"""Split-front traversal (exec_opts.front_split): the fused megakernel's
block rows walk the wide BVH as two independent half-block fronts (own
SMEM stack segment each, both pop pipelines in one loop iteration) —
a pure execution-strategy knob that must not change a single pixel.
Per-lane acceptance is identical: a front enters every node any of its
rows hit, a superset of each lane's own walk, and leaf accepts are
idempotent (the leaf_split/dual_union superset argument).  The serial-
visit-bound spine (ROADMAP r4/r5 dup attributions) is what the two
textually independent visit chains overlap."""

import numpy as np
import pytest

from dsrt_tpu.config import RenderConfig
from dsrt_tpu.exec_opts import OPTS
from dsrt_tpu.models.materials import Material
from dsrt_tpu.models.scene import SceneBuilder
from dsrt_tpu.ops.camera import make_camera
from dsrt_tpu.ops import pallas_path
from dsrt_tpu.utils.image_io import write_png

W, H = 96, 56
CFG = RenderConfig(width=W, height=H, spp=4, max_depth=8)


def _require_fused(scene, cfg):
    if not pallas_path.fused_supported(scene, cfg):
        pytest.skip("fused path needs a TPU backend")


def _sun_mesh_scene(tmp_path=None, textured=False):
    """A couple dozen triangles + a metal tri + a sphere, sun-lit —
    enough geometry that both fronts walk non-trivial stacks."""
    b = SceneBuilder(sun_enabled=True, sun_dir=(0.2, -0.5, -1.0),
                     sun_radiance=(9.0, 8.5, 8.0))
    tex = None
    if textured:
        img = np.zeros((8, 8, 3), np.uint8)
        img[::2, ::2] = [250, 60, 60]
        img[1::2, 1::2] = [60, 60, 250]
        tex = str(tmp_path / "fs_check.png")
        write_png(tex, img)
    rng = np.random.default_rng(7)
    for i in range(24):
        c = rng.uniform(-2.0, 2.0, 3) * np.array([1.0, 0.7, 0.3]) \
            + np.array([0.0, 0.0, -2.5])
        d1 = rng.uniform(-0.4, 0.4, 3)
        d2 = rng.uniform(-0.4, 0.4, 3)
        mat = Material.lambertian(tuple(rng.uniform(0.2, 0.9, 3)),
                                  tex_path=tex if (textured and i % 2)
                                  else None)
        kw = {}
        if textured and i % 2:
            kw = dict(uv0=(0.0, 0.0), uv1=(1.0, 0.0), uv2=(0.5, 1.0),
                      tex_path=tex)
        b.add_triangle(tuple(c), tuple(c + d1), tuple(c + d2), mat, **kw)
    b.add_triangle((1.2, -1, -2.2), (2.2, -1, -2.2), (1.7, 0.5, -2.2),
                   Material.metal((0.8, 0.8, 0.9), fuzz=0.05))
    b.add_sphere((-1.5, -0.5, -2.0), 0.45,
                 Material.dielectric(1.5))
    return b.build()


def _render_ab(scene, **opts):
    """Render with front_split=1 then =2 (plus extra OPTS overrides),
    return the two u8 frames."""
    from dsrt_tpu.render import render_frame_fused
    cam = make_camera((0, 0, 1.2), (0, 0, -2), vfov=65, width=W, height=H)
    old = {k: getattr(OPTS, k) for k in ("front_split", *opts)}
    try:
        for k, v in opts.items():
            setattr(OPTS, k, v)
        OPTS.front_split = 1
        a = render_frame_fused(scene, cam, CFG)
        OPTS.front_split = 2
        b = render_frame_fused(scene, cam, CFG)
    finally:
        for k, v in old.items():
            setattr(OPTS, k, v)
    return a, b


def test_front_split_ab_bit_identical_sun_mesh():
    """Default engine (separate sun walk): split-front closest-hit must
    be bit-identical."""
    scene = _sun_mesh_scene()
    _require_fused(scene, CFG)
    a, b = _render_ab(scene)
    assert (a > 0).any(), "scene not in frame"
    np.testing.assert_array_equal(a, b)


def test_front_split_ab_bit_identical_textured(tmp_path):
    """Shaded (in-record UV) engine: the split-front leaf scans update
    only their front's rows of the candidate state."""
    scene = _sun_mesh_scene(tmp_path, textured=True)
    _require_fused(scene, CFG)
    a, b = _render_ab(scene)
    assert (a > 0).any()
    np.testing.assert_array_equal(a, b)


def test_front_split_ab_bit_identical_defer_shadow():
    """Combined extension+shadow walk (exec_opts.defer_shadow): each
    front carries BOTH its rows' extension set and their pending
    sun-shadow set; per-front shadow scans must resolve the same
    occlusions."""
    scene = _sun_mesh_scene()
    _require_fused(scene, CFG)
    a, b = _render_ab(scene, defer_shadow=True)
    assert (a > 0).any()
    np.testing.assert_array_equal(a, b)


def test_front_split_gated_off_under_hbm():
    """HBM leaf streaming keeps the union walk (per-front DMA window
    slots are not implemented): front_split=2 with hbm_tris=on must
    still render, bit-identical to the union-walk HBM frame."""
    scene = _sun_mesh_scene()
    _require_fused(scene, CFG)
    from dsrt_tpu.render import render_frame_fused
    from dsrt_tpu.ops.camera import make_camera as mk
    cam = mk((0, 0, 1.2), (0, 0, -2), vfov=65, width=W, height=H)
    old_h, old_f = OPTS.hbm_tris, OPTS.front_split
    try:
        OPTS.hbm_tris = "on"
        OPTS.front_split = 1
        a = render_frame_fused(scene, cam, CFG)
        OPTS.front_split = 2
        b = render_frame_fused(scene, cam, CFG)
    finally:
        OPTS.hbm_tris, OPTS.front_split = old_h, old_f
    assert (a > 0).any()
    np.testing.assert_array_equal(a, b)


def test_front_split_matches_parity_renderer():
    """And the split-front frame equals the oracle-matched split
    parity renderer, not just the other fused variant."""
    scene = _sun_mesh_scene()
    _require_fused(scene, CFG)
    from dsrt_tpu.render import render_frame, render_frame_fused
    cam = make_camera((0, 0, 1.2), (0, 0, -2), vfov=65, width=W, height=H)
    ref = render_frame(scene, cam, CFG)
    old = OPTS.front_split
    try:
        OPTS.front_split = 2
        img = render_frame_fused(scene, cam, CFG)
    finally:
        OPTS.front_split = old
    np.testing.assert_array_equal(img, ref)
