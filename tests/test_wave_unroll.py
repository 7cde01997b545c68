"""Wave-body unroll (exec_opts.wave_unroll): the fused tri megakernel
applies N wave bodies per persistent-loop iteration so the while back-
edge (where the ~30 carried (8,128) planes are materialized) is paid
once per N waves — a pure execution-strategy knob that must not change
a single pixel.

Bit-identity argument: the unrolled execution applies the SAME body the
same number of times as the rolled loop, except for up to N-1 trailing
bodies on a fully-terminated state; those are masked no-ops (regen
cannot fire at scnt == spp, every RNG draw is masked off so LCG states
hold, and _closest_hit's any_work gate skips the root push so the walk
does zero visits).  The tests below assert u8 equality across engine
variants, plus equality with the oracle-matched parity renderer.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # each test compiles 2+ megakernel variants

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


def _mesh_scene(tmp_path=None, textured=False, media=False):
    b = SceneBuilder(sun_enabled=True, sun_dir=(0.2, -0.5, -1.0),
                     sun_radiance=(9.0, 8.5, 8.0))
    tex = None
    if textured:
        img = np.zeros((8, 8, 3), np.uint8)
        img[::2, ::2] = [250, 60, 60]
        img[1::2, 1::2] = [60, 60, 250]
        tex = str(tmp_path / "wu_check.png")
        write_png(tex, img)
    rng = np.random.default_rng(11)
    for i in range(20):
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
    b.add_sphere((-1.5, -0.5, -2.0), 0.45, Material.dielectric(1.5))
    if media:
        b.add_constant_medium_sphere((0.5, 0.0, -2.0), 0.8, 0.6,
                                     (0.7, 0.7, 0.8))
    return b.build()


def _render_ab(scene, unroll=2, **opts):
    from dsrt_tpu.render import render_frame_fused
    cam = make_camera((0, 0, 1.2), (0, 0, -2), vfov=65, width=W, height=H)
    old = {k: getattr(OPTS, k) for k in ("wave_unroll", *opts)}
    try:
        for k, v in opts.items():
            setattr(OPTS, k, v)
        OPTS.wave_unroll = 1
        a = render_frame_fused(scene, cam, CFG)
        OPTS.wave_unroll = unroll
        b = render_frame_fused(scene, cam, CFG)
    finally:
        for k, v in old.items():
            setattr(OPTS, k, v)
    return a, b


def test_wave_unroll_ab_bit_identical():
    scene = _mesh_scene()
    _require_fused(scene, CFG)
    a, b = _render_ab(scene, unroll=2)
    assert (a > 0).any(), "scene not in frame"
    np.testing.assert_array_equal(a, b)


def test_wave_unroll4_ab_bit_identical():
    """unroll=4: up to 3 trailing no-op bodies per block."""
    scene = _mesh_scene()
    _require_fused(scene, CFG)
    a, b = _render_ab(scene, unroll=4)
    np.testing.assert_array_equal(a, b)


def test_wave_unroll_ab_bit_identical_textured(tmp_path):
    """Shaded (in-record UV) engine under unroll."""
    scene = _mesh_scene(tmp_path, textured=True)
    _require_fused(scene, CFG)
    a, b = _render_ab(scene, unroll=2)
    assert (a > 0).any()
    np.testing.assert_array_equal(a, b)


def test_wave_unroll_ab_bit_identical_media():
    """Constant-medium draws ride masked schedules; trailing bodies
    must not advance any lane's LCG stream."""
    scene = _mesh_scene(media=True)
    _require_fused(scene, CFG)
    a, b = _render_ab(scene, unroll=2)
    np.testing.assert_array_equal(a, b)


def test_wave_unroll_matches_parity_renderer():
    scene = _mesh_scene()
    _require_fused(scene, CFG)
    from dsrt_tpu.render import render_frame, render_frame_fused
    cam = make_camera((0, 0, 1.2), (0, 0, -2), vfov=65, width=W, height=H)
    ref = render_frame(scene, cam, CFG)
    old = OPTS.wave_unroll
    try:
        OPTS.wave_unroll = 2
        img = render_frame_fused(scene, cam, CFG)
    finally:
        OPTS.wave_unroll = old
    np.testing.assert_array_equal(img, ref)
