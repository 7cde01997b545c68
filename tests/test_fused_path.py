"""Fused persistent path-tracing megakernel (ops/pallas_path.py):
must be BIT-IDENTICAL to the parity renderer (same per-pixel LCG streams,
same draw schedule), which is itself u8-exact vs the scalar oracle."""

import numpy as np
import pytest

from dsrt_tpu.config import RenderConfig
from dsrt_tpu.models.mesh_gen import iss_standin_scene
from dsrt_tpu.models.presets import random_tri_soup_scene
from dsrt_tpu.ops.camera import make_camera, point_camera_at
from dsrt_tpu.ops import pallas_path

W, H = 96, 56
CFG = RenderConfig(width=W, height=H, spp=4, max_depth=12)


def _require_fused(scene, cfg):
    if not pallas_path.fused_supported(scene, cfg):
        pytest.skip("fused path needs a TPU backend")


@pytest.mark.slow
def test_fused_matches_parity_renderer_iss():
    scene = iss_standin_scene(detail=2)
    _require_fused(scene, CFG)
    from dsrt_tpu.render import render_frame, render_frame_fused
    cam = point_camera_at((20.0, 30.0, 95.0), (0.0, 0.0, 0.0),
                          vfov=CFG.vfov, width=W, height=H)
    ref = render_frame(scene, cam, CFG)
    img = render_frame_fused(scene, cam, CFG)
    assert (img > 0).any(), "scene not in frame"
    np.testing.assert_array_equal(img, ref)


@pytest.mark.slow
def test_fused_matches_parity_renderer_soup():
    # tri soup exercises metal + dielectric + emissive-triangle paths
    scene = random_tri_soup_scene(n=60)
    _require_fused(scene, CFG)
    from dsrt_tpu.render import render_frame, render_frame_fused
    cam = make_camera((0, 0, 2.0), (0, 0, -3), vfov=55, width=W, height=H)
    ref = render_frame(scene, cam, CFG)
    img = render_frame_fused(scene, cam, CFG)
    np.testing.assert_array_equal(img, ref)


@pytest.mark.slow
def test_fused_ray_count_matches_split_pipeline():
    scene = iss_standin_scene(detail=1)
    _require_fused(scene, CFG)
    import jax
    import jax.numpy as jnp
    from dsrt_tpu.render import lane_layout
    from dsrt_tpu.ops.pallas_path import trace_fused
    cam = point_camera_at((20.0, 30.0, 95.0), (0.0, 0.0, 0.0),
                          vfov=CFG.vfov, width=W, height=H)
    px, py, valid, _ = lane_layout(W, H)
    _, nrays = jax.jit(
        lambda s, c, a, b, v: trace_fused(s, CFG, c, a, b, v)
    )(scene, cam, jnp.asarray(px), jnp.asarray(py), jnp.asarray(valid))
    n = int(np.asarray(nrays, np.int64).sum())
    # every (pixel, sample) costs at least one primary ray
    assert n >= W * H * CFG.spp
    # and bounded by (max_depth extensions + shadows) per sample
    assert n <= W * H * CFG.spp * 2 * CFG.max_depth


def test_fused_gate_rejects_unsupported():
    from dsrt_tpu.models.presets import rtiow_smoke_scene
    scene = rtiow_smoke_scene()  # spheres -> unsupported
    assert not pallas_path.fused_supported(scene, CFG)


def test_fused_stream_walk_matches_union_walk():
    """The streamed walk (leaf tiles folded into the visit iteration,
    exec_opts.stream) must be bit-identical to the union walk: every
    enqueued range is fully drained, pruning clamps only lag (superset
    walks), idle tile slots re-test real tiles (idempotent accepts)."""
    scene = iss_standin_scene(detail=2)
    _require_fused(scene, CFG)
    from dsrt_tpu.render import render_frame_fused
    from dsrt_tpu.exec_opts import OPTS
    cam = point_camera_at((20.0, 30.0, 95.0), (0.0, 0.0, 0.0),
                          vfov=CFG.vfov, width=W, height=H)
    old = OPTS.stream
    try:
        OPTS.stream = "off"
        ref = render_frame_fused(scene, cam, CFG)
        OPTS.stream = "on"
        img = render_frame_fused(scene, cam, CFG)
    finally:
        OPTS.stream = old
    assert (img > 0).any()
    np.testing.assert_array_equal(img, ref)


def test_fused_rowtrav_matches_union_walk():
    """Per-row traversal (exec_opts.rowtrav; measured net-negative,
    kept as an A/B knob) must still be bit-identical."""
    scene = iss_standin_scene(detail=2)
    _require_fused(scene, CFG)
    from dsrt_tpu.render import render_frame_fused
    from dsrt_tpu.exec_opts import OPTS
    cam = point_camera_at((20.0, 30.0, 95.0), (0.0, 0.0, 0.0),
                          vfov=CFG.vfov, width=W, height=H)
    olds, oldr = OPTS.stream, OPTS.rowtrav
    try:
        OPTS.stream = "off"
        OPTS.rowtrav = False
        ref = render_frame_fused(scene, cam, CFG)
        OPTS.rowtrav = True
        img = render_frame_fused(scene, cam, CFG)
    finally:
        OPTS.stream, OPTS.rowtrav = olds, oldr
    np.testing.assert_array_equal(img, ref)


@pytest.mark.slow
def test_fused_dual_union_bit_identical():
    """Half-leaf mode's dual-union scan (both halves entered the same
    node's leaves -> one full-row union scan) must be bit-identical to
    the two half-row scans AND to the parity renderer: superset tile
    scans only add misses (exec_opts.dual_union)."""
    from dsrt_tpu.exec_opts import OPTS
    scene = iss_standin_scene(detail=3)
    _require_fused(scene, CFG)
    from dsrt_tpu.render import render_frame, render_frame_fused
    cam = point_camera_at((20.0, 30.0, 95.0), (0.0, 0.0, 0.0),
                          vfov=CFG.vfov, width=W, height=H)
    old_split, old_du = OPTS.leaf_split, OPTS.dual_union
    try:
        OPTS.leaf_split = "half"   # force halves on this small scene
        OPTS.dual_union = False
        a = render_frame_fused(scene, cam, CFG)
        OPTS.dual_union = True
        b = render_frame_fused(scene, cam, CFG)
    finally:
        OPTS.leaf_split, OPTS.dual_union = old_split, old_du
    ref = render_frame(scene, cam, CFG)
    assert (b > 0).any()
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(b, ref)


def test_standin_multi_texture_structure(tmp_path):
    """tex_paths gives each solar wing its own map_Kd (the real NASA
    OBJ's per-surface-MTL layout, inc/triangle_mesh.h:244-251): four
    distinct maps must land as four texture pools, wings cycling."""
    from dsrt_tpu.models.mesh_gen import iss_standin_mesh
    from dsrt_tpu.utils.image_io import write_png
    paths = []
    for i in range(4):
        tex = np.full((4, 4, 3), 40 + 50 * i, np.uint8)
        p = str(tmp_path / f"t{i}.png")
        write_png(p, tex)
        paths.append(p)
    mesh = iss_standin_mesh(detail=1, tex_paths=paths)
    assert sorted(set(p for p in mesh.tex_paths if p)) == sorted(paths)
    scene = iss_standin_scene(detail=1, tex_paths=paths)
    assert int(scene.n_textures) == 4
    # single-path form unchanged
    one = iss_standin_scene(detail=1, tex_path=paths[0])
    assert int(one.n_textures) == 1


@pytest.mark.slow
def test_fused_multi_texture_standin_matches_parity(tmp_path):
    """The 4-map stand-in must stay on the fused path and remain
    bit-identical to the parity renderer (multi-pool select)."""
    from dsrt_tpu.models.mesh_gen import iss_standin_scene as mk
    from dsrt_tpu.utils.image_io import write_png
    paths = []
    for i in range(4):
        tex = np.zeros((4, 4, 3), np.uint8)
        tex[::2, ::2] = [200 - 40 * i, 60 + 40 * i, 90]
        p = str(tmp_path / f"t{i}.png")
        write_png(p, tex)
        paths.append(p)
    scene = mk(detail=1, tex_paths=paths)
    _require_fused(scene, CFG)
    from dsrt_tpu.render import render_frame, render_frame_fused
    cam = point_camera_at((20.0, 30.0, 95.0), (0.0, 0.0, 0.0),
                          vfov=CFG.vfov, width=W, height=H)
    ref = render_frame(scene, cam, CFG)
    img = render_frame_fused(scene, cam, CFG)
    assert (img > 0).any()
    np.testing.assert_array_equal(img, ref)
