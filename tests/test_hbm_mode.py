"""HBM-streamed leaf mode (exec_opts.hbm_tris) for the fused megakernel.

Big scenes (tri tables past the VMEM budget, ~90k tris) keep only the
wide-BVH table on-core and DMA each visit's entered leaf window from
HBM.  The mode must be bit-identical to the VMEM-resident kernel — the
window always covers the whole contiguous leaf span of a wide node
(Scene.wide_max_span sizes it), and the duplicate/boundary tiles it
re-tests are real records (idempotent accepts).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dsrt_tpu.config import RenderConfig
from dsrt_tpu.exec_opts import OPTS
from dsrt_tpu.models.mesh_gen import iss_standin_scene
from dsrt_tpu.ops.camera import point_camera_at
from dsrt_tpu.render import lane_layout


def _require_tpu():
    from dsrt_tpu.ops.pallas_trace import backend_is_tpu
    if not backend_is_tpu():
        pytest.skip("fused megakernel requires a TPU backend")


@partial(jax.jit, static_argnames=("cfg", "key"))
def _run(scene, cfg, cam, px, py, valid, key):
    from dsrt_tpu.ops.pallas_path import trace_fused
    return trace_fused(scene, cfg, cam, px, py, valid)


def _trace(scene, cfg, key):
    cam = point_camera_at((40.0, 60.0, 190.0), (0.0, 0.0, 0.0),
                          vfov=cfg.vfov, width=cfg.width,
                          height=cfg.height)
    px, py, valid, _ = lane_layout(cfg.width, cfg.height)
    acc, nr = _run(scene, cfg, cam, jnp.asarray(px), jnp.asarray(py),
                   jnp.asarray(valid), key)
    return (np.asarray(jax.device_get(acc.x)),
            np.asarray(jax.device_get(acc.y)),
            np.asarray(jax.device_get(acc.z)),
            int(np.asarray(jax.device_get(nr), np.int64).sum()))


@pytest.mark.slow
def test_hbm_forced_bit_identical():
    """hbm_tris=on must reproduce the VMEM kernel exactly (same LCG
    draws, same accepts) on a scene that fits both modes."""
    _require_tpu()
    scene = iss_standin_scene(detail=2)
    cfg = RenderConfig(width=96, height=56, spp=2, max_depth=8)
    try:
        OPTS.hbm_tris = "off"
        ref = _trace(scene, cfg, "hbm-off")
        OPTS.hbm_tris = "on"
        out = _trace(scene, cfg, "hbm-on")
    finally:
        OPTS.hbm_tris = "auto"
    assert out[3] == ref[3]
    for i in range(3):
        np.testing.assert_array_equal(out[i], ref[i])


@pytest.mark.slow
def test_hbm_textured_bit_identical(tmp_path):
    """Shaded scenes ride an aux window per slot (UV/tex-id tiles DMA'd
    alongside the MT tiles): identical streams to the VMEM kernel."""
    _require_tpu()
    import numpy as np_
    from dsrt_tpu.utils.image_io import write_png
    y, x = np_.mgrid[0:64, 0:64]
    img = np_.stack([40 + 30 * ((x // 8 + y // 8) % 2)] * 3,
                    -1).astype(np_.uint8)
    tex = str(tmp_path / "panel.png")
    write_png(tex, img)
    scene = iss_standin_scene(detail=2, tex_path=tex,
                              sun_radiance=(6.0, 5.7, 5.4))
    assert scene.has_image_tex
    cfg = RenderConfig(width=96, height=56, spp=2, max_depth=8)
    try:
        OPTS.hbm_tris = "off"
        ref = _trace(scene, cfg, "tex-hbm-off")
        OPTS.hbm_tris = "on"
        out = _trace(scene, cfg, "tex-hbm-on")
    finally:
        OPTS.hbm_tris = "auto"
    assert out[3] == ref[3]
    for i in range(3):
        np.testing.assert_array_equal(out[i], ref[i])


@pytest.mark.slow
def test_hbm_auto_resolution():
    """auto = engage exactly when the VMEM-resident tables no longer
    fit; the window covers every wide node's contiguous leaf span."""
    from dsrt_tpu.ops.pallas_path import _hbm_mode, _hbm_gw
    from dsrt_tpu.ops.pallas_trace import fits_vmem_fused_packed
    small = iss_standin_scene(detail=2)
    assert fits_vmem_fused_packed(small)
    assert not _hbm_mode(small, 0)
    big = iss_standin_scene(detail=20)
    # 130k tris now fits the raised VMEM-resident budget (the scoped-
    # VMEM limit lift); auto stays resident — the faster mode there
    assert fits_vmem_fused_packed(big)
    assert not _hbm_mode(big, 0)
    # shrink the budget to check the auto cutover logic itself
    from dsrt_tpu.ops import pallas_trace as pt
    orig = pt._FUSED_RESIDENT_ROWS
    try:
        pt._FUSED_RESIDENT_ROWS = 24000
        assert not fits_vmem_fused_packed(big)
        assert _hbm_mode(big, 0)
    finally:
        pt._FUSED_RESIDENT_ROWS = orig
    # window (groups of 64 tris) covers span + misalignment + the
    # engine's trailing duplicate tile
    assert 8 * _hbm_gw(big) * 8 >= big.wide_max_span + 8 + 8
    cfg = RenderConfig(width=96, height=56, spp=2, max_depth=8)
    from dsrt_tpu.ops.pallas_path import fused_supported
    from dsrt_tpu.ops.pallas_trace import backend_is_tpu
    if backend_is_tpu():
        assert fused_supported(big, cfg)


@pytest.mark.slow
def test_hbm_bigscene_renders():
    """A 130k-tri scene (past the VMEM budget) renders through the
    fused kernel in HBM mode and produces a lit image.  (The u8-exact
    cross-check against the CPU XLA parity path was done offline — CPU
    and TPU transcendental lowerings agreed exactly on this scene.)"""
    _require_tpu()
    scene = iss_standin_scene(detail=20)
    cfg = RenderConfig(width=96, height=56, spp=2, max_depth=8)
    from dsrt_tpu.render import render_frame_fused, fused_kind
    assert fused_kind(scene, cfg) == "tri"
    cam = point_camera_at((40.0, 60.0, 190.0), (0.0, 0.0, 0.0),
                          vfov=cfg.vfov, width=cfg.width,
                          height=cfg.height)
    img = render_frame_fused(scene, cam, cfg)
    assert img.shape == (56, 96, 3)
    assert (img > 0).any()
