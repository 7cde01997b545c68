"""Sphere-scene fused megakernel (ops/pallas_sphere.py): must be
BIT-IDENTICAL to the parity renderer (same per-pixel LCG streams, same
draw schedule incl. per-medium draws), which is itself u8-exact vs the
scalar oracle."""

import numpy as np
import pytest

from dsrt_tpu.config import RenderConfig
from dsrt_tpu.models.presets import rtiow_smoke_scene, volumetric_scene
from dsrt_tpu.ops.camera import make_camera
from dsrt_tpu.ops import pallas_sphere

W, H = 96, 56
CFG = RenderConfig(width=W, height=H, spp=4, max_depth=12)


def _require(scene, cfg):
    if not pallas_sphere.sphere_fused_supported(scene, cfg):
        pytest.skip("sphere fused path needs a TPU backend")


def test_sphere_fused_matches_parity_rtiow():
    scene = rtiow_smoke_scene()
    _require(scene, CFG)
    from dsrt_tpu.render import render_frame, render_frame_fused
    cam = make_camera((0, 0.6, 2.0), (0, 0, -1), vfov=50, width=W, height=H)
    ref = render_frame(scene, cam, CFG)
    img = render_frame_fused(scene, cam, CFG)
    assert (img > 0).any(), "scene not in frame"
    np.testing.assert_array_equal(img, ref)


def test_sphere_fused_matches_parity_volumetric():
    # media draws + procedural textures + sphere-light mixture.  The RNG
    # draw schedule is bit-identical (verified by state comparison), but
    # the media free-path test uses jnp.log, whose Mosaic lowering
    # differs from XLA's by ~4e-5 relative — analytically identical
    # verdicts can round one u8 step apart on isolated pixels.
    scene = volumetric_scene()
    _require(scene, CFG)
    from dsrt_tpu.render import render_frame, render_frame_fused
    cam = make_camera((0, 0.6, 2.0), (0, 0, -1), vfov=50, width=W, height=H)
    ref = render_frame(scene, cam, CFG)
    img = render_frame_fused(scene, cam, CFG)
    assert (img > 0).any(), "scene not in frame"
    diff = np.abs(img.astype(int) - ref.astype(int))
    assert diff.max() <= 1, diff.max()
    frac = (diff > 0).mean()
    assert frac <= 1e-3, frac
