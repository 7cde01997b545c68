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


@pytest.mark.slow
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


def _dof_motion_scene(sun=False):
    from dsrt_tpu.models.materials import Material
    from dsrt_tpu.models.scene import SceneBuilder
    b = SceneBuilder(sun_enabled=sun, seed=1337)
    b.add_sphere((0.0, -100.5, -1.0), 100.0,
                 Material.lambertian((0.8, 0.8, 0.0)))
    b.add_sphere((-0.4, 0.0, -1.0), 0.35,
                 Material.lambertian((0.1, 0.2, 0.7)),
                 center2=(0.4, 0.1, -1.0))
    b.add_sphere((0.3, -0.1, -0.6), 0.2,
                 Material.metal((0.8, 0.7, 0.6), fuzz=0.1))
    b.add_sphere((0.0, 2.2, -1.0), 0.8,
                 Material.diffuse_light((8.0, 8.0, 8.0)))
    return b.build()


def test_sphere_fused_thin_lens_dof():
    """aperture > 0 stays on the fused kernel and matches the split
    path bit-for-bit (in-kernel disk draws ride the same masked
    schedule as ops/camera.generate_rays_dof)."""
    scene = _dof_motion_scene()
    cfg = RenderConfig(width=W, height=H, spp=4, max_depth=10,
                       aperture=0.25)
    _require(scene, cfg)
    from dsrt_tpu.render import render_frame, render_frame_fused
    cam = make_camera((0, 0.4, 1.2), (0, 0, -1), vfov=60,
                      width=W, height=H, aperture=0.25)
    ref = render_frame(scene, cam, cfg)
    img = render_frame_fused(scene, cam, cfg)
    assert (img > 0).any()
    np.testing.assert_array_equal(img, ref)


def test_sphere_fused_motion_blur_and_dof():
    """Moving centers + open shutter + DOF + sun MIS together: one
    shutter-time draw after the jitter/aperture pair, held for the
    whole path incl. shadow rays (inc/sphere.h:143-146 center lerp)."""
    scene = _dof_motion_scene(sun=True)
    cfg = RenderConfig(width=W, height=H, spp=4, max_depth=10,
                       aperture=0.2, time0=0.2, time1=0.8)
    _require(scene, cfg)
    from dsrt_tpu.render import render_frame, render_frame_fused
    cam = make_camera((0, 0.4, 1.2), (0, 0, -1), vfov=60,
                      width=W, height=H, aperture=0.2)
    ref = render_frame(scene, cam, cfg)
    img = render_frame_fused(scene, cam, cfg)
    assert (img > 0).any()
    np.testing.assert_array_equal(img, ref)
