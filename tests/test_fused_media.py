"""Constant media inside the fused TRI megakernel (the last fused-scope
gap): probabilistic medium hits + isotropic scatter + shadow-ray media,
draw-schedule-identical to the split path (which is oracle-matched for
the media transport — tests/test_volume_golden.py)."""

import numpy as np
import pytest

from dsrt_tpu.config import RenderConfig
from dsrt_tpu.models.materials import Material
from dsrt_tpu.models.scene import SceneBuilder
from dsrt_tpu.ops.camera import make_camera

W, H = 96, 56
CFG = RenderConfig(width=W, height=H, spp=4, max_depth=10)


def _mesh_media_scene(box=True, sphere=True, light=False):
    # sun_dir is model->Sun and the renderer NEGATES it (reference
    # quirk): a NEGATIVE y here lights the up-facing ground
    b = SceneBuilder(sun_enabled=True, sun_dir=(0.2, -0.8, -0.3),
                     sun_radiance=(30.0, 30.0, 28.0), seed=1337)
    m = Material.lambertian((0.7, 0.7, 0.7))
    b.add_triangle((-2, -1, -3), (2, -1, -3), (2, -1, 1), m)
    b.add_triangle((-2, -1, -3), (2, -1, 1), (-2, -1, 1), m)
    b.add_triangle((-0.6, -1, -2), (0.6, -1, -2), (0, 0.4, -2),
                   Material.metal((0.85, 0.85, 0.9), fuzz=0.1))
    if box:
        b.add_constant_medium_box((-1.2, -1.0, -2.6), (0.2, 0.2, -1.4),
                                  density=1.2, albedo=(0.8, 0.85, 0.9))
    if sphere:
        b.add_constant_medium_sphere((0.9, -0.4, -1.6), 0.5,
                                     density=2.0, albedo=(0.9, 0.6, 0.5))
    if light:
        b.add_sphere((0.0, 1.6, -1.6), 0.3,
                     Material.diffuse_light((14.0, 13.0, 12.0)))
    return b.build()


def _require_fused(scene):
    from dsrt_tpu.ops import pallas_path
    if not pallas_path.fused_supported(scene, CFG):
        pytest.skip("fused path needs a TPU backend")


@pytest.mark.parametrize("light", [False, True])
@pytest.mark.slow
def test_fused_media_matches_split(light):
    scene = _mesh_media_scene(light=light)
    assert scene.n_media == 2 and scene.n_tris == 3
    _require_fused(scene)
    from dsrt_tpu.render import render_frame, render_frame_fused
    cam = make_camera((0, 0.2, 1.6), (0, -0.3, -2), vfov=55,
                      width=W, height=H)
    ref = np.asarray(render_frame(scene, cam, CFG))
    img = np.asarray(render_frame_fused(scene, cam, CFG))
    assert (img > 0).any()
    np.testing.assert_array_equal(img, ref)


def test_split_media_mesh_matches_oracle():
    """The split path itself stays oracle-matched on tri+media scenes
    (the volumetric goldens cover sphere scenes)."""
    from dsrt_tpu.oracle import render_oracle
    from dsrt_tpu.render import render_frame
    cfg = RenderConfig(width=24, height=14, spp=2, max_depth=8)
    scene = _mesh_media_scene()
    cam = make_camera((0, 0.2, 1.6), (0, -0.3, -2), vfov=55,
                      width=cfg.width, height=cfg.height)
    ours = np.asarray(render_frame(scene, cam, cfg))
    gold, _ = render_oracle(scene, cam, cfg)
    np.testing.assert_array_equal(ours, gold)


def test_fused_media_gate():
    from dsrt_tpu.ops import pallas_path
    scene = _mesh_media_scene()
    if pallas_path.backend_is_tpu():
        assert pallas_path.fused_supported(scene, CFG)


@pytest.mark.slow
def test_fused_ptex_tris_matches_split():
    """Procedural (checker/marble) textures on TRIANGLES in the fused
    megakernel (the sphere kernel's block transplanted): bit-identical
    to the split path's sample_procedural."""
    from dsrt_tpu.ops import pallas_path
    b = SceneBuilder(sun_enabled=True, sun_dir=(0.2, -0.8, -0.3),
                     sun_radiance=(25.0, 25.0, 24.0), seed=1337)
    g = Material.checker((0.2, 0.3, 0.1), (0.9, 0.9, 0.9), scale=3.0)
    b.add_triangle((-2, -1, -3), (2, -1, -3), (2, -1, 1), g)
    b.add_triangle((-2, -1, -3), (2, -1, 1), (-2, -1, 1), g)
    b.add_triangle((-0.6, -1, -2), (0.6, -1, -2), (0, 0.4, -2),
                   Material.marble(scale=2.0)
                   if hasattr(Material, "marble")
                   else Material.noise(scale=2.0))
    scene = b.build()
    assert scene.has_ptex
    if not pallas_path.fused_supported(scene, CFG):
        pytest.skip("fused path needs a TPU backend")
    from dsrt_tpu.render import render_frame, render_frame_fused
    cam = make_camera((0, 0.2, 1.6), (0, -0.3, -2), vfov=55,
                      width=W, height=H)
    ref = np.asarray(render_frame(scene, cam, CFG))
    img = np.asarray(render_frame_fused(scene, cam, CFG))
    assert (img > 0).any()
    np.testing.assert_array_equal(img, ref)


@pytest.mark.slow
def test_fused_dof_matches_split():
    """Thin-lens DOF (cfg.aperture > 0 — the reference defines but
    never calls it, inc/camera.h:35-61) inside the fused raygen: the
    disk-sampler draws ride the same per-pixel schedule as the split
    path."""
    from dsrt_tpu.ops import pallas_path
    cfg = RenderConfig(width=64, height=40, spp=4, max_depth=6,
                       aperture=0.35)
    b = SceneBuilder(sun_enabled=True, sun_dir=(0.2, -0.8, -0.3),
                     sun_radiance=(25.0, 25.0, 24.0), seed=1337)
    m = Material.lambertian((0.7, 0.7, 0.7))
    b.add_triangle((-2, -1, -3), (2, -1, -3), (2, -1, 1), m)
    b.add_triangle((-2, -1, -3), (2, -1, 1), (-2, -1, 1), m)
    b.add_triangle((-0.5, -1, -2), (0.5, -1, -2), (0, 0.2, -2),
                   Material.lambertian((0.8, 0.3, 0.3)))
    scene = b.build()
    if not pallas_path.fused_supported(scene, cfg):
        pytest.skip("fused path needs a TPU backend")
    from dsrt_tpu.render import render_frame, render_frame_fused
    cam = make_camera((0, 0.2, 1.6), (0, -0.3, -2), vfov=55,
                      width=cfg.width, height=cfg.height,
                      aperture=cfg.aperture)
    ref = np.asarray(render_frame(scene, cam, cfg))
    img = np.asarray(render_frame_fused(scene, cam, cfg))
    assert (img > 0).any()
    np.testing.assert_array_equal(img, ref)
