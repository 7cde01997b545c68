"""Participating-media golden test: the full volumetric light transport
(exponential free path, isotropic scatter, media-aware shadow rays, light
mixture sampling) must match the scalar oracle draw-for-draw."""

import numpy as np

from dsrt_tpu.config import RenderConfig
from dsrt_tpu.models.materials import Material
from dsrt_tpu.models.scene import SceneBuilder
from dsrt_tpu.ops.camera import make_camera
from dsrt_tpu.oracle import render_oracle
from dsrt_tpu.render import render_radiance

W, H = 20, 12
CFG = RenderConfig(width=W, height=H, spp=2, max_depth=8)


def _media_scene():
    b = SceneBuilder(sun_enabled=True, sun_dir=(-0.3, -0.9, -0.2),
                     sun_radiance=(6.0, 5.7, 5.4))
    ground = Material.lambertian((0.6, 0.6, 0.55))
    lamp = Material.diffuse_light((9.0, 8.5, 8.0))
    b.add_sphere((0.0, -100.5, -1.0), 100.0, ground)
    b.add_sphere((0.8, 1.8, -1.0), 0.5, lamp)
    b.add_constant_medium_sphere((-0.5, 0.2, -1.2), 0.6, density=1.8,
                                 albedo=(0.85, 0.9, 0.95))
    b.add_constant_medium_box((0.6, -0.4, -0.6), (1.4, 0.4, 0.2),
                              density=1.0, albedo=(0.9, 0.8, 0.7))
    return b.build()


def test_media_render_matches_oracle():
    scene = _media_scene()
    assert scene.n_media == 2 and scene.n_lights == 1
    cam = make_camera((0, 0.4, 1.6), (0, 0, -1), vfov=55, width=W, height=H)
    fl = render_radiance(scene, cam, CFG)
    _, ofl = render_oracle(scene, cam, CFG)
    diff = np.abs(fl - ofl)
    assert diff.max() <= 5e-5, diff.max()
    assert fl.max() > 0.05  # scene actually produces light
