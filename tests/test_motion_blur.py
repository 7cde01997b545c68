"""Moving-sphere motion blur (inc/sphere.h:143-146 center-as-ray,
CPU-library-only in the reference; rendered here when the camera shutter
cfg.time1 > cfg.time0 is open).  Golden: u8-exact vs the scalar oracle."""

import numpy as np

from dsrt_tpu.config import RenderConfig
from dsrt_tpu.models.materials import Material
from dsrt_tpu.models.scene import SceneBuilder
from dsrt_tpu.ops.camera import make_camera
from dsrt_tpu.oracle import render_oracle
from dsrt_tpu.render import render_frame
import pytest

W, H = 32, 24


def _scene():
    b = SceneBuilder(sun_enabled=False, seed=1337)
    b.add_sphere((0.0, -100.5, -1.0), 100.0,
                 Material.lambertian((0.8, 0.8, 0.0)))
    # moving emissive-lit diffuse sphere sweeping left->right
    b.add_sphere((-0.4, 0.0, -1.0), 0.35,
                 Material.lambertian((0.1, 0.2, 0.7)),
                 center2=(0.4, 0.1, -1.0))
    b.add_sphere((0.0, 2.2, -1.0), 0.8,
                 Material.diffuse_light((8.0, 8.0, 8.0)))
    return b.build()


def test_moving_sphere_flags():
    s = _scene()
    assert s.has_moving
    b2 = SceneBuilder(sun_enabled=False)
    b2.add_sphere((0, 0, -1), 0.5, Material.lambertian((0.5, 0.5, 0.5)))
    assert not b2.build().has_moving


def test_motion_blur_golden_vs_oracle():
    scene = _scene()
    cfg = RenderConfig(width=W, height=H, spp=4, max_depth=8,
                       time0=0.0, time1=1.0)
    cam = make_camera((0, 0.4, 1.2), (0, 0, -1), vfov=60, width=W, height=H)
    img = np.asarray(render_frame(scene, cam, cfg))
    ref, _ = render_oracle(scene, cam, cfg)
    np.testing.assert_array_equal(img, ref)


def test_zero_shutter_ignores_center2():
    """Closed shutter: centers at c0, stream identical to a static scene
    (no extra raygen draw)."""
    scene = _scene()
    b = SceneBuilder(sun_enabled=False, seed=1337)
    b.add_sphere((0.0, -100.5, -1.0), 100.0,
                 Material.lambertian((0.8, 0.8, 0.0)))
    b.add_sphere((-0.4, 0.0, -1.0), 0.35,
                 Material.lambertian((0.1, 0.2, 0.7)))
    b.add_sphere((0.0, 2.2, -1.0), 0.8,
                 Material.diffuse_light((8.0, 8.0, 8.0)))
    static = b.build()
    cfg = RenderConfig(width=W, height=H, spp=2, max_depth=6)
    cam = make_camera((0, 0.4, 1.2), (0, 0, -1), vfov=60, width=W, height=H)
    a = np.asarray(render_frame(scene, cam, cfg))
    c = np.asarray(render_frame(static, cam, cfg))
    np.testing.assert_array_equal(a, c)


@pytest.mark.slow
def test_motion_blur_wavefront_statistical():
    """Wavefront mode (decorrelated streams) converges to the same image
    statistically."""
    scene = _scene()
    cfg = RenderConfig(width=W, height=H, spp=64, max_depth=8,
                       time0=0.0, time1=1.0)
    cam = make_camera((0, 0.4, 1.2), (0, 0, -1), vfov=60, width=W, height=H)
    from dsrt_tpu.render import render_frame_wavefront
    a = np.asarray(render_frame(scene, cam, cfg)).astype(np.float64)
    b = np.asarray(render_frame_wavefront(scene, cam, cfg, spp_batch=4)
                   ).astype(np.float64)
    assert np.abs(a - b).mean() < 12.0
