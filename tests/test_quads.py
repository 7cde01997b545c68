"""Quad primitive + box geometry + quad area lights (inc/qaud.h:31-123
resurrected): golden-exact against the independent scalar oracle, plus
structural checks on the box() builder and the light table."""

import numpy as np

from dsrt_tpu.config import RenderConfig
from dsrt_tpu.models.materials import Material
from dsrt_tpu.models.presets import cornell_box_scene
from dsrt_tpu.models.scene import SceneBuilder
from dsrt_tpu.ops.camera import make_camera
from dsrt_tpu.oracle import render_oracle
from dsrt_tpu.render import render_frame, render_radiance

W, H = 24, 16
CFG = RenderConfig(width=W, height=H, spp=2, max_depth=8)


def test_cornell_box_matches_oracle():
    scene = cornell_box_scene()
    cam = make_camera((0.5, 0.5, -1.3), (0.5, 0.5, 0.5), vfov=40,
                      width=W, height=H)
    img = render_frame(scene, cam, CFG)
    oimg, _ = render_oracle(scene, cam, CFG)
    assert (img > 0).mean() > 0.4, "cornell interior should be mostly lit"
    np.testing.assert_array_equal(img, oimg)


def test_single_quad_matches_oracle():
    b = SceneBuilder(sun_enabled=True, sun_dir=(-0.3, -0.8, -0.5),
                     sun_radiance=(6.0, 6.0, 6.0))
    b.add_quad((-1.0, -0.5, -2.0), (2.0, 0.0, 0.0), (0.0, 1.4, 0.2),
               Material.lambertian((0.6, 0.3, 0.2)))
    scene = b.build()
    cam = make_camera((0, 0.2, 1.5), (0, 0.2, -1), vfov=50,
                      width=W, height=H)
    fl = render_radiance(scene, cam, CFG)
    _, ofl = render_oracle(scene, cam, CFG)
    assert (fl > 0).any()
    assert np.abs(fl - ofl).max() <= 5e-5


def test_box_builder_geometry():
    b = SceneBuilder(sun_enabled=False)
    b.add_box((1.0, 2.0, 3.0), (0.0, 0.0, 0.0),  # reversed corners
              Material.lambertian((0.5, 0.5, 0.5)))
    scene = b.build()
    assert scene.n_quads == 6
    q = np.asarray(scene.quad_q)
    u = np.asarray(scene.quad_u)
    v = np.asarray(scene.quad_v)
    # all 4 corners of every side inside the box bounds
    for i in range(6):
        for a in (q[i], q[i] + u[i], q[i] + v[i], q[i] + u[i] + v[i]):
            assert (a >= -1e-6).all() and (a <= [1, 2, 3] + np.float32(1e-6)).all()
    # total surface area = 2(xy + yz + zx)
    area = np.asarray(scene.quad_area)[:6].sum()
    assert abs(area - 2 * (1 * 2 + 2 * 3 + 3 * 1)) < 1e-3


def test_quad_light_in_mixture_table():
    scene = cornell_box_scene()
    assert scene.n_lights == 1
    assert int(np.asarray(scene.light_kind)[0]) == 1  # quad light
    # ceiling light quad index
    li = int(np.asarray(scene.light_idx)[0])
    assert 0 <= li < scene.n_quads
