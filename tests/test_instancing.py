"""Build-time instancing transforms (inc/hittable.h:61-233 wrappers as
geometry transforms) and the flat-shade debug render
(ray_color_debug, src/gpu_render.cu:663-710)."""

import numpy as np

from dsrt_tpu.config import RenderConfig
from dsrt_tpu.models.materials import Material
from dsrt_tpu.models.mesh_gen import iss_standin_mesh
from dsrt_tpu.models.scene import SceneBuilder
from dsrt_tpu.ops.camera import make_camera
from dsrt_tpu.oracle import render_oracle
from dsrt_tpu.render import render_frame, render_frame_debug
import pytest

W, H = 24, 16
CFG = RenderConfig(width=W, height=H, spp=2, max_depth=6)


def _tri_mesh():
    class M:
        v0 = np.array([[1.0, 0.0, 0.0]], np.float32)
        v1 = np.array([[0.0, 1.0, 0.0]], np.float32)
        v2 = np.array([[0.0, 0.0, 1.0]], np.float32)
        uv0 = uv1 = uv2 = np.zeros((1, 2), np.float32)
        materials = [Material.lambertian((0.5, 0.5, 0.5))]
        tex_paths = [""]
    return M()


def test_rotate_y_vertex_map():
    """x' = cos t x + sin t z, z' = -sin t x + cos t z
    (inc/hittable.h:99-102): +90 deg maps +x -> -z and +z -> +x."""
    b = SceneBuilder()
    b.add_mesh(_tri_mesh(), rotate_y_deg=90.0)
    s = b.build()
    v0 = np.asarray(s.tri_v0)[0]   # was (1,0,0)
    v2 = np.asarray(s.tri_v2)[0]   # was (0,0,1)
    np.testing.assert_allclose(v0, [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(v2, [1, 0, 0], atol=1e-6)


def test_translate_and_flip_face():
    b = SceneBuilder()
    b.add_mesh(_tri_mesh(), translate=(5.0, 0.0, 0.0))
    b2 = SceneBuilder()
    b2.add_mesh(_tri_mesh(), translate=(5.0, 0.0, 0.0), flip_face=True)
    s, s2 = b.build(), b2.build()
    np.testing.assert_allclose(np.asarray(s.tri_v0)[0], [6, 0, 0],
                               atol=1e-6)
    # flipped winding -> negated face normal
    np.testing.assert_allclose(np.asarray(s.tri_n0)[0],
                               -np.asarray(s2.tri_n0)[0], atol=1e-6)


@pytest.mark.slow
def test_rotated_mesh_golden_vs_oracle():
    """Rotated + translated stand-in mesh must stay oracle-exact (the
    transforms are pre-applied, so this checks the full pipeline sees the
    transformed geometry consistently)."""
    b = SceneBuilder(sun_enabled=True, sun_dir=(0.3, 0.8, 0.4),
                     sun_radiance=(5.0, 5.0, 5.0))
    b.add_mesh(iss_standin_mesh(1), rotate_y_deg=35.0,
               translate=(0.0, -5.0, 0.0))
    scene = b.build()
    cfg = RenderConfig(width=16, height=12, spp=1, max_depth=6)
    cam = make_camera((20.0, 30.0, 95.0), (0, 0, 0), vfov=40,
                      width=16, height=12)
    img = render_frame(scene, cam, cfg)
    oimg, _ = render_oracle(scene, cam, cfg)
    np.testing.assert_array_equal(img, oimg)


def test_debug_shade_flat_colors_and_sky():
    b = SceneBuilder(sun_enabled=False)
    b.add_quad((-2.0, -1.0, -2.0), (4.0, 0.0, 0.0), (0.0, 2.0, 0.0),
               Material.lambertian((0.8, 0.1, 0.1)))
    scene = b.build()
    cfg = RenderConfig(width=W, height=H, spp=4, max_depth=6,
                       sky_type="gradient")
    cam = make_camera((0, 0, 2.0), (0, 0, -1), vfov=70, width=W, height=H)
    img = render_frame_debug(scene, cam, cfg)
    # quad renders flat albedo (red dominant), sky renders blue-ish at top
    center = img[H // 2, W // 2]
    assert center[0] > center[2], f"expected flat red albedo, got {center}"
    top = img[0, W // 2]
    assert top[2] >= top[0], f"expected blue-ish gradient sky, got {top}"
    assert (img > 0).all()  # gradient sky lights every miss
