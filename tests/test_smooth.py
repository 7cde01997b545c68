"""Smooth shading opt-in (`vn` honored; the reference discards vn,
triangle_mesh.h:227-234 — flat remains the default and the parity mode)."""

import numpy as np

from dsrt_tpu.config import RenderConfig
from dsrt_tpu.models.materials import Material
from dsrt_tpu.models.obj import load_obj
from dsrt_tpu.models.scene import SceneBuilder
from dsrt_tpu.ops.camera import make_camera
from dsrt_tpu.oracle import render_oracle
from dsrt_tpu.render import render_frame

OBJ = """
v -1 -1 -2
v  1 -1 -2
v  0  1 -2
vn -0.5 0 0.8660254
vn  0.5 0 0.8660254
vn  0   0.5 0.8660254
f 1//1 2//2 3//3
"""

W, H = 24, 16
CFG = RenderConfig(width=W, height=H, spp=2, max_depth=6)


def _scene(tmp_path, smooth):
    p = tmp_path / "tri.obj"
    p.write_text(OBJ)
    mesh = load_obj(str(p), Material.lambertian((0.7, 0.7, 0.7)),
                    smooth=smooth)
    b = SceneBuilder(sun_enabled=True, sun_dir=(0.2, -0.4, -1.0),
                     sun_radiance=(1.2, 1.2, 1.2))
    b.add_mesh(mesh)
    return b.build()


def test_smooth_normals_loaded(tmp_path):
    s = _scene(tmp_path, smooth=True)
    assert s.has_smooth
    n0 = np.asarray(s.tri_n0)[0]
    n1 = np.asarray(s.tri_n1)[0]
    assert not np.allclose(n0, n1)  # per-vertex normals differ
    flat = _scene(tmp_path, smooth=False)
    assert not flat.has_smooth
    np.testing.assert_allclose(np.asarray(flat.tri_n0),
                               np.asarray(flat.tri_n1))


def test_smooth_matches_oracle_and_differs_from_flat(tmp_path):
    cam = make_camera((0, 0, 1.0), (0, 0, -2), vfov=60, width=W, height=H)
    s = _scene(tmp_path, smooth=True)
    img = render_frame(s, cam, CFG)
    oimg, _ = render_oracle(s, cam, CFG)
    np.testing.assert_array_equal(img, oimg)  # oracle interpolates too

    flat = _scene(tmp_path, smooth=False)
    img_flat = render_frame(flat, cam, CFG)
    assert (img.astype(int) - img_flat.astype(int)).any()
