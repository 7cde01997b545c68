"""OBJ/MTL loader parse semantics (inc/triangle_mesh.h:114-255)."""

import numpy as np

from dsrt_tpu.models.materials import (DIELECTRIC, DIFFUSE_LIGHT, LAMBERTIAN,
                                       METAL, Material)
from dsrt_tpu.models.obj import load_mtl, load_obj

OBJ = """
# comment
mtllib test.mtl
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vt 0 0
vt 1 0
vt 1 1
vt 0 1
usemtl red
f 1/1 2/2 3/3 4/4
usemtl shiny
f 1 2 3
f 1//1 3//2 4//3
"""

MTL = """
newmtl red
Kd 0.8 0.1 0.1
newmtl shiny
Kd 0.2 0.2 0.2
Ks 0.9 0.9 0.9
Ns 100
newmtl glass
d 0.4
Ni 1.6
newmtl lamp
Ke 3 3 3
"""


def _write(tmp_path):
    (tmp_path / "test.mtl").write_text(MTL)
    p = tmp_path / "test.obj"
    p.write_text(OBJ)
    return str(p)


def test_fan_triangulation_and_materials(tmp_path):
    mesh = load_obj(_write(tmp_path))
    # quad -> 2 tris (fan), plus 2 single tris
    assert mesh.num_triangles == 4
    # fan shares vertex 0: triangles (0,1,2) and (0,2,3)
    np.testing.assert_allclose(mesh.v0[0], [0, 0, 0])
    np.testing.assert_allclose(mesh.v1[0], [1, 0, 0])
    np.testing.assert_allclose(mesh.v2[0], [1, 1, 0])
    np.testing.assert_allclose(mesh.v1[1], [1, 1, 0])
    np.testing.assert_allclose(mesh.v2[1], [0, 1, 0])
    assert mesh.materials[0].kind == LAMBERTIAN
    assert mesh.materials[0].albedo == (0.8, 0.1, 0.1)
    assert mesh.materials[2].kind == METAL
    # material cached per name: same object for both shiny faces
    assert mesh.materials[2] is mesh.materials[3]


def test_uv_v_flip(tmp_path):
    mesh = load_obj(_write(tmp_path))
    # vt (1,1) stored as (1, 0): V flipped at load (triangle_mesh.h:207)
    np.testing.assert_allclose(mesh.uv0[0], [0, 1])   # vt (0,0) -> (0,1)
    np.testing.assert_allclose(mesh.uv2[0], [1, 0])   # vt (1,1) -> (1,0)


def test_scale(tmp_path):
    mesh = load_obj(_write(tmp_path), scale=2.5)
    np.testing.assert_allclose(mesh.v1[0], [2.5, 0, 0])


def test_fallback_material(tmp_path):
    p = tmp_path / "nomat.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    fb = Material.metal((0.5, 0.5, 0.5), 0.1)
    mesh = load_obj(str(p), fallback=fb)
    assert mesh.materials[0] is fb


def test_mtl_parse(tmp_path):
    (tmp_path / "m.mtl").write_text(MTL)
    props = load_mtl(str(tmp_path / "m.mtl"))
    assert set(props) == {"red", "shiny", "glass", "lamp"}
    assert props["glass"].d == 0.4 and props["glass"].Ni == 1.6
    assert props["lamp"].Ke == (3.0, 3.0, 3.0)


def test_vn_ignored_flat_normals(tmp_path):
    """vn data present but normals must be flat per face
    (triangle_mesh.h:227-234 + triangle.h:70-73)."""
    p = tmp_path / "n.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\n"
                 "vn 1 0 0\nvn 0 1 0\nvn 0 0 -1\n"
                 "f 1//1 2//2 3//3\n")
    mesh = load_obj(str(p))
    from dsrt_tpu.models.scene import SceneBuilder
    b = SceneBuilder(sun_enabled=False)
    b.add_mesh(mesh)
    s = b.build()
    np.testing.assert_allclose(np.asarray(s.tri_n0[0]), [0, 0, 1], atol=1e-6)
