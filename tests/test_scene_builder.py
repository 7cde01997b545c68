"""Scene compiler semantics: material dedup, MTL heuristic, textured-white
quirk, light collection (src/gpu_scene_builder.cpp behavior)."""

import numpy as np

from dsrt_tpu.models.materials import (DIELECTRIC, DIFFUSE_LIGHT, LAMBERTIAN,
                                       METAL, Material, MtlProps,
                                       material_from_mtl)
from dsrt_tpu.models.scene import SceneBuilder


def test_material_identity_dedup():
    b = SceneBuilder(sun_enabled=False)
    shared = Material.lambertian((0.5, 0.5, 0.5))
    b.add_sphere((0, 0, 0), 1.0, shared)
    b.add_sphere((2, 0, 0), 1.0, shared)
    b.add_sphere((4, 0, 0), 1.0, Material.lambertian((0.5, 0.5, 0.5)))
    s = b.build()
    assert s.mat_type.shape[0] == 2  # shared dedups, equal-value distinct obj doesn't
    assert int(s.sph_mat[0]) == int(s.sph_mat[1]) != int(s.sph_mat[2])


def test_mtl_heuristic():
    bd = "/tmp"
    # emissive wins
    m = material_from_mtl(MtlProps(Ke=(1.0, 0.5, 0.2)), bd)
    assert m.kind == DIFFUSE_LIGHT and m.emissive == (1.0, 0.5, 0.2)
    # map_Kd -> textured lambertian (before dielectric/metal)
    m = material_from_mtl(MtlProps(map_Kd="tex.png", d=0.5, Ks=(1, 1, 1)), bd)
    assert m.kind == LAMBERTIAN and m.tex_path.endswith("tex.png")
    # transparency -> dielectric with clamped Ni
    m = material_from_mtl(MtlProps(d=0.5, Ni=50.0), bd)
    assert m.kind == DIELECTRIC and m.ref_idx == 1.5
    m = material_from_mtl(MtlProps(d=0.5, Ni=1.33), bd)
    assert abs(m.ref_idx - 1.33) < 1e-9
    # metal from Ks with fuzz = 100/(Ns+100)
    m = material_from_mtl(MtlProps(Ks=(0.9, 0.9, 0.9), Ns=300.0), bd)
    assert m.kind == METAL and abs(m.fuzz - 0.25) < 1e-9
    assert m.albedo == (0.9, 0.9, 0.9)
    # fallback lambertian(Kd)
    m = material_from_mtl(MtlProps(Kd=(0.1, 0.2, 0.3)), bd)
    assert m.kind == LAMBERTIAN and m.albedo == (0.1, 0.2, 0.3)


def test_textured_triangle_forces_white_albedo(tmp_path):
    from dsrt_tpu.utils.image_io import write_png
    tex = tmp_path / "t.png"
    write_png(str(tex), np.full((2, 2, 3), 128, np.uint8))
    b = SceneBuilder(sun_enabled=False)
    mat = Material.lambertian((0.2, 0.3, 0.4), tex_path=str(tex))
    b.add_triangle((0, 0, 0), (1, 0, 0), (0, 1, 0), mat, tex_path=str(tex))
    s = b.build()
    np.testing.assert_array_equal(np.asarray(s.mat_albedo[0]), [1, 1, 1])
    assert s.n_textures == 1
    assert int(s.tri_tex[0]) == 0


def test_missing_texture_falls_back_white():
    b = SceneBuilder(sun_enabled=False)
    mat = Material.lambertian((0.2, 0.3, 0.4))
    b.add_triangle((0, 0, 0), (1, 0, 0), (0, 1, 0), mat,
                   tex_path="/nonexistent/nope.png")
    s = b.build()
    assert s.n_textures == 1
    assert int(s.tex_w[0]) == 1 and int(s.tex_h[0]) == 1
    np.testing.assert_allclose(np.asarray(s.tex_pool[:3]), 1.0)


def test_light_collection_order():
    b = SceneBuilder(sun_enabled=False)
    lamp1 = Material.diffuse_light((5, 5, 5))
    lamp0 = Material.diffuse_light((0, 0, 0))  # zero emissive: NOT a light
    b.add_sphere((0, 0, 0), 1.0, Material.lambertian((0.5, 0.5, 0.5)))
    b.add_sphere((1, 0, 0), 1.0, lamp1)
    b.add_sphere((2, 0, 0), 1.0, lamp0)
    b.add_sphere((3, 0, 0), 1.0, lamp1)
    s = b.build()
    assert s.n_lights == 2
    np.testing.assert_array_equal(np.asarray(s.light_idx), [1, 3])


def test_flat_normals():
    b = SceneBuilder(sun_enabled=False)
    b.add_triangle((0, 0, 0), (1, 0, 0), (0, 1, 0),
                   Material.lambertian((0.5, 0.5, 0.5)))
    s = b.build()
    n = np.asarray(s.tri_n0[0])
    np.testing.assert_allclose(n, [0, 0, 1], atol=1e-7)
    np.testing.assert_array_equal(np.asarray(s.tri_n0), np.asarray(s.tri_n1))
    np.testing.assert_array_equal(np.asarray(s.tri_n0), np.asarray(s.tri_n2))
