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


def test_uv_bf16_pack_roundtrip_exact():
    """The fused kernel's in-record UV contract: _pack_uv_bf16 packs two
    bf16-rounded f32 values into one f32 bit pattern; the kernel's
    bitcast extraction ((bits & 0xffff0000) for u, (bits << 16) for v)
    must reproduce the _bf16_round values EXACTLY (ops/pallas_path.py
    _unpack_uv)."""
    from dsrt_tpu.models.scene import _bf16_round, _pack_uv_bf16
    rng = np.random.default_rng(7)
    uv = rng.uniform(-3, 3, size=(4096, 2)).astype(np.float32)
    uv[:16] = [[0, 0], [1, 1], [0.5, 0.25], [1e-8, -1e-8]] * 4
    q = _bf16_round(uv)
    # rounding is correct-to-nearest bf16 (ties-to-even), verified
    # against the ml_dtypes/jnp bf16 cast
    import jax.numpy as jnp
    ref = np.asarray(jnp.asarray(uv).astype(jnp.bfloat16).astype(jnp.float32))
    np.testing.assert_array_equal(q, ref)
    packed = _pack_uv_bf16(q)
    bits = packed.view(np.uint32)
    u_back = (bits & np.uint32(0xFFFF0000)).view(np.float32)
    v_back = (bits << np.uint32(16)).view(np.float32)
    np.testing.assert_array_equal(u_back, q[:, 0])
    np.testing.assert_array_equal(v_back, q[:, 1])


def test_upsert_keys_on_material_and_texture(tmp_path):
    """One Material object used with two different map_Kd textures gets
    two material rows (tex is a pure function of the material row —
    the fused kernel's in-record-UV engine depends on this)."""
    from dsrt_tpu.utils.image_io import write_png

    class _Mesh:
        pass

    p1 = str(tmp_path / "a.png")
    p2 = str(tmp_path / "b.png")
    for p, val in ((p1, 64), (p2, 192)):
        write_png(p, np.full((4, 4, 3), val, np.uint8))
    shared = Material.lambertian((0.5, 0.5, 0.5))
    b = SceneBuilder(sun_enabled=False)
    m = _Mesh()
    m.v0 = np.array([[0, 0, 0], [0, 0, 1]], np.float32)
    m.v1 = np.array([[1, 0, 0], [1, 0, 1]], np.float32)
    m.v2 = np.array([[0, 1, 0], [0, 1, 1]], np.float32)
    m.uv0 = np.zeros((2, 2), np.float32)
    m.uv1 = np.zeros((2, 2), np.float32)
    m.uv2 = np.zeros((2, 2), np.float32)
    m.materials = [shared, shared]
    m.tex_paths = [p1, p2]
    b.add_mesh(m)
    s = b.build()
    assert s.mat_type.shape[0] == 2
    # mat_pack col 14 carries each row's texture id; the two rows
    # reference different pool entries
    t0, t1 = int(s.mat_pack[0, 14]), int(s.mat_pack[1, 14])
    assert t0 >= 0 and t1 >= 0 and t0 != t1
