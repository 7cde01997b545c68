"""Fused megakernel shading tables: image-textured and smooth-shaded
triangle meshes stay on the fused fast path (the real NASA ISS OBJ
carries per-triangle map_Kd textures, inc/triangle_mesh.h:244-251, and
the reference samples them inside its one kernel: tex2D
src/gpu_render.cu:232-259, UV interp :763-774) and must remain
BIT-IDENTICAL to the split parity renderer, which is oracle-matched."""

import dataclasses

import numpy as np
import pytest

from dsrt_tpu.config import RenderConfig
from dsrt_tpu.models.materials import Material
from dsrt_tpu.models.obj import load_obj
from dsrt_tpu.models.scene import SceneBuilder
from dsrt_tpu.ops.camera import make_camera
from dsrt_tpu.ops import pallas_path
from dsrt_tpu.utils.image_io import write_png

W, H = 96, 56
CFG = RenderConfig(width=W, height=H, spp=4, max_depth=8)

SMOOTH_OBJ = """
v -1 -1 -2
v  1 -1 -2
v  0  1 -2
v  2  1 -2
vn -0.5 0 0.8660254
vn  0.5 0 0.8660254
vn  0   0.5 0.8660254
f 1//1 2//2 3//3
f 2//2 4//1 3//3
"""


def _require_fused(scene, cfg):
    if not pallas_path.fused_supported(scene, cfg):
        pytest.skip("fused path needs a TPU backend")


def _write_checker(tmp_path, name="check.png"):
    tex = np.zeros((4, 4, 3), np.uint8)
    tex[::2, ::2] = [255, 40, 40]
    tex[1::2, 1::2] = [255, 40, 40]
    tex[::2, 1::2] = [40, 40, 255]
    tex[1::2, ::2] = [40, 40, 255]
    path = str(tmp_path / name)
    write_png(path, tex)
    return path


def _textured_scene(tmp_path, two_tex=False):
    """Textured quad (2 tris) + an untextured metal triangle, sun-lit;
    optionally a second texture to exercise the multi-header select."""
    path = _write_checker(tmp_path)
    b = SceneBuilder(sun_enabled=True, sun_dir=(0.0, -0.3, -1.0),
                     sun_radiance=(8.0, 8.0, 8.0))
    mat = Material.lambertian((0.2, 0.9, 0.2), tex_path=path)
    uv = lambda u, v: (u, 1.0 - v)
    b.add_triangle((-1, -1, -2), (1, -1, -2), (1, 1, -2), mat,
                   uv0=uv(0, 0), uv1=uv(1, 0), uv2=uv(1, 1),
                   tex_path=path)
    b.add_triangle((-1, -1, -2), (1, 1, -2), (-1, 1, -2), mat,
                   uv0=uv(0, 0), uv1=uv(1, 1), uv2=uv(0, 1),
                   tex_path=path)
    if two_tex:
        tex2 = np.zeros((3, 5, 3), np.uint8)
        tex2[:, :, 1] = np.linspace(30, 220, 5, dtype=np.uint8)[None, :]
        p2 = str(tmp_path / "grad.png")
        write_png(p2, tex2)
        m2 = Material.lambertian((0.9, 0.9, 0.2), tex_path=p2)
        b.add_triangle((-2.2, -1, -2.5), (-1.2, -1, -2.5),
                       (-1.7, 0.5, -2.5), m2,
                       uv0=uv(0, 0), uv1=uv(1, 0), uv2=uv(0.5, 1),
                       tex_path=p2)
    b.add_triangle((1.2, -1, -2.5), (2.2, -1, -2.5), (1.7, 0.5, -2.5),
                   Material.metal((0.8, 0.8, 0.9), fuzz=0.05))
    return b.build()


def _smooth_scene(tmp_path):
    p = tmp_path / "tri.obj"
    p.write_text(SMOOTH_OBJ)
    mesh = load_obj(str(p), Material.lambertian((0.7, 0.7, 0.7)),
                    smooth=True)
    b = SceneBuilder(sun_enabled=True, sun_dir=(0.2, -0.4, -1.0),
                     sun_radiance=(1.2, 1.2, 1.2))
    b.add_mesh(mesh)
    return b.build()


def test_fused_gate_accepts_textured(tmp_path):
    scene = _textured_scene(tmp_path)
    assert scene.has_image_tex
    if not pallas_path.backend_is_tpu():
        pytest.skip("needs TPU backend")
    assert pallas_path.fused_supported(scene, CFG)


@pytest.mark.slow
def test_fused_textured_matches_split(tmp_path):
    scene = _textured_scene(tmp_path)
    _require_fused(scene, CFG)
    from dsrt_tpu.render import render_frame, render_frame_fused
    cam = make_camera((0, 0, 1.0), (0, 0, -2), vfov=60, width=W, height=H)
    ref = render_frame(scene, cam, CFG)
    img = render_frame_fused(scene, cam, CFG)
    assert (img > 0).any()
    np.testing.assert_array_equal(img, ref)


@pytest.mark.slow
def test_fused_two_textures_matches_split(tmp_path):
    scene = _textured_scene(tmp_path, two_tex=True)
    assert scene.n_textures == 2
    _require_fused(scene, CFG)
    from dsrt_tpu.render import render_frame, render_frame_fused
    cam = make_camera((0, 0, 1.0), (0, 0, -2), vfov=60, width=W, height=H)
    ref = render_frame(scene, cam, CFG)
    img = render_frame_fused(scene, cam, CFG)
    np.testing.assert_array_equal(img, ref)


@pytest.mark.slow
def test_fused_smooth_matches_split(tmp_path):
    scene = _smooth_scene(tmp_path)
    assert scene.has_smooth
    _require_fused(scene, CFG)
    from dsrt_tpu.render import render_frame, render_frame_fused
    cam = make_camera((0, 0, 1.0), (0, 0, -2), vfov=60, width=W, height=H)
    ref = render_frame(scene, cam, CFG)
    img = render_frame_fused(scene, cam, CFG)
    assert (img > 0).any()
    np.testing.assert_array_equal(img, ref)


def test_fused_textured_stream_and_rowtrav_walks(tmp_path):
    """The shaded leaf engine must stay bit-identical under the A/B
    walk variants (streamed tile queue; per-row traversal)."""
    scene = _textured_scene(tmp_path)
    _require_fused(scene, CFG)
    from dsrt_tpu.render import render_frame_fused
    from dsrt_tpu.exec_opts import OPTS
    cam = make_camera((0, 0, 1.0), (0, 0, -2), vfov=60, width=W, height=H)
    olds, oldr = OPTS.stream, OPTS.rowtrav
    try:
        OPTS.stream = "off"
        OPTS.rowtrav = False
        ref = render_frame_fused(scene, cam, CFG)
        OPTS.stream = "on"
        a = render_frame_fused(scene, cam, CFG)
        OPTS.stream = "off"
        OPTS.rowtrav = True
        b = render_frame_fused(scene, cam, CFG)
    finally:
        OPTS.stream, OPTS.rowtrav = olds, oldr
    np.testing.assert_array_equal(a, ref)
    np.testing.assert_array_equal(b, ref)


def test_fused_gate_big_pool_accepted_to_cap(tmp_path):
    """Texture pools wider than one gather chunk (the r3-era cap) stay
    ON the fused path — the chunked one-hot gather serves them
    (_pool_fetch_rows_ref; the reference samples pools of any size,
    src/gpu_scene_builder.cpp:513-555) — while pools past the raised
    VMEM-plane cap still fall back."""
    scene = _textured_scene(tmp_path)
    if not pallas_path.backend_is_tpu():
        pytest.skip("needs TPU backend")
    # the fused gate sizes the layout the kernel will hold (the tiled
    # relayout under exec_opts.tex_tiled), so size BOTH pool fields
    big_pool = np.zeros((3 * (pallas_path.TEX_CHUNK_ROWS + 1) * 128,),
                        np.float32)
    big = dataclasses.replace(scene, tex_pool=big_pool,
                              tex_pool_tiled=big_pool)
    assert pallas_path.fused_supported(big, CFG)
    over_pool = np.zeros((3 * (pallas_path.TEX_ROWS_MAX + 1) * 128,),
                         np.float32)
    over = dataclasses.replace(scene, tex_pool=over_pool,
                               tex_pool_tiled=over_pool)
    assert not pallas_path.fused_supported(over, CFG)


def test_fused_big_pool_multichunk_matches_split(tmp_path):
    """A texture pool spanning multiple gather chunks (texture data
    landing past chunk 0) must render bit-identically to the split
    path AND to the single-chunk render of the same scene: the
    chunked gather selects each lane's texel from exactly the chunk
    that contains it.  This is the acceptance test VERDICT r3 item 2
    asked for (was: a rejection test at the old 2048-row cap)."""
    import jax.numpy as jnp
    scene = _textured_scene(tmp_path, two_tex=True)
    _require_fused(scene, CFG)
    from dsrt_tpu.render import render_frame, render_frame_fused
    cam = make_camera((0, 0, 1.0), (0, 0, -2), vfov=60, width=W, height=H)
    base = render_frame_fused(scene, cam, CFG)
    # shift every texture one full chunk deeper into the pool: the
    # image is unchanged (same texels, same headers relative to data)
    # but every fetch now lands in chunk >= 1 of a 2-chunk pool
    pad = pallas_path.TEX_CHUNK_ROWS * 128   # texels; tex_off is in
    big = dataclasses.replace(                # FLOAT units (3/texel),
        scene,                                # tex_toff in TEXEL units
        tex_pool=jnp.concatenate([jnp.zeros((3 * pad,), jnp.float32),
                                  jnp.asarray(scene.tex_pool)]),
        tex_off=scene.tex_off + 3 * pad,
        tex_pool_tiled=jnp.concatenate(
            [jnp.zeros((3 * pad,), jnp.float32),
             jnp.asarray(scene.tex_pool_tiled)]),
        tex_toff=scene.tex_toff + pad)
    assert pallas_path.fused_supported(big, CFG)
    ref = render_frame(big, cam, CFG)
    img = render_frame_fused(big, cam, CFG)
    assert (img > 0).any()
    np.testing.assert_array_equal(img, ref)
    np.testing.assert_array_equal(img, base)


def test_fused_defer_aux_knob_bit_identical(tmp_path):
    """exec_opts.defer_aux (deferred-attribute engine, measured
    net-negative at scale — sweep50k15) must stay bit-identical."""
    from dsrt_tpu.exec_opts import OPTS
    scene = _textured_scene(tmp_path)
    _require_fused(scene, CFG)
    from dsrt_tpu.render import render_frame_fused
    cam = make_camera((0, 0, 1.0), (0, 0, -2), vfov=60, width=W, height=H)
    base = render_frame_fused(scene, cam, CFG)
    OPTS.defer_aux = True
    try:
        img = render_frame_fused(scene, cam, CFG)
    finally:
        OPTS.defer_aux = False
    np.testing.assert_array_equal(np.asarray(img), np.asarray(base))


def test_fused_texrec_ab_matches_aux_engine(tmp_path):
    """The in-record-UV engine (uvrec, default) must be bit-identical
    to the aux-tile engine (uvrec off): both interpolate the SAME
    bf16-quantized UVs with the same expression; the texture id is a
    pure function of the material row (models/scene.py upsert)."""
    scene = _textured_scene(tmp_path)
    _require_fused(scene, CFG)
    from dsrt_tpu.render import render_frame_fused
    from dsrt_tpu.exec_opts import OPTS
    cam = make_camera((0, 0, 1.0), (0, 0, -2), vfov=60, width=W, height=H)
    old = OPTS.uvrec
    try:
        OPTS.uvrec = False
        ref = render_frame_fused(scene, cam, CFG)
        OPTS.uvrec = True
        img = render_frame_fused(scene, cam, CFG)
    finally:
        OPTS.uvrec = old
    assert (img > 0).any()
    np.testing.assert_array_equal(img, ref)


def test_fused_uvcarry_ab_bit_identical(tmp_path):
    """exec_opts.uvcarry (carried-UV variant of the in-record engine:
    accepts select raw packed-lane bits + bary (u, v); interpolation
    runs once per wave on the tournament winners — measured FLAT at
    47.7k/tex256, banked A/B knob) must stay bit-identical to the
    per-accept-interpolating engine: same formula over the same bits,
    evaluated on the winning accept's exact inputs."""
    scene = _textured_scene(tmp_path, two_tex=True)
    _require_fused(scene, CFG)
    from dsrt_tpu.render import render_frame_fused
    from dsrt_tpu.exec_opts import OPTS
    cam = make_camera((0, 0, 1.0), (0, 0, -2), vfov=60, width=W, height=H)
    old = OPTS.uvcarry
    try:
        OPTS.uvcarry = False
        ref = render_frame_fused(scene, cam, CFG)
        OPTS.uvcarry = True
        img = render_frame_fused(scene, cam, CFG)
    finally:
        OPTS.uvcarry = old
    assert (img > 0).any()
    np.testing.assert_array_equal(img, ref)


@pytest.mark.slow
def test_fused_texrec_mixed_primitives(tmp_path):
    """Textured mesh + spheres: primitive hits must reset the texture
    id even though the in-record engine derives it from the material
    row (the <=-tie primitive merge carries tex = -1)."""
    path = _write_checker(tmp_path)
    b = SceneBuilder(sun_enabled=True, sun_dir=(0.0, -0.3, -1.0),
                     sun_radiance=(8.0, 8.0, 8.0))
    mat = Material.lambertian((0.9, 0.9, 0.9), tex_path=path)
    uv = lambda u, v: (u, 1.0 - v)
    b.add_triangle((-2, -1, -3), (2, -1, -3), (2, -1, 1), mat,
                   uv0=uv(0, 0), uv1=uv(1, 0), uv2=uv(1, 1))
    b.add_triangle((-2, -1, -3), (2, -1, 1), (-2, -1, 1), mat,
                   uv0=uv(0, 0), uv1=uv(1, 1), uv2=uv(0, 1))
    # a sphere SHARING the textured material object: upsert keys on
    # (material, tex) so the sphere gets its own untextured row
    b.add_sphere((0.0, -0.4, -1.2), 0.45, mat)
    b.add_sphere((-0.8, -0.2, -1.8), 0.3,
                 Material.metal((0.9, 0.8, 0.7), fuzz=0.05))
    scene = b.build()
    _require_fused(scene, CFG)
    from dsrt_tpu.render import render_frame, render_frame_fused
    cam = make_camera((0, 0.4, 1.2), (0, -0.3, -2), vfov=60,
                      width=W, height=H)
    ref = render_frame(scene, cam, CFG)
    img = render_frame_fused(scene, cam, CFG)
    assert (img > 0).any()
    np.testing.assert_array_equal(img, ref)


def _many_material_scene(n_diffuse=36):
    """A material table past the _mat_field unroll threshold (32): a
    grid of sun-lit triangles with n_diffuse distinct lambertian rows
    plus metal / dielectric / emissive rows — the MTL-heavy OBJ shape
    that drives the kernel's MXU one-hot material gather."""
    b = SceneBuilder(sun_enabled=True, sun_dir=(0.2, -0.4, -1.0),
                     sun_radiance=(6.0, 6.0, 6.0))
    cols = 6
    for i in range(n_diffuse):
        r, c = divmod(i, cols)
        x0 = -1.8 + 0.6 * c
        y0 = -1.5 + 0.55 * r
        alb = (0.15 + 0.8 * (i / n_diffuse),
               0.9 - 0.7 * (i / n_diffuse),
               0.3 + 0.5 * ((i * 7) % n_diffuse) / n_diffuse)
        b.add_triangle((x0, y0, -2.0), (x0 + 0.5, y0, -2.0),
                       (x0 + 0.25, y0 + 0.45, -2.0),
                       Material.lambertian(alb))
    b.add_triangle((-2.4, -1, -2.5), (-1.6, -1, -2.5), (-2.0, 0, -2.5),
                   Material.metal((0.85, 0.85, 0.9), fuzz=0.1))
    b.add_triangle((1.6, -1, -2.5), (2.4, -1, -2.5), (2.0, 0, -2.5),
                   Material.dielectric(1.5))
    b.add_triangle((-0.4, 1.6, -2.2), (0.4, 1.6, -2.2), (0.0, 2.2, -2.2),
                   Material.diffuse_light((4.0, 4.0, 4.0)))
    return b.build()


def test_fused_many_materials_bit_identical():
    """n_mats > 32 switches _mat_field to the MXU one-hot gather
    (all 16 columns per wave, (16,Np)@(Np,128) per ray row) — it must
    be bit-identical to the parity renderer, which uses XLA gathers
    (VERDICT r4 item 9 / ADVICE r3: the old per-field select chain
    serialized with table length on every wave)."""
    scene = _many_material_scene()
    assert int(scene.mat_pack.shape[0]) > 32, "scene must exceed unroll cap"
    _require_fused(scene, CFG)
    from dsrt_tpu.render import render_frame, render_frame_fused
    cam = make_camera((0, 0, 1.2), (0, 0, -2), vfov=70, width=W, height=H)
    ref = render_frame(scene, cam, CFG)
    img = render_frame_fused(scene, cam, CFG)
    assert (img > 0).any(), "scene not in frame"
    np.testing.assert_array_equal(img, ref)


def test_fused_tex_tiled_ab_bit_identical(tmp_path):
    """exec_opts.tex_tiled (32x32-tiled pool layout for gather
    locality) must not change a single pixel: same texel values,
    different addresses.  OPTS participates in the jit cache key
    (_opts threading), so the second render genuinely recompiles the
    untiled layout."""
    from dsrt_tpu.exec_opts import OPTS
    scene = _textured_scene(tmp_path, two_tex=True)
    _require_fused(scene, CFG)
    from dsrt_tpu.render import render_frame_fused
    cam = make_camera((0, 0, 1.0), (0, 0, -2), vfov=60, width=W, height=H)
    old = OPTS.tex_tiled
    try:
        OPTS.tex_tiled = True
        a = render_frame_fused(scene, cam, CFG)
        OPTS.tex_tiled = False
        b = render_frame_fused(scene, cam, CFG)
    finally:
        OPTS.tex_tiled = old
    assert (a > 0).any()
    np.testing.assert_array_equal(a, b)
