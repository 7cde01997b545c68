"""Texture pipeline: image textures end-to-end vs oracle (exercising the
double V-flip contract, loader flip + sampler flip), procedural texture
evaluation, and the two-float utilities."""

import numpy as np
import pytest

from dsrt_tpu.config import RenderConfig
from dsrt_tpu.models.materials import Material
from dsrt_tpu.models.scene import SceneBuilder
from dsrt_tpu.ops.camera import make_camera
from dsrt_tpu.oracle import render_oracle
from dsrt_tpu.render import render_radiance
from dsrt_tpu.utils.image_io import write_png

W, H = 24, 16
CFG = RenderConfig(width=W, height=H, spp=2, max_depth=6)


def _textured_scene(tmp_path):
    """Two textured triangles (a quad) facing the camera, sun-lit."""
    # 4x4 checkerboard texture
    tex = np.zeros((4, 4, 3), np.uint8)
    tex[::2, ::2] = [255, 40, 40]
    tex[1::2, 1::2] = [255, 40, 40]
    tex[::2, 1::2] = [40, 40, 255]
    tex[1::2, ::2] = [40, 40, 255]
    path = str(tmp_path / "check.png")
    write_png(path, tex)

    b = SceneBuilder(sun_enabled=True, sun_dir=(0.0, -0.3, -1.0),
                     sun_radiance=(8.0, 8.0, 8.0))
    mat = Material.lambertian((0.2, 0.9, 0.2), tex_path=path)
    # quad from (-1,-1,-2) to (1,1,-2) with uv [0,1]^2; note loader-style
    # pre-flipped V is the builder contract, so supply (u, 1-v)
    uv = lambda u, v: (u, 1.0 - v)
    b.add_triangle((-1, -1, -2), (1, -1, -2), (1, 1, -2), mat,
                   uv0=uv(0, 0), uv1=uv(1, 0), uv2=uv(1, 1), tex_path=path)
    b.add_triangle((-1, -1, -2), (1, 1, -2), (-1, 1, -2), mat,
                   uv0=uv(0, 0), uv1=uv(1, 1), uv2=uv(0, 1), tex_path=path)
    return b.build()


def _tonemap_u8(fl, cfg):
    c = np.clip(fl, 0.0, None)
    c = np.minimum(c, cfg.firefly_clamp)
    c = np.power(c, np.float32(1.0 / cfg.gamma))
    c = np.clip(c, 0.0, 1.0)
    return (np.float32(255.99) * c).astype(np.uint8)


def test_textured_mesh_matches_oracle(tmp_path):
    scene = _textured_scene(tmp_path)
    assert scene.n_textures == 1
    cam = make_camera((0, 0, 1.0), (0, 0, -2), vfov=60, width=W, height=H)
    # single compiled path (radiance); u8 tonemap on host
    fl = render_radiance(scene, cam, CFG)
    oimg, ofl = render_oracle(scene, cam, CFG)
    assert np.abs(fl - ofl).max() <= 5e-5
    img = _tonemap_u8(fl, CFG)
    assert np.abs(img.astype(int) - oimg.astype(int)).max() == 0
    # the texture pattern is actually visible (red and blue regions)
    assert img[..., 0].max() > img[..., 2].min()
    assert (img > 0).mean() > 0.1


def test_textured_albedo_forced_white(tmp_path):
    scene = _textured_scene(tmp_path)
    np.testing.assert_array_equal(np.asarray(scene.mat_albedo[0]), [1, 1, 1])


@pytest.mark.slow
def test_procedural_textures_evaluate():
    import jax.numpy as jnp
    from dsrt_tpu.models.presets import volumetric_scene
    from dsrt_tpu.ops import textures as T
    from dsrt_tpu.ops.linalg import V3

    scene = volumetric_scene()
    p = V3(jnp.linspace(-3, 3, 64), jnp.linspace(-2, 2, 64),
           jnp.linspace(0, 5, 64))
    noise = np.asarray(T.perlin_noise(scene, p))
    assert np.abs(noise).max() <= 1.0 and np.abs(noise).std() > 0.01
    turb = np.asarray(T.perlin_turb(scene, p))
    assert (turb >= 0).all() and turb.max() > 0.05
    base = V3(jnp.ones(64), jnp.ones(64), jnp.ones(64))
    mid = jnp.zeros(64, jnp.int32)  # checker ground material
    out = T.sample_procedural(scene, mid, base, p)
    vals = np.asarray(out.x)
    assert len(np.unique(np.round(vals, 3))) >= 2  # both checker colors hit


def test_two_float_precision():
    """hi+lo carries ~2x24 bits: residual ~2^-47 of magnitude, vastly
    better than single f32 (~2^-24); pair-add beats plain f32 add."""
    from dsrt_tpu.utils.transform import two_float_add, two_float_split
    rng = np.random.default_rng(3)
    x = rng.uniform(-1e11, 1e11, 64)
    y = rng.uniform(-1e11, 1e11, 64)
    xh, xl = two_float_split(x)
    yh, yl = two_float_split(y)
    resid = np.abs(xh.astype(np.float64) + xl.astype(np.float64) - x)
    assert resid.max() < np.abs(x).max() * 2.0 ** -45
    f32_err = np.abs(x.astype(np.float32).astype(np.float64) - x).max()
    assert resid.max() < f32_err / 1e4  # orders of magnitude better

    sh, sl = two_float_add(xh, xl, yh, yl)
    pair_err = np.abs(sh.astype(np.float64) + sl.astype(np.float64)
                      - (x + y))
    plain_err = np.abs((xh + yh).astype(np.float64) - (x + y))
    assert pair_err.max() <= plain_err.max()
    assert pair_err.max() < np.abs(x + y).max() * 2.0 ** -40
