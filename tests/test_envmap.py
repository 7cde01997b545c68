"""Environment-map sky (SKY_ENV_MAP productized — gpu_scene.h:90-94,
env_rotation gpu_scene.h:108): equirect miss-radiance, oracle-matched."""

import numpy as np
import pytest

from dsrt_tpu.config import RenderConfig
from dsrt_tpu.models.materials import Material
from dsrt_tpu.models.scene import SceneBuilder
from dsrt_tpu.ops.camera import make_camera


def _env_array():
    # 8x16 equirect with distinct quadrant colors + bright band
    env = np.zeros((8, 16, 3), np.float32)
    env[:4, :8] = (2.0, 0.1, 0.1)     # top/left
    env[:4, 8:] = (0.1, 2.0, 0.1)
    env[4:, :8] = (0.1, 0.1, 2.0)
    env[4:, 8:] = (1.0, 1.0, 0.2)
    return env


def _scene(rotation_deg=0.0, scale=1.0):
    b = SceneBuilder(sun_enabled=False, seed=1337)
    b.add_sphere((0.0, 0.0, -2.0), 0.6,
                 Material.lambertian((0.6, 0.6, 0.6)))
    b.add_sphere((1.2, 0.0, -2.0), 0.4,
                 Material.metal((0.9, 0.9, 0.9), fuzz=0.05))
    b.set_environment(_env_array(), rotation_deg=rotation_deg, scale=scale)
    return b.build()


def test_env_scene_meta():
    s = _scene(rotation_deg=90.0, scale=2.0)
    assert s.env_tex >= 0 and s.has_env
    assert np.isclose(s.env_rotation, np.pi / 2)
    assert s.env_scale == 2.0
    assert not s.has_image_tex       # env is not a TRIANGLE texture


def test_env_matches_oracle_u8():
    from dsrt_tpu.oracle import render_oracle
    from dsrt_tpu.render import render_frame
    cfg = RenderConfig(width=24, height=16, spp=2, max_depth=6)
    scene = _scene()
    cam = make_camera((0, 0, 1.0), (0, 0, -1), vfov=60,
                      width=cfg.width, height=cfg.height)
    ours = np.asarray(render_frame(scene, cam, cfg))
    gold, _ = render_oracle(scene, cam, cfg)
    np.testing.assert_array_equal(ours, gold)


@pytest.mark.slow
def test_env_rotation_shifts_background():
    from dsrt_tpu.render import render_frame
    cfg = RenderConfig(width=24, height=16, spp=1, max_depth=3)
    cam = make_camera((0, 0, 1.0), (0, 0, -1), vfov=60,
                      width=cfg.width, height=cfg.height)
    a = np.asarray(render_frame(_scene(0.0), cam, cfg))
    b = np.asarray(render_frame(_scene(180.0), cam, cfg))
    assert (a != b).any()            # rotation changes the miss radiance


def test_hdr_env_loads_linear(tmp_path):
    """.hdr env maps must bypass the pool's sRGB->linear pow."""
    from dsrt_tpu.models.textures import TextureRegistry
    img = np.full((4, 8, 3), 3.5, np.float32)    # >1: only HDR can hold it
    # write flat RGBE
    m = img.max(-1)
    e = np.ceil(np.log2(m)).astype(np.int32)
    rgbe = np.zeros((4, 8, 4), np.uint8)
    rgbe[..., :3] = np.minimum(img * np.exp2(8.0 - e)[..., None],
                               255).astype(np.uint8)
    rgbe[..., 3] = (e + 128).astype(np.uint8)
    p = str(tmp_path / "e.hdr")
    with open(p, "wb") as fh:
        fh.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n-Y 4 +X 8\n"
                 + rgbe.tobytes())
    reg = TextureRegistry()
    idx = reg.get_or_load(p)
    pool, w, h, off, n = reg.build_pool()
    assert n == 1 and idx == 0
    assert abs(pool.max() - 3.5) < 0.05          # linear, unclamped


def _mesh_env_scene(rotation_deg=0.0, scale=1.0):
    """Two triangles + a metal tri under an env sky (fused-path shape)."""
    b = SceneBuilder(sun_enabled=True, sun_dir=(0.0, -0.3, -1.0),
                     sun_radiance=(4.0, 4.0, 4.0), seed=1337)
    m = Material.lambertian((0.7, 0.7, 0.7))
    b.add_triangle((-1, -1, -2), (1, -1, -2), (1, 1, -2), m)
    b.add_triangle((-1, -1, -2), (1, 1, -2), (-1, 1, -2), m)
    b.add_triangle((1.2, -1, -2.5), (2.2, -1, -2.5), (1.7, 0.5, -2.5),
                   Material.metal((0.8, 0.8, 0.9), fuzz=0.05))
    b.set_environment(_env_array(), rotation_deg=rotation_deg, scale=scale)
    return b.build()


@pytest.mark.slow
def test_fused_env_matches_split():
    """Env-map sky inside the fused megakernel (in-kernel equirect
    gather at miss) must match the split pipeline, which is
    oracle-matched (test_env_matches_oracle_u8)."""
    from dsrt_tpu.ops import pallas_path
    cfg = RenderConfig(width=96, height=56, spp=4, max_depth=8)
    scene = _mesh_env_scene(rotation_deg=30.0, scale=1.5)
    if not pallas_path.fused_supported(scene, cfg):
        import pytest as _pt
        _pt.skip("fused path needs a TPU backend")
    from dsrt_tpu.render import render_frame, render_frame_fused
    cam = make_camera((0, 0, 1.0), (0, 0, -2), vfov=60,
                      width=cfg.width, height=cfg.height)
    ref = np.asarray(render_frame(scene, cam, cfg))
    img = np.asarray(render_frame_fused(scene, cam, cfg))
    assert (img > 0).any()
    np.testing.assert_array_equal(img, ref)


def test_fused_env_gate():
    """Env scenes are fused-eligible on BOTH megakernels iff the pool
    fits the in-kernel gather budget."""
    from dsrt_tpu.ops import pallas_path, pallas_sphere
    cfg = RenderConfig(width=32, height=16, spp=1, max_depth=4)
    scene = _mesh_env_scene()
    if pallas_path.backend_is_tpu():
        assert pallas_path.fused_supported(scene, cfg)
        assert pallas_sphere.sphere_fused_supported(_scene(), cfg)


def test_sphere_fused_env_matches_split():
    """Env-map sky in the SPHERE megakernel (classic RTiOW spheres
    under an HDR sky) matches the split pipeline, which is
    oracle-matched."""
    from dsrt_tpu.ops import pallas_sphere
    cfg = RenderConfig(width=48, height=32, spp=4, max_depth=8)
    scene = _scene(rotation_deg=45.0, scale=1.2)
    if not pallas_sphere.sphere_fused_supported(scene, cfg):
        pytest.skip("sphere megakernel needs a TPU backend")
    from dsrt_tpu.render import render_frame, render_frame_fused
    cam = make_camera((0, 0, 1.0), (0, 0, -1), vfov=60,
                      width=cfg.width, height=cfg.height)
    ref = np.asarray(render_frame(scene, cam, cfg))
    img = np.asarray(render_frame_fused(scene, cam, cfg))
    assert (img > 0).any()
    np.testing.assert_array_equal(img, ref)


def test_sphere_fused_gate_big_env_pool_accepted_to_cap():
    """Sphere scenes with big equirect env pools stay fused up to the
    plane cap (TEX_ROWS_MAX, shared with the tri path) and fall back
    past it.  ADVICE r4: the gate used to accept pools the kernel's
    default 16 MB Mosaic scoped-VMEM limit could not hold — the
    pallas_call now raises the limit like pallas_path's."""
    import dataclasses
    from dsrt_tpu.ops import pallas_path, pallas_sphere
    if not pallas_path.backend_is_tpu():
        pytest.skip("needs TPU backend")
    cfg = RenderConfig(width=32, height=16, spp=1, max_depth=4)
    scene = _scene()
    big_pool = np.zeros((3 * pallas_path.TEX_ROWS_MAX * 128,), np.float32)
    big = dataclasses.replace(scene, tex_pool=big_pool,
                              tex_pool_tiled=big_pool)
    assert pallas_sphere.sphere_fused_supported(big, cfg)
    over_pool = np.zeros((3 * (pallas_path.TEX_ROWS_MAX + 1) * 128,),
                         np.float32)
    over = dataclasses.replace(scene, tex_pool=over_pool,
                               tex_pool_tiled=over_pool)
    assert not pallas_sphere.sphere_fused_supported(over, cfg)


@pytest.mark.slow
def test_sphere_fused_big_env_pool_compiles_and_matches(rng):
    """A realistic 2048x1024 equirect env (16384 plane rows = 25 MB of
    f32 planes, past Mosaic's default 16 MB scoped-VMEM limit) must
    COMPILE and render bit-identically to the split pipeline through
    the sphere megakernel (the ADVICE r4 failure case)."""
    from dsrt_tpu.ops import pallas_sphere
    cfg = RenderConfig(width=48, height=32, spp=2, max_depth=6)
    env = rng.random((1024, 2048, 3)).astype(np.float32) * 2.0
    b = SceneBuilder(sun_enabled=False, seed=1337)
    b.add_sphere((0.0, 0.0, -2.0), 0.6,
                 Material.lambertian((0.6, 0.6, 0.6)))
    b.add_sphere((1.2, 0.0, -2.0), 0.4,
                 Material.metal((0.9, 0.9, 0.9), fuzz=0.05))
    b.set_environment(env, rotation_deg=30.0)
    scene = b.build()
    if not pallas_sphere.sphere_fused_supported(scene, cfg):
        pytest.skip("sphere megakernel needs a TPU backend")
    from dsrt_tpu.render import render_frame, render_frame_fused
    cam = make_camera((0, 0, 1.0), (0, 0, -1), vfov=60,
                      width=cfg.width, height=cfg.height)
    ref = np.asarray(render_frame(scene, cam, cfg))
    img = np.asarray(render_frame_fused(scene, cam, cfg))
    assert (img > 0).any()
    np.testing.assert_array_equal(img, ref)
