"""Mixed-geometry scenes in the fused megakernel: triangle meshes
composed with spheres, quads, and area lights (sphere + quad) run
in-kernel instead of falling back to the split pipeline, and must stay
BIT-IDENTICAL to the split parity renderer (which is oracle-matched).

Reference contract: scene_hit tests BVH triangles then brute-force
spheres (src/gpu_render.cu:509-551, `<=` tie acceptance so a later
primitive wins); quads are the resurrected vestigial book primitive
(inc/qaud.h:31-72); the 50/50 light/BRDF mixture with the asymmetric
0.5*pdf_brdf branch is src/gpu_render.cu:869-927."""

import dataclasses

import numpy as np
import pytest

from dsrt_tpu.config import RenderConfig
from dsrt_tpu.models.materials import Material
from dsrt_tpu.models.scene import SceneBuilder
from dsrt_tpu.ops.camera import make_camera
from dsrt_tpu.ops import pallas_path

W, H = 96, 56
CFG = RenderConfig(width=W, height=H, spp=4, max_depth=8)
CAM = dict(vfov=60, width=W, height=H)


def _require_fused(scene, cfg):
    if not pallas_path.fused_supported(scene, cfg):
        pytest.skip("fused path needs a TPU backend")


def _mesh_floor(b):
    """A small two-triangle floor + a raised triangle (real BVH work)."""
    m = Material.lambertian((0.7, 0.7, 0.65))
    b.add_triangle((-3, -1, -5), (3, -1, -5), (3, -1, 1), m)
    b.add_triangle((-3, -1, -5), (3, -1, 1), (-3, -1, 1), m)
    b.add_triangle((-1.5, -1, -3), (-0.5, -1, -3), (-1.0, 0.2, -3.2),
                   Material.lambertian((0.3, 0.5, 0.8)))


def _sphere_mix_scene():
    """Mesh + diffuse/metal/glass spheres under the sun; the metal
    sphere sits sunward of the floor so primitive shadow occlusion is
    exercised."""
    b = SceneBuilder(sun_enabled=True, sun_dir=(0.25, -0.8, -0.4),
                     sun_radiance=(6.0, 5.7, 5.4))
    _mesh_floor(b)
    b.add_sphere((0.6, -0.4, -2.6), 0.6,
                 Material.lambertian((0.8, 0.3, 0.3)))
    b.add_sphere((-0.9, 0.6, -2.2), 0.35,
                 Material.metal((0.8, 0.8, 0.9), fuzz=0.1))
    b.add_sphere((0.0, -0.6, -1.6), 0.4, Material.dielectric(1.5))
    return b.build()


def _quad_light_scene():
    """Cornell-style: mesh floor + side quads + an emissive quad
    overhead (quad AREA light drives the mixture sampler)."""
    b = SceneBuilder(sun_enabled=False)
    _mesh_floor(b)
    b.add_quad((-2, -1, -4.5), (4, 0, 0), (0, 3, 0),
               Material.lambertian((0.73, 0.73, 0.73)))
    b.add_quad((-2, -1, -4.5), (0, 3, 0), (0, 0, 4),
               Material.lambertian((0.12, 0.45, 0.15)))
    b.add_quad((-0.7, 1.8, -3.4), (1.4, 0, 0), (0, 0, 1.2),
               Material.diffuse_light((8.0, 8.0, 7.0)))
    return b.build()


def _sphere_light_scene():
    """Mesh + an emissive SPHERE light (sphere-light solid-angle pdf in
    the mixture), sun off."""
    b = SceneBuilder(sun_enabled=False)
    _mesh_floor(b)
    b.add_sphere((0.8, 1.6, -2.8), 0.5,
                 Material.diffuse_light((10.0, 9.0, 8.0)))
    b.add_sphere((-0.6, -0.5, -2.3), 0.5,
                 Material.lambertian((0.4, 0.6, 0.9)))
    return b.build()


def test_gate_accepts_mixed_and_media_bounds():
    scene = _sphere_mix_scene()
    if not pallas_path.backend_is_tpu():
        pytest.skip("needs TPU backend")
    assert pallas_path.fused_supported(scene, CFG)
    many = dataclasses.replace(
        scene, n_spheres=pallas_path.MIX_MAX_SPH + 1)
    assert not pallas_path.fused_supported(many, CFG)
    # media are now IN fused scope (tests/test_fused_media.py) up to
    # the unrolled loop bound
    media = dataclasses.replace(scene, n_media=1)
    assert pallas_path.fused_supported(media, CFG)
    toomany = dataclasses.replace(scene,
                                  n_media=pallas_path.MIX_MAX_MED + 1)
    assert not pallas_path.fused_supported(toomany, CFG)


@pytest.mark.slow
def test_fused_sphere_mix_matches_split():
    scene = _sphere_mix_scene()
    _require_fused(scene, CFG)
    from dsrt_tpu.render import render_frame, render_frame_fused
    cam = make_camera((0, 0.4, 1.6), (0, -0.2, -2.5), **CAM)
    ref = render_frame(scene, cam, CFG)
    img = render_frame_fused(scene, cam, CFG)
    assert (img > 0).any()
    np.testing.assert_array_equal(img, ref)


@pytest.mark.slow
def test_fused_quad_light_matches_split():
    scene = _quad_light_scene()
    assert scene.n_quads == 3 and scene.n_lights == 1
    _require_fused(scene, CFG)
    from dsrt_tpu.render import render_frame, render_frame_fused
    cam = make_camera((0, 0.4, 1.6), (0, -0.2, -2.5), **CAM)
    ref = render_frame(scene, cam, CFG)
    img = render_frame_fused(scene, cam, CFG)
    assert (img > 0).any()
    np.testing.assert_array_equal(img, ref)


def test_fused_sphere_light_matches_split():
    # The sphere-light sampler maps its two uniforms through sin/cos,
    # whose Mosaic lowerings differ from XLA's by ulps (same class as
    # the media jnp.log note in test_fused_spheres): the sampled light
    # point shifts a hair and a grazing next-bounce light hit can flip,
    # dropping one whole sample's radiance on an isolated pixel.  The
    # draw SCHEDULE is identical; tolerate rare isolated flips.  (The
    # quad-light sampler is transcendental-free and stays u8-exact —
    # see test_fused_quad_light_matches_split.)
    scene = _sphere_light_scene()
    assert scene.n_lights == 1
    _require_fused(scene, CFG)
    from dsrt_tpu.render import render_frame, render_frame_fused
    cam = make_camera((0, 0.4, 1.6), (0, -0.2, -2.5), **CAM)
    ref = render_frame(scene, cam, CFG)
    img = render_frame_fused(scene, cam, CFG)
    assert (img > 0).any()
    diff = np.abs(img.astype(int) - ref.astype(int))
    frac = (diff > 0).any(-1).mean()
    assert frac <= 2e-3, frac
    assert diff.max() <= 255 // CFG.spp + 1, diff.max()


@pytest.mark.slow
def test_fused_quads_only_cornell_matches_split():
    """A quads-ONLY scene (no triangles) also runs the wide-BVH kernel:
    the pre-walk primitive pass does all the intersection work and the
    0-tri walk is a no-op (render._render_fused routes n_quads > 0)."""
    from dsrt_tpu.models.presets import cornell_box_scene
    scene = cornell_box_scene()
    assert scene.n_tris == 0 and scene.n_quads > 0
    _require_fused(scene, CFG)
    from dsrt_tpu.render import render_frame, render_frame_fused
    cam = make_camera((0.5, 0.5, -1.3), (0.5, 0.5, 0.5), vfov=40,
                      width=W, height=H)
    ref = render_frame(scene, cam, CFG)
    img = render_frame_fused(scene, cam, CFG)
    assert (img > 0).any()
    np.testing.assert_array_equal(img, ref)


def test_fused_mixed_defer_shadow_matches():
    """The deferred-shadow (combined tile walk) variant must also
    resolve primitive occluders for the pending sun term."""
    scene = _sphere_mix_scene()
    _require_fused(scene, CFG)
    from dsrt_tpu.render import render_frame_fused
    from dsrt_tpu.exec_opts import OPTS
    cam = make_camera((0, 0.4, 1.6), (0, -0.2, -2.5), **CAM)
    old = OPTS.defer_shadow
    try:
        OPTS.defer_shadow = False
        ref = render_frame_fused(scene, cam, CFG)
        OPTS.defer_shadow = True
        img = render_frame_fused(scene, cam, CFG)
    finally:
        OPTS.defer_shadow = old
    np.testing.assert_array_equal(img, ref)


@pytest.mark.slow
def test_fused_mixed_motion_blur():
    """Moving spheres in a MIXED tri+sphere scene stay on the fused
    megakernel and match the split path bit-for-bit: one shutter-time
    draw per sample after the jitter pair (render.py:96), centers at
    c0 + t*(c2-c0) in both the closest-hit and sun-shadow passes
    (inc/sphere.h:143-146)."""
    b = SceneBuilder(sun_enabled=True, sun_dir=(0.25, -0.8, -0.4),
                     sun_radiance=(6.0, 5.7, 5.4))
    _mesh_floor(b)
    b.add_sphere((0.6, -0.4, -2.6), 0.5,
                 Material.lambertian((0.8, 0.3, 0.3)),
                 center2=(-0.6, -0.4, -2.6))
    b.add_sphere((-0.9, 0.6, -2.2), 0.35,
                 Material.metal((0.8, 0.8, 0.9), fuzz=0.1))
    scene = b.build()
    cfg = dataclasses.replace(CFG, time0=0.1, time1=0.9)
    _require_fused(scene, cfg)
    from dsrt_tpu.render import render_frame, render_frame_fused
    cam = make_camera((0, 0.3, 1.2), (0, 0, -2), **CAM)
    ref = render_frame(scene, cam, cfg)
    img = render_frame_fused(scene, cam, cfg)
    assert (img > 0).any()
    np.testing.assert_array_equal(img, ref)


def test_fused_tri_shutter_open_draw_parity():
    """A shutter-open config on a STATIC scene still burns one LCG
    draw per sample (render.py:96 draws on time1 > time0 alone, moving
    spheres or not) — the fused kernel must mirror that draw."""
    b = SceneBuilder(sun_enabled=True, sun_dir=(0.25, -0.8, -0.4),
                     sun_radiance=(6.0, 5.7, 5.4))
    _mesh_floor(b)
    scene = b.build()
    cfg = dataclasses.replace(CFG, time0=0.0, time1=1.0)
    _require_fused(scene, cfg)
    from dsrt_tpu.render import render_frame, render_frame_fused
    cam = make_camera((0, 0.3, 1.2), (0, 0, -2), **CAM)
    ref = render_frame(scene, cam, cfg)
    img = render_frame_fused(scene, cam, cfg)
    np.testing.assert_array_equal(img, ref)
