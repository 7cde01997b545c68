"""Golden-image equivalence: the TPU packet tracer vs the independent
scalar oracle, at tiny sizes (SURVEY.md §4 implication (a), §7 step 4)."""

import numpy as np
import pytest

from dsrt_tpu.config import RenderConfig
from dsrt_tpu.models.presets import (random_tri_soup_scene, rtiow_smoke_scene,
                                     single_triangle_scene,
                                     sphere_light_scene)
from dsrt_tpu.ops.camera import make_camera
from dsrt_tpu.oracle import render_oracle
from dsrt_tpu.render import render_frame, render_radiance

W, H, SPP = 20, 12, 2
CFG = RenderConfig(width=W, height=H, spp=SPP, max_depth=8)
CAM = dict(vfov=55, width=W, height=H)


def check(scene, lookfrom=(0, 0.4, 1.5), lookat=(0, 0, -1), cfg=CFG,
          u8_tol=0, f32_tol=5e-5):
    cam = make_camera(lookfrom, lookat, **CAM)
    img = render_frame(scene, cam, cfg)
    fl = render_radiance(scene, cam, cfg)
    oimg, ofl = render_oracle(scene, cam, cfg)
    fd = np.abs(fl - ofl)
    d = np.abs(img.astype(int) - oimg.astype(int))
    assert fd.max() <= f32_tol, f"f32 maxdiff {fd.max()}"
    assert d.max() <= u8_tol, f"u8 maxdiff {d.max()}"


@pytest.mark.slow
def test_smoke_scene_matches_oracle():
    check(rtiow_smoke_scene())


def test_sphere_light_scene_matches_oracle():
    check(sphere_light_scene())


def test_single_triangle_matches_oracle():
    check(single_triangle_scene(), lookfrom=(0, 0, 1.0), lookat=(0, 0, -2))


def test_tri_soup_with_bvh_matches_oracle():
    # oracle uses brute force; tracer uses the BVH -> also a traversal test
    check(random_tri_soup_scene(n=60), lookfrom=(0, 0, 2.0),
          lookat=(0, 0, -3))


def test_sun_off_is_black_background():
    scene = rtiow_smoke_scene(sun=False)
    cam = make_camera((0, 0.4, 1.5), (0, 0, -1), **CAM)
    img = render_frame(scene, cam, CFG)
    assert img.max() == 0  # no lights, black background (cu:744-747)


def test_determinism():
    scene = rtiow_smoke_scene()
    cam = make_camera((0, 0.4, 1.5), (0, 0, -1), **CAM)
    a = render_frame(scene, cam, CFG)
    b = render_frame(scene, cam, CFG)
    np.testing.assert_array_equal(a, b)


def test_seed_changes_image():
    cam = make_camera((0, 0.4, 1.5), (0, 0, -1), **CAM)
    a = render_frame(rtiow_smoke_scene(seed=1337), cam, CFG)
    b = render_frame(rtiow_smoke_scene(seed=999), cam, CFG)
    assert (a != b).any()
