"""Benchmark / test scene presets (BASELINE.json `configs`).

- `rtiow_smoke_scene`: 3 spheres + ground (lambertian/metal/dielectric),
  no mesh/BVH — BASELINE configs[1].
- `sphere_light_scene`: emissive-sphere + diffuse geometry exercising the
  50/50 light/BRDF mixture sampling path (src/gpu_render.cu:869-918).
- `volumetric_scene`: constant-medium fog + Perlin/checker textures +
  sphere light — BASELINE configs[4].
- `iss_standin_scene` lives in models/mesh_gen.py (procedural mesh; the
  NASA ISS OBJ is not in the reference repo either, src/main.cpp:238).
"""

from __future__ import annotations

import numpy as np

from dsrt_tpu.models.materials import Material
from dsrt_tpu.models.scene import Scene, SceneBuilder


def rtiow_smoke_scene(sun: bool = True, seed: int = 1337) -> Scene:
    b = SceneBuilder(sun_enabled=sun,
                     sun_dir=(-0.4, -0.8, -0.45),  # effective light from (0.4,0.8,0.45) after the kernel's negation
                     sun_radiance=(6.0, 5.7, 5.4),
                     seed=seed)
    ground = Material.lambertian((0.8, 0.8, 0.0))
    center = Material.lambertian((0.1, 0.2, 0.5))
    left = Material.dielectric(1.5)
    right = Material.metal((0.8, 0.6, 0.2), fuzz=0.05)
    b.add_sphere((0.0, -100.5, -1.0), 100.0, ground)
    b.add_sphere((0.0, 0.0, -1.0), 0.5, center)
    b.add_sphere((-1.0, 0.0, -1.0), 0.5, left)
    b.add_sphere((1.0, 0.0, -1.0), 0.5, right)
    return b.build()


def sphere_light_scene(seed: int = 1337) -> Scene:
    """Diffuse ground + two spheres lit by one emissive sphere, sun off:
    exercises emissive termination, light picking, and the asymmetric
    mixture pdf."""
    b = SceneBuilder(sun_enabled=False, seed=seed)
    ground = Material.lambertian((0.73, 0.73, 0.73))
    ball = Material.lambertian((0.6, 0.2, 0.2))
    mirror = Material.metal((0.9, 0.9, 0.9), fuzz=0.0)
    lamp = Material.diffuse_light((12.0, 11.0, 10.0))
    b.add_sphere((0.0, -100.5, -1.0), 100.0, ground)
    b.add_sphere((-0.6, 0.0, -1.2), 0.5, ball)
    b.add_sphere((0.7, 0.0, -1.0), 0.5, mirror)
    b.add_sphere((0.0, 2.2, -1.0), 0.6, lamp)
    return b.build()


def volumetric_scene(seed: int = 1337) -> Scene:
    """Constant-medium fog sphere + marble and checker materials + sphere
    light + sun: BASELINE configs[4] (the reference's vestigial
    constant_medium/perlin features resurrected, SURVEY.md §7 step 10)."""
    b = SceneBuilder(sun_enabled=True,
                     sun_dir=(-0.3, -0.9, -0.2),
                     sun_radiance=(7.0, 6.6, 6.2),  # modest: keep checker albedo visible (no clamp saturation)
                     seed=seed)
    ground = Material.checker((0.2, 0.3, 0.1), (0.9, 0.9, 0.9), scale=4.0)
    marble = Material.marble(scale=2.0)
    lamp = Material.diffuse_light((10.0, 10.0, 9.0))
    b.add_sphere((0.0, -100.5, -1.0), 100.0, ground)
    b.add_sphere((0.7, 0.0, -1.1), 0.5, marble)
    b.add_sphere((0.0, 2.4, -1.0), 0.5, lamp)
    b.add_constant_medium_sphere((-0.7, 0.1, -1.0), 0.55, density=2.5,
                                 albedo=(0.8, 0.85, 0.9))
    return b.build()


def single_triangle_scene(sun: bool = True, seed: int = 1337) -> Scene:
    """One triangle facing +Z — the minimal mesh/BVH exerciser."""
    b = SceneBuilder(sun_enabled=sun, sun_dir=(0.0, -0.3, -1.0),
                     sun_radiance=(5.0, 5.0, 5.0), seed=seed)
    mat = Material.lambertian((0.7, 0.3, 0.3))
    b.add_triangle((-1.0, -1.0, -2.0), (1.0, -1.0, -2.0), (0.0, 1.0, -2.0),
                   mat)
    return b.build()


def random_tri_soup_scene(n: int = 256, sun: bool = True,
                          seed: int = 1337, rng_seed: int = 7) -> Scene:
    """Random triangle soup in a unit-ish box in front of the camera — the
    BVH stress scene for traversal-vs-bruteforce tests."""
    rng = np.random.default_rng(rng_seed)
    b = SceneBuilder(sun_enabled=sun, sun_dir=(-0.2, -1.0, -0.4),
                     sun_radiance=(6.0, 6.0, 6.0), seed=seed)
    mats = [Material.lambertian(tuple(rng.uniform(0.2, 0.9, 3))),
            Material.metal(tuple(rng.uniform(0.5, 0.95, 3)), fuzz=0.1),
            Material.lambertian((0.73, 0.73, 0.73))]
    centers = rng.uniform([-1.5, -1.0, -4.0], [1.5, 1.0, -2.0], (n, 3))
    for i in range(n):
        c = centers[i]
        e1 = rng.normal(0, 0.12, 3)
        e2 = rng.normal(0, 0.12, 3)
        b.add_triangle(c, c + e1, c + e2, mats[i % len(mats)])
    return b.build()


def cornell_box_scene(seed: int = 1337) -> Scene:
    """Cornell-box-style scene from the reference's vestigial quad/box
    geometry (inc/qaud.h:31-123): 5 wall quads, a quad area light in the
    ceiling, and two boxes — the classic MIS stress test for the
    light/BRDF mixture pdf.  Sun off (interior scene)."""
    from dsrt_tpu.models.materials import Material
    b = SceneBuilder(sun_enabled=False, seed=seed)
    red = Material.lambertian((0.65, 0.05, 0.05))
    white = Material.lambertian((0.73, 0.73, 0.73))
    green = Material.lambertian((0.12, 0.45, 0.15))
    light = Material.diffuse_light((15.0, 15.0, 15.0))
    s = 1.0  # unit box
    b.add_quad((s, 0, 0), (0, s, 0), (0, 0, s), green)     # left wall
    b.add_quad((0, 0, 0), (0, s, 0), (0, 0, s), red)       # right wall
    b.add_quad((0.35 * s, s - 1e-3, 0.35 * s),
               (0.3 * s, 0, 0), (0, 0, 0.3 * s), light)    # ceiling light
    b.add_quad((0, 0, 0), (s, 0, 0), (0, 0, s), white)     # floor
    b.add_quad((0, s, 0), (s, 0, 0), (0, 0, s), white)     # ceiling
    b.add_quad((0, 0, s), (s, 0, 0), (0, s, 0), white)     # back wall
    b.add_box((0.15, 0.0, 0.10), (0.45, 0.55, 0.40), white)
    b.add_box((0.55, 0.0, 0.50), (0.85, 0.30, 0.80), white)
    return b.build()


def mixed_scene(seed: int = 1337) -> Scene:
    """Mixed geometry: a small triangle mesh + spheres + a quad light in
    one scene — the scene_hit composition order of the reference
    (triangles via BVH first, then brute spheres, src/gpu_render.cu:
    509-551, then the resurrected quads).  Exercises whichever execution
    path render.fused_kind routes mixed scenes to (split wavefront today)
    and is the bench line that keeps that cost visible."""
    from dsrt_tpu.models.mesh_gen import iss_standin_mesh
    b = SceneBuilder(sun_enabled=True,
                     sun_dir=(-0.4, -0.8, -0.45),
                     sun_radiance=(6.0, 5.7, 5.4), seed=seed,
                     bvh_method="sah")
    mesh = iss_standin_mesh(1)
    # shrink the station into tabletop scale
    for arr in (mesh.v0, mesh.v1, mesh.v2):
        arr *= 0.012
    b.add_mesh(mesh, translate=(0.0, 0.3, -1.2))
    b.add_sphere((0.0, -100.5, -1.0), 100.0,
                 Material.lambertian((0.8, 0.8, 0.0)))
    b.add_sphere((-0.9, 0.0, -1.0), 0.45, Material.dielectric(1.5))
    b.add_sphere((0.9, 0.0, -1.0), 0.45,
                 Material.metal((0.8, 0.6, 0.2), fuzz=0.05))
    b.add_quad((-0.5, 1.8, -1.7), (1.0, 0.0, 0.0), (0.0, 0.0, 1.0),
               Material.diffuse_light((10.0, 9.5, 9.0)), flip_face=True)
    return b.build()
