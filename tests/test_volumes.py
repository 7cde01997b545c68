"""Constant-medium (participating media) correctness: the exponential
free-path sampling must reproduce Beer-Lambert transmittance
(inc/constant_medium.h:20-53 semantics, resurrected per SURVEY.md §7)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dsrt_tpu.config import RenderConfig
from dsrt_tpu.models.materials import Material
from dsrt_tpu.models.presets import volumetric_scene
from dsrt_tpu.models.scene import SceneBuilder
from dsrt_tpu.ops.linalg import V3
from dsrt_tpu.ops import trace as T
from dsrt_tpu.ops import rng as R
from dsrt_tpu.ops.camera import make_camera
from dsrt_tpu.render import render_frame

DENSITY = 1.2
RADIUS = 0.8


def _fog_scene(extra=None):
    b = SceneBuilder(sun_enabled=False)
    b.add_constant_medium_sphere((0, 0, -3.0), RADIUS, DENSITY,
                                 (0.9, 0.9, 0.9))
    if extra:
        extra(b)
    return b.build()


def _central_rays(n):
    ro = V3(jnp.zeros(n), jnp.zeros(n), jnp.zeros(n))
    rd = V3(jnp.zeros(n), jnp.zeros(n), jnp.full(n, -1.0))
    return ro, rd


@pytest.mark.slow
def test_transmittance_matches_beer_lambert():
    scene = _fog_scene()
    n = 8192
    ro, rd = _central_rays(n)
    state = jnp.arange(n, dtype=jnp.uint32) * jnp.uint32(2654435761)
    hit, _ = T.scene_hit(scene, ro, rd, 1e-3, 1e9, jnp.ones(n, bool),
                         state)
    scatter_frac = float(jnp.mean((hit.medium >= 0).astype(jnp.float32)))
    expect = 1.0 - np.exp(-DENSITY * 2 * RADIUS)  # chord through center
    assert abs(scatter_frac - expect) < 0.03, (scatter_frac, expect)
    # scatter points lie inside the fog chord
    t = np.asarray(hit.t)[np.asarray(hit.medium) >= 0]
    assert ((t >= 3.0 - RADIUS - 1e-4) & (t <= 3.0 + RADIUS + 1e-4)).all()


def test_surface_clips_medium():
    # wall at the fog center: only the first half of the chord can scatter
    def add_wall(b):
        m = Material.lambertian((0.5, 0.5, 0.5))
        b.add_triangle((-5, -5, -3.0), (5, -5, -3.0), (0, 5, -3.0), m)

    scene = _fog_scene(add_wall)
    n = 8192
    ro, rd = _central_rays(n)
    state = jnp.arange(n, dtype=jnp.uint32) * jnp.uint32(2654435761)
    hit, _ = T.scene_hit(scene, ro, rd, 1e-3, 1e9, jnp.ones(n, bool), state)
    med = np.asarray(hit.medium) >= 0
    expect = 1.0 - np.exp(-DENSITY * RADIUS)  # half chord
    assert abs(med.mean() - expect) < 0.03
    # non-scattered rays hit the wall
    assert np.asarray(hit.hit)[~med].all()
    t = np.asarray(hit.t)
    assert (t[med] <= 3.0 + 1e-4).all()
    np.testing.assert_allclose(t[~med], 3.0, atol=1e-3)


def test_volumetric_scene_renders():
    scene = volumetric_scene()
    cam = make_camera((0, 0.4, 1.5), (0, 0, -1), vfov=55, width=24,
                      height=16)
    cfg = RenderConfig(width=24, height=16, spp=4, max_depth=8)
    a = render_frame(scene, cam, cfg)
    b = render_frame(scene, cam, cfg)
    np.testing.assert_array_equal(a, b)  # deterministic
    assert a.max() > 0  # lit by lamp/sun through fog
