"""Traversal-vs-bruteforce equivalence on random rays — the reference's
latent `scene_hit_bruteforce` oracle (src/gpu_render.cu:553-577)
productized per SURVEY.md §4."""

import numpy as np
import jax.numpy as jnp
import pytest

from dsrt_tpu.models.presets import random_tri_soup_scene, rtiow_smoke_scene
from dsrt_tpu.ops.linalg import V3
from dsrt_tpu.ops import trace as T
from dsrt_tpu import oracle as O


@pytest.fixture(scope="module")
def soup():
    return random_tri_soup_scene(n=200)


def _random_rays(rng, n):
    ro = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    ro[:, 2] += 2.0
    rd = rng.normal(0, 1, (n, 3)).astype(np.float32)
    rd[:, 2] -= 1.5
    return ro, rd


@pytest.mark.slow
def test_packet_traversal_matches_bruteforce(soup, rng):
    n = 256
    ro_np, rd_np = _random_rays(rng, n)
    ro = V3(jnp.asarray(ro_np[:, 0]), jnp.asarray(ro_np[:, 1]),
            jnp.asarray(ro_np[:, 2]))
    rd = V3(jnp.asarray(rd_np[:, 0]), jnp.asarray(rd_np[:, 1]),
            jnp.asarray(rd_np[:, 2]))
    active = jnp.ones(n, bool)
    hit, _ = T.scene_hit(soup, ro, rd, 1e-3, 1e9, active)

    sc = O.OracleScene(soup)
    for i in range(n):
        ref = O.scene_hit(sc, ro_np[i], rd_np[i], np.float32(1e-3),
                          np.float32(1e9))
        assert bool(hit.hit[i]) == (ref is not None), f"ray {i}"
        if ref is not None:
            np.testing.assert_allclose(float(hit.t[i]), ref["t"], rtol=2e-5,
                                       err_msg=f"ray {i}")
            assert int(hit.mat[i]) == ref["mat"]
            np.testing.assert_allclose(
                [float(hit.nx[i]), float(hit.ny[i]), float(hit.nz[i])],
                ref["normal"], rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_sphere_hit_matches_oracle(rng):
    scene = rtiow_smoke_scene()
    n = 128
    ro_np = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    rd_np = rng.normal(0, 1, (n, 3)).astype(np.float32)
    ro = V3(*(jnp.asarray(ro_np[:, i]) for i in range(3)))
    rd = V3(*(jnp.asarray(rd_np[:, i]) for i in range(3)))
    hit, _ = T.scene_hit(scene, ro, rd, 1e-3, 1e9, jnp.ones(n, bool))
    sc = O.OracleScene(scene)
    for i in range(n):
        ref = O.scene_hit(sc, ro_np[i], rd_np[i], np.float32(1e-3),
                          np.float32(1e9))
        assert bool(hit.hit[i]) == (ref is not None)
        if ref is not None:
            # grazing hits amplify ulp differences in the discriminant
            np.testing.assert_allclose(float(hit.t[i]), ref["t"], rtol=1e-4,
                                       atol=1e-5)
            assert int(hit.mat[i]) == ref["mat"]
            assert bool(hit.front[i]) == bool(ref["front"])


def test_any_hit_consistent_with_closest(soup, rng):
    n = 128
    ro_np, rd_np = _random_rays(rng, n)
    ro = V3(*(jnp.asarray(ro_np[:, i]) for i in range(3)))
    rd = V3(*(jnp.asarray(rd_np[:, i]) for i in range(3)))
    act = jnp.ones(n, bool)
    closest, _ = T.scene_hit(soup, ro, rd, 1e-3, 1e9, act)
    anyh = T.packet_traverse(soup, ro, rd, 1e-3, 1e9, act, any_hit=True)
    # any-hit must find a hit iff closest-hit triangles found one
    tri_hit = closest.hit & (closest.tri >= 0)
    np.testing.assert_array_equal(np.asarray(anyh.hit), np.asarray(tri_hit))


def test_inactive_lanes_report_miss(soup):
    n = 8
    ro = V3(jnp.zeros(n), jnp.zeros(n), jnp.full(n, 3.0))
    rd = V3(jnp.zeros(n), jnp.zeros(n), jnp.full(n, -1.0))
    active = jnp.asarray([True, False] * 4)
    hit, _ = T.scene_hit(soup, ro, rd, 1e-3, 1e9, active)
    assert not np.asarray(hit.hit)[~np.asarray(active)].any()
