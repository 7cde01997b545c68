"""LCG parity: the jnp implementation must reproduce the reference's exact
integer sequence (inc/rtweekend.h:126-133) and masked draws must advance
only masked lanes."""

import numpy as np
import jax.numpy as jnp

from dsrt_tpu.ops import rng as R
from dsrt_tpu.oracle import LCG


def py_lcg_sequence(seed, n):
    s = seed & 0xFFFFFFFF
    out = []
    for _ in range(n):
        s = (s * 1664525 + 1013904223) & 0xFFFFFFFF
        out.append((s & 0xFFFFFF) / 16777216.0)
    return out


def test_lcg_matches_pure_python():
    seeds = np.array([0, 1, 1337, 0xFFFFFFFF, 123456789], np.uint32)
    state = jnp.asarray(seeds)
    got = []
    for _ in range(16):
        u, state = R.draw(state)
        got.append(np.asarray(u))
    got = np.stack(got, axis=1)
    for i, s in enumerate(seeds):
        expect = py_lcg_sequence(int(s), 16)
        np.testing.assert_allclose(got[i], expect, rtol=0, atol=0)


def test_oracle_lcg_matches():
    rng = LCG(1337)
    expect = py_lcg_sequence(1337, 8)
    got = [float(rng.rand()) for _ in range(8)]
    np.testing.assert_allclose(got, expect)


def test_pixel_seed():
    px = jnp.asarray([0, 5, 10], jnp.int32)
    py = jnp.asarray([0, 2, 3], jnp.int32)
    s = R.seed_pixels(px, py, 800, 1337)
    expect = [(x + y * 800) ^ 1337 for x, y in [(0, 0), (5, 2), (10, 3)]]
    np.testing.assert_array_equal(np.asarray(s), np.array(expect, np.uint32))


def test_masked_draw_freezes_unmasked_lanes():
    state = jnp.asarray([7, 7, 7, 7], jnp.uint32)
    mask = jnp.asarray([True, False, True, False])
    _, s1 = R.draw(state, mask)
    s1 = np.asarray(s1)
    assert s1[0] == s1[2] != 7
    assert s1[1] == s1[3] == 7


def test_rejection_sampler_draw_counts_match_scalar():
    """random_in_unit_sphere must advance each lane's state exactly as the
    scalar rejection loop does (3 draws per attempt until |p|^2 < 1)."""
    seeds = [1, 99, 1337, 424242]

    def scalar_ref(seed):
        rng = LCG(seed)
        while True:
            x = rng.rand() * 2 - 1
            y = rng.rand() * 2 - 1
            z = rng.rand() * 2 - 1
            if x * x + y * y + z * z < 1.0:
                return (x, y, z), int(rng.state)

    state = jnp.asarray(seeds, jnp.uint32)
    p, s_out = R.random_in_unit_sphere(state)
    for i, seed in enumerate(seeds):
        (ex, ey, ez), es = scalar_ref(seed)
        assert int(np.asarray(s_out)[i]) == es
        np.testing.assert_allclose(
            [float(p.x[i]), float(p.y[i]), float(p.z[i])], [ex, ey, ez],
            rtol=1e-6)
