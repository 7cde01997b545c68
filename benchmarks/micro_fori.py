"""Microbenchmark: per-entry cost of a dynamic-trip lax.fori_loop inside
a Mosaic while_loop body.

The fused kernel's union walk calls run_tiles (a dynamic fori) once per
POP — ~6 entries per traversal iteration, ~161k per ISS frame.  If an
entry costs O(100 ns), that alone is tens of ms/frame.  Variants: F
sequential fori loops per outer iteration, each with a small dynamic
trip count (0-2, data-dependent), each trip doing one dynamic VMEM tile
load + a few vector ops (the run_tiles shape).  A 'fused' variant runs
ONE fori with the summed trip count.  Prints ns/outer-iteration.

Run on the real chip: python benchmarks/micro_fori.py
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import jax.lax as lax
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 100_000
NT = 256   # tile table rows / 8


def make_kernel(n_fori: int, fused: bool):
    def kernel(tab_ref, out_ref):
        acc0 = tab_ref[0:8, :] * 0.0

        def cond(c):
            return c[0] < ITERS

        def body(c):
            it, acc, seed = c
            # F pseudo-random small trip counts (0..2), data-dependent
            trips = []
            s = seed
            for f in range(n_fori):
                s = s * jnp.int32(1664525) + jnp.int32(1013904223)
                trips.append((s >> 16) & 3)

            def tile_body(k, a, base):
                t = (base + k) % NT
                w = tab_ref[pl.ds(8 * t, 8), :]
                return a + w * jnp.float32(1e-30)

            if fused:
                total = trips[0]
                for t in trips[1:]:
                    total = total + t
                acc = lax.fori_loop(
                    0, total, lambda k, a: tile_body(k, a, it), acc)
            else:
                for f in range(n_fori):
                    acc = lax.fori_loop(
                        0, trips[f],
                        lambda k, a, f=f: tile_body(k, a, it + f), acc)
            return it + 1, acc, s

        out = lax.while_loop(cond, body,
                             (jnp.int32(0), acc0, jnp.int32(12345)))
        out_ref[...] = out[1]

    return kernel


def run(tab, n_fori, fused):
    fn = pl.pallas_call(
        make_kernel(n_fori, fused),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    fn = jax.jit(fn)
    r = fn(tab)
    float(jnp.sum(r))
    salt = jnp.float32((time.time() % 1.0) * 1e-3)
    best = None
    for rep in range(3):
        t2 = tab + salt + jnp.float32(rep + 1) * 1e-7
        t0 = time.perf_counter()
        r = fn(t2)
        float(jnp.sum(r))
        dt = time.perf_counter() - t0
        if dt > 0.005:
            best = dt if best is None else min(best, dt)
    if best is None:
        raise RuntimeError("cache hits only")
    return best / ITERS * 1e9


def main():
    tab = jnp.asarray(np.random.default_rng(0).random((8 * NT, 128)),
                      jnp.float32)
    for n_fori, fused in [(0, False), (1, False), (2, False), (6, False),
                          (6, True)]:
        ns = run(tab, n_fori, fused)
        label = f"F={n_fori}" + (" fused" if fused else "")
        print(f"{label:10s}: {ns:8.1f} ns/iter", flush=True)


if __name__ == "__main__":
    main()
