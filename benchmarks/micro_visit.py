"""Microbenchmark: decompose the per-visit cost of the traversal loop.

Variants (cumulative):
  chase   — scalar pointer-chase only: node = table[node, 6]
  loads   — + load the other 8 node fields (sum into a scalar, dead-ish)
  slab    — + full slab test against an (8,128) ray block
  reduce  — + jnp.any() verdict feeding the next-node select
  groups4 — the 'reduce' variant with 4 independent cursors in one body

Each runs ITERS chained visits; prints ns/visit.  Run on the real chip.
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

ITERS = 2_000_000
N = 3000  # table rows


def make_kernel(variant: str, n_groups: int = 1):
    def kernel(tab_ref, ray_ref, out_ref):
        rays = ray_ref[...]

        def grp(g):
            return rays[g * 8:(g + 1) * 8, :]

        def cond(c):
            return c[0][0] < ITERS

        def body(c):
            its, nodes, accs = c
            new_nodes, new_accs = [], []
            for g in range(n_groups):
                node, acc = nodes[g], accs[g]
                nxt_f = tab_ref[node, 6]
                nxt = nxt_f.astype(jnp.int32) % N
                if variant == "chase":
                    new_nodes.append(nxt)
                    new_accs.append(acc)
                    continue
                f = [tab_ref[node, i] for i in (0, 1, 2, 3, 4, 5, 7, 8)]
                if variant == "loads":
                    # fold the loads into the next pointer cheaply
                    s = f[0] + f[1] + f[2] + f[3] + f[4] + f[5] + f[6] + f[7]
                    nxt = (nxt + (s.astype(jnp.int32) & 0)) % N
                    new_nodes.append(nxt)
                    new_accs.append(acc)
                    continue
                r = grp(g)
                tx0 = (f[0] - r) * 1.0001
                tx1 = (f[3] - r) * 1.0001
                ty0 = (f[1] - r) * 0.999
                ty1 = (f[4] - r) * 0.999
                tz0 = (f[2] - r) * 1.01
                tz1 = (f[5] - r) * 1.01
                lo = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                             jnp.minimum(ty0, ty1)),
                                 jnp.minimum(tz0, tz1))
                hi = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                             jnp.maximum(ty0, ty1)),
                                 jnp.maximum(tz0, tz1))
                boxhit = hi > lo
                if variant == "slab":
                    # consume slab without a cross-lane reduce: fold into acc
                    acc = acc + jnp.where(boxhit, 1.0, 0.0)
                    new_nodes.append(nxt)
                    new_accs.append(acc)
                    continue
                # reduce: verdict feeds the next-node select
                enter = jnp.any(boxhit)
                nxt = jnp.where(enter, nxt, (nxt + 1) % N)
                acc = acc + jnp.where(boxhit, 1.0, 0.0)
                new_nodes.append(nxt)
                new_accs.append(acc)
            return (its[0] + 1,) + tuple(new_nodes[1:]) if False else (
                (its[0] + 1, its[1]), tuple(new_nodes), tuple(new_accs))

        nodes0 = tuple(jnp.int32(g) for g in range(n_groups))
        accs0 = tuple(jnp.zeros((8, 128), jnp.float32)
                      for _ in range(n_groups))
        out = lax.while_loop(cond, body,
                             ((jnp.int32(0), jnp.int32(0)), nodes0, accs0))
        tot = out[2][0]
        for g in range(1, n_groups):
            tot = tot + out[2][g]
        out_ref[...] = tot + out[1][0].astype(jnp.float32)

    return kernel


@partial(jax.jit, static_argnames=("variant", "n_groups"))
def run(tab, rays, variant, n_groups=1):
    return pl.pallas_call(
        make_kernel(variant, n_groups),
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(tab, rays)


def main():
    rng = np.random.default_rng(0)
    # random skip pointers that stay in range
    tab = rng.uniform(0.0, 1.0, (N, 16)).astype(np.float32)
    tab[:, 6] = rng.integers(0, N, N)
    base = (time.time() % 100)
    for variant in ("chase", "loads", "slab", "reduce"):
        for g in (1, 2, 4):
            if variant != "reduce" and g > 1:
                continue
            t = jnp.asarray(tab + base * 1e-6)
            rays = jnp.asarray(
                rng.uniform(0, 1, (8 * g, 128)).astype(np.float32))
            r = run(t, rays, variant, g)
            np.asarray(jax.device_get(r))  # force completion (axon tunnel)
            base += 1
            t = jnp.asarray(tab + base * 1e-6)
            t0 = time.perf_counter()
            r = run(t, rays, variant, g)
            np.asarray(jax.device_get(r))
            dt = time.perf_counter() - t0
            print(f"{variant:7s} g={g}: {dt*1e3:8.2f} ms total, "
                  f"{dt/ITERS*1e9/g:7.1f} ns/visit "
                  f"({dt/ITERS*1e9:7.1f} ns/iter)")


if __name__ == "__main__":
    main()
