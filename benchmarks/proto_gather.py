"""Prototype: per-lane gather from a VMEM-resident table inside a Pallas
TPU kernel (no gather primitive exists — pltpu offers only uniform roll).

Scheme (the fused-kernel texture fetch): for each sublane row s of the
(8,128) index tile, transpose the 128 lane indices to sublanes, build a
(128,128) one-hot of the low 7 bits (column j within a pool row), matmul
against poolT (128, R) so tmp[l, c] = pool[c, j_l], then select each
lane's own row c_l with an iota compare + row-sum, and transpose back.
Exactness requirement: one-hot x f32 matmul must reproduce pool values
BIT-EXACTLY (precision=HIGHEST); verified here against numpy.

    python benchmarks/proto_gather.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(idx_ref, pool_ref, out_ref, *, R: int, reps: int):
    idx = idx_ref[...]                      # (8,128) i32 in [0, R*128)
    poolT = jnp.transpose(pool_ref[...])    # (128, R)
    c_all = idx // 128
    j_all = idx % 128
    acc = jnp.zeros((8, 128), jnp.float32)
    for _ in range(reps):                   # reps>1 = timing amplification
        rows = []
        for s in range(8):
            jT = jnp.transpose(j_all[s:s + 1, :])        # (128,1)
            cT = jnp.transpose(c_all[s:s + 1, :])        # (128,1)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            onehot = (jT == lane).astype(jnp.float32)    # (128,128)
            tmp = jax.lax.dot_general(
                onehot, poolT, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST)     # (128, R)
            crange = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1)
            sel = jnp.where(cT == crange, tmp, 0.0)
            val = jnp.sum(sel, axis=1, keepdims=True)    # (128,1)
            rows.append(jnp.transpose(val))              # (1,128)
        acc = acc + jnp.concatenate(rows, axis=0)
    out_ref[...] = acc


@partial(jax.jit, static_argnames=("R", "reps"))
def run(idx, pool, R: int, reps: int):
    return pl.pallas_call(
        partial(_gather_kernel, R=R, reps=reps),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(idx, pool)


def main():
    rng = np.random.default_rng(3)
    for R in (8, 64, 256):
        pool = rng.standard_normal((R, 128)).astype(np.float32)
        idx = rng.integers(0, R * 128, (8, 128)).astype(np.int32)
        out = np.asarray(run(jnp.asarray(idx), jnp.asarray(pool), R, 1))
        ref = pool.reshape(-1)[idx]
        exact = np.array_equal(out, ref)
        print(f"R={R:4d}: exact={exact} maxerr={np.abs(out-ref).max():.3e}",
              flush=True)
        # timing: 100 gathers per kernel, min of 3
        best = None
        for r in range(3):
            i2 = ((idx.astype(np.int64) + r + 1) % (R * 128)).astype(np.int32)
            t0 = time.perf_counter()
            o = run(jnp.asarray(i2), jnp.asarray(pool), R, 100)
            o.block_until_ready()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"        ~{best/100*1e6:.2f} us per (8,128) gather "
              f"(100x amplified, min of 3)", flush=True)


if __name__ == "__main__":
    main()
