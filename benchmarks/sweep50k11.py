"""Eleventh ISS-scale sweep: row-group leaf masking granularity.

Half-block leaf masking (leaf_split=half) cut ISS-scale frame time to
146.3 ms by scanning each half's own entered ranges with 4-row MT
updates.  ROADMAP's next step on the same road: QUARTER-row groups
(2-row granularity) save up to another ~25% of remaining leaf row work
for ~4 more reduces per pop on the serial visit chain — measure before
believing.  Run: python benchmarks/sweep50k11.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

from dsrt_tpu.config import RenderConfig
from dsrt_tpu.exec_opts import OPTS
from dsrt_tpu.ops.camera import point_camera_at

import os as _os
import struct as _struct
BASE = (_struct.unpack("<I", _os.urandom(4))[0] % 100000) * 1e-5


@partial(jax.jit, static_argnames=("cfg", "key"))
def run(scene, cfg, cam, px, py, valid, key):
    from dsrt_tpu.ops.pallas_path import trace_fused
    return trace_fused(scene, cfg, cam, px, py, valid, return_stats=True)


def measure(scene, cfg, px, py, valid, key, reps=3):
    import dataclasses
    global BASE
    best = None
    good = 0
    tries = 0
    while good < reps and tries < reps * 4 + 1:
        BASE += 3.1e-3
        cam = point_camera_at((40.0 + BASE, 60.0, 190.0),
                              (0.0, 0.0, 0.0), vfov=cfg.vfov,
                              width=cfg.width, height=cfg.height)
        eps = jnp.float32(BASE * 1e-12)
        sc = dataclasses.replace(scene,
                                 tri_pack=scene.tri_pack + eps,
                                 tri_pk8=scene.tri_pk8 + eps)
        t0 = time.perf_counter()
        accum, nr, stats = run(sc, cfg, cam, px, py, valid, key)
        stats_h = np.asarray(jax.device_get(stats), np.int64)
        dt = time.perf_counter() - t0
        tries += 1
        if tries == 1:
            continue
        if dt < 0.01:
            continue
        good += 1
        if best is None or dt < best[0]:
            best = (dt, stats_h)
    if best is None:
        raise RuntimeError("all reps were cache hits")
    dt, s = best
    cols = ("rays", "waves", "cvis", "ctst", "svis", "stst", "cidl")
    return dt, {k: int(s[:, i].sum()) for i, k in enumerate(cols)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--only", default="")
    ap.add_argument("--detail", type=int, default=12)
    args = ap.parse_args()

    cfg = RenderConfig(width=800, height=450, spp=args.spp, max_depth=50)

    from dsrt_tpu.models.mesh_gen import iss_standin_scene
    scene = iss_standin_scene(detail=args.detail)

    modes = ["off", "half", "quarter"]
    wanted = [w for w in args.only.split(",") if w]
    for mode in modes:
        if wanted and mode not in wanted:
            continue
        OPTS.leaf_split = mode
        from dsrt_tpu.render import lane_layout
        px, py, valid, _ = lane_layout(cfg.width, cfg.height)
        px, py, valid = jnp.asarray(px), jnp.asarray(py), jnp.asarray(valid)
        key = (args.detail, mode)
        dt, c = measure(scene, cfg, px, py, valid, key)
        mray = c["rays"] / dt / 1e6
        print(f"{mode:8s} {dt*1e3:7.1f} ms  {mray:6.2f} Mrays/s  "
              f"waves={c['waves']:6d} cvis={c['cvis']:8d} "
              f"ctst={c['ctst']:9d}", flush=True)
    OPTS.leaf_split = "auto"


if __name__ == "__main__":
    main()
