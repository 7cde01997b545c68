"""Twelfth ISS-scale sweep: leaf-engine tail handling (exec_opts.
leaf_tail).

The tile leaf engine retires 2 tiles per iteration and rounds every
range UP to pairs ("pad") — odd-tile ranges scan one fully-wasted
duplicate tile.  Entered leaf ranges at ISS scale are mostly 1-2 tiles,
so the pads may be a large slice of the 48 ms leaf-engine attribution
(benchmarks/sweep50k8.py).  Variants: "cond" = floor(n/2) pairs + a
lax.cond single-tile tail; "single" = 1 tile/iteration, no unroll.
All bit-identical.  Run: python benchmarks/sweep50k12.py
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from dsrt_tpu.config import RenderConfig
from dsrt_tpu.exec_opts import OPTS
from sweep50k11 import measure


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--only", default="")
    ap.add_argument("--detail", type=int, default=12)
    args = ap.parse_args()

    cfg = RenderConfig(width=800, height=450, spp=args.spp, max_depth=50)

    from dsrt_tpu.models.mesh_gen import iss_standin_scene
    scene = iss_standin_scene(detail=args.detail)

    modes = ["pad", "cond", "single"]
    wanted = [w for w in args.only.split(",") if w]
    for mode in modes:
        if wanted and mode not in wanted:
            continue
        OPTS.leaf_tail = mode
        from dsrt_tpu.render import lane_layout
        px, py, valid, _ = lane_layout(cfg.width, cfg.height)
        px, py, valid = jnp.asarray(px), jnp.asarray(py), jnp.asarray(valid)
        key = (args.detail, mode)
        dt, c = measure(scene, cfg, px, py, valid, key)
        mray = c["rays"] / dt / 1e6
        print(f"{mode:8s} {dt*1e3:7.1f} ms  {mray:6.2f} Mrays/s  "
              f"waves={c['waves']:6d} cvis={c['cvis']:8d} "
              f"ctst={c['ctst']:9d}", flush=True)
    OPTS.leaf_tail = "cond"


if __name__ == "__main__":
    main()
