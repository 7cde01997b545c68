"""Thirteenth ISS-scale sweep: block height x row-group leaf masking.

block_h 16 halves the wave count (7422 -> 3909) but at half-masking its
8-row groups double the leaf row work (182 ms, ROADMAP).  Quarter
masking at block_h 16 restores the measured-good 4-row group
granularity while keeping the halved wave count — if most ranges stay
single-group, leaf row work holds and the per-wave glue halves.
Run: python benchmarks/sweep50k13.py
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

    variants = [("b8_half", 8, "half"), ("b16_half", 16, "half"),
                ("b16_quarter", 16, "quarter"),
                ("b16_eighth", 16, "eighth"),
                ("b32_eighth", 32, "eighth")]
    wanted = [w for w in args.only.split(",") if w]
    for name, bh, split in variants:
        if wanted and name not in wanted:
            continue
        OPTS.block_h = bh
        OPTS.leaf_split = split
        from dsrt_tpu.render import lane_layout
        px, py, valid, _ = lane_layout(cfg.width, cfg.height)
        px, py, valid = jnp.asarray(px), jnp.asarray(py), jnp.asarray(valid)
        key = (args.detail, name)
        dt, c = measure(scene, cfg, px, py, valid, key)
        mray = c["rays"] / dt / 1e6
        print(f"{name:12s} {dt*1e3:7.1f} ms  {mray:6.2f} Mrays/s  "
              f"waves={c['waves']:6d} cvis={c['cvis']:8d} "
              f"ctst={c['ctst']:9d}", flush=True)
    OPTS.block_h = 8
    OPTS.leaf_split = "auto"


if __name__ == "__main__":
    main()
