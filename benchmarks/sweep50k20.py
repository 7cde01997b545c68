"""Twentieth ISS-scale sweep: confirm the sweep50k19 contenders
head-to-head with repeats (pops 4 vs 6 x sun_pops 1 vs 2), 47.7k tris
800x450@16spp.  Run: python benchmarks/sweep50k20.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from dsrt_tpu.config import RenderConfig
from dsrt_tpu.exec_opts import OPTS
from sweep50k15 import measure


def main():
    cfg = RenderConfig(width=800, height=450, spp=16, max_depth=50)
    from dsrt_tpu.models.mesh_gen import iss_standin_scene
    from dsrt_tpu.render import lane_layout
    px, py, valid, _ = lane_layout(cfg.width, cfg.height)
    px, py, valid = jnp.asarray(px), jnp.asarray(py), jnp.asarray(valid)
    scene = iss_standin_scene(detail=12)

    grid = [(6, 2), (4, 2), (6, 1), (4, 1)]
    for rep in range(2):
        for p, s in grid:
            OPTS.pops, OPTS.sun_pops = p, s
            dt, rays = measure(scene, cfg, px, py, valid,
                               (20, p, s), reps=3)
            print(f"pops{p}/sun{s} rep{rep}  {dt*1e3:7.1f} ms  "
                  f"{rays/dt/1e6:6.2f} Mrays/s", flush=True)
    OPTS.pops, OPTS.sun_pops = 6, 2


if __name__ == "__main__":
    main()
