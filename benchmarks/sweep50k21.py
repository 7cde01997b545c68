"""Twenty-first ISS-scale sweep: wml x regen_thresh interaction check
at the new pops=4 default (sweep50k19/20).  wml was tuned at pops6
(16 ~= 24 at the noise edge); regen 0.25 was tuned at the r3-early
engine.  47.7k tris, 800x450 @ 16 spp.  Run: python benchmarks/sweep50k21.py
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

    for wml in (16, 24):
        scene = iss_standin_scene(detail=12, wide_max_leaf=wml)
        dt, rays = measure(scene, cfg, px, py, valid, (21, "wml", wml),
                           reps=3)
        print(f"wml{wml:2d} regen0.25  {dt*1e3:7.1f} ms  "
              f"{rays/dt/1e6:6.2f} Mrays/s", flush=True)
    scene = iss_standin_scene(detail=12)
    for rt in (0.125, 0.5):
        OPTS.regen_thresh = rt
        dt, rays = measure(scene, cfg, px, py, valid, (21, "rt", rt),
                           reps=3)
        print(f"wml16 regen{rt:5.3f}  {dt*1e3:7.1f} ms  "
              f"{rays/dt/1e6:6.2f} Mrays/s", flush=True)
    OPTS.regen_thresh = 0.25


if __name__ == "__main__":
    main()
