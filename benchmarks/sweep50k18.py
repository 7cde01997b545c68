"""Eighteenth ISS-scale sweep: dual-union leaf scan (exec_opts.
dual_union) A/B at 47.7k tris.  Half-leaf mode scans dual-entered
ranges (~7% of entered ranges) once over the union range at full rows
instead of twice at half rows — same MT row work, half the tile
load+roll chains for those ranges.  Run: python benchmarks/sweep50k18.py
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
    for du in (False, True, False, True):
        OPTS.dual_union = du
        dt, rays = measure(scene, cfg, px, py, valid, (12, du))
        print(f"dual_union={int(du)}  {dt*1e3:7.1f} ms  "
              f"{rays/dt/1e6:6.2f} Mrays/s", flush=True)
    OPTS.dual_union = True


if __name__ == "__main__":
    main()
