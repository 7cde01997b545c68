"""Nineteenth ISS-scale sweep: knob re-tune at the CURRENT engine
state (SBVH + half-split + wml16 + uvrec).  pops/sun_pops/leaf_tail
were last tuned on earlier engine generations; wml16's re-tune showed
optima move when engine balance changes.  47.7k tris, 800x450 @ 16
spp, fresh camera per rep, min-of-3.  Run: python benchmarks/sweep50k19.py
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

    base = dict(pops=OPTS.pops, sun_pops=OPTS.sun_pops,
                leaf_tail=OPTS.leaf_tail)
    variants = [("baseline", {})]
    variants += [(f"pops{p}", {"pops": p}) for p in (4, 8)]
    variants += [(f"sun_pops{s}", {"sun_pops": s}) for s in (1, 3)]
    variants += [(f"leaf_tail={t}", {"leaf_tail": t})
                 for t in ("pad", "single")]
    for name, kv in variants:
        for k, v in base.items():
            setattr(OPTS, k, v)
        for k, v in kv.items():
            setattr(OPTS, k, v)
        dt, rays = measure(scene, cfg, px, py, valid, (19, name))
        print(f"{name:16s} {dt*1e3:7.1f} ms  {rays/dt/1e6:6.2f} Mrays/s",
              flush=True)
    for k, v in base.items():
        setattr(OPTS, k, v)


if __name__ == "__main__":
    main()
