"""Seventeenth ISS-scale sweep: in-record-UV engine (exec_opts.uvrec)
A/B on the textured 47.7k-tri scene.

sweep50k15 decomposed the textured-scene tax: ~28 ms/frame of
IN-ENGINE work (aux tile load+roll + 3 extra candidate planes +
per-accept UV/normal interpolation), not the texture-pool gather.
uvrec moves per-vertex UVs into the MT record's 3 spare lanes as bf16
pairs and resolves the texture id from the winning material row, so
the flat-textured leaf engine loads NO aux tiles and carries one
fewer candidate plane.  Run: python benchmarks/sweep50k17.py
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from dsrt_tpu.config import RenderConfig
from dsrt_tpu.exec_opts import OPTS
from sweep50k15 import measure, _tex


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--detail", type=int, default=12)
    args = ap.parse_args()

    cfg = RenderConfig(width=800, height=450, spp=args.spp, max_depth=50)
    from dsrt_tpu.models.mesh_gen import iss_standin_scene
    from dsrt_tpu.render import lane_layout
    px, py, valid, _ = lane_layout(cfg.width, cfg.height)
    px, py, valid = jnp.asarray(px), jnp.asarray(py), jnp.asarray(valid)

    import tempfile
    for size in (16, 256):
        with tempfile.TemporaryDirectory() as td:
            tp = os.path.join(td, "t.png")
            _tex(tp, size)
            scene = iss_standin_scene(detail=args.detail, tex_path=tp)
        for uvrec in (False, True):
            OPTS.uvrec = uvrec
            dt, rays = measure(scene, cfg, px, py, valid,
                               (args.detail, size, uvrec))
            print(f"tex {size:4d} uvrec={int(uvrec)}  {dt*1e3:7.1f} ms  "
                  f"{rays/dt/1e6:6.2f} Mrays/s", flush=True)
    OPTS.uvrec = True
    # untextured control (uvrec is a no-op there)
    scene = iss_standin_scene(detail=args.detail)
    dt, rays = measure(scene, cfg, px, py, valid, (args.detail, "plain"))
    print(f"plain          {dt*1e3:7.1f} ms  {rays/dt/1e6:6.2f} Mrays/s",
          flush=True)


if __name__ == "__main__":
    main()
