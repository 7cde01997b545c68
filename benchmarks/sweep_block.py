"""Fit the fused-kernel cost model: sweep block_h, record exact
visit/test counters + honest wall time (fresh camera values per rep to
defeat the axon result cache; block_h is part of the jit key).

    python benchmarks/sweep_block.py
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

from dsrt_tpu.config import RenderConfig
from dsrt_tpu.exec_opts import OPTS
from dsrt_tpu.models.mesh_gen import iss_standin_scene
from dsrt_tpu.ops.camera import point_camera_at
from dsrt_tpu.render import lane_layout

# unique camera offset per process so the axon result cache never hits
import os as _os
import struct as _struct
# per-process unique, collision-free across runs (time-based bases can
# collide with the axon result cache's keys across processes)
BASE = (_struct.unpack("<I", _os.urandom(4))[0] % 100000) * 1e-5


@partial(jax.jit, static_argnames=("cfg", "bh"))
def run(scene, cfg, cam, px, py, valid, bh):
    from dsrt_tpu.ops.pallas_path import trace_fused
    return trace_fused(scene, cfg, cam, px, py, valid, return_stats=True)


def measure(scene, cfg, px, py, valid, bh, reps=2):
    global BASE
    best = None
    for r in range(reps):
        BASE += 3.1e-3
        cam = point_camera_at((40.0 + BASE, 60.0, 190.0),
                              (0.0, 0.0, 0.0), vfov=cfg.vfov,
                              width=cfg.width, height=cfg.height)
        t0 = time.perf_counter()
        accum, nr, stats = run(scene, cfg, cam, px, py, valid, bh)
        accum.x.block_until_ready()
        dt = time.perf_counter() - t0
        if best is None or dt < best[0]:
            best = (dt, stats)
    dt, stats = best
    s = np.asarray(jax.device_get(stats), np.int64)
    return dt, {k: int(s[:, i].sum()) for i, k in enumerate(
        ("rays", "waves", "cvis", "ctst", "svis", "stst"))}, s.shape[0]


def main():
    global BASE
    cfg = RenderConfig(width=800, height=450, spp=32, max_depth=50)
    scene = iss_standin_scene(detail=4)
    px, py, valid, _ = lane_layout(cfg.width, cfg.height)
    px, py, valid = jnp.asarray(px), jnp.asarray(py), jnp.asarray(valid)

    for bh in (8, 16, 32, 64):
        OPTS.block_h = bh
        BASE += 3.1e-3
        cam = point_camera_at((40.0 + BASE, 60.0, 190.0), (0.0, 0.0, 0.0),
                              vfov=cfg.vfov, width=cfg.width,
                              height=cfg.height)
        accum, nr, stats = run(scene, cfg, cam, px, py, valid, bh)
        accum.x.block_until_ready()
        dt, c, nb = measure(scene, cfg, px, py, valid, bh)
        vregs = bh // 8
        mray = c["rays"] / dt / 1e6
        print(f"block_h={bh:3d}: {dt*1e3:7.1f} ms  {mray:6.2f} Mrays/s  "
              f"blocks={nb:4d} waves={c['waves']:6d} "
              f"cvis={c['cvis']:8d} ctst={c['ctst']:8d} "
              f"svis={c['svis']:7d} stst={c['stst']:7d} "
              f"vis_vreg={(c['cvis']+c['svis'])*vregs/1e6:7.1f}M "
              f"tst_vreg={(c['ctst']+c['stst'])*vregs/1e6:7.1f}M")
    OPTS.block_h = 32


if __name__ == "__main__":
    main()
