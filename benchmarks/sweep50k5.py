"""Fifth ISS-scale sweep: per-row traversal (exec_opts.rowtrav) A/B vs
the block-union walk, row_pops sweep, and regen re-check (per-row walks
may shift the coherence tradeoff)."""

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
from dsrt_tpu.render import lane_layout

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
        print(f"    try {tries}: {dt*1e3:.2f} ms", flush=True)
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
    args = ap.parse_args()

    cfg = RenderConfig(width=800, height=450, spp=args.spp, max_depth=50)
    px, py, valid, _ = lane_layout(cfg.width, cfg.height)
    px, py, valid = jnp.asarray(px), jnp.asarray(py), jnp.asarray(valid)

    scenes = {}

    def scene_for(detail, wml):
        k = (detail, wml)
        if k not in scenes:
            from dsrt_tpu.models.mesh_gen import iss_standin_scene
            scenes[k] = iss_standin_scene(detail=detail, wide_max_leaf=wml)
        return scenes[k]

    NS = "nostream"
    combos = [  # (label, detail, wml, regen, mode, knob)
        # mode: NS+rowtrav row_pops via knob<0; stream tiles via knob>0
        ("d12 union", 12, 8, 0.25, NS, 0),
        ("d12 row rp2", 12, 8, 0.25, NS, -2),
        ("d12 row rp1", 12, 8, 0.25, NS, -1),
        ("d12 stream t4", 12, 8, 0.25, "stream", 4),
        ("d12 stream t2", 12, 8, 0.25, "stream", 2),
        ("d12 stream t6", 12, 8, 0.25, "stream", 6),
        ("d12 stream t8", 12, 8, 0.25, "stream", 8),
        ("d12 stream t4 wml16", 12, 16, 0.25, "stream", 4),
        ("d12 stream t4 r0.125", 12, 8, 0.125, "stream", 4),
        ("d4 union", 4, 8, 0.25, NS, 0),
        ("d4 stream t4", 4, 8, 0.25, "stream", 4),
        ("d4 stream t2", 4, 8, 0.25, "stream", 2),
    ]
    wanted = [w for w in args.only.split(",") if w]
    for label, detail, wml, regen, mode, knob in combos:
        if wanted and not any(w in label for w in wanted):
            continue
        scene = scene_for(detail, wml)
        OPTS.regen_thresh = regen
        OPTS.pops = 4
        OPTS.block_h = 8
        OPTS.defer_shadow = False
        OPTS.stream = mode == "stream"
        OPTS.stream_tiles = max(knob, 1)
        OPTS.rowtrav = knob < 0
        OPTS.row_pops = max(-knob, 1)
        key = (detail, wml, regen, mode, knob)
        dt, c = measure(scene, cfg, px, py, valid, key)
        mray = c["rays"] / dt / 1e6
        us_wave = dt * 1e6 / max(c["waves"], 1)
        print(f"{label:18s} {dt*1e3:7.1f} ms  {mray:6.2f} Mrays/s  "
              f"waves={c['waves']:6d} ({us_wave:5.1f} us/w) "
              f"cvis={c['cvis']:8d} ctst={c['ctst']:9d} "
              f"cidl={c['cidl']:9d} svis={c['svis']:7d} "
              f"stst={c['stst']:8d}", flush=True)


if __name__ == "__main__":
    main()
