"""Fifteenth ISS-scale sweep: textured-scene cost attribution.

iss50k_tex measures 41.4 vs 54.2 Mrays/s untextured (-24%).  Theory:
the in-kernel texture gather is a (128,128)x(128,3*Rp) one-hot matmul
per ray row per wave — cost linear in pool rows Rp (256x256 RGB ->
Rp=512 -> ~25M MAC/row/wave).  Sweep texture size to split the tax
into gather (Rp-scaling) vs shaded-leaf-engine overhead (Rp-flat).
Run: python benchmarks/sweep50k15.py
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
from dsrt_tpu.ops.camera import point_camera_at

import struct as _struct
BASE = (_struct.unpack("<I", os.urandom(4))[0] % 100000) * 1e-5


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
    return dt, int(s[:, 0].sum())


def _tex(path, size):
    from dsrt_tpu.utils.image_io import write_png
    y, x = np.mgrid[0:size, 0:size]
    img = np.stack([40 + 30 * ((x // 4 + y // 4) % 2),
                    np.full_like(x, 35), np.full_like(x, 120)], -1)
    write_png(path, img.astype(np.uint8))


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
    for size in (0, 16, 64, 256):
        with tempfile.TemporaryDirectory() as td:
            if size:
                tp = os.path.join(td, "t.png")
                _tex(tp, size)
                scene = iss_standin_scene(detail=args.detail, tex_path=tp)
            else:
                scene = iss_standin_scene(detail=args.detail)
        rp = (int(scene.tex_pool.shape[0]) // 3 + 127) // 128 if size else 0
        dt, rays = measure(scene, cfg, px, py, valid, (args.detail, size))
        print(f"tex {size:4d}  Rp={rp:4d}  {dt*1e3:7.1f} ms  "
              f"{rays/dt/1e6:6.2f} Mrays/s", flush=True)


def attribution():
    """texg dup: marginal cost of the whole per-wave texture gather
    branch (onehot build + transposes + matmuls + selects)."""
    from dsrt_tpu.exec_opts import OPTS
    cfg = RenderConfig(width=800, height=450, spp=16, max_depth=50)
    from dsrt_tpu.models.mesh_gen import iss_standin_scene
    from dsrt_tpu.render import lane_layout
    import tempfile
    px, py, valid, _ = lane_layout(cfg.width, cfg.height)
    px, py, valid = jnp.asarray(px), jnp.asarray(py), jnp.asarray(valid)
    for size in (16, 256):
        with tempfile.TemporaryDirectory() as td:
            tp = os.path.join(td, "t.png")
            _tex(tp, size)
            scene = iss_standin_scene(detail=12, tex_path=tp)
        for dup in ("", "texg"):
            OPTS.dup = dup
            dt, rays = measure(scene, cfg, px, py, valid,
                               (12, size, dup))
            print(f"tex {size:4d} dup={dup or '-':5s} {dt*1e3:7.1f} ms  "
                  f"{rays/dt/1e6:6.2f} Mrays/s", flush=True)
    OPTS.dup = ""


if __name__ == "__main__":
    import sys as _s
    if "--attr" in _s.argv:
        attribution()
    else:
        main()
