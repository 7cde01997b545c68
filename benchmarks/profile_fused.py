"""Perf triage for the fused megakernel: exact visit/test telemetry.

Prints, for the headline bench scene, where the frame time goes:
node visits and leaf triangle tests for the closest-hit and sun-shadow
passes (exact in-kernel counters), wave counts, and the implied
per-visit / per-test cost.  Run on the real chip:

    python benchmarks/profile_fused.py [--spp 32] [--detail 4]
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

from dsrt_tpu.config import RenderConfig
from dsrt_tpu.models.mesh_gen import iss_standin_scene
from dsrt_tpu.ops.camera import point_camera_at
from dsrt_tpu.render import lane_layout


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=32)
    ap.add_argument("--detail", type=int, default=4)
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=450)
    ap.add_argument("--sun", type=int, default=1)
    args = ap.parse_args()

    cfg = RenderConfig(width=args.width, height=args.height, spp=args.spp,
                       max_depth=50)
    scene = iss_standin_scene(detail=args.detail)
    if not args.sun:
        import dataclasses
        scene = dataclasses.replace(scene, sun_enabled=False)
    cam = point_camera_at((40.0, 60.0, 190.0), (0.0, 0.0, 0.0),
                          vfov=cfg.vfov, width=args.width, height=args.height)
    px, py, valid, _ = lane_layout(cfg.width, cfg.height)
    px, py, valid = jnp.asarray(px), jnp.asarray(py), jnp.asarray(valid)

    from functools import partial

    @partial(jax.jit, static_argnames=("cfg",))
    def run(scene, cfg, cam, px, py, valid):
        from dsrt_tpu.ops.pallas_path import trace_fused
        return trace_fused(scene, cfg, cam, px, py, valid,
                           return_stats=True)

    accum, nr, stats = run(scene, cfg, cam, px, py, valid)
    accum.x.block_until_ready()
    # fresh camera per rep (axon result-cache busting), min-of-3, and a
    # hard floor so a cache hit can never pass as a measurement
    # NOTE: the axon result cache persists ACROSS PROCESSES keyed on input
    # values — a fixed eps schedule replays earlier runs' inputs and times
    # cache hits.  Salt the perturbation with wall-clock time.
    salt = (time.time() % 1.0) * 1e-3
    dt = None
    for rep in range(3):
        eps = salt + (rep + 1) * 1e-4
        cam2 = point_camera_at((40.0 + eps, 60.0, 190.0), (0.0, 0.0, 0.0),
                               vfov=40.0,
                               width=args.width, height=args.height)
        t0 = time.perf_counter()
        accum, nr, stats = run(scene, cfg, cam2, px, py, valid)
        # block_until_ready can return EARLY under the axon tunnel; the
        # reliable completion fence is fetching a device-computed scalar
        float(jnp.sum(accum.x))
        d = time.perf_counter() - t0
        if d < 0.010:
            print(f"  rep {rep}: {d*1e3:.2f} ms — CACHE HIT, discarded")
            continue
        dt = d if dt is None else min(dt, d)
    if dt is None:
        raise RuntimeError("all reps were cache hits; no measurement")

    s = np.asarray(jax.device_get(stats), np.int64)
    nrays, waves, cvis, ctst, svis, stst = (s[:, i].sum() for i in range(6))
    n_blocks = s.shape[0]
    print(f"scene: n_tris={scene.n_tris} n_nodes={scene.n_nodes} "
          f"max_leaf={scene.max_leaf}")
    print(f"frame {args.width}x{args.height}@{args.spp}spp: {dt*1e3:.1f} ms "
          f"({nrays/dt/1e6:.1f} Mrays/s), blocks={n_blocks}, "
          f"waves total={waves} (avg {waves/n_blocks:.1f}/block)")
    print(f"rays: {nrays}  ({nrays/waves:.0f}/wave avg over blocks)")
    print(f"closest-hit: visits={cvis} ({cvis/waves:.1f}/wave), "
          f"tri-tests={ctst} ({ctst/waves:.1f}/wave)")
    print(f"sun-shadow : visits={svis} ({svis/waves:.1f}/wave), "
          f"tri-tests={stst} ({stst/waves:.1f}/wave)")
    tot_vis = cvis + svis
    tot_tst = ctst + stst
    print(f"total visits={tot_vis} tests={tot_tst}")
    print(f"implied cost if visits dominate: {dt/tot_vis*1e9:.0f} ns/visit")
    print(f"implied cost if tests dominate : {dt/tot_tst*1e9:.0f} ns/test")
    # vector-op floor @ ~940MHz, block rows/8 vregs per op
    from dsrt_tpu.exec_opts import OPTS
    vregs = OPTS.block_h // 8
    visit_ops, test_ops = 25, 45
    floor = (tot_vis * visit_ops + tot_tst * test_ops) * vregs / 0.94e9
    print(f"VPU floor estimate ({visit_ops} ops/visit, {test_ops} ops/test, "
          f"{vregs} vregs): {floor*1e3:.1f} ms  "
          f"(measured {dt*1e3:.1f} ms, ratio {dt/floor:.2f}x)")


if __name__ == "__main__":
    main()
