"""Benchmark: Mrays/sec/chip on the ISS scene (BASELINE.json metric).

Renders the ISS stand-in scene (the NASA OBJ is not in the reference repo;
see models/mesh_gen.py) at the reference's 800x450 frame size with a
rendezvous-style camera/sun geometry, in the renderer's throughput mode
(8 concurrent samples per pixel, decorrelated LCG slots — the rng_mode the
reference reserved, inc/gpu_scene.h:103; the sequential parity mode is
validated against the scalar oracle by tests/test_render_golden.py).

The ray count is measured EXACTLY — every scene-intersection query
(primary, bounce, shadow) is counted inside the jitted loop — not
estimated.

Prints ONE JSON line:
    {"metric": "Mrays/sec/chip", "value": N, "unit": "Mrays/s",
     "vs_baseline": N / 50.0}
vs_baseline is against the driver-supplied north-star target of
50 Mrays/sec/chip on v5e (BASELINE.md; the reference publishes no numbers).
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

from dsrt_tpu.config import RenderConfig
from dsrt_tpu.models.mesh_gen import iss_standin_scene
from dsrt_tpu.ops.camera import point_camera_at
from dsrt_tpu.ops.wavefront import trace_accumulate
from dsrt_tpu.render import lane_layout

NORTH_STAR = 50.0  # Mrays/sec/chip on v5e (BASELINE.md)

import os

WIDTH, HEIGHT = 800, 450
BATCH = int(os.environ.get("DSRT_BENCH_BATCH", "4"))  # sample slots/pixel
SPP = 32        # timed samples per pixel
DETAIL = 4      # ~5.8k-triangle stand-in (ISS OBJ is tens of thousands)


@partial(jax.jit, static_argnames=("cfg", "spp_local", "count"))
def run_wavefront(scene, cam, pxb, pyb, validb, slot, cfg, spp_local, count):
    return trace_accumulate(scene, cfg, cam, pxb, pyb, validb, slot,
                            spp_local, count_rays=count)


def main() -> int:
    cfg = RenderConfig(width=WIDTH, height=HEIGHT, spp=SPP, max_depth=50)
    scene = iss_standin_scene(detail=DETAIL)
    # rendezvous-style viewpoint: ~200 m out, station fills the frame
    cam = point_camera_at((40.0, 60.0, 190.0), (0.0, 0.0, 0.0),
                          vfov=cfg.vfov, width=WIDTH, height=HEIGHT)
    px, py, valid, _ = lane_layout(WIDTH, HEIGHT)
    k = px.shape[0]
    pxb = jnp.tile(jnp.asarray(px), (BATCH, 1))
    pyb = jnp.tile(jnp.asarray(py), (BATCH, 1))
    validb = jnp.tile(jnp.asarray(valid), (BATCH, 1))
    slot = jnp.broadcast_to(
        jnp.repeat(jnp.arange(BATCH, dtype=jnp.uint32), k)[:, None],
        pxb.shape)
    spp_local = SPP // BATCH

    # compile + warm both variants; exact ray count from counting variant
    # (identical RNG schedule => identical ray count in the timed run)
    accum, nr = run_wavefront(scene, cam, pxb, pyb, validb, slot, cfg,
                              spp_local, True)
    exact = int(jax.device_get(nr))
    accum, _ = run_wavefront(scene, cam, pxb, pyb, validb, slot, cfg,
                             spp_local, False)
    accum.x.block_until_ready()

    # timed pass
    t0 = time.perf_counter()
    accum, _ = run_wavefront(scene, cam, pxb, pyb, validb, slot, cfg,
                             spp_local, False)
    accum.x.block_until_ready()
    dt = time.perf_counter() - t0

    mrays = exact / dt / 1e6
    result = {
        "metric": "Mrays/sec/chip",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / NORTH_STAR, 4),
        "detail": {
            "scene": f"iss_standin_detail{DETAIL}",
            "n_tris": scene.n_tris,
            "frame": f"{WIDTH}x{HEIGHT}",
            "spp_timed": SPP,
            "spp_batch": BATCH,
            "mode": "wavefront-regeneration",
            "rays": exact,
            "seconds": round(dt, 3),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
