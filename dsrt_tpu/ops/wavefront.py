"""Persistent wavefront with per-lane sample regeneration (throughput mode).

The parity renderer (`trace_paths`) runs samples sequentially and its bounce
while_loop pays a full-width wave for every depth level even when most lanes
have terminated — the TPU analogue of CUDA warp divergence (SURVEY.md §7
"hard part" #5 / BASELINE north_star "sort-and-compact").  This module is
the compaction-equivalent design: occupancy is kept high by *regeneration*
instead of compaction.  Every lane owns one pixel and immediately starts its
next sample the moment its current path terminates, banking clamp01(L) into
a per-lane accumulator (a pure vector op — no scatter).  The wave count then
tracks the real path-segment work (~spp x mean depth) instead of
spp x max_depth.

RNG: per-(pixel, sample-slot) decorrelated LCG streams — statistically
equivalent to the reference, not stream-identical (the reference reserved
this as rng_mode, inc/gpu_scene.h:103).  The parity mode remains the
verification path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.lax as lax

from dsrt_tpu.ops import rng as rngmod
from dsrt_tpu.ops.camera import Camera, camera_rays
from dsrt_tpu.ops.linalg import V3, clamp01, where as vwhere
from dsrt_tpu.ops.shade import bounce_step

SLOT_SEED_MIX = 0x9E3779B9


def trace_accumulate(scene, cfg, cam: Camera, px, py, valid, slot,
                     spp_local: int, count_rays: bool = False):
    """Trace `spp_local` samples per lane with regeneration.

    px/py/valid/slot are lane arrays (any 2D shape); `slot` is the
    sample-slot id (uint32) so a pixel's B concurrent lanes decorrelate.
    Sample s of slot b covers global stratum s*B + b.

    Returns (accum V3 = sum over samples of clamp01(L), nrays int32).
    """
    shape = px.shape
    zero = jnp.zeros(shape, jnp.float32)
    one = jnp.ones(shape, jnp.float32)
    izero = jnp.zeros(shape, jnp.int32)

    max_depth = cfg.max_depth if cfg.max_depth > 0 else 12
    spp_total = cfg.resolved_spp()
    batch = spp_total // max(spp_local, 1)

    seed = rngmod.seed_pixels(px, py, cam.width, scene.seed)
    state0 = seed ^ (slot.astype(jnp.uint32) * jnp.uint32(SLOT_SEED_MIX))

    def cond(c):
        return jnp.any(c["alive"]) | jnp.any(valid & (c["scnt"] < spp_local))

    def body(c):
        accum = c["accum"]
        L, thr = c["L"], c["thr"]
        ro, rd = c["ro"], c["rd"]
        state, alive = c["state"], c["alive"]
        depth, scnt = c["depth"], c["scnt"]
        nrays = c["nrays"]

        # ---- regeneration: idle lanes start their next sample --------
        need = valid & ~alive & (scnt < spp_local)
        jxu, state = rngmod.draw(state, need)
        jyu, state = rngmod.draw(state, need)
        s_global = (scnt * batch).astype(jnp.float32) + slot.astype(
            jnp.float32)
        jx = (s_global + jxu) / jnp.float32(spp_total)
        jy = (s_global + jyu) / jnp.float32(spp_total)
        cro, crd, state = camera_rays(cam, px, py, jx, jy, state, need,
                                      cfg.aperture > 0)
        ro = vwhere(need, cro, ro)
        rd = vwhere(need, crd, rd)
        L = vwhere(need, V3(zero, zero, zero), L)
        thr = vwhere(need, V3(one, one, one), thr)
        depth = jnp.where(need, 0, depth)
        scnt = scnt + need.astype(jnp.int32)
        alive = alive | need

        # ---- one path segment ----------------------------------------
        rr_mask = alive & (depth >= cfg.rr_start_depth)
        L, thr, ro, rd, state, alive2, nr = bounce_step(
            scene, cfg, L, thr, ro, rd, state, alive, rr_mask,
            count_rays=count_rays)
        depth = depth + alive.astype(jnp.int32)
        alive2 = alive2 & (depth < max_depth)

        # ---- bank completed samples ----------------------------------
        died = alive & ~alive2
        accum = vwhere(died, accum + clamp01(L), accum)

        return dict(accum=accum, L=L, thr=thr, ro=ro, rd=rd, state=state,
                    alive=alive2, depth=depth, scnt=scnt, nrays=nrays + nr)

    init = dict(accum=V3(zero, zero, zero), L=V3(zero, zero, zero),
                thr=V3(one, one, one), ro=V3(zero, zero, zero),
                rd=V3(zero, zero, one), state=state0,
                alive=jnp.zeros(shape, bool), depth=izero, scnt=izero,
                nrays=jnp.int32(0))

    out = lax.while_loop(cond, body, init)
    return out["accum"], out["nrays"]
