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

import numpy as np
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
    # camera shutter: one extra draw per regenerated sample (after jitter
    # and aperture), driving moving-sphere centers (cfg.time0/time1)
    with_time = cfg.time1 > cfg.time0

    def make_body(px, py, valid, slot):
        def body(c):
            accum = c["accum"]
            L, thr = c["L"], c["thr"]
            ro, rd = c["ro"], c["rd"]
            state, alive = c["state"], c["alive"]
            depth, scnt = c["depth"], c["scnt"]
            nrays = c["nrays"]

            # ---- regeneration: idle lanes start their next sample ----
            need = valid & ~alive & (scnt < spp_local)
            jxu, state = rngmod.draw(state, need)
            jyu, state = rngmod.draw(state, need)
            s_global = (scnt * batch).astype(jnp.float32) + slot.astype(
                jnp.float32)
            jx = (s_global + jxu) / jnp.float32(spp_total)
            jy = (s_global + jyu) / jnp.float32(spp_total)
            cro, crd, state = camera_rays(cam, px, py, jx, jy, state, need,
                                          cfg.aperture > 0)
            z = jnp.zeros_like(jx)
            o = jnp.ones_like(jx)
            if with_time:
                ut, state = rngmod.draw(state, need)
                c["time"] = jnp.where(
                    need, cfg.time0 + ut * (cfg.time1 - cfg.time0),
                    c["time"])
            ro = vwhere(need, cro, ro)
            rd = vwhere(need, crd, rd)
            L = vwhere(need, V3(z, z, z), L)
            thr = vwhere(need, V3(o, o, o), thr)
            depth = jnp.where(need, 0, depth)
            scnt = scnt + need.astype(jnp.int32)
            alive = alive | need

            # ---- one path segment ------------------------------------
            rr_mask = alive & (depth >= cfg.rr_start_depth)
            L, thr, ro, rd, state, alive2, nr = bounce_step(
                scene, cfg, L, thr, ro, rd, state, alive, rr_mask,
                count_rays=count_rays,
                time=c.get("time") if with_time else None)
            depth = depth + alive.astype(jnp.int32)
            alive2 = alive2 & (depth < max_depth)

            # ---- bank completed samples ------------------------------
            died = alive & ~alive2
            accum = vwhere(died, accum + clamp01(L), accum)

            out = dict(accum=accum, L=L, thr=thr, ro=ro, rd=rd,
                       state=state, alive=alive2, depth=depth, scnt=scnt,
                       nrays=nrays + nr)
            if with_time:
                out["time"] = c["time"]
            return out

        return body

    def busy(c, valid):
        return c["alive"] | (valid & (c["scnt"] < spp_local))

    init = dict(accum=V3(zero, zero, zero), L=V3(zero, zero, zero),
                thr=V3(one, one, one), ro=V3(zero, zero, zero),
                rd=V3(zero, zero, one), state=state0,
                alive=jnp.zeros(shape, bool), depth=izero, scnt=izero,
                nrays=jnp.int32(0))
    if with_time:
        init["time"] = zero

    # ---- phase 1: full width until the busy set fits the drain pool ----
    # Deep-space frames leave ~10% of lanes (the mesh pixels) grinding
    # many more waves than the background; draining them at 1/16 width
    # removes most of the tail's full-width wave cost.
    cap_rows = max(shape[0] // 16, 1)
    cap = cap_rows * shape[1]

    def cond1(c):
        n_busy = jnp.sum(busy(c, valid).astype(jnp.int32))
        return n_busy > cap

    out = lax.while_loop(cond1, make_body(px, py, valid, slot), init)

    # ---- compaction into the drain pool ---------------------------------
    order = jnp.argsort(~busy(out, valid).reshape(-1))[:cap]

    def take(a):
        return a.reshape(-1)[order].reshape(cap_rows, shape[1])

    small = dict(
        accum=V3(take(out["accum"].x), take(out["accum"].y),
                 take(out["accum"].z)),
        L=V3(take(out["L"].x), take(out["L"].y), take(out["L"].z)),
        thr=V3(take(out["thr"].x), take(out["thr"].y), take(out["thr"].z)),
        ro=V3(take(out["ro"].x), take(out["ro"].y), take(out["ro"].z)),
        rd=V3(take(out["rd"].x), take(out["rd"].y), take(out["rd"].z)),
        state=take(out["state"]), alive=take(out["alive"]),
        depth=take(out["depth"]), scnt=take(out["scnt"]),
        nrays=out["nrays"])
    if with_time:
        small["time"] = take(out["time"])
    px_s, py_s = take(px), take(py)
    valid_s, slot_s = take(valid), take(slot)

    def cond2(c):
        return jnp.any(busy(c, valid_s))

    out2 = lax.while_loop(cond2, make_body(px_s, py_s, valid_s, slot_s),
                          small)

    # ---- scatter the drained lanes' accumulators back -------------------
    # full-pool accum minus the compacted lanes' stale copies, plus final
    nacc = out["accum"]
    flat = dict(x=nacc.x.reshape(-1), y=nacc.y.reshape(-1),
                z=nacc.z.reshape(-1))
    fx = flat["x"].at[order].set(out2["accum"].x.reshape(-1))
    fy = flat["y"].at[order].set(out2["accum"].y.reshape(-1))
    fz = flat["z"].at[order].set(out2["accum"].z.reshape(-1))
    accum = V3(fx.reshape(shape), fy.reshape(shape), fz.reshape(shape))
    return accum, out2["nrays"]


def trace_queue(scene, cfg, cam: Camera, width: int, height: int,
                pool_shape, count_rays: bool = False, y0: int = 0):
    """Global-work-queue wavefront: true load balancing.

    Per-lane regeneration (`trace_accumulate`) binds each lane to one
    pixel, so the render tail is dominated by the most expensive pixels
    while background lanes idle (~4-8% occupancy on deep-space frames).
    Here the work units are all (pixel, sample) pairs of the frame in one
    global queue; ANY idle lane pops the next unit via an exclusive prefix
    sum over dead lanes, and completed samples are banked into a per-pixel
    accumulator with a scatter-add (measured ~0.03 ms for 3M updates on
    v5e — effectively free).  Occupancy stays ~100% until the final drain,
    so wave count tracks total path segments / pool size.

    Work ids are stratum-major (sid = s * npix + pix), so a regeneration
    burst fills lanes with *consecutive pixels of one sample stratum* —
    coherent packets for the traversal kernel.

    Returns (accum (npix, 3) f32 sum of clamp01(L) per pixel, nrays).
    """
    shape = pool_shape
    zero = jnp.zeros(shape, jnp.float32)
    one = jnp.ones(shape, jnp.float32)
    izero = jnp.zeros(shape, jnp.int32)

    npix = width * height
    spp = cfg.resolved_spp()
    total = npix * spp
    pool = int(np.prod(shape)) if hasattr(shape, "__len__") else int(shape)
    if total + pool >= 2 ** 31:
        raise ValueError(
            f"work-queue id space {total} + pool {pool} overflows int32; "
            "render.render_frame_queue auto-bands the frame — pass a "
            "band height such that width*band_h*spp fits int32")
    max_depth = cfg.max_depth if cfg.max_depth > 0 else 12
    with_time = cfg.time1 > cfg.time0

    def cond(c):
        return jnp.any(c["alive"]) | (c["base"] < total)

    def body(c):
        accum = c["accum"]
        L, thr = c["L"], c["thr"]
        ro, rd = c["ro"], c["rd"]
        state, alive = c["state"], c["alive"]
        depth, pix = c["depth"], c["pix"]
        base, nrays = c["base"], c["nrays"]

        # ---- pop work units for idle lanes ---------------------------
        dead = ~alive
        deadf = dead.reshape(-1).astype(jnp.int32)
        offs = (jnp.cumsum(deadf) - deadf).reshape(dead.shape)
        sid = base + offs
        assign = dead & (sid < total)
        s_idx = sid // npix
        pix_new = sid - s_idx * npix
        pix = jnp.where(assign, pix_new, pix)
        base = jnp.minimum(base + jnp.sum(deadf), total)

        pxl = pix % width
        pyl = pix // width + y0   # y0: horizontal-band offset (auto-banding)
        seed = rngmod.seed_pixels(pxl, pyl, cam.width, scene.seed)
        fresh = seed ^ (s_idx.astype(jnp.uint32) * jnp.uint32(SLOT_SEED_MIX))
        state = jnp.where(assign, fresh, state)

        jxu, state = rngmod.draw(state, assign)
        jyu, state = rngmod.draw(state, assign)
        sf = s_idx.astype(jnp.float32)
        jx = (sf + jxu) / jnp.float32(spp)
        jy = (sf + jyu) / jnp.float32(spp)
        cro, crd, state = camera_rays(cam, pxl, pyl, jx, jy, state, assign,
                                      cfg.aperture > 0)
        z = jnp.zeros_like(jx)
        o = jnp.ones_like(jx)
        if with_time:
            ut, state = rngmod.draw(state, assign)
            c["time"] = jnp.where(
                assign, cfg.time0 + ut * (cfg.time1 - cfg.time0),
                c["time"])
        ro = vwhere(assign, cro, ro)
        rd = vwhere(assign, crd, rd)
        L = vwhere(assign, V3(z, z, z), L)
        thr = vwhere(assign, V3(o, o, o), thr)
        depth = jnp.where(assign, 0, depth)
        alive = alive | assign

        # ---- one path segment ----------------------------------------
        rr_mask = alive & (depth >= cfg.rr_start_depth)
        L, thr, ro, rd, state, alive2, nr = bounce_step(
            scene, cfg, L, thr, ro, rd, state, alive, rr_mask,
            count_rays=count_rays,
            time=c.get("time") if with_time else None)
        depth = depth + alive.astype(jnp.int32)
        alive2 = alive2 & (depth < max_depth)

        # ---- bank completed samples (scatter-add) --------------------
        died = alive & ~alive2
        Lc = clamp01(L)
        vals = jnp.stack([jnp.where(died, Lc.x, 0.0),
                          jnp.where(died, Lc.y, 0.0),
                          jnp.where(died, Lc.z, 0.0)], axis=-1)
        accum = accum.at[pix.reshape(-1)].add(
            vals.reshape(-1, 3), mode="drop")

        out = dict(accum=accum, L=L, thr=thr, ro=ro, rd=rd, state=state,
                   alive=alive2, depth=depth, pix=pix, base=base,
                   nrays=nrays + nr)
        if with_time:
            out["time"] = c["time"]
        return out

    init = dict(accum=jnp.zeros((npix, 3), jnp.float32),
                L=V3(zero, zero, zero), thr=V3(one, one, one),
                ro=V3(zero, zero, zero), rd=V3(zero, zero, one),
                state=jnp.zeros(shape, jnp.uint32),
                alive=jnp.zeros(shape, bool), depth=izero, pix=izero,
                base=jnp.int32(0), nrays=jnp.int32(0))
    if with_time:
        init["time"] = zero

    # ---- phase 1: full pool while work remains or too many survivors ----
    # The Russian-roulette tail (paths surviving to depth 30-50) would
    # otherwise cost dozens of nearly-empty full-width waves; once the
    # queue is exhausted and survivors fit, they are compacted into a
    # 16x smaller pool and drained with cheap waves.
    cap_rows = max(shape[0] // 16, 1)
    cap = cap_rows * shape[1]

    def cond1(c):
        n_alive = jnp.sum(c["alive"].astype(jnp.int32))
        return (c["base"] < total) | (n_alive > cap)

    out = lax.while_loop(cond1, body, init)

    # ---- compaction: survivors to the front, slice the small pool -------
    order = jnp.argsort(~out["alive"].reshape(-1))[:cap]

    def take(a):
        return a.reshape(-1)[order].reshape(cap_rows, shape[1])

    small = dict(
        accum=out["accum"],
        L=V3(take(out["L"].x), take(out["L"].y), take(out["L"].z)),
        thr=V3(take(out["thr"].x), take(out["thr"].y), take(out["thr"].z)),
        ro=V3(take(out["ro"].x), take(out["ro"].y), take(out["ro"].z)),
        rd=V3(take(out["rd"].x), take(out["rd"].y), take(out["rd"].z)),
        state=take(out["state"]), alive=take(out["alive"]),
        depth=take(out["depth"]), pix=take(out["pix"]),
        base=out["base"], nrays=out["nrays"])
    if with_time:
        small["time"] = take(out["time"])

    def cond2(c):
        return jnp.any(c["alive"])

    out2 = lax.while_loop(cond2, body, small)
    return out2["accum"], out2["nrays"]
