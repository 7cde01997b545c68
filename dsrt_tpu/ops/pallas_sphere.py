"""Fused persistent path-tracing megakernel for SPHERE scenes (Pallas TPU).

The tri-scene megakernel (ops/pallas_path.py) covers the flagship ISS
pipeline; this sibling covers the other BASELINE scene class — sphere
geometry with constant media, procedural textures, and sphere area
lights (RTiOW smoke + volumetric configs) — which previously ran the
split XLA wavefront at ~10 Mrays/s.

Same execution shape as pallas_path: one `pallas_call` per frame, each
grid step owns a pixel block and runs the whole sample loop on-core.
Geometry is tiny (N spheres/media unrolled from SMEM scalar params — no
BVH), so the kernel is dominated by the shading chain; the win over the
split path is killing the per-wave XLA glue and full-width occupancy
tax.

Behavior contract: the per-pixel LCG draw schedule of the parity
renderer (ops/shade.py bounce_step / trace_paths), reproduced draw for
draw on masked lanes:

- RR draw on depth >= rr_start lanes (src/gpu_render.cu:727-738)
- one draw PER MEDIUM on every intersection query's active lanes
  (ops/trace.py media_pass — including sun-shadow queries)
- medium scatter: rejection-sampled unit vector (3 draws/attempt)
- metal fuzz rejection draws, dielectric reflect/refract draw
- mixture: choose draw (diffuse), light-pick + 2 uniforms (light
  branch), cosine pair (BRDF branch), with the reference's asymmetric
  0.5-mixture pdfs (src/gpu_render.cu:869-918)

Scope (see `sphere_fused_supported`): no triangles/quads, <= MAX_SPH
spheres, <= MAX_MED media, no image textures; checker/marble/noise
procedural textures evaluate in-kernel with the gather-free
hash-gradient Perlin of ops/textures.py.  Thin-lens DOF (aperture > 0,
inc/camera.h:35-61) and moving-sphere motion blur (center-as-ray,
inc/sphere.h:143-146; one shutter-time draw per sample after the
jitter/aperture draws, ops/../render.py sample_body) run in-kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import jax.lax as lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import numpy as np

from dsrt_tpu.exec_opts import OPTS as _OPTS
from dsrt_tpu.ops.linalg import V3
from dsrt_tpu.ops.pallas_trace import backend_is_tpu, TILE_H, TILE_W
from dsrt_tpu.ops.pallas_path import (_draw, _rand_in_unit_sphere,
                                      _rand_in_unit_disk,
                                      _normalize3, _cosine_hemisphere,
                                      _pool_fetch_rows_ref, _tex_plane_rows,
                                      _tex_plane_rows_eff,
                                      _perlin_turb,
                                      TEX_ROWS_MAX, STATS_ROWS, PI_F)
from dsrt_tpu.models.materials import (DIELECTRIC, DIFFUSE_LIGHT, LAMBERTIAN,
                                       METAL, PTEX_CHECKER, PTEX_MARBLE,
                                       PTEX_NOISE)

MAX_SPH = 16          # unrolled sphere loop bound
MAX_MED = 4           # unrolled media loop bound
MAX_LIGHTS = 8        # unrolled light-select bound


def sphere_fused_supported(scene, cfg) -> bool:
    """Whether the sphere megakernel covers this scene/config."""
    if _OPTS.pallas == "off":
        return False
    return (scene.n_tris == 0 and scene.n_quads == 0
            and 0 < scene.n_spheres <= MAX_SPH
            and scene.n_media <= MAX_MED
            and scene.n_lights <= MAX_LIGHTS
            and not scene.has_image_tex
            # env-map sky: in-kernel when the pool fits the gather
            and (scene.env_tex < 0
                 or _tex_plane_rows_eff(scene) <= TEX_ROWS_MAX)
            and backend_is_tpu())


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _sphere_kernel(mat_ref, sph_ref, med_ref, lit_ref, cam_ref, sun_ref,
                   spp_ref, texT_ref, hdr_ref, px_ref, py_ref, valid_ref,
                   acc_r_ref, acc_g_ref, acc_b_ref, nray_ref,
                   *, n_sph: int, n_med: int, n_lights: int, n_mats: int,
                   max_depth: int, width: int, height: int, seed: int,
                   rr_start: int, rr_max_p: float, t_min: float,
                   t_max: float, sun_on: bool, has_ptex: bool,
                   env_id: int = -1, env_rot: float = 0.0,
                   env_scale: float = 1.0, aperture_on: bool = False,
                   motion_on: bool = False, time0: float = 0.0,
                   time1: float = 0.0, tex_chunk: int = 0,
                   tiled: bool = False):
    pxf = px_ref[...].astype(jnp.float32)
    pyf = py_ref[...].astype(jnp.float32)
    valid = valid_ref[...] > 0
    shape = pxf.shape

    tmin_f = jnp.float32(t_min)
    tmax_f = jnp.float32(t_max)
    inv_w1 = jnp.float32(1.0 / (width - 1))
    inv_h1 = jnp.float32(1.0 / (height - 1))
    spp = spp_ref[0]
    spp_f = spp.astype(jnp.float32)

    cam_ox, cam_oy, cam_oz = cam_ref[0], cam_ref[1], cam_ref[2]
    ll = (cam_ref[3], cam_ref[4], cam_ref[5])
    hz = (cam_ref[6], cam_ref[7], cam_ref[8])
    vt = (cam_ref[9], cam_ref[10], cam_ref[11])
    sdx, sdy, sdz = sun_ref[0], sun_ref[1], sun_ref[2]
    sun_r, sun_g, sun_b = sun_ref[3], sun_ref[4], sun_ref[5]
    sh_bias = sun_ref[6]

    # spp_ref[1]: runtime stream salt (0 = parity; adaptive chunks)
    state0 = (px_ref[...].astype(jnp.uint32)
              + py_ref[...].astype(jnp.uint32) * jnp.uint32(width)
              ) ^ jnp.uint32(seed & 0xFFFFFFFF) \
        ^ spp_ref[1].astype(jnp.uint32)

    f0 = jnp.zeros(shape, jnp.float32)
    f1 = jnp.ones(shape, jnp.float32)
    i0 = jnp.zeros(shape, jnp.int32)

    def _mat_field(bm, col):
        out = jnp.zeros(shape, jnp.float32)
        for m in range(n_mats):
            out = jnp.where(bm == m, mat_ref[16 * m + col], out)
        return out

    # ---------------- scene intersection (ops/trace.py semantics) ------

    def _closest_hit(rox, roy, roz, rdx, rdy, rdz, act, state, tm=None):
        """Sequential sphere loop (`<=` ties, later sphere wins,
        src/gpu_render.cu:529-545) then per-medium probabilistic hits
        (one draw per medium on `act` lanes).  With per-lane `tm`,
        moving centers evaluate at c0 + tm*(c2-c0) (ops/trace.py
        sphere_pass, inc/sphere.h:143-146).  Returns (hitm, t, mat,
        n flipped(3), front, medium, state)."""
        closest = jnp.where(act, tmax_f, tmin_f)
        bt, bm = closest, i0
        bhit = f0
        bnx, bny, bnz = f0, f0, f1
        bfr = f0
        bmed = jnp.full(shape, -1, jnp.int32)
        a = rdx * rdx + rdy * rdy + rdz * rdz
        for i in range(n_sph):
            cx, cy, cz = sph_ref[8 * i], sph_ref[8 * i + 1], sph_ref[8 * i + 2]
            r = sph_ref[8 * i + 3]
            mid = sph_ref[8 * i + 4].astype(jnp.int32)
            if motion_on and tm is not None:
                cx = cx + tm * (sph_ref[8 * i + 5] - cx)
                cy = cy + tm * (sph_ref[8 * i + 6] - cy)
                cz = cz + tm * (sph_ref[8 * i + 7] - cz)
            ocx, ocy, ocz = rox - cx, roy - cy, roz - cz
            half_b = ocx * rdx + ocy * rdy + ocz * rdz
            cq = ocx * ocx + ocy * ocy + ocz * ocz - r * r
            disc = half_b * half_b - a * cq
            has = disc >= 0.0
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            root1 = (-half_b - sq) / a
            root2 = (-half_b + sq) / a
            r1ok = (root1 >= tmin_f) & (root1 <= closest)
            root = jnp.where(r1ok, root1, root2)
            ok = has & (root >= tmin_f) & (root <= closest) & act
            inv_r = 1.0 / jnp.where(r != 0, r, 1.0)
            nx = (rox + root * rdx - cx) * inv_r
            ny = (roy + root * rdy - cy) * inv_r
            nz = (roz + root * rdz - cz) * inv_r
            front = (rdx * nx + rdy * ny + rdz * nz) < 0.0
            sgn = jnp.where(front, 1.0, -1.0)
            bt = jnp.where(ok, root, bt)
            bhit = jnp.where(ok, 1.0, bhit)
            bnx = jnp.where(ok, sgn * nx, bnx)
            bny = jnp.where(ok, sgn * ny, bny)
            bnz = jnp.where(ok, sgn * nz, bnz)
            bfr = jnp.where(ok, jnp.where(front, 1.0, 0.0), bfr)
            bm = jnp.where(ok, mid, bm)
            bmed = jnp.where(ok, -1, bmed)
            closest = jnp.where(ok, root, closest)

        if n_med > 0:
            rlen = jnp.sqrt(a)
            for i in range(n_med):
                base = 15 * i
                kind = med_ref[base]
                cx = med_ref[base + 1]
                cy = med_ref[base + 2]
                cz = med_ref[base + 3]
                r = med_ref[base + 4]
                ocx, ocy, ocz = rox - cx, roy - cy, roz - cz
                half_b = ocx * rdx + ocy * rdy + ocz * rdz
                cq = ocx * ocx + ocy * ocy + ocz * ocz - r * r
                disc = half_b * half_b - a * cq
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                s_has = disc > 0.0
                s_t0 = (-half_b - sq) / a
                s_t1 = (-half_b + sq) / a
                # box slab interval (unbounded range)
                t0 = jnp.full(shape, -3e38)
                t1 = jnp.full(shape, 3e38)
                for ax, (o, d) in enumerate(((rox, rdx), (roy, rdy),
                                             (roz, rdz))):
                    inv = 1.0 / d
                    ta = (med_ref[base + 5 + ax] - o) * inv
                    tb = (med_ref[base + 8 + ax] - o) * inv
                    t0 = jnp.maximum(t0, jnp.minimum(ta, tb))
                    t1 = jnp.minimum(t1, jnp.maximum(ta, tb))
                b_has = t1 > t0
                is_sph = kind == 0.0
                has = jnp.where(is_sph, jnp.where(s_has, 1.0, 0.0),
                                jnp.where(b_has, 1.0, 0.0)) > 0.5
                mt0 = jnp.where(is_sph, s_t0, t0)
                mt1 = jnp.where(is_sph, s_t1, t1)
                e0 = jnp.maximum(mt0, tmin_f)
                e1 = jnp.minimum(mt1, bt)
                inside = has & (e0 < e1) & act
                u, state = _draw(state, act)
                dist_inside = (e1 - e0) * rlen
                neg_inv_d = med_ref[base + 11]
                hit_dist = neg_inv_d * jnp.log(jnp.maximum(u, 1e-30))
                ok = inside & (hit_dist <= dist_inside)
                t = e0 + hit_dist / jnp.maximum(rlen, 1e-30)
                bt = jnp.where(ok, t, bt)
                bhit = jnp.where(ok, 1.0, bhit)
                bnx = jnp.where(ok, 1.0, bnx)
                bny = jnp.where(ok, 0.0, bny)
                bnz = jnp.where(ok, 0.0, bnz)
                bfr = jnp.where(ok, 1.0, bfr)
                bm = jnp.where(ok, 0, bm)
                bmed = jnp.where(ok, i, bmed)

        # hit flag accumulates per accepted primitive (ops/trace.py
        # hit.hit), so even a hit exactly at t_min registers
        return bhit > 0.5, bt, bm, bnx, bny, bnz, bfr, bmed, state

    # ---------------- the persistent wave loop -------------------------

    def wave_cond(c):
        alive = c[7] > 0.5
        scnt = c[9]
        return jnp.any(alive) | jnp.any(valid & (scnt < spp))

    def wave_body(c):
        (acc_r, acc_g, acc_b, Lr, Lg, Lb, thr3, alive_f, state, scnt,
         depth, ro3, rd3, nrays, waves, tm) = c
        thr_r, thr_g, thr_b = thr3
        rox, roy, roz = ro3
        rdx, rdy, rdz = rd3
        alive = alive_f > 0.5

        # ---- regeneration ----------------------------------------------
        need = valid & ~alive & (scnt < spp)
        jxu, state = _draw(state, need)
        jyu, state = _draw(state, need)
        sf = scnt.astype(jnp.float32)
        jx = (sf + jxu) / spp_f
        jy = (sf + jyu) / spp_f
        u = (pxf + jx) * inv_w1
        v = (pyf + jy) * inv_h1
        crx = ll[0] + u * hz[0] + v * vt[0] - cam_ox
        cry = ll[1] + u * hz[1] + v * vt[1] - cam_oy
        crz = ll[2] + u * hz[2] + v * vt[2] - cam_oz
        if aperture_on:
            # thin-lens DOF (ops/camera.generate_rays_dof in-kernel,
            # inc/camera.h:35-61): lens offset = lens_radius * disk
            # sample on the camera (u, v) basis; same masked draw
            # schedule as the split path (after the jitter pair)
            ldx, ldy, state = _rand_in_unit_disk(state, need)
            lrx = cam_ref[18] * ldx
            lry = cam_ref[18] * ldy
            offx = cam_ref[12] * lrx + cam_ref[15] * lry
            offy = cam_ref[13] * lrx + cam_ref[16] * lry
            offz = cam_ref[14] * lrx + cam_ref[17] * lry
            rox = jnp.where(need, cam_ox + offx, rox)
            roy = jnp.where(need, cam_oy + offy, roy)
            roz = jnp.where(need, cam_oz + offz, roz)
            rdx = jnp.where(need, crx - offx, rdx)
            rdy = jnp.where(need, cry - offy, rdy)
            rdz = jnp.where(need, crz - offz, rdz)
        else:
            rox = jnp.where(need, cam_ox, rox)
            roy = jnp.where(need, cam_oy, roy)
            roz = jnp.where(need, cam_oz, roz)
            rdx = jnp.where(need, crx, rdx)
            rdy = jnp.where(need, cry, rdy)
            rdz = jnp.where(need, crz, rdz)
        if motion_on:
            # camera shutter: ONE draw after jitter/aperture, held for
            # the whole path incl. shadow rays (render.py sample_body)
            ut, state = _draw(state, need)
            tm = jnp.where(need,
                           jnp.float32(time0)
                           + ut * jnp.float32(time1 - time0), tm)
        Lr = jnp.where(need, 0.0, Lr)
        Lg = jnp.where(need, 0.0, Lg)
        Lb = jnp.where(need, 0.0, Lb)
        thr_r = jnp.where(need, 1.0, thr_r)
        thr_g = jnp.where(need, 1.0, thr_g)
        thr_b = jnp.where(need, 1.0, thr_b)
        depth = jnp.where(need, 0, depth)
        scnt = scnt + need.astype(jnp.int32)
        alive = alive | need
        alive_in = alive

        # ---- 0. Russian roulette ---------------------------------------
        rr_mask = alive & (depth >= rr_start)
        u_rr, state = _draw(state, rr_mask)
        p_rr = jnp.minimum(jnp.maximum(thr_r, jnp.maximum(thr_g, thr_b)),
                           jnp.float32(rr_max_p))
        killed = rr_mask & (u_rr > p_rr)
        alive = alive & ~killed
        scale = rr_mask & ~killed
        inv_p = 1.0 / jnp.where(p_rr > 0, p_rr, 1.0)
        thr_r = jnp.where(scale, thr_r * inv_p, thr_r)
        thr_g = jnp.where(scale, thr_g * inv_p, thr_g)
        thr_b = jnp.where(scale, thr_b * inv_p, thr_b)

        # ---- 1. closest hit --------------------------------------------
        nrays = nrays + jnp.sum(jnp.where(alive, 1, 0))
        (hitm, bt, bm, nx, ny, nz, bfr, bmed, state) = _closest_hit(
            rox, roy, roz, rdx, rdy, rdz, alive, state, tm=tm)
        if env_id >= 0:
            # environment-map sky on miss lanes (the tri megakernel's
            # env branch verbatim; shared polynomial atan2/acos +
            # shared one-hot pool gather)
            import math as _math
            from dsrt_tpu.ops.textures import acosf, atan2f
            missm = alive & ~hitm

            def env_branch(Ls):
                Lr_, Lg_, Lb_ = Ls
                inv = 1.0 / jnp.sqrt(jnp.maximum(
                    rdx * rdx + rdy * rdy + rdz * rdz, 1e-20))
                two_pi = 2.0 * _math.pi
                u = (atan2f(rdz * inv, rdx * inv)
                     / jnp.float32(two_pi) + jnp.float32(0.5)
                     + jnp.float32(env_rot / two_pi))
                v = 1.0 - acosf(jnp.clip(rdy * inv, -1.0, 1.0)) \
                    / jnp.float32(_math.pi)
                v = jnp.clip(v, 0.0, 1.0 - 1e-6)
                hs = 4 if tiled else 3
                wt = hdr_ref[hs * env_id]
                ht = hdr_ref[hs * env_id + 1]
                ot = hdr_ref[hs * env_id + 2]
                uu = u - jnp.floor(u)
                it = (uu * jnp.float32(wt - 1)).astype(jnp.int32)
                jt = ((1.0 - v) * jnp.float32(ht - 1)).astype(jnp.int32)
                if tiled:
                    # 32x32-tiled pool addressing (build_pool_tiled)
                    twt = hdr_ref[4 * env_id + 3]
                    pidx = (ot + (((jt >> 5) * twt + (it >> 5)) << 10)
                            + ((jt & 31) << 5) + (it & 31))
                else:
                    pidx = ot + jt * wt + it
                Rp = texT_ref.shape[1] // 3
                npl = Rp * TILE_W
                oke = (pidx >= 0) & (pidx < npl)
                # exec_opts.tex_chunk plumbed like pallas_path's env
                # gather (0 = whole-pool A/B; ADVICE r4)
                tr, tg, tb = _pool_fetch_rows_ref(
                    texT_ref, jnp.clip(pidx, 0, npl - 1),
                    shape[0], tex_chunk)
                sc = jnp.float32(env_scale)
                er = jnp.where(oke, tr, 1.0) * sc
                eg = jnp.where(oke, tg, 1.0) * sc
                eb = jnp.where(oke, tb, 1.0) * sc
                return (jnp.where(missm, Lr_ + thr_r * er, Lr_),
                        jnp.where(missm, Lg_ + thr_g * eg, Lg_),
                        jnp.where(missm, Lb_ + thr_b * eb, Lb_))

            Lr, Lg, Lb = lax.cond(jnp.any(missm), env_branch,
                                  lambda a: a, (Lr, Lg, Lb))
        alive = alive & hitm
        px_ = rox + bt * rdx
        py_ = roy + bt * rdy
        pz_ = roz + bt * rdz

        # ---- medium scatter --------------------------------------------
        if n_med > 0:
            med_mask = alive & (bmed >= 0)
            mar = jnp.zeros(shape, jnp.float32)
            mag = jnp.zeros(shape, jnp.float32)
            mab = jnp.zeros(shape, jnp.float32)
            for i in range(n_med):
                sel = bmed == i
                mar = jnp.where(sel, med_ref[15 * i + 12], mar)
                mag = jnp.where(sel, med_ref[15 * i + 13], mag)
                mab = jnp.where(sel, med_ref[15 * i + 14], mab)
            (ux_, uy_, uz_), state = _rand_in_unit_sphere(state, med_mask)
            dmx, dmy, dmz = _normalize3(ux_, uy_, uz_)
            thr_r = jnp.where(med_mask, thr_r * mar, thr_r)
            thr_g = jnp.where(med_mask, thr_g * mag, thr_g)
            thr_b = jnp.where(med_mask, thr_b * mab, thr_b)
            rox = jnp.where(med_mask, px_, rox)
            roy = jnp.where(med_mask, py_, roy)
            roz = jnp.where(med_mask, pz_, roz)
            rdx = jnp.where(med_mask, dmx, rdx)
            rdy = jnp.where(med_mask, dmy, rdy)
            rdz = jnp.where(med_mask, dmz, rdz)
            surf = alive & (bmed < 0)
        else:
            surf = alive

        mtype = _mat_field(bm, 0).astype(jnp.int32)

        # ---- 2. emission -----------------------------------------------
        emis = surf & (mtype == DIFFUSE_LIGHT)
        Lr = jnp.where(emis, Lr + thr_r * _mat_field(bm, 4), Lr)
        Lg = jnp.where(emis, Lg + thr_g * _mat_field(bm, 5), Lg)
        Lb = jnp.where(emis, Lb + thr_b * _mat_field(bm, 6), Lb)
        alive = alive & ~emis
        surf = surf & ~emis

        # ---- 3. albedo (solid x procedural) ----------------------------
        alb_r = _mat_field(bm, 1)
        alb_g = _mat_field(bm, 2)
        alb_b = _mat_field(bm, 3)
        if has_ptex:
            # mat_pack cols: 9 ptex_kind, 10 ptex_scale, 11-13 color2
            kind = _mat_field(bm, 9).astype(jnp.int32)
            pscale = _mat_field(bm, 10)
            c2r = _mat_field(bm, 11)
            c2g = _mat_field(bm, 12)
            c2b = _mat_field(bm, 13)
            sines = (jnp.sin(pscale * px_) * jnp.sin(pscale * py_)
                     * jnp.sin(pscale * pz_))
            chk = sines < 0.0
            chk_r = jnp.where(chk, c2r, alb_r)
            chk_g = jnp.where(chk, c2g, alb_g)
            chk_b = jnp.where(chk, c2b, alb_b)
            need_noise = surf & ((kind == PTEX_NOISE)
                                 | (kind == PTEX_MARBLE))
            turb = lax.cond(jnp.any(need_noise),
                            lambda: _perlin_turb(px_, py_, pz_),
                            lambda: jnp.zeros(shape, jnp.float32))
            marble_v = 0.5 * (1.0 + jnp.sin(pscale * pz_ + 10.0 * turb))
            noise_v = jnp.clip(turb, 0.0, 1.0)
            is_chk = surf & (kind == PTEX_CHECKER)
            alb_r = jnp.where(is_chk, chk_r, alb_r)
            alb_g = jnp.where(is_chk, chk_g, alb_g)
            alb_b = jnp.where(is_chk, chk_b, alb_b)
            is_mar = surf & (kind == PTEX_MARBLE)
            alb_r = jnp.where(is_mar, marble_v, alb_r)
            alb_g = jnp.where(is_mar, marble_v, alb_g)
            alb_b = jnp.where(is_mar, marble_v, alb_b)
            is_noi = surf & (kind == PTEX_NOISE)
            alb_r = jnp.where(is_noi, noise_v, alb_r)
            alb_g = jnp.where(is_noi, noise_v, alb_g)
            alb_b = jnp.where(is_noi, noise_v, alb_b)

        # ---- 4. specular -----------------------------------------------
        metal_m = surf & (mtype == METAL)
        diel_m = surf & (mtype == DIELECTRIC)
        uix, uiy, uiz = _normalize3(rdx, rdy, rdz)
        din = uix * nx + uiy * ny + uiz * nz
        rfx = uix - 2.0 * din * nx
        rfy = uiy - 2.0 * din * ny
        rfz = uiz - 2.0 * din * nz
        fuzz = jnp.clip(_mat_field(bm, 7), 0.0, 1.0)
        (fzx, fzy, fzz), state = _rand_in_unit_sphere(state, metal_m)
        mdx = rfx + fzx * fuzz
        mdy = rfy + fzy * fuzz
        mdz = rfz + fzz * fuzz
        metal_ok = (mdx * nx + mdy * ny + mdz * nz) > 0.0
        alive = alive & ~(metal_m & ~metal_ok)

        eta = _mat_field(bm, 8)
        eta = jnp.where((eta <= 0.0) | ~jnp.isfinite(eta), 1.5, eta)
        front = bfr > 0.5
        ratio = jnp.where(front, 1.0 / eta, eta)
        cos_t = jnp.minimum(-(uix * nx + uiy * ny + uiz * nz), 1.0)
        sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
        cannot = ratio * sin_t > 1.0
        r0 = (1.0 - ratio) / (1.0 + ratio)
        r0 = r0 * r0
        om = 1.0 - cos_t
        om2 = om * om
        refl_prob = r0 + (1.0 - r0) * (om2 * om2 * om)
        u_d, state = _draw(state, diel_m)
        use_refl = cannot | (refl_prob > u_d)
        rpx = (uix + nx * cos_t) * ratio
        rpy = (uiy + ny * cos_t) * ratio
        rpz = (uiz + nz * cos_t) * ratio
        rpar = -jnp.sqrt(jnp.abs(1.0 - (rpx * rpx + rpy * rpy + rpz * rpz)))
        rrx = rpx + nx * rpar
        rry = rpy + ny * rpar
        rrz = rpz + nz * rpar
        ddx = jnp.where(use_refl, rfx, rrx)
        ddy = jnp.where(use_refl, rfy, rry)
        ddz = jnp.where(use_refl, rfz, rrz)

        spec = metal_m | diel_m
        sdx_ = jnp.where(metal_m, mdx, ddx)
        sdy_ = jnp.where(metal_m, mdy, ddy)
        sdz_ = jnp.where(metal_m, mdz, ddz)
        sar = jnp.where(metal_m, alb_r, 1.0)
        sag = jnp.where(metal_m, alb_g, 1.0)
        sab = jnp.where(metal_m, alb_b, 1.0)
        mv = spec & alive
        thr_r = jnp.where(mv, thr_r * sar, thr_r)
        thr_g = jnp.where(mv, thr_g * sag, thr_g)
        thr_b = jnp.where(mv, thr_b * sab, thr_b)
        rox = jnp.where(mv, px_, rox)
        roy = jnp.where(mv, py_, roy)
        roz = jnp.where(mv, pz_, roz)
        rdx = jnp.where(mv, sdx_, rdx)
        rdy = jnp.where(mv, sdy_, rdy)
        rdz = jnp.where(mv, sdz_, rdz)

        # ---- 5. sun MIS at diffuse hits --------------------------------
        diff = surf & (mtype == LAMBERTIAN) & alive
        if sun_on:
            cos_sun = jnp.maximum(0.0, nx * sdx + ny * sdy + nz * sdz)
            pot = diff & (cos_sun > 0.0)
            nrays = nrays + jnp.sum(jnp.where(pot, 1, 0))
            sox = px_ + sh_bias * nx
            soy = py_ + sh_bias * ny
            soz = pz_ + sh_bias * nz
            sdir_x = jnp.broadcast_to(sdx, shape)
            sdir_y = jnp.broadcast_to(sdy, shape)
            sdir_z = jnp.broadcast_to(sdz, shape)
            (sh_hit, _, _, _, _, _, _, _, state) = _closest_hit(
                sox, soy, soz, sdir_x, sdir_y, sdir_z, pot, state, tm=tm)
            unb = pot & ~sh_hit
            pdf_b = cos_sun / jnp.float32(PI_F)
            w_sun = pdf_b / (0.5 + 0.5 * pdf_b)
            Lr = jnp.where(unb, Lr + thr_r * alb_r * sun_r * w_sun, Lr)
            Lg = jnp.where(unb, Lg + thr_g * alb_g * sun_g * w_sun, Lg)
            Lb = jnp.where(unb, Lb + thr_b * alb_b * sun_b * w_sun, Lb)

        # ---- 6-9. next-direction sampling ------------------------------
        if n_lights == 0:
            (bdx, bdy, bdz), pdf_b2, state = _cosine_hemisphere(
                nx, ny, nz, state, diff)
            ok_b = pdf_b2 > 0.0
            alive = alive & ~(diff & ~ok_b)
            mv2 = diff & ok_b
            thr_r = jnp.where(mv2, thr_r * alb_r, thr_r)
            thr_g = jnp.where(mv2, thr_g * alb_g, thr_g)
            thr_b = jnp.where(mv2, thr_b * alb_b, thr_b)
            rox = jnp.where(mv2, px_, rox)
            roy = jnp.where(mv2, py_, roy)
            roz = jnp.where(mv2, pz_, roz)
            rdx = jnp.where(mv2, bdx, rdx)
            rdy = jnp.where(mv2, bdy, rdy)
            rdz = jnp.where(mv2, bdz, rdz)
        else:
            choose, state = _draw(state, diff)
            light_m = diff & (choose < 0.5)
            brdf_m = diff & ~(choose < 0.5)

            # light branch: pick light k, then 2 uniforms
            uk, state = _draw(state, light_m)
            k = jnp.minimum((uk * jnp.float32(n_lights)).astype(jnp.int32),
                            n_lights - 1)
            lcx = jnp.zeros(shape, jnp.float32)
            lcy = jnp.zeros(shape, jnp.float32)
            lcz = jnp.zeros(shape, jnp.float32)
            lrad = jnp.zeros(shape, jnp.float32)
            for i in range(n_lights):
                sel = k == i
                lcx = jnp.where(sel, lit_ref[4 * i], lcx)
                lcy = jnp.where(sel, lit_ref[4 * i + 1], lcy)
                lcz = jnp.where(sel, lit_ref[4 * i + 2], lcz)
                lrad = jnp.where(sel, lit_ref[4 * i + 3], lrad)
            u1, state = _draw(state, light_m)
            u2, state = _draw(state, light_m)
            z = 2.0 * u1 - 1.0
            phi = 2.0 * jnp.float32(PI_F) * u2
            rl = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
            plx = lcx + rl * jnp.cos(phi) * lrad
            ply = lcy + rl * jnp.sin(phi) * lrad
            plz = lcz + z * lrad
            tlx = plx - px_
            tly = ply - py_
            tlz = plz - pz_
            dist2 = tlx * tlx + tly * tly + tlz * tlz
            dist = jnp.sqrt(dist2)
            okl = dist > 0.0
            invd = 1.0 / jnp.where(okl, dist, 1.0)
            wix = jnp.where(okl, tlx * invd, 0.0)
            wiy = jnp.where(okl, tly * invd, 0.0)
            wiz = jnp.where(okl, tlz * invd, 1.0)
            nlx, nly, nlz = _normalize3(plx - lcx, ply - lcy, plz - lcz)
            cos_l = jnp.maximum(0.0, -(nlx * wix + nly * wiy + nlz * wiz))
            okl = okl & (cos_l > 0.0)
            area = 4.0 * jnp.float32(PI_F) * lrad * lrad
            pdf_lc = jnp.where(okl,
                               dist2 / jnp.where(okl, cos_l * area, 1.0),
                               0.0)
            cos_li = jnp.maximum(0.0, wix * nx + wiy * ny + wiz * nz)
            l_ok = (pdf_lc > 0.0) & (cos_li > 0.0)
            pdf_light = pdf_lc / jnp.float32(n_lights)
            pdf_val_l = 0.5 * pdf_light + 0.5 * (cos_li / jnp.float32(PI_F))

            # BRDF branch (asymmetric 0.5 pdf)
            (bdx, bdy, bdz), pdf_b2, state = _cosine_hemisphere(
                nx, ny, nz, state, brdf_m)
            b_ok = pdf_b2 > 0.0
            pdf_val_b = 0.5 * pdf_b2

            dsx = jnp.where(light_m, wix, bdx)
            dsy = jnp.where(light_m, wiy, bdy)
            dsz = jnp.where(light_m, wiz, bdz)
            pdf_val = jnp.where(light_m, pdf_val_l, pdf_val_b)
            # no jnp.where on bools (Mosaic can't truncate i8->i1)
            ok = (light_m & l_ok) | (~light_m & b_ok)
            alive = alive & ~(diff & ~ok)
            mv2 = diff & ok

            cos_o = jnp.maximum(0.0, dsx * nx + dsy * ny + dsz * nz)
            weight = (cos_o / jnp.float32(PI_F)) / jnp.where(
                pdf_val > 0, pdf_val, 1.0)
            thr_r = jnp.where(mv2, thr_r * alb_r * weight, thr_r)
            thr_g = jnp.where(mv2, thr_g * alb_g * weight, thr_g)
            thr_b = jnp.where(mv2, thr_b * alb_b * weight, thr_b)
            rox = jnp.where(mv2, px_, rox)
            roy = jnp.where(mv2, py_, roy)
            roz = jnp.where(mv2, pz_, roz)
            rdx = jnp.where(mv2, dsx, rdx)
            rdy = jnp.where(mv2, dsy, rdy)
            rdz = jnp.where(mv2, dsz, rdz)

        # ---- termination bookkeeping -----------------------------------
        depth = depth + alive_in.astype(jnp.int32)
        alive = alive & (depth < max_depth)
        died = alive_in & ~alive
        acc_r = jnp.where(died, acc_r + jnp.clip(Lr, 0.0, 1.0), acc_r)
        acc_g = jnp.where(died, acc_g + jnp.clip(Lg, 0.0, 1.0), acc_g)
        acc_b = jnp.where(died, acc_b + jnp.clip(Lb, 0.0, 1.0), acc_b)

        return (acc_r, acc_g, acc_b, Lr, Lg, Lb,
                (thr_r, thr_g, thr_b),
                jnp.where(alive, 1.0, 0.0), state, scnt, depth,
                (rox, roy, roz), (rdx, rdy, rdz), nrays, waves + 1, tm)

    init = (f0, f0, f0, f0, f0, f0, (f1, f1, f1), f0, state0, i0, i0,
            (f0, f0, f0), (f0, f0, f1), jnp.int32(0), jnp.int32(0), f0)
    out = lax.while_loop(wave_cond, wave_body, init)
    acc_r_ref[...] = out[0]
    acc_g_ref[...] = out[1]
    acc_b_ref[...] = out[2]
    pid = pl.program_id(0)
    rows = nray_ref.shape[0]
    row = pid % rows
    first = pid < rows
    vals = (out[13], out[14], jnp.int32(0), jnp.int32(0), jnp.int32(0),
            jnp.int32(0))
    for c_, v_ in enumerate(vals):
        nray_ref[row, c_] = jnp.where(first, v_, nray_ref[row, c_] + v_)


@partial(jax.jit, static_argnames=("n_sph", "n_med", "n_lights", "n_mats",
                                   "max_depth", "width", "height", "seed",
                                   "rr_start", "rr_max_p", "t_min", "t_max",
                                   "sun_on", "has_ptex", "k", "block_h",
                                   "env_id", "env_rot", "env_scale",
                                   "aperture_on", "motion_on",
                                   "time0", "time1", "tex_chunk",
                                   "tiled"))
def _run_sphere(mat_vec, sph_vec, med_vec, lit_vec, cam_vec, sun_vec,
                spp_vec, texT, hdr_vec, px, py, valid,
                n_sph: int, n_med: int, n_lights: int, n_mats: int,
                max_depth: int, width: int, height: int, seed: int,
                rr_start: int, rr_max_p: float, t_min: float, t_max: float,
                sun_on: bool, has_ptex: bool, k: int, block_h: int,
                env_id: int = -1, env_rot: float = 0.0,
                env_scale: float = 1.0, aperture_on: bool = False,
                motion_on: bool = False, time0: float = 0.0,
                time1: float = 0.0, tex_chunk: int = 0,
                tiled: bool = False):
    kern = partial(_sphere_kernel, n_sph=n_sph, n_med=n_med,
                   n_lights=n_lights, n_mats=n_mats, max_depth=max_depth,
                   width=width, height=height, seed=seed, rr_start=rr_start,
                   rr_max_p=rr_max_p, t_min=t_min, t_max=t_max,
                   sun_on=sun_on, has_ptex=has_ptex, env_id=env_id,
                   env_rot=env_rot, env_scale=env_scale,
                   aperture_on=aperture_on, motion_on=motion_on,
                   time0=time0, time1=time1, tex_chunk=tex_chunk,
                   tiled=tiled)
    ray_spec = pl.BlockSpec((block_h, TILE_W), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = (k * TILE_H, TILE_W)
    n_blocks = (k * TILE_H) // block_h
    return pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[smem] * 7
        + [pl.BlockSpec(memory_space=pltpu.VMEM), smem]
        + [ray_spec] * 3,
        out_specs=(ray_spec, ray_spec, ray_spec,
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(
            jax.ShapeDtypeStruct(out_shape, jnp.float32),
            jax.ShapeDtypeStruct(out_shape, jnp.float32),
            jax.ShapeDtypeStruct(out_shape, jnp.float32),
            jax.ShapeDtypeStruct((min(n_blocks, STATS_ROWS), 6),
                                 jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=out_shape[0] * TILE_W * 20000,
            bytes_accessed=out_shape[0] * 128 * 24,
            transcendentals=out_shape[0] * 128 * 64),
        # Mosaic's default scoped-VMEM limit is 16 MB; the resident env
        # plane table alone is up to 3*TEX_ROWS_MAX*128*4 = 50 MB at the
        # sphere gate's cap (sphere_fused_supported <= TEX_ROWS_MAX), so
        # raise the limit like pallas_path does — without this a sphere
        # scene with a realistic 1024^2+ equirect HDR passed the gate
        # but failed at Mosaic compile time (ADVICE r4)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=119 * 1024 * 1024),
    )(mat_vec, sph_vec, med_vec, lit_vec, cam_vec, sun_vec, spp_vec,
      texT, hdr_vec, px, py, valid)


def trace_fused_spheres(scene, cfg, cam, px, py, valid,
                        return_stats: bool = False, salt=0, spp=None):
    """Render `spp` samples for every (K, P) lane pixel in one kernel
    (sphere-scene sibling of pallas_path.trace_fused; same contract)."""
    K, P = px.shape
    assert P == TILE_H * TILE_W, P
    block_h = _OPTS.block_h
    group = block_h // TILE_H
    Kp = ((K + group - 1) // group) * group
    pad = Kp - K

    def fold(a, fill=0):
        if pad:
            a = jnp.concatenate(
                [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)], axis=0)
        return a.reshape(Kp * TILE_H, TILE_W)

    n_sph = int(scene.n_spheres)
    n_med = int(scene.n_media)
    n_lights = int(scene.n_lights)

    # SMEM parameter vectors (host-resolved indirections); stride 8 per
    # sphere: c0(3), radius, mat, c2(3) — c2 drives in-kernel motion blur
    sph_vec = jnp.concatenate([
        jnp.concatenate([scene.sph_center[:n_sph],
                         scene.sph_radius[:n_sph, None],
                         scene.sph_mat[:n_sph, None].astype(jnp.float32),
                         scene.sph_center2[:n_sph]],
                        axis=1).reshape(-1)
    ]) if n_sph else jnp.zeros((1,), jnp.float32)
    if n_med:
        med_vec = jnp.concatenate([
            scene.med_kind[:n_med, None].astype(jnp.float32),
            scene.med_center[:n_med],
            scene.med_radius[:n_med, None],
            scene.med_min[:n_med],
            scene.med_max[:n_med],
            scene.med_neg_inv_density[:n_med, None],
            scene.med_albedo[:n_med],
        ], axis=1).reshape(-1)
    else:
        med_vec = jnp.zeros((1,), jnp.float32)
    if n_lights:
        li = jnp.clip(scene.light_idx[:n_lights], 0,
                      scene.sph_center.shape[0] - 1)
        lit_vec = jnp.concatenate([
            scene.sph_center[li],
            scene.sph_radius[li, None],
        ], axis=1).reshape(-1)
    else:
        lit_vec = jnp.zeros((1,), jnp.float32)
    mat_vec = scene.mat_pack.reshape(-1)

    sd = (-scene.sun_dir).astype(jnp.float32)
    # bit-identical to ops/linalg.normalize (reciprocal-multiply, not
    # divide): the parity renderer computes sdir in-trace with that
    # formula, and media shadow verdicts are ULP-sensitive to it
    l2 = jnp.sum(sd * sd)
    sd = sd * jnp.where(l2 > 0.0, 1.0 / jnp.sqrt(jnp.maximum(l2, 1e-38)),
                        0.0)
    sun_vec = jnp.concatenate([
        sd.astype(jnp.float32), scene.sun_radiance.astype(jnp.float32),
        jnp.array([cfg.shadow_bias, 0.0], jnp.float32)])
    cam_vec = jnp.concatenate([
        cam.origin, cam.lower_left, cam.horizontal, cam.vertical,
        cam.u, cam.v, cam.lens_radius[None]
    ]).astype(jnp.float32)
    # [spp, stream salt] — both runtime scalars; salt 0 keeps parity
    spp_rt = cfg.resolved_spp() if spp is None else spp
    spp_vec = jnp.stack([jnp.asarray(spp_rt, jnp.int32),
                         jnp.asarray(salt, jnp.int32)])

    # env-map planes (texture pool de-interleaved for the in-kernel
    # one-hot gather — same layout as trace_fused's texT)
    env_on = int(scene.env_tex) >= 0
    tiled = bool(_OPTS.tex_tiled) and env_on
    if env_on:
        Rp = _tex_plane_rows_eff(scene)
        texels = (scene.tex_pool_tiled if tiled
                  else scene.tex_pool).reshape(-1, 3)
        npad = Rp * TILE_W - texels.shape[0]
        if npad:
            texels = jnp.concatenate(
                [texels, jnp.zeros((npad, 3), jnp.float32)], axis=0)
        texT = jnp.concatenate(
            [texels[:, ch].reshape(Rp, TILE_W).T for ch in range(3)],
            axis=1)
        if bool(scene.tex_bf16):
            texT = texT.astype(jnp.bfloat16)
        if tiled:
            # 4-stride header: (w, h, tiled texel offset, tiles-across)
            hdr_vec = jnp.stack(
                [scene.tex_w.astype(jnp.int32),
                 scene.tex_h.astype(jnp.int32),
                 scene.tex_toff.astype(jnp.int32),
                 scene.tex_ttw.astype(jnp.int32)],
                axis=1).reshape(-1)
        else:
            hdr_vec = jnp.stack(
                [scene.tex_w.astype(jnp.int32),
                 scene.tex_h.astype(jnp.int32),
                 (scene.tex_off // 3).astype(jnp.int32)],
                axis=1).reshape(-1)
    else:
        texT = jnp.zeros((TILE_W, 3), jnp.float32)
        hdr_vec = jnp.zeros((3,), jnp.int32)

    acc_r, acc_g, acc_b, stats = _run_sphere(
        mat_vec, sph_vec, med_vec, lit_vec, cam_vec, sun_vec, spp_vec,
        texT, hdr_vec,
        fold(px.astype(jnp.int32)), fold(py.astype(jnp.int32)),
        fold(valid.astype(jnp.int32)),
        n_sph=n_sph, n_med=n_med, n_lights=n_lights,
        n_mats=scene.mat_pack.shape[0],
        max_depth=cfg.resolved_max_depth(), width=cam.width,
        height=cam.height, seed=scene.seed, rr_start=cfg.rr_start_depth,
        rr_max_p=float(cfg.rr_max_p), t_min=float(cfg.hit_eps),
        t_max=float(cfg.hit_tmax), sun_on=bool(scene.sun_enabled),
        has_ptex=bool(scene.has_ptex), k=Kp, block_h=block_h,
        env_id=int(scene.env_tex), env_rot=float(scene.env_rotation),
        env_scale=float(scene.env_scale),
        aperture_on=bool(cfg.aperture > 0),
        # the shutter draw fires whenever the shutter is OPEN, moving
        # spheres or not (render.py:96 draws on time1 > time0 alone);
        # the center lerp is an exact no-op when c2 == c0
        motion_on=bool(cfg.time1 > cfg.time0),
        time0=float(cfg.time0), time1=float(cfg.time1),
        tex_chunk=int(_OPTS.tex_chunk), tiled=tiled)

    def unfold(a):
        return a.reshape(Kp, P)[:K]

    accum = V3(unfold(acc_r), unfold(acc_g), unfold(acc_b))
    if return_stats:
        return accum, stats[:, 0], stats
    return accum, stats[:, 0]
