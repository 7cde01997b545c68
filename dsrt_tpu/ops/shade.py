"""Batched path tracing: the reference's `ray_color` loop, wavefront style.

Reproduces src/gpu_render.cu:715-936 step for step over masked lanes:

0. Russian roulette from depth >= 5: p = min(max(throughput), 0.95),
   kill if rand > p else divide (gpu_render.cu:727-738).
1. Scene hit with t in [1e-3, 1e9]; miss -> black background, terminate
   (gpu_render.cu:743-747).
2. DIFFUSE_LIGHT -> L += throughput * emissive, terminate (754-758).
3. albedo = material albedo x image texture (UV from barycentrics, 763-774)
   [x procedural texture — extension, only when the scene has any].
4. metal / dielectric -> specular scatter, no pdf (779-795).
5. Sun MIS at every diffuse hit: Ldir = normalize(-sun_dir) — the kernel
   NEGATES the documented ISS->Sun direction (802-806), reproduced
   verbatim; delta-light MIS weight = scattering_pdf / (0.5 + 0.5 pdf_brdf)
   (819-833); shadow ray offset 1e-3 along the normal.
6-7. No emissive spheres -> pure cosine BRDF sampling, throughput *= albedo
   (ratio scattering_pdf/pdf_brdf computed with identical floats == 1)
   (850-866).
8-9. Else 50/50 light- vs BRDF-sampling with the reference's *asymmetric*
   mixture pdf: light branch uses 0.5 pdf_light + 0.5 pdf_brdf, BRDF branch
   uses 0.5 pdf_brdf only (869-918) — reproduced verbatim.
10. Per-sample clamp01(L) on return (935).

Every RNG draw is masked to exactly the lanes that would draw in the
reference's scalar control flow, preserving each pixel's LCG stream.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import jax.lax as lax

from dsrt_tpu.ops.linalg import (V3, cross, dot, normalize, reflect, refract,
                                 schlick, where as vwhere, maxc)
from dsrt_tpu.ops import rng as rngmod
from dsrt_tpu.ops import trace as tracemod
from dsrt_tpu.ops import textures as texmod
from dsrt_tpu.models.materials import (DIELECTRIC, DIFFUSE_LIGHT, LAMBERTIAN,
                                       METAL)

PI_F = rngmod.PI_F


def build_onb(n: V3) -> Tuple[V3, V3, V3]:
    """ONB with w along n (src/gpu_render.cu:112-118)."""
    w = normalize(n)
    big = jnp.abs(w.x) > 0.9
    ax = jnp.where(big, 0.0, 1.0)
    ay = jnp.where(big, 1.0, 0.0)
    a = V3(ax, ay, jnp.zeros_like(ax))
    v = normalize(cross(w, a))
    u = cross(v, w)
    return u, v, w


def sample_cosine_hemisphere(n: V3, state, mask):
    """World-space cosine-weighted direction + pdf
    (src/gpu_render.cu:121-141); 2 draws on masked lanes."""
    local, state = rngmod.random_cosine_direction(state, mask)
    u, v, w = build_onb(n)
    world = normalize(u * local.x + v * local.y + w * local.z)
    cos_t = jnp.maximum(0.0, dot(world, n))
    pdf = jnp.where(cos_t > 0.0, cos_t / PI_F, 0.0)
    return world, pdf, state


def sample_sphere_light_direction(center: V3, radius, origin: V3, state, mask):
    """Uniform sphere-surface light sample with directional pdf
    dist^2 / (cos_theta_light * 4 pi r^2) (src/gpu_render.cu:145-189);
    2 draws on masked lanes."""
    uz, uphi, state = rngmod.draw2(state, mask)
    wi, pdf = sphere_light_from_uniforms(center, radius, origin, uz, uphi)
    return wi, pdf, state


def sphere_light_from_uniforms(center: V3, radius, origin: V3, uz, uphi):
    """The sphere-light sample given its two uniforms (pure)."""
    z = 2.0 * uz - 1.0
    phi = 2.0 * PI_F * uphi
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    local = V3(r * jnp.cos(phi), r * jnp.sin(phi), z)
    p_light = center + local * radius
    to_light = p_light - origin
    dist2 = dot(to_light, to_light)
    dist = jnp.sqrt(dist2)
    ok = dist > 0.0
    wi = vwhere(ok, to_light * (1.0 / jnp.where(ok, dist, 1.0)),
                V3(jnp.zeros_like(dist), jnp.zeros_like(dist),
                   jnp.ones_like(dist)))
    n_light = normalize(p_light - center)
    cos_l = jnp.maximum(0.0, dot(n_light, -wi))
    ok = ok & (cos_l > 0.0)
    area = 4.0 * PI_F * radius * radius
    pdf = jnp.where(ok, dist2 / jnp.where(ok, cos_l * area, 1.0), 0.0)
    return wi, pdf


def quad_light_from_uniforms(q: V3, eu: V3, ev: V3, qn: V3, area,
                             origin: V3, u1, u2):
    """Quad area-light sample (inc/qaud.h:74-88): point = Q + r1 u + r2 v;
    pdf_value = dist^2 / (|dir . n| * area), 0 when the sampled point is
    closer than the book's 0.001 hit epsilon or grazing."""
    p_l = V3(q.x + u1 * eu.x + u2 * ev.x,
             q.y + u1 * eu.y + u2 * ev.y,
             q.z + u1 * eu.z + u2 * ev.z)
    to_light = p_l - origin
    dist2 = dot(to_light, to_light)
    dist = jnp.sqrt(dist2)
    ok = dist > 1e-3
    wi = vwhere(ok, to_light * (1.0 / jnp.where(ok, dist, 1.0)),
                V3(jnp.zeros_like(dist), jnp.zeros_like(dist),
                   jnp.ones_like(dist)))
    cos_l = jnp.abs(dot(wi, qn))
    ok = ok & (cos_l > 1e-8) & (area > 0.0)
    pdf = jnp.where(ok, dist2 / jnp.where(ok, cos_l * area, 1.0), 0.0)
    return wi, pdf


from dsrt_tpu.exec_opts import OPTS, use_pallas as _use_pallas


def _vmapped_scene_hit(scene, ro, rd, t_min, t_max, active, state,
                       any_hit=False, time=None):
    """scene_hit over a (K, P) lane grid: the Pallas traversal kernel on
    TPU (VMEM-resident scene), else vmap of the per-packet XLA kernel.
    `time` (per-lane, optional) drives moving-sphere centers."""
    if _use_pallas(scene):
        return tracemod.scene_hit_flat(scene, ro, rd, t_min, t_max, active,
                                       state, any_hit=any_hit, time=time)
    if scene.n_tris > tracemod.LANE_SWITCH_TRIS:
        # big scenes off the Pallas path (CPU backend, VMEM overflow,
        # smooth/media combinations): per-LANE stackless traversal — the
        # packet union walk degenerates on incoherent bounce waves at
        # this scale (50 s/frame at 33k tris, TPU watchdog kill at 40k)
        return tracemod.scene_hit_flat_lane(scene, ro, rd, t_min, t_max,
                                            active, state, any_hit=any_hit,
                                            time=time)
    if scene.n_media > 0:
        fn = lambda ox, oy, oz, dx, dy, dz, act, st, tm: tracemod.scene_hit(
            scene, V3(ox, oy, oz), V3(dx, dy, dz), t_min, t_max, act, st,
            any_hit=any_hit, time=tm)
        tm = time if time is not None else jnp.zeros_like(ro.x)
        hit, state = jax.vmap(fn)(ro.x, ro.y, ro.z, rd.x, rd.y, rd.z,
                                  active, state, tm)
        return hit, state
    fn = lambda ox, oy, oz, dx, dy, dz, act, tm: tracemod.scene_hit(
        scene, V3(ox, oy, oz), V3(dx, dy, dz), t_min, t_max, act, None,
        any_hit=any_hit, time=tm)[0]
    tm = time if time is not None else jnp.zeros_like(ro.x)
    hit = jax.vmap(fn)(ro.x, ro.y, ro.z, rd.x, rd.y, rd.z, active, tm)
    return hit, state


def bounce_step(scene, cfg, L, thr, ro: V3, rd: V3, state, alive, rr_mask,
                count_rays: bool = False, time=None):
    """One path segment for every lane: Russian roulette (on `rr_mask`
    lanes), scene intersection, and the full reference shading chain
    (emission, albedo/texture, specular, sun MIS, mixture sampling).

    Shared by the two execution strategies: the sample-sequential parity
    loop (`trace_paths`) and the persistent-wavefront regeneration loop
    (ops/wavefront.py), which differ only in how depth/termination and
    sample banking are orchestrated.

    Returns (L, thr, ro, rd, state, alive, nrays_inc).
    """
    shape = ro.x.shape
    one = jnp.ones(shape, jnp.float32)
    # python floats: the Pallas traversal takes these as static params
    t_min = float(cfg.hit_eps)
    t_max = float(cfg.hit_tmax)
    sun_on = scene.sun_enabled
    # Ldir = normalize(-sun_dir): the verbatim negation quirk
    # (src/gpu_render.cu:802-806).
    sdir = normalize(V3(-scene.sun_dir[0], -scene.sun_dir[1],
                        -scene.sun_dir[2]))
    nrays = jnp.int32(0)

    if True:
        # ---- 0. Russian roulette -------------------------------------
        u_rr, state = rngmod.draw(state, rr_mask)
        p_rr = jnp.minimum(maxc(thr), cfg.rr_max_p)
        killed = rr_mask & (u_rr > p_rr)
        alive = alive & ~killed
        scale_mask = rr_mask & ~killed
        inv_p = 1.0 / jnp.where(p_rr > 0, p_rr, 1.0)
        thr = vwhere(scale_mask, thr * inv_p, thr)

        # ---- 1. scene intersection -----------------------------------
        if count_rays:
            nrays = nrays + jnp.sum(alive.astype(jnp.int32))
        # Fused hit+shadow kernel: saves one launch floor per wave but runs
        # the shadow traversal for every hit lane (not just potential
        # diffuse receivers) — measured net-negative on the ISS scene
        # (9.4 vs 13.9 Mrays/s), so off by default; kept for scenes where
        # most hits are shadow receivers (DSRT_FUSED_SUN=1).
        fused_sun = (OPTS.fused_sun and sun_on and scene.n_media == 0
                     and scene.n_spheres == 0 and _use_pallas(scene))
        if fused_sun:
            # one Pallas launch: closest hit + sun occlusion together
            hit, sun_blocked = tracemod.scene_hit_flat_sun(
                scene, ro, rd, t_min, t_max, alive, sdir, cfg.shadow_bias)
        else:
            sun_blocked = None
            hit, state = _vmapped_scene_hit(scene, ro, rd, t_min, t_max,
                                            alive, state, time=time)
        if scene.env_tex >= 0:
            # environment-map sky extension: miss lanes pick up the
            # equirect env radiance instead of the reference's black
            # background (src/gpu_render.cu:744-747); env_tex < 0 keeps
            # parity exactly (this branch is trace-time static)
            env_rgb = texmod.sample_env(scene, rd)
            miss_mask = alive & ~hit.hit
            L = vwhere(miss_mask, L + thr * env_rgb, L)
        alive = alive & hit.hit
        n = hit.normal
        px = ro.x + hit.t * rd.x
        py = ro.y + hit.t * rd.y
        pz = ro.z + hit.t * rd.z
        p = V3(px, py, pz)

        # ---- medium scatter (extension) ------------------------------
        if scene.n_media > 0:
            med_mask = alive & (hit.medium >= 0)
            mi = jnp.clip(hit.medium, 0, scene.n_media - 1)
            med_alb = V3(scene.med_albedo[mi, 0], scene.med_albedo[mi, 1],
                         scene.med_albedo[mi, 2])
            dir_m, state = rngmod.random_unit_vector(state, med_mask)
            thr = vwhere(med_mask, thr * med_alb, thr)
            ro = vwhere(med_mask, p, ro)
            rd = vwhere(med_mask, dir_m, rd)
            surf = alive & (hit.medium < 0)
        else:
            surf = alive

        # one consolidated material row gather (type, albedo, emissive,
        # fuzz, ref_idx in a single fetch — TPU gathers are overhead-bound)
        mp = scene.mat_pack[hit.mat]
        mtype = mp[..., 0].astype(jnp.int32)
        m_emis = V3(mp[..., 4], mp[..., 5], mp[..., 6])

        # ---- 2. emission ---------------------------------------------
        emis_mask = surf & (mtype == DIFFUSE_LIGHT)
        L = vwhere(emis_mask, L + thr * m_emis, L)
        alive = alive & ~emis_mask
        surf = surf & ~emis_mask

        # ---- 3. albedo ------------------------------------------------
        albedo = V3(mp[..., 1], mp[..., 2], mp[..., 3])
        if scene.has_image_tex:
            tex_rgb = texmod.sample_image(scene, hit.tex, hit.tu, hit.tv)
            has_tex = hit.tex >= 0
            albedo = vwhere(surf & has_tex, albedo * tex_rgb, albedo)
        if scene.has_ptex:
            albedo = texmod.sample_procedural(scene, hit.mat, albedo, p,
                                              mask=surf)

        # ---- 4. specular branch --------------------------------------
        metal_mask = surf & (mtype == METAL)
        diel_mask = surf & (mtype == DIELECTRIC)

        # metal (src/gpu_render.cu:603-619)
        unit_in = normalize(rd)
        refl = reflect(unit_in, n)
        fuzz = jnp.clip(mp[..., 7], 0.0, 1.0)
        fz, state = rngmod.random_in_unit_sphere(state, metal_mask)
        metal_dir = refl + fz * fuzz
        metal_ok = dot(metal_dir, n) > 0.0
        alive = alive & ~(metal_mask & ~metal_ok)

        # dielectric (src/gpu_render.cu:621-661)
        eta = mp[..., 8]
        eta = jnp.where((eta <= 0.0) | ~jnp.isfinite(eta), 1.5, eta)
        ratio = jnp.where(hit.front, 1.0 / eta, eta)
        cos_t = jnp.minimum(dot(-unit_in, n), 1.0)
        sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
        cannot = ratio * sin_t > 1.0
        refl_prob = schlick(cos_t, ratio)
        u_d, state = rngmod.draw(state, diel_mask)
        use_refl = cannot | (refl_prob > u_d)
        refr = refract(unit_in, n, ratio)
        diel_dir = vwhere(use_refl, reflect(unit_in, n), refr)

        spec_mask = metal_mask | diel_mask
        spec_dir = vwhere(metal_mask, metal_dir, diel_dir)
        spec_att = vwhere(metal_mask, albedo, V3(one, one, one))
        thr = vwhere(spec_mask & alive, thr * spec_att, thr)
        ro = vwhere(spec_mask & alive, p, ro)
        rd = vwhere(spec_mask & alive, spec_dir, rd)

        # ---- 5. diffuse: sun MIS -------------------------------------
        diff_mask = surf & (mtype == LAMBERTIAN) & alive
        if sun_on:
            cos_sun = jnp.maximum(0.0, dot(n, sdir))
            pot = diff_mask & (cos_sun > 0.0)
            if count_rays:
                nrays = nrays + jnp.sum(pot.astype(jnp.int32))
            if sun_blocked is not None:
                unblocked = pot & ~sun_blocked
            else:
                sh_o = V3(px + cfg.shadow_bias * n.x,
                          py + cfg.shadow_bias * n.y,
                          pz + cfg.shadow_bias * n.z)
                sh_d = V3(jnp.broadcast_to(sdir.x, shape),
                          jnp.broadcast_to(sdir.y, shape),
                          jnp.broadcast_to(sdir.z, shape))
                sh_hit, state = _vmapped_scene_hit(scene, sh_o, sh_d, t_min,
                                                   t_max, pot, state,
                                                   any_hit=True, time=time)
                unblocked = pot & ~sh_hit.hit
            pdf_brdf_s = cos_sun / PI_F
            pdf_mix = 0.5 * 1.0 + 0.5 * pdf_brdf_s
            w_sun = pdf_brdf_s / pdf_mix
            sun_rad = V3(jnp.broadcast_to(scene.sun_radiance[0], shape),
                         jnp.broadcast_to(scene.sun_radiance[1], shape),
                         jnp.broadcast_to(scene.sun_radiance[2], shape))
            L = vwhere(unblocked, L + thr * albedo * sun_rad * w_sun, L)

        # ---- 6-9. next-direction sampling ----------------------------
        if scene.n_lights == 0:
            # BRDF-only cosine sampling (src/gpu_render.cu:852-866):
            # scattering_pdf/pdf_brdf uses identical floats -> ratio 1.
            dir_b, pdf_b, state = sample_cosine_hemisphere(n, state, diff_mask)
            ok = pdf_b > 0.0
            alive = alive & ~(diff_mask & ~ok)
            move = diff_mask & ok
            thr = vwhere(move, thr * albedo, thr)
            ro = vwhere(move, p, ro)
            rd = vwhere(move, dir_b, rd)
        else:
            choose, state = rngmod.draw(state, diff_mask)
            light_m = diff_mask & (choose < 0.5)
            brdf_m = diff_mask & ~(choose < 0.5)

            # light branch (src/gpu_render.cu:875-908); the light list
            # mixes sphere and quad area lights (kind 0/1) — both consume
            # exactly two uniforms so the per-pixel draw schedule is
            # kind-independent
            uk, state = rngmod.draw(state, light_m)
            k = jnp.minimum((uk * scene.n_lights).astype(jnp.int32),
                            scene.n_lights - 1)
            kc = jnp.clip(k, 0, scene.light_idx.shape[0] - 1)
            li = scene.light_idx[kc]
            u1, u2, state = rngmod.draw2(state, light_m)
            sph = jnp.clip(li, 0, scene.sph_center.shape[0] - 1)
            c = V3(scene.sph_center[sph, 0], scene.sph_center[sph, 1],
                   scene.sph_center[sph, 2])
            rad = scene.sph_radius[sph]
            dir_l, pdf_lc = sphere_light_from_uniforms(c, rad, p, u1, u2)
            if scene.n_quads > 0:
                qi = jnp.clip(li, 0, scene.quad_q.shape[0] - 1)
                qq = V3(scene.quad_q[qi, 0], scene.quad_q[qi, 1],
                        scene.quad_q[qi, 2])
                qu = V3(scene.quad_u[qi, 0], scene.quad_u[qi, 1],
                        scene.quad_u[qi, 2])
                qv = V3(scene.quad_v[qi, 0], scene.quad_v[qi, 1],
                        scene.quad_v[qi, 2])
                qn = V3(scene.quad_n[qi, 0], scene.quad_n[qi, 1],
                        scene.quad_n[qi, 2])
                dir_q, pdf_q = quad_light_from_uniforms(
                    qq, qu, qv, qn, scene.quad_area[qi], p, u1, u2)
                is_q = scene.light_kind[kc] == 1
                dir_l = vwhere(is_q, dir_q, dir_l)
                pdf_lc = jnp.where(is_q, pdf_q, pdf_lc)
            cos_l = jnp.maximum(0.0, dot(dir_l, n))
            l_ok = (pdf_lc > 0.0) & (cos_l > 0.0)
            pdf_light = pdf_lc / jnp.float32(scene.n_lights)
            pdf_val_l = 0.5 * pdf_light + 0.5 * (cos_l / PI_F)

            # BRDF branch (src/gpu_render.cu:910-918): asymmetric 0.5*pdf
            dir_b, pdf_b, state = sample_cosine_hemisphere(n, state, brdf_m)
            b_ok = pdf_b > 0.0
            pdf_val_b = 0.5 * pdf_b

            dir_s = vwhere(light_m, dir_l, dir_b)
            pdf_val = jnp.where(light_m, pdf_val_l, pdf_val_b)
            ok = jnp.where(light_m, l_ok, b_ok)
            alive = alive & ~(diff_mask & ~ok)
            move = diff_mask & ok

            # 9. MIS weighting (src/gpu_render.cu:920-927)
            cos_o = jnp.maximum(0.0, dot(dir_s, n))
            weight = (cos_o / PI_F) / jnp.where(pdf_val > 0, pdf_val, 1.0)
            thr = vwhere(move, thr * albedo * weight, thr)
            ro = vwhere(move, p, ro)
            rd = vwhere(move, dir_s, rd)

    return L, thr, ro, rd, state, alive, nrays


def trace_paths(scene, cfg, ro: V3, rd: V3, state, active0,
                count_rays: bool = False, time=None):
    """Trace one sample per lane to completion; lanes shaped (K, P).

    Returns (L clamped to [0,1] per channel, new rng state) — and, when
    `count_rays` (static) is set, a third element: the exact number of rays
    traced (scene-intersection queries: primary/bounce + shadow), the
    denominator-free Mrays metric input.
    """
    shape = ro.x.shape
    zero = jnp.zeros(shape, jnp.float32)
    one = jnp.ones(shape, jnp.float32)
    max_depth = cfg.max_depth if cfg.max_depth > 0 else 12

    def cond(dc):
        depth, carry = dc
        return (depth < max_depth) & jnp.any(carry[5])

    def wl_body(dc):
        depth, carry = dc
        L, thr, ro, rd, state, alive, nrays = carry
        rr_mask = alive & (depth >= cfg.rr_start_depth)
        L, thr, ro, rd, state, alive, nr = bounce_step(
            scene, cfg, L, thr, ro, rd, state, alive, rr_mask,
            count_rays=count_rays, time=time)
        return depth + 1, (L, thr, ro, rd, state, alive, nrays + nr)

    init = (V3(zero, zero, zero), V3(one, one, one), ro, rd, state, active0,
            jnp.int32(0))
    _, (L, _, _, _, state, _, nrays) = lax.while_loop(cond, wl_body,
                                                      (jnp.int32(0), init))
    # per-sample clamp before averaging (src/gpu_render.cu:935)
    from dsrt_tpu.ops.linalg import clamp01
    if count_rays:
        return clamp01(L), state, nrays
    return clamp01(L), state
