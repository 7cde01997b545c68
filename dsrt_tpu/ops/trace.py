"""Packet scene intersection: BVH traversal, triangles, spheres, media.

TPU-native redesign of the reference's per-thread traversal
(src/gpu_render.cu:387-473).  A CUDA thread owns one ray and a private
64-entry stack; that shape is hostile to a vector machine.  Here a *packet*
of P rays (P = 1024 -> an 8x128 VPU tile per component) traverses the tree
together with ONE shared stack:

- control flow (node index, stack) is scalar per packet;
- node AABB tests and leaf Moller-Trumbore tests are full-width vector ops
  over the packet's lanes;
- a node's children are visited if ANY active lane's AABB test passes, so a
  packet visits the union of its lanes' node sets (classic packet traversal);
- node/triangle fetches use scalar indices -> under `vmap` over packets they
  become tiny (n_packets,)-sized gathers instead of per-ray gathers.

Intersection semantics match the reference exactly (same epsilons, same
tie-breaking — later-tested primitive wins ties via `<=` acceptance,
matching src/gpu_render.cu:353/495 accepting t == t_max):
- AABB slab test with miss iff t_max <= t_min (src/gpu_render.cu:285-315);
- Moller-Trumbore with |det| < 1e-8 reject (src/gpu_render.cu:322-380);
- sphere half-b quadratic, near root preferred (src/gpu_render.cu:478-504);
- scene_hit = BVH triangles then sequential spheres
  (src/gpu_render.cu:509-551).

Extension (reference inc/constant_medium.h resurrected per SURVEY.md §7
step 10): constant-density media sampled by exponential free path after the
nearest surface hit; draws RNG only when the scene has media, so
parity-comparable scenes keep the exact reference sample stream.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import jax.lax as lax

from dsrt_tpu.ops.linalg import V3, dot, cross
from dsrt_tpu.ops import rng as rngmod

STACK_CAP = 64  # matches the reference's fixed stack (src/gpu_render.cu:399)


class Hit(NamedTuple):
    """SoA hit record over packet lanes (HitRecord, src/gpu_render.cu:264-279
    plus medium fields)."""
    hit: jnp.ndarray        # bool
    t: jnp.ndarray          # f32
    nx: jnp.ndarray         # face-flipped shading normal
    ny: jnp.ndarray
    nz: jnp.ndarray
    front: jnp.ndarray      # bool front_face
    mat: jnp.ndarray        # i32 material id
    tex: jnp.ndarray        # i32 per-triangle texture id (-1 none)
    tri: jnp.ndarray        # i32 triangle index (-1 sphere/medium)
    u: jnp.ndarray          # barycentric u
    v: jnp.ndarray          # barycentric v
    tu: jnp.ndarray         # interpolated texture u (triangles only)
    tv: jnp.ndarray         # interpolated texture v
    medium: jnp.ndarray     # i32 medium index (-1 = surface hit)

    @property
    def normal(self) -> V3:
        return V3(self.nx, self.ny, self.nz)


def _aabb_hit(bmin, bmax, ro: V3, rd: V3, t_min, t_max):
    """Slab test; bmin/bmax are (3,) scalars-per-axis, lanes vectorized.
    Mirrors bbox_hit (src/gpu_render.cu:285-315) incl. NaN/inf semantics:
    comparisons with NaN are false, leaving bounds unchanged."""
    tmin_c, tmax_c = t_min, t_max
    for axis, (o, d) in enumerate(((ro.x, rd.x), (ro.y, rd.y), (ro.z, rd.z))):
        inv = 1.0 / d
        t0 = (bmin[axis] - o) * inv
        t1 = (bmax[axis] - o) * inv
        neg = inv < 0.0
        lo = jnp.where(neg, t1, t0)
        hi = jnp.where(neg, t0, t1)
        tmin_c = jnp.where(lo > tmin_c, lo, tmin_c)
        tmax_c = jnp.where(hi < tmax_c, hi, tmax_c)
    return tmax_c > tmin_c


def _mt_hit(v0, v1, v2, ro: V3, rd: V3):
    """Moller-Trumbore over lanes for one triangle given as (3,) scalars.
    Returns (valid_geom, t, u, v); caller applies the t-range test."""
    e1 = V3(v1[0] - v0[0], v1[1] - v0[1], v1[2] - v0[2])
    e2 = V3(v2[0] - v0[0], v2[1] - v0[1], v2[2] - v0[2])
    pvec = cross(rd, e2)
    det = dot(e1, pvec)
    ok = jnp.abs(det) >= 1e-8
    inv_det = 1.0 / jnp.where(ok, det, 1.0)
    tvec = V3(ro.x - v0[0], ro.y - v0[1], ro.z - v0[2])
    u = dot(tvec, pvec) * inv_det
    ok = ok & (u >= 0.0) & (u <= 1.0)
    qvec = cross(tvec, e1)
    v = dot(rd, qvec) * inv_det
    ok = ok & (v >= 0.0) & (u + v <= 1.0)
    t = dot(e2, qvec) * inv_det
    return ok, t, u, v


def packet_traverse(scene, ro: V3, rd: V3, t_min, t_max, active,
                    any_hit: bool = False) -> Hit:
    """Closest-hit (or any-hit) BVH traversal for one packet of lanes.

    `active` masks lanes that participate; inactive lanes report miss.
    Designed to be vmapped over a leading packet axis.
    """
    P = ro.x.shape
    f0 = jnp.zeros(P, jnp.float32)
    i_neg = jnp.full(P, -1, jnp.int32)

    max_leaf = scene.max_leaf

    init = dict(
        node=jnp.int32(0),
        stack=jnp.zeros((STACK_CAP,), jnp.int32),
        sp=jnp.int32(0),
        done=jnp.asarray(scene.n_tris == 0) | ~jnp.any(active),
        closest=jnp.where(active, jnp.asarray(t_max, jnp.float32), t_min),
        hit=jnp.zeros(P, bool),
        nx=f0, ny=f0, nz=f0,
        front=jnp.zeros(P, bool),
        mat=jnp.zeros(P, jnp.int32),
        tex=i_neg, tri=i_neg, u=f0, v=f0, tu=f0, tv=f0,
    )

    rep = 0  # representative lane for near/far ordering (perf-only choice)

    def cond(st):
        return ~st["done"]

    def body(st):
        node = st["node"]
        bmin = scene.bvh_min[node]
        bmax = scene.bvh_max[node]
        leaf_cnt = scene.bvh_tri_count[node]
        leaf_off = scene.bvh_tri_offset[node]

        lane_hit = _aabb_hit(bmin, bmax, ro, rd, t_min, st["closest"]) & active
        enter = jnp.any(lane_hit)

        # ---------------- leaf: test up to max_leaf triangles ----------------
        def do_leaf(st):
            def tri_body(i, st):
                valid_slot = i < leaf_cnt
                tri_idx = scene.tri_indices[jnp.clip(leaf_off + i, 0,
                                                     scene.tri_indices.shape[0] - 1)]
                v0 = scene.tri_v0[tri_idx]
                v1 = scene.tri_v1[tri_idx]
                v2 = scene.tri_v2[tri_idx]
                ok, t, u, v = _mt_hit(v0, v1, v2, ro, rd)
                ok = ok & (t >= t_min) & (t <= st["closest"]) & valid_slot & active
                # interpolated (flat in practice) normal, then face flip
                w = 1.0 - u - v
                n0, n1, n2 = (scene.tri_n0[tri_idx], scene.tri_n1[tri_idx],
                              scene.tri_n2[tri_idx])
                nx = w * n0[0] + u * n1[0] + v * n2[0]
                ny = w * n0[1] + u * n1[1] + v * n2[1]
                nz = w * n0[2] + u * n1[2] + v * n2[2]
                nlen = jnp.sqrt(nx * nx + ny * ny + nz * nz)
                ninv = jnp.where(nlen > 0, 1.0 / jnp.maximum(nlen, 1e-38), 0.0)
                nx, ny, nz = nx * ninv, ny * ninv, nz * ninv
                front = (rd.x * nx + rd.y * ny + rd.z * nz) < 0.0
                sgn = jnp.where(front, 1.0, -1.0)
                new_closest = jnp.where(ok, t, st["closest"])
                if any_hit:
                    # collapse the lane's interval so later AABB tests fail
                    new_closest = jnp.where(ok, t_min, new_closest)
                st = dict(st)
                st["closest"] = new_closest
                st["hit"] = st["hit"] | ok
                st["nx"] = jnp.where(ok, sgn * nx, st["nx"])
                st["ny"] = jnp.where(ok, sgn * ny, st["ny"])
                st["nz"] = jnp.where(ok, sgn * nz, st["nz"])
                st["front"] = jnp.where(ok, front, st["front"])
                st["mat"] = jnp.where(ok, scene.tri_mat[tri_idx], st["mat"])
                st["tex"] = jnp.where(ok, scene.tri_tex[tri_idx], st["tex"])
                st["tri"] = jnp.where(ok, tri_idx.astype(jnp.int32), st["tri"])
                st["u"] = jnp.where(ok, u, st["u"])
                st["v"] = jnp.where(ok, v, st["v"])
                uv0 = scene.tri_uv0[tri_idx]
                uv1 = scene.tri_uv1[tri_idx]
                uv2 = scene.tri_uv2[tri_idx]
                st["tu"] = jnp.where(ok, w * uv0[0] + u * uv1[0] + v * uv2[0],
                                     st["tu"])
                st["tv"] = jnp.where(ok, w * uv0[1] + u * uv1[1] + v * uv2[1],
                                     st["tv"])
                return st

            return lax.fori_loop(0, max_leaf, tri_body, st)

        is_leaf = leaf_cnt > 0
        st = lax.cond(enter & is_leaf, do_leaf, lambda s: s, st)

        # ---------------- internal: pick children ----------------
        left = scene.bvh_left[node]
        right = scene.bvh_right[node]

        def child_mask(ci):
            return jnp.any(_aabb_hit(scene.bvh_min[ci], scene.bvh_max[ci],
                                     ro, rd, t_min, st["closest"]) & active)

        is_internal = enter & ~is_leaf
        hit_l = jnp.where(is_internal, child_mask(left), False)
        hit_r = jnp.where(is_internal, child_mask(right), False)

        # near/far ordering from a representative lane (perf heuristic;
        # the reference orders per ray, src/gpu_render.cu:433-454)
        cl = 0.5 * (scene.bvh_min[left] + scene.bvh_max[left])
        cr = 0.5 * (scene.bvh_min[right] + scene.bvh_max[right])
        dl = ((cl[0] - ro.x[rep]) * rd.x[rep] + (cl[1] - ro.y[rep]) * rd.y[rep]
              + (cl[2] - ro.z[rep]) * rd.z[rep])
        dr = ((cr[0] - ro.x[rep]) * rd.x[rep] + (cr[1] - ro.y[rep]) * rd.y[rep]
              + (cr[2] - ro.z[rep]) * rd.z[rep])
        near = jnp.where(dl < dr, left, right)
        far = jnp.where(dl < dr, right, left)

        both = hit_l & hit_r
        one = hit_l ^ hit_r
        descend = both | one
        next_direct = jnp.where(both, near, jnp.where(hit_l, left, right))

        # push far child when both hit
        sp = st["sp"]
        stack = lax.cond(
            both & (sp < STACK_CAP),
            lambda: st["stack"].at[sp].set(far),
            lambda: st["stack"])
        sp = jnp.where(both & (sp < STACK_CAP), sp + 1, sp)

        # pop when not descending
        can_pop = sp > 0
        pop_node = stack[jnp.maximum(sp - 1, 0)]
        node_next = jnp.where(descend, next_direct,
                              jnp.where(can_pop, pop_node, 0))
        sp = jnp.where(descend, sp, jnp.where(can_pop, sp - 1, sp))
        done = jnp.where(descend, False, ~can_pop)

        st = dict(st)
        st["node"] = node_next
        st["stack"] = stack
        st["sp"] = sp
        st["done"] = done
        return st

    st = lax.while_loop(cond, body, init)
    t_out = jnp.where(st["hit"], st["closest"], jnp.asarray(t_max, jnp.float32))
    return Hit(hit=st["hit"], t=t_out, nx=st["nx"], ny=st["ny"], nz=st["nz"],
               front=st["front"], mat=st["mat"], tex=st["tex"], tri=st["tri"],
               u=st["u"], v=st["v"], tu=st["tu"], tv=st["tv"],
               medium=jnp.full(ro.x.shape, -1, jnp.int32))


def sphere_pass(scene, ro: V3, rd: V3, t_min, hit: Hit, active,
                time=None) -> Hit:
    """Sequential sphere loop after the BVH pass (src/gpu_render.cu:529-545):
    iterates spheres in order, accepting t <= closest so later spheres win
    ties, exactly like the CUDA loop.  With per-lane `time`, moving-sphere
    centers are evaluated at c0 + t*(c2-c0) (inc/sphere.h:143-146)."""
    if scene.n_spheres == 0:
        return hit
    with_time = time is not None and scene.has_moving

    def body(i, carry):
        hit, closest = carry
        c = scene.sph_center[i]
        if with_time:
            c2 = scene.sph_center2[i]
            c = (c[0] + time * (c2[0] - c[0]),
                 c[1] + time * (c2[1] - c[1]),
                 c[2] + time * (c2[2] - c[2]))
        r = scene.sph_radius[i]
        oc = V3(ro.x - c[0], ro.y - c[1], ro.z - c[2])
        a = dot(rd, rd)
        half_b = dot(oc, rd)
        cq = dot(oc, oc) - r * r
        disc = half_b * half_b - a * cq
        has = disc >= 0.0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        root1 = (-half_b - sq) / a
        root2 = (-half_b + sq) / a
        r1ok = (root1 >= t_min) & (root1 <= closest)
        root = jnp.where(r1ok, root1, root2)
        ok = has & (root >= t_min) & (root <= closest) & active
        inv_r = 1.0 / jnp.where(r != 0, r, 1.0)
        px = ro.x + root * rd.x
        py = ro.y + root * rd.y
        pz = ro.z + root * rd.z
        nx = (px - c[0]) * inv_r
        ny = (py - c[1]) * inv_r
        nz = (pz - c[2]) * inv_r
        front = (rd.x * nx + rd.y * ny + rd.z * nz) < 0.0
        sgn = jnp.where(front, 1.0, -1.0)
        new = Hit(
            hit=hit.hit | ok,
            t=jnp.where(ok, root, hit.t),
            nx=jnp.where(ok, sgn * nx, hit.nx),
            ny=jnp.where(ok, sgn * ny, hit.ny),
            nz=jnp.where(ok, sgn * nz, hit.nz),
            front=jnp.where(ok, front, hit.front),
            mat=jnp.where(ok, scene.sph_mat[i], hit.mat),
            tex=jnp.where(ok, -1, hit.tex),
            tri=jnp.where(ok, -1, hit.tri),
            u=jnp.where(ok, 0.0, hit.u),
            v=jnp.where(ok, 0.0, hit.v),
            tu=jnp.where(ok, 0.0, hit.tu),
            tv=jnp.where(ok, 0.0, hit.tv),
            medium=jnp.where(ok, -1, hit.medium),
        )
        closest = jnp.where(ok, root, closest)
        return new, closest

    # hit.t already equals t_max on miss, so it is the running closest
    hit, _ = lax.fori_loop(0, scene.n_spheres, body, (hit, hit.t))
    return hit


def quad_pass(scene, ro: V3, rd: V3, t_min, hit: Hit, active) -> Hit:
    """Sequential quad loop after the sphere pass: the reference's
    vestigial quad.hit resurrected (inc/qaud.h:31-72) — plane hit with
    |denom| < 1e-8 parallel reject, then the interior test via the
    precomputed w vector; alpha/beta land in u/v (and tu/tv) exactly like
    the book sets rec.u/rec.v.  `<=` tie acceptance like the sphere loop
    (later primitive wins ties)."""
    if scene.n_quads == 0:
        return hit

    def body(i, carry):
        hit, closest = carry
        qn = scene.quad_n[i]
        denom = rd.x * qn[0] + rd.y * qn[1] + rd.z * qn[2]
        ok = jnp.abs(denom) >= 1e-8
        t = (scene.quad_d[i]
             - (ro.x * qn[0] + ro.y * qn[1] + ro.z * qn[2])) / jnp.where(
                 ok, denom, 1.0)
        ok = ok & (t >= t_min) & (t <= closest) & active
        q = scene.quad_q[i]
        px = ro.x + t * rd.x - q[0]
        py = ro.y + t * rd.y - q[1]
        pz = ro.z + t * rd.z - q[2]
        u_e = scene.quad_u[i]
        v_e = scene.quad_v[i]
        w = scene.quad_w[i]
        # alpha = w . (p x v), beta = w . (u x p)
        cx = py * v_e[2] - pz * v_e[1]
        cy = pz * v_e[0] - px * v_e[2]
        cz = px * v_e[1] - py * v_e[0]
        alpha = w[0] * cx + w[1] * cy + w[2] * cz
        cx = u_e[1] * pz - u_e[2] * py
        cy = u_e[2] * px - u_e[0] * pz
        cz = u_e[0] * py - u_e[1] * px
        beta = w[0] * cx + w[1] * cy + w[2] * cz
        ok = ok & (alpha >= 0.0) & (alpha <= 1.0) & (beta >= 0.0) & (beta <= 1.0)
        front = denom < 0.0
        sgn = jnp.where(front, 1.0, -1.0)
        new = Hit(
            hit=hit.hit | ok,
            t=jnp.where(ok, t, hit.t),
            nx=jnp.where(ok, sgn * qn[0], hit.nx),
            ny=jnp.where(ok, sgn * qn[1], hit.ny),
            nz=jnp.where(ok, sgn * qn[2], hit.nz),
            front=jnp.where(ok, front, hit.front),
            mat=jnp.where(ok, scene.quad_mat[i], hit.mat),
            tex=jnp.where(ok, -1, hit.tex),
            tri=jnp.where(ok, -1, hit.tri),
            u=jnp.where(ok, alpha, hit.u),
            v=jnp.where(ok, beta, hit.v),
            tu=jnp.where(ok, alpha, hit.tu),
            tv=jnp.where(ok, beta, hit.tv),
            medium=jnp.where(ok, -1, hit.medium),
        )
        closest = jnp.where(ok, t, closest)
        return new, closest

    hit, _ = lax.fori_loop(0, scene.n_quads, body, (hit, hit.t))
    return hit


def _boundary_interval(scene, m, ro: V3, rd: V3):
    """Entry/exit params of medium m's boundary along the ray, as the book's
    double-hit with universe intervals (inc/constant_medium.h:20-41).
    Returns (has, t0, t1) with t in unbounded range."""
    kind = scene.med_kind[m]
    # sphere
    c = scene.med_center[m]
    r = scene.med_radius[m]
    oc = V3(ro.x - c[0], ro.y - c[1], ro.z - c[2])
    a = dot(rd, rd)
    half_b = dot(oc, rd)
    cq = dot(oc, oc) - r * r
    disc = half_b * half_b - a * cq
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    s_has = disc > 0.0
    s_t0 = (-half_b - sq) / a
    s_t1 = (-half_b + sq) / a
    # box: slab interval
    bmin = scene.med_min[m]
    bmax = scene.med_max[m]
    t0 = jnp.full_like(ro.x, -3e38)
    t1 = jnp.full_like(ro.x, 3e38)
    for axis, (o, d) in enumerate(((ro.x, rd.x), (ro.y, rd.y), (ro.z, rd.z))):
        inv = 1.0 / d
        ta = (bmin[axis] - o) * inv
        tb = (bmax[axis] - o) * inv
        lo = jnp.minimum(ta, tb)
        hi = jnp.maximum(ta, tb)
        t0 = jnp.maximum(t0, lo)
        t1 = jnp.minimum(t1, hi)
    b_has = t1 > t0
    is_sph = kind == 0
    return (jnp.where(is_sph, s_has, b_has),
            jnp.where(is_sph, s_t0, t0),
            jnp.where(is_sph, s_t1, t1))


def media_pass(scene, ro: V3, rd: V3, t_min, hit: Hit, active, state):
    """Probabilistic constant-medium hits (inc/constant_medium.h:20-53
    semantics): free path ~ Exp(density); scatter if inside the clipped
    boundary interval and before the nearest surface.  One RNG draw per
    medium per call for active lanes (uniform draw schedule)."""
    if scene.n_media == 0:
        return hit, state

    rlen = jnp.sqrt(dot(rd, rd))

    def body(i, carry):
        hit, state = carry
        has, t0, t1 = _boundary_interval(scene, i, ro, rd)
        closest = hit.t
        e0 = jnp.maximum(t0, t_min)
        e1 = jnp.minimum(t1, closest)
        inside = has & (e0 < e1) & active
        u, state = rngmod.draw(state, active)
        # guard log(0)
        dist_inside = (e1 - e0) * rlen
        hit_dist = scene.med_neg_inv_density[i] * jnp.log(jnp.maximum(u, 1e-30))
        ok = inside & (hit_dist <= dist_inside)
        t = e0 + hit_dist / jnp.maximum(rlen, 1e-30)
        new = Hit(
            hit=hit.hit | ok,
            t=jnp.where(ok, t, hit.t),
            nx=jnp.where(ok, 1.0, hit.nx),   # arbitrary, unused for media
            ny=jnp.where(ok, 0.0, hit.ny),
            nz=jnp.where(ok, 0.0, hit.nz),
            front=jnp.where(ok, True, hit.front),
            mat=jnp.where(ok, 0, hit.mat),
            tex=jnp.where(ok, -1, hit.tex),
            tri=jnp.where(ok, -1, hit.tri),
            u=jnp.where(ok, 0.0, hit.u),
            v=jnp.where(ok, 0.0, hit.v),
            tu=jnp.where(ok, 0.0, hit.tu),
            tv=jnp.where(ok, 0.0, hit.tv),
            medium=jnp.where(ok, i, hit.medium),
        )
        return new, state

    hit, state = lax.fori_loop(0, scene.n_media, body, (hit, state))
    return hit, state


def lane_traverse(scene, ro: V3, rd: V3, t_min, t_max, active,
                  any_hit: bool = False):
    """Per-LANE stackless BVH traversal over the octant thread table
    (models/scene.py thr_pack): every lane walks with its OWN node
    cursor in its own direction octant's front-to-back preorder — the
    per-ray near/far ordering of the reference (src/gpu_render.cu:
    433-454), with `skip` threads instead of a stack.

    This is the XLA fallback for scenes too big for packet traversal:
    a 1024-lane packet's *union* walk visits nearly every node once
    bounce waves decohere (measured ~0.8 ms/ray at 33k tris — 160x90
    @ 2 spp took 50 s warm, and one step up crashed the TPU worker's
    execution watchdog), while per-lane walks are bounded by each
    ray's own visit count.  Control flow is elementwise: one row
    gather from bvh_pack + one thread-pair gather + max_leaf row
    gathers from tri_pack per iteration, over all lanes at once.

    Returns (t, u, v, tri) with `tri` a tri_pack row index (leaf
    order, -1 = miss) — the same contract as pallas_trace.traverse,
    so `hit_from_kernel` assembles the Hit (and the shading math is
    shared bit-for-bit with the Pallas split path)."""
    shape = ro.x.shape
    end = int(scene.bvh_min.shape[0])          # terminal thread target
    bp = int(scene.bvh_pack.shape[0])
    tmax_f = jnp.asarray(t_max, jnp.float32)
    tmin_f = jnp.asarray(t_min, jnp.float32)

    octant = ((rd.x < 0).astype(jnp.int32)
              + 2 * (rd.y < 0).astype(jnp.int32)
              + 4 * (rd.z < 0).astype(jnp.int32))
    thr_flat = scene.thr_pack.reshape(-1)

    has_work = active & jnp.asarray(scene.n_tris > 0)
    init = dict(
        node=jnp.where(has_work, 0, end).astype(jnp.int32),
        closest=jnp.where(active, tmax_f, tmin_f),
        u=jnp.zeros(shape, jnp.float32),
        v=jnp.zeros(shape, jnp.float32),
        tri=jnp.full(shape, -1, jnp.int32),
    )
    max_leaf = int(scene.max_leaf)

    def cond(c):
        return jnp.any(c["node"] < end)

    def body(c):
        node = c["node"]
        nodec = jnp.clip(node, 0, bp - 1)
        nf = scene.bvh_pack[nodec]             # (..., 16) row gather
        live = node < end

        # slab test against the lane's own interval (bbox_hit,
        # src/gpu_render.cu:285-315: miss iff t_max <= t_min)
        tmin_c = jnp.broadcast_to(tmin_f, shape)
        tmax_c = c["closest"]
        for axis, (o, d) in enumerate(
                ((ro.x, rd.x), (ro.y, rd.y), (ro.z, rd.z))):
            inv = 1.0 / d
            t0 = (nf[..., axis] - o) * inv
            t1 = (nf[..., 3 + axis] - o) * inv
            neg = inv < 0.0
            lo = jnp.where(neg, t1, t0)
            hi = jnp.where(neg, t0, t1)
            tmin_c = jnp.maximum(tmin_c, lo)
            tmax_c = jnp.minimum(tmax_c, hi)
        enter = (tmax_c > tmin_c) & live

        leaf_off = nf[..., 7].astype(jnp.int32)
        leaf_cnt = nf[..., 8].astype(jnp.int32)
        is_leaf = leaf_cnt > 0
        at_leaf = enter & is_leaf

        def tri_body(i, st):
            closest, uu, vv, tri = st
            row = jnp.clip(leaf_off + i, 0, scene.tri_pack.shape[0] - 1)
            tp = scene.tri_pack[row]           # (..., 16) row gather
            # Moller-Trumbore with the precomputed e1/e2 edge columns
            # (same math as the Pallas kernels; |det| < 1e-8 reject,
            # src/gpu_render.cu:322-380)
            pvx = rd.y * tp[..., 8] - rd.z * tp[..., 7]
            pvy = rd.z * tp[..., 6] - rd.x * tp[..., 8]
            pvz = rd.x * tp[..., 7] - rd.y * tp[..., 6]
            det = tp[..., 3] * pvx + tp[..., 4] * pvy + tp[..., 5] * pvz
            ok = jnp.abs(det) >= 1e-8
            inv_det = 1.0 / jnp.where(ok, det, 1.0)
            tvx = ro.x - tp[..., 0]
            tvy = ro.y - tp[..., 1]
            tvz = ro.z - tp[..., 2]
            u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
            ok = ok & (u >= 0.0) & (u <= 1.0)
            qvx = tvy * tp[..., 5] - tvz * tp[..., 4]
            qvy = tvz * tp[..., 3] - tvx * tp[..., 5]
            qvz = tvx * tp[..., 4] - tvy * tp[..., 3]
            v = (rd.x * qvx + rd.y * qvy + rd.z * qvz) * inv_det
            ok = ok & (v >= 0.0) & (u + v <= 1.0)
            t = (tp[..., 6] * qvx + tp[..., 7] * qvy
                 + tp[..., 8] * qvz) * inv_det
            ok = ok & (t >= tmin_f) & (t <= closest) & at_leaf \
                & (i < leaf_cnt)
            if any_hit:
                # collapse the interval so every later test fails
                closest = jnp.where(ok, tmin_f, closest)
            else:
                closest = jnp.where(ok, t, closest)
            uu = jnp.where(ok, u, uu)
            vv = jnp.where(ok, v, vv)
            tri = jnp.where(ok, row, tri)
            return closest, uu, vv, tri

        closest, uu, vv, tri = lax.fori_loop(
            0, max_leaf, tri_body, (c["closest"], c["u"], c["v"], c["tri"]))

        # next node: the lane's octant thread — near child on entered
        # internal nodes, the post-subtree thread otherwise
        tidx = nodec * 16 + 2 * octant
        enter_n = thr_flat[tidx].astype(jnp.int32)
        skip_n = thr_flat[tidx + 1].astype(jnp.int32)
        nxt = jnp.where(enter & ~is_leaf, enter_n, skip_n)
        if any_hit:
            nxt = jnp.where(closest <= tmin_f, end, nxt)  # park on hit
        nxt = jnp.where(live, nxt, end)
        return dict(node=nxt, closest=closest, u=uu, v=vv, tri=tri)

    st = lax.while_loop(cond, body, init)
    t_out = jnp.where(st["tri"] >= 0, st["closest"], tmax_f)
    return t_out, st["u"], st["v"], st["tri"]


# Above this many triangles the XLA fallback uses the per-lane walk.
# Packet union fronts degenerate on incoherent bounce waves: measured
# warm frame times at 160x90 @ 2 spp (v5e) — 5.8k tris: packet 0.64 s
# vs lane 0.30 s; 12.4k: 12.5 s vs 0.32 s; 33k: 50 s vs ~0.4 s; 40k+:
# packet exceeds the TPU worker's execution watchdog (worker crash)
# while lane runs 0.41 s at 47.7k and 0.88 s at 130k.  Only tiny
# scenes (coherent fronts, shared node loads) keep the packet walk.
LANE_SWITCH_TRIS = 2048


def scene_hit_flat_lane(scene, ro: V3, rd: V3, t_min, t_max, active,
                        state=None, any_hit: bool = False, time=None):
    """scene_hit over a full (K, P) lane grid via `lane_traverse` (the
    big-scene XLA fallback; same Hit-assembly as the Pallas split path,
    plus vn interpolation for smooth scenes)."""
    t, u, v, tri = lane_traverse(scene, ro, rd, t_min, t_max, active,
                                 any_hit=any_hit)
    hit = hit_from_kernel(scene, ro, rd, t, u, v, tri, t_max)
    if scene.has_smooth:
        # interpolate + normalize the vn normals (tri_aux rows
        # [n0 n1 n2 ...], exact split-path formula at :158-167)
        trc = jnp.clip(tri, 0, scene.tri_aux.shape[0] - 1)
        ta = scene.tri_aux[trc]
        w = 1.0 - u - v
        nx = w * ta[..., 0] + u * ta[..., 3] + v * ta[..., 6]
        ny = w * ta[..., 1] + u * ta[..., 4] + v * ta[..., 7]
        nz = w * ta[..., 2] + u * ta[..., 5] + v * ta[..., 8]
        nlen = jnp.sqrt(nx * nx + ny * ny + nz * nz)
        ninv = jnp.where(nlen > 0, 1.0 / jnp.maximum(nlen, 1e-38), 0.0)
        nx, ny, nz = nx * ninv, ny * ninv, nz * ninv
        front = (rd.x * nx + rd.y * ny + rd.z * nz) < 0.0
        sgn = jnp.where(front, 1.0, -1.0)
        m = hit.hit
        hit = hit._replace(
            nx=jnp.where(m, sgn * nx, hit.nx),
            ny=jnp.where(m, sgn * ny, hit.ny),
            nz=jnp.where(m, sgn * nz, hit.nz),
            front=jnp.where(m, front, hit.front))
    hit = sphere_pass(scene, ro, rd, t_min, hit, active, time=time)
    hit = quad_pass(scene, ro, rd, t_min, hit, active)
    if scene.n_media > 0:
        assert state is not None, "media require an RNG state"
        hit, state = media_pass(scene, ro, rd, t_min, hit, active, state)
    return hit, state


def scene_hit(scene, ro: V3, rd: V3, t_min, t_max, active, state=None,
              any_hit: bool = False, time=None):
    """Full scene intersection for one packet: BVH triangles, then spheres,
    then media.  Returns (Hit, state); `state` unchanged when no media."""
    hit = packet_traverse(scene, ro, rd, t_min, t_max, active, any_hit=any_hit)
    hit = sphere_pass(scene, ro, rd, t_min, hit, active, time=time)
    hit = quad_pass(scene, ro, rd, t_min, hit, active)
    if scene.n_media > 0:
        assert state is not None, "media require an RNG state"
        hit, state = media_pass(scene, ro, rd, t_min, hit, active, state)
    return hit, state


def hit_from_kernel(scene, ro: V3, rd: V3, t, u, v, tri, t_max) -> Hit:
    """Assemble a full Hit from the Pallas traversal kernel's raw output
    with ONE consolidated row gather from tri_shade (normal + uvs + mat +
    tex in a single (.,16) fetch — TPU gathers are op-overhead-bound)."""
    hitmask = tri >= 0
    trc = jnp.clip(tri, 0, scene.tri_shade.shape[0] - 1)
    ts = scene.tri_shade[trc]  # (..., 16)
    nx, ny, nz = ts[..., 0], ts[..., 1], ts[..., 2]
    w = 1.0 - u - v
    tu = w * ts[..., 3] + u * ts[..., 5] + v * ts[..., 7]
    tv = w * ts[..., 4] + u * ts[..., 6] + v * ts[..., 8]
    mat = ts[..., 9].astype(jnp.int32)
    tex = ts[..., 10].astype(jnp.int32)
    front = (rd.x * nx + rd.y * ny + rd.z * nz) < 0.0
    sgn = jnp.where(front, 1.0, -1.0)
    zero = jnp.zeros_like(t)
    return Hit(
        hit=hitmask,
        t=jnp.where(hitmask, t, jnp.asarray(t_max, jnp.float32)),
        nx=jnp.where(hitmask, sgn * nx, zero),
        ny=jnp.where(hitmask, sgn * ny, zero),
        nz=jnp.where(hitmask, sgn * nz, zero),
        front=jnp.where(hitmask, front, False),
        mat=jnp.where(hitmask, mat, 0),
        tex=jnp.where(hitmask, tex, -1),
        tri=tri,
        u=jnp.where(hitmask, u, 0.0),
        v=jnp.where(hitmask, v, 0.0),
        tu=jnp.where(hitmask, tu, 0.0),
        tv=jnp.where(hitmask, tv, 0.0),
        medium=jnp.full(t.shape, -1, jnp.int32),
    )


def scene_hit_flat_sun(scene, ro: V3, rd: V3, t_min, t_max, active,
                       sun_ldir: V3, shadow_bias: float):
    """Fused closest-hit + sun-shadow for triangle-only scenes (no spheres,
    no media): one Pallas launch instead of two per bounce wave.  Returns
    (Hit, blocked) where `blocked` is valid on triangle-hit lanes."""
    from dsrt_tpu.ops import pallas_trace
    t, u, v, tri, blocked = pallas_trace.traverse_with_sun(
        scene, ro, rd, active, float(t_min), float(t_max), sun_ldir,
        float(shadow_bias))
    hit = hit_from_kernel(scene, ro, rd, t, u, v, tri, t_max)
    return hit, blocked


def scene_hit_flat(scene, ro: V3, rd: V3, t_min, t_max, active, state=None,
                   any_hit: bool = False, time=None):
    """scene_hit over a full (K, P) lane grid using the Pallas traversal
    kernel for triangles (sphere/media passes are shape-polymorphic)."""
    from dsrt_tpu.ops import pallas_trace
    if scene.n_tris > 0:
        t, u, v, tri = pallas_trace.traverse(scene, ro, rd, active,
                                             float(t_min), float(t_max),
                                             any_hit=any_hit)
        hit = hit_from_kernel(scene, ro, rd, t, u, v, tri, t_max)
    else:
        shape = ro.x.shape
        f0 = jnp.zeros(shape, jnp.float32)
        hit = Hit(hit=jnp.zeros(shape, bool),
                  t=jnp.full(shape, t_max, jnp.float32),
                  nx=f0, ny=f0, nz=f0, front=jnp.zeros(shape, bool),
                  mat=jnp.zeros(shape, jnp.int32),
                  tex=jnp.full(shape, -1, jnp.int32),
                  tri=jnp.full(shape, -1, jnp.int32), u=f0, v=f0,
                  tu=f0, tv=f0,
                  medium=jnp.full(shape, -1, jnp.int32))
    hit = sphere_pass(scene, ro, rd, t_min, hit, active, time=time)
    hit = quad_pass(scene, ro, rd, t_min, hit, active)
    if scene.n_media > 0:
        assert state is not None, "media require an RNG state"
        hit, state = media_pass(scene, ro, rd, t_min, hit, active, state)
    return hit, state
