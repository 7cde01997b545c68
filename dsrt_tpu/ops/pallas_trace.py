"""Pallas TPU kernel: stackless threaded-BVH packet traversal.

The performance-critical replacement for the XLA packet traversal in
ops/trace.py (the CUDA megakernel's `bvh_hit_closest`,
src/gpu_render.cu:387-473, re-designed twice over for TPU):

- the whole scene (BVH nodes + triangles) lives in VMEM for the duration of
  the kernel — zero HBM traffic per traversal step;
- one grid step = one packet of 1024 rays shaped (8, 128) — a full VPU tile
  per vector component;
- control flow is a single scalar node index per packet over a *skip-pointer
  (threaded) preorder BVH*: descend -> node+1, miss/leaf -> skip.  No stack,
  no per-ray state machines;
- node/triangle fetches are scalar loads from VMEM (9 scalars per node, 9
  per leaf triangle) broadcast against the packet's lanes;
- the traversal loop runs entirely on-core: no per-iteration XLA dispatch
  (the reason the pure-XLA path is ~100x slower).

Semantics match ops/trace.py (same epsilons, `<=` tie acceptance) with two
benign deviations: leaf visit order is DFS (no per-ray near/far ordering,
a work heuristic only) and NaN slab corner cases resolve to miss.

VMEM budget: tables are (rows, 16) f32, padded by Mosaic to (rows, 128)
lanes, i.e. 512 B/row.  ~12 MB budget => ~12k nodes + 12k triangles; larger
scenes fall back to the XLA path (see `fits_vmem`).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import jax.lax as lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dsrt_tpu.ops.linalg import V3

TILE_H = 8
TILE_W = 128
# Rays per grid step: block_h x 128 lanes (block_h/8 packets fused).  Bigger
# blocks amortize the per-grid-step pipeline overhead (measured ~47us/step
# on v5e) at the cost of a larger traversal union per block.  32 measured
# best on v5e for the ISS scene; configured via exec_opts.OPTS.block_h.
from dsrt_tpu.exec_opts import OPTS as _OPTS


def _block_h() -> int:
    return _OPTS.block_h

_VMEM_BUDGET_ROWS = 24000  # (Bp + Tp) rows at 512 B/row ~= 12 MB


def fits_vmem(scene) -> bool:
    """Dense-row mode budget (512 B/record)."""
    return (scene.bvh_pack.shape[0] + scene.tri_pack.shape[0]
            <= _VMEM_BUDGET_ROWS)


def fits_vmem_packed(scene) -> bool:
    """Packed mode budget (64 B/record): ~8x the dense capacity."""
    return (scene.bvh_pk8.shape[0] + scene.tri_pk8.shape[0]
            <= _VMEM_BUDGET_ROWS)


def fits_vmem_fused(scene, extra_rows: int = 0) -> bool:
    """Fused megakernel, dense tri mode: wide-BVH rows + tri rows +
    the tile-packed leaf table (vectorized leaf engine).  `extra_rows`
    accounts for optional shading tables (aux tile / texture planes)."""
    return (scene.bvh_wide.shape[0] + scene.tri_pack.shape[0]
            + scene.tri_tile.shape[0] + extra_rows <= _VMEM_BUDGET_ROWS)


# Fused-kernel VMEM-RESIDENT budget: the fused pallas_call raises
# Mosaic's scoped-VMEM limit to 119 MB (of the v5e's 128), so all
# tables can stay resident up to ~82 MB — headroom is reserved for the
# framebuffer outputs at 1080p (~25 MB on the same scoped stack) plus
# windows/scratch.  Beyond this the HBM-streamed leaf mode takes over.
_FUSED_RESIDENT_ROWS = 160000


def fits_vmem_fused_packed(scene, extra_rows: int = 0) -> bool:
    """Fused megakernel, packed tri fallback (64 B/tri) + tile table."""
    return (scene.bvh_wide.shape[0] + scene.tri_pk8.shape[0]
            + scene.tri_tile.shape[0] + extra_rows
            <= _FUSED_RESIDENT_ROWS)


def fits_vmem_fused_hbm(scene, extra_rows: int = 0) -> bool:
    """Fused megakernel, HBM-streamed leaf mode (exec_opts.hbm_tris):
    only the wide-BVH table stays VMEM-resident (the tri tables it
    shares the budget with elsewhere are DMA'd per entered leaf
    window), so the node table alone may take ~86 MB of the v5e's
    128 MB VMEM (the kernel raises Mosaic's scoped-VMEM limit to
    119 MB; ray blocks + leaf windows + outputs take ~6 MB).
    Validated on v5e at 1.32M tris (43.8k wide-node rows, 22 MB) and
    at the 2.4M-tri edge."""
    return (scene.bvh_wide.shape[0] + extra_rows
            <= 7 * _VMEM_BUDGET_ROWS)


def backend_is_tpu() -> bool:
    try:
        plat = jax.devices()[0].platform
    except Exception:
        return False
    return plat in ("tpu", "axon")


def _load_many(tab_ref, rec, cols, packed: bool):
    """Fetch scalar fields `cols` of record `rec` from a kernel table.

    Dense mode: direct dynamic-sublane scalar loads from a (N,16) table.
    Packed mode: records live 8-per-128-lane-row (64 B/record); Mosaic has
    no dynamic-lane scalar load, so fields are extracted from the (1,128)
    row with static-lane mask reductions (~2x the per-visit cost, 8x the
    VMEM capacity)."""
    if not packed:
        return [tab_ref[rec, c] for c in cols]
    row = tab_ref[pl.ds(rec // 8, 1), :]
    base = (rec % 8) * 16
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    return [jnp.sum(jnp.where(lane == base + c, row, 0.0)) for c in cols]


def _kernel_common(box_ref, tri_ref, thr_ref, sun_ref, ox_ref, oy_ref,
                   oz_ref, dx_ref, dy_ref, dz_ref, act_ref,
                   t_ref, u_ref, v_ref, id_ref, sh_ref,
                   *, n_nodes: int, max_leaf: int, t_min: float,
                   t_max: float, any_hit: bool, packed: bool,
                   with_shadow: bool):
    ox, oy, oz = ox_ref[...], oy_ref[...], oz_ref[...]
    dx, dy, dz = dx_ref[...], dy_ref[...], dz_ref[...]
    act = act_ref[...] > 0

    inv_dx = 1.0 / dx
    inv_dy = 1.0 / dy
    inv_dz = 1.0 / dz

    tmin_f = jnp.float32(t_min)
    tmax_f = jnp.float32(t_max)

    shape = ox.shape
    closest0 = jnp.where(act, tmax_f, tmin_f)
    best_t0 = jnp.full(shape, tmax_f)
    best_u0 = jnp.zeros(shape, jnp.float32)
    best_v0 = jnp.zeros(shape, jnp.float32)
    best_i0 = jnp.full(shape, -1, jnp.int32)
    zero = jnp.zeros(shape, jnp.float32)

    # ---- block direction octant (majority vote of active lanes) -------
    # selects the thread-table column pair for front-to-back descent;
    # any octant is CORRECT (the table only changes visit order), the
    # majority octant just maximizes the early-out benefit.
    actf = jnp.where(act, 1.0, 0.0)
    half = 0.5 * jnp.maximum(jnp.sum(actf), 1.0)
    bx = jnp.sum(jnp.where(act & (dx < 0.0), 1.0, 0.0)) > half
    by = jnp.sum(jnp.where(act & (dy < 0.0), 1.0, 0.0)) > half
    bz = jnp.sum(jnp.where(act & (dz < 0.0), 1.0, 0.0)) > half
    octant = (bx.astype(jnp.int32) + 2 * by.astype(jnp.int32)
              + 4 * bz.astype(jnp.int32))
    ent_lane = 2 * octant
    skp_lane = 2 * octant + 1

    def _load_thread(node):
        """(enter, skip) i32 scalars for `node` in the block's octant.
        The lane index is dynamic (octant-dependent), so both modes
        extract via a static-iota mask reduction over the node's row."""
        if packed:
            row = thr_ref[pl.ds(node // 8, 1), :]
            base = (node % 8) * 16
        else:
            row = thr_ref[pl.ds(node, 1), :]
            base = 0
        lane = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
        ent = jnp.sum(jnp.where(lane == base + ent_lane, row, 0.0))
        skp = jnp.sum(jnp.where(lane == base + skp_lane, row, 0.0))
        return ent.astype(jnp.int32), skp.astype(jnp.int32)

    def cond(c):
        return c[0] < n_nodes

    def body(c):
        node, closest, bt, bu, bv, bi, bn = c
        (minx, miny, minz, maxx, maxy, maxz, off_f,
         cnt_f) = _load_many(box_ref, node, (0, 1, 2, 3, 4, 5, 7, 8),
                             packed)
        enter_n, skip = _load_thread(node)
        off = off_f.astype(jnp.int32)
        cnt = cnt_f.astype(jnp.int32)

        t0 = (minx - ox) * inv_dx
        t1 = (maxx - ox) * inv_dx
        lo = jnp.minimum(t0, t1)
        hi = jnp.maximum(t0, t1)
        t0 = (miny - oy) * inv_dy
        t1 = (maxy - oy) * inv_dy
        lo = jnp.maximum(lo, jnp.minimum(t0, t1))
        hi = jnp.minimum(hi, jnp.maximum(t0, t1))
        t0 = (minz - oz) * inv_dz
        t1 = (maxz - oz) * inv_dz
        lo = jnp.maximum(lo, jnp.minimum(t0, t1))
        hi = jnp.minimum(hi, jnp.maximum(t0, t1))
        lo = jnp.maximum(lo, tmin_f)
        hi = jnp.minimum(hi, closest)
        boxhit = (hi > lo) & act
        enter = jnp.any(boxhit)

        is_leaf = cnt > 0

        def leaf_body(i, lc):
            closest, bt, bu, bv, bi, bn = lc
            row = off + i

            def hit_tri(args):
                closest, bt, bu, bv, bi, bn = args
                (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y,
                 e2z) = _load_many(tri_ref, row, range(9), packed)
                # Moller-Trumbore with precomputed edges
                pvx = dy * e2z - dz * e2y
                pvy = dz * e2x - dx * e2z
                pvz = dx * e2y - dy * e2x
                det = e1x * pvx + e1y * pvy + e1z * pvz
                ok = jnp.abs(det) >= 1e-8
                inv_det = 1.0 / jnp.where(ok, det, 1.0)
                tvx = ox - v0x
                tvy = oy - v0y
                tvz = oz - v0z
                u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                ok = ok & (u >= 0.0) & (u <= 1.0)
                qvx = tvy * e1z - tvz * e1y
                qvy = tvz * e1x - tvx * e1z
                qvz = tvx * e1y - tvy * e1x
                v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
                ok = ok & (v >= 0.0) & (u + v <= 1.0)
                t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                ok = ok & (t >= tmin_f) & (t <= closest) & act
                if any_hit:
                    closest = jnp.where(ok, tmin_f, closest)
                else:
                    closest = jnp.where(ok, t, closest)
                bt = jnp.where(ok, t, bt)
                bu = jnp.where(ok, u, bu)
                bv = jnp.where(ok, v, bv)
                bi = jnp.where(ok, row, bi)
                if with_shadow:
                    # track the face-flipped shading normal (scalar
                    # geometric normal per triangle, per-lane sign)
                    gx = e1y * e2z - e1z * e2y
                    gy = e1z * e2x - e1x * e2z
                    gz = e1x * e2y - e1y * e2x
                    gl = 1.0 / jnp.sqrt(gx * gx + gy * gy + gz * gz + 1e-38)
                    gx, gy, gz = gx * gl, gy * gl, gz * gl
                    sgn = jnp.where(dx * gx + dy * gy + dz * gz < 0.0,
                                    1.0, -1.0)
                    bn = (jnp.where(ok, sgn * gx, bn[0]),
                          jnp.where(ok, sgn * gy, bn[1]),
                          jnp.where(ok, sgn * gz, bn[2]))
                return closest, bt, bu, bv, bi, bn

            return hit_tri((closest, bt, bu, bv, bi, bn))

        def do_leaf(args):
            # dynamic bound: SAH leaves average < max_leaf triangles
            return lax.fori_loop(0, cnt, leaf_body, args)

        closest, bt, bu, bv, bi, bn = lax.cond(
            enter & is_leaf, do_leaf, lambda a: a,
            (closest, bt, bu, bv, bi, bn))

        descend = enter & jnp.logical_not(is_leaf)
        node_next = jnp.where(descend, enter_n, skip)
        if any_hit:
            # all active lanes occluded -> escape
            alive = jnp.any(closest > tmin_f)
            node_next = jnp.where(alive, node_next, n_nodes)
        return node_next, closest, bt, bu, bv, bi, bn

    _, closest, bt, bu, bv, bi, bn = lax.while_loop(
        cond, body, (jnp.int32(0), closest0, best_t0, best_u0, best_v0,
                     best_i0, (zero, zero, zero)))

    t_ref[...] = bt
    u_ref[...] = bu
    v_ref[...] = bv
    id_ref[...] = bi

    if with_shadow:
        # ---- fused sun shadow pass (any-hit) over the SAME block ------
        # direction is uniform (the frame's sun), so the Moller-Trumbore
        # p-vector and determinant become per-triangle scalars.
        ldx = sun_ref[0]
        ldy = sun_ref[1]
        ldz = sun_ref[2]
        bias = sun_ref[3]
        hitm = bi >= 0
        sox = ox + bt * dx + bias * bn[0]
        soy = oy + bt * dy + bias * bn[1]
        soz = oz + bt * dz + bias * bn[2]
        inv_sx = 1.0 / ldx
        inv_sy = 1.0 / ldy
        inv_sz = 1.0 / ldz
        sc0 = jnp.where(hitm & act, tmax_f, tmin_f)

        def scond(c):
            return c[0] < n_nodes

        def sbody(c):
            node, sc, blocked = c
            (minx, miny, minz, maxx, maxy, maxz, skip_f, off_f,
             cnt_f) = _load_many(box_ref, node, range(9), packed)
            skip = skip_f.astype(jnp.int32)
            off = off_f.astype(jnp.int32)
            cnt = cnt_f.astype(jnp.int32)

            t0 = (minx - sox) * inv_sx
            t1 = (maxx - sox) * inv_sx
            lo = jnp.minimum(t0, t1)
            hi = jnp.maximum(t0, t1)
            t0 = (miny - soy) * inv_sy
            t1 = (maxy - soy) * inv_sy
            lo = jnp.maximum(lo, jnp.minimum(t0, t1))
            hi = jnp.minimum(hi, jnp.maximum(t0, t1))
            t0 = (minz - soz) * inv_sz
            t1 = (maxz - soz) * inv_sz
            lo = jnp.maximum(lo, jnp.minimum(t0, t1))
            hi = jnp.minimum(hi, jnp.maximum(t0, t1))
            lo = jnp.maximum(lo, tmin_f)
            hi = jnp.minimum(hi, sc)
            enter = jnp.any(hi > lo)
            is_leaf = cnt > 0

            def leaf_body(i, lc):
                sc, blocked = lc
                row = off + i

                def hit_tri(args):
                    sc, blocked = args
                    (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y,
                     e2z) = _load_many(tri_ref, row, range(9), packed)
                    pvx = ldy * e2z - ldz * e2y      # scalar
                    pvy = ldz * e2x - ldx * e2z
                    pvz = ldx * e2y - ldy * e2x
                    det = e1x * pvx + e1y * pvy + e1z * pvz
                    ok0 = jnp.abs(det) >= 1e-8
                    inv_det = 1.0 / jnp.where(ok0, det, 1.0)
                    tvx = sox - v0x
                    tvy = soy - v0y
                    tvz = soz - v0z
                    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                    ok = ok0 & (u >= 0.0) & (u <= 1.0)
                    qvx = tvy * e1z - tvz * e1y
                    qvy = tvz * e1x - tvx * e1z
                    qvz = tvx * e1y - tvy * e1x
                    v = (ldx * qvx + ldy * qvy + ldz * qvz) * inv_det
                    ok = ok & (v >= 0.0) & (u + v <= 1.0)
                    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                    ok = ok & (t >= tmin_f) & (t <= sc)
                    sc = jnp.where(ok, tmin_f, sc)   # any-hit collapse
                    # f32 carry: bool vector carries trip a Mosaic layout
                    # bug in nested scf conditionals
                    blocked = jnp.where(ok, 1.0, blocked)
                    return sc, blocked

                return hit_tri((sc, blocked))

            sc, blocked = lax.cond(
                enter & is_leaf,
                lambda a: lax.fori_loop(0, cnt, leaf_body, a),
                lambda a: a, (sc, blocked))

            descend = enter & jnp.logical_not(is_leaf)
            node_next = jnp.where(descend, node + 1, skip)
            open_lanes = jnp.any(sc > tmin_f)
            node_next = jnp.where(open_lanes, node_next, n_nodes)
            return node_next, sc, blocked

        _, _, blocked = lax.while_loop(
            scond, sbody,
            (jnp.int32(0), sc0, jnp.zeros(shape, jnp.float32)))
        sh_ref[...] = blocked


def _traverse_kernel(box_ref, tri_ref, thr_ref, ox_ref, oy_ref, oz_ref,
                     dx_ref, dy_ref, dz_ref, act_ref,
                     t_ref, u_ref, v_ref, id_ref,
                     *, n_nodes: int, max_leaf: int, t_min: float,
                     t_max: float, any_hit: bool, packed: bool = False):
    _kernel_common(box_ref, tri_ref, thr_ref, None, ox_ref, oy_ref, oz_ref,
                   dx_ref, dy_ref, dz_ref, act_ref,
                   t_ref, u_ref, v_ref, id_ref, None,
                   n_nodes=n_nodes, max_leaf=max_leaf, t_min=t_min,
                   t_max=t_max, any_hit=any_hit, packed=packed,
                   with_shadow=False)


def _traverse_sun_kernel(box_ref, tri_ref, thr_ref, sun_ref, ox_ref, oy_ref,
                         oz_ref, dx_ref, dy_ref, dz_ref, act_ref,
                         t_ref, u_ref, v_ref, id_ref, sh_ref,
                         *, n_nodes: int, max_leaf: int, t_min: float,
                         t_max: float, packed: bool = False):
    _kernel_common(box_ref, tri_ref, thr_ref, sun_ref, ox_ref, oy_ref,
                   oz_ref, dx_ref, dy_ref, dz_ref, act_ref,
                   t_ref, u_ref, v_ref, id_ref, sh_ref,
                   n_nodes=n_nodes, max_leaf=max_leaf, t_min=t_min,
                   t_max=t_max, any_hit=False, packed=packed,
                   with_shadow=True)


@partial(jax.jit, static_argnames=("n_nodes", "max_leaf", "t_min", "t_max",
                                   "any_hit", "k", "packed", "block_h"))
def _run_traverse(bvh_pack, tri_pack, thr_pack, ox, oy, oz, dx, dy, dz, act,
                  n_nodes: int, max_leaf: int, t_min: float, t_max: float,
                  any_hit: bool, k: int, packed: bool = False,
                  block_h: int = 32):
    kern = partial(_traverse_kernel, n_nodes=n_nodes, max_leaf=max_leaf,
                   t_min=t_min, t_max=t_max, any_hit=any_hit, packed=packed)
    ray_spec = pl.BlockSpec((block_h, TILE_W), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = (k * TILE_H, TILE_W)
    n_blocks = (k * TILE_H) // block_h
    flops_est = int(n_nodes) * 60 * TILE_H * TILE_W  # rough
    return pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[full, full, full] + [ray_spec] * 7,
        out_specs=(ray_spec, ray_spec, ray_spec, ray_spec),
        out_shape=(
            jax.ShapeDtypeStruct(out_shape, jnp.float32),
            jax.ShapeDtypeStruct(out_shape, jnp.float32),
            jax.ShapeDtypeStruct(out_shape, jnp.float32),
            jax.ShapeDtypeStruct(out_shape, jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(flops=flops_est,
                                      bytes_accessed=out_shape[0] * 128 * 44,
                                      transcendentals=0),
    )(bvh_pack, tri_pack, thr_pack, ox, oy, oz, dx, dy, dz, act)


@partial(jax.jit, static_argnames=("n_nodes", "max_leaf", "t_min", "t_max",
                                   "k", "packed", "block_h"))
def _run_traverse_sun(bvh_pack, tri_pack, thr_pack, sun, ox, oy, oz, dx, dy,
                      dz, act, n_nodes: int, max_leaf: int, t_min: float,
                      t_max: float, k: int, packed: bool = False,
                      block_h: int = 32):
    kern = partial(_traverse_sun_kernel, n_nodes=n_nodes, max_leaf=max_leaf,
                   t_min=t_min, t_max=t_max, packed=packed)
    ray_spec = pl.BlockSpec((block_h, TILE_W), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    sun_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = (k * TILE_H, TILE_W)
    n_blocks = (k * TILE_H) // block_h
    flops_est = int(n_nodes) * 120 * TILE_H * TILE_W  # rough (2 passes)
    return pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[full, full, full, sun_spec] + [ray_spec] * 7,
        out_specs=(ray_spec, ray_spec, ray_spec, ray_spec, ray_spec),
        out_shape=(
            jax.ShapeDtypeStruct(out_shape, jnp.float32),
            jax.ShapeDtypeStruct(out_shape, jnp.float32),
            jax.ShapeDtypeStruct(out_shape, jnp.float32),
            jax.ShapeDtypeStruct(out_shape, jnp.int32),
            jax.ShapeDtypeStruct(out_shape, jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(flops=flops_est,
                                      bytes_accessed=out_shape[0] * 128 * 48,
                                      transcendentals=0),
    )(bvh_pack, tri_pack, thr_pack, sun, ox, oy, oz, dx, dy, dz, act)


def traverse(scene, ro: V3, rd: V3, active, t_min: float, t_max: float,
             any_hit: bool = False):
    """Traverse for (K, P) lane grids (P = 1024).

    Returns (t, u, v, tri) arrays of shape (K, P); tri == -1 means miss.

    When exec_opts.OPTS.sort_rays is on, rays are stably sorted by
    direction octant before the kernel (and results unsorted after): each
    kernel block then traverses with a single coherent octant — a much
    tighter node-set union per block and an unambiguous front-to-back
    order for the ordered-descent thread table.  Stability preserves the
    caller's pixel-tile coherence within each octant bucket.  Pure
    reordering: results are exactly the per-ray results either way.
    """
    K, P = ro.x.shape
    assert P == TILE_H * TILE_W, P

    sort = bool(_OPTS.sort_rays) and not any_hit and K * P >= 4096
    if sort:
        n = K * P
        fx, fy, fz = ro.x.reshape(n), ro.y.reshape(n), ro.z.reshape(n)
        gx, gy, gz = rd.x.reshape(n), rd.y.reshape(n), rd.z.reshape(n)
        af = active.reshape(n)
        key = ((gx < 0).astype(jnp.int32)
               + 2 * (gy < 0).astype(jnp.int32)
               + 4 * (gz < 0).astype(jnp.int32))
        key = jnp.where(af, key, 8)  # park inactive lanes at the end
        order = jnp.argsort(key)     # stable -> keeps tile coherence
        inv = jnp.zeros(n, jnp.int32).at[order].set(
            jnp.arange(n, dtype=jnp.int32))
        ro = V3(fx[order].reshape(K, P), fy[order].reshape(K, P),
                fz[order].reshape(K, P))
        rd = V3(gx[order].reshape(K, P), gy[order].reshape(K, P),
                gz[order].reshape(K, P))
        active = af[order].reshape(K, P)

    # pad the packet axis so K*8 divides block_h
    block_h = _block_h()
    group = block_h // TILE_H
    Kp = ((K + group - 1) // group) * group
    pad = Kp - K

    def fold(a):
        if pad:
            a = jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
        return a.reshape(Kp * TILE_H, TILE_W)

    act_f = fold(active.astype(jnp.float32))
    packed = not fits_vmem(scene)
    box_tab = scene.bvh_pk8 if packed else scene.bvh_pack
    tri_tab = scene.tri_pk8 if packed else scene.tri_pack
    thr_tab = scene.thr_pk8 if packed else scene.thr_pack
    t, u, v, tri = _run_traverse(
        box_tab, tri_tab, thr_tab,
        fold(ro.x), fold(ro.y), fold(ro.z),
        fold(rd.x), fold(rd.y), fold(rd.z), act_f,
        n_nodes=scene.n_nodes, max_leaf=scene.max_leaf,
        t_min=float(t_min), t_max=float(t_max), any_hit=any_hit, k=Kp,
        packed=packed, block_h=block_h)

    def unfold(a):
        return a.reshape(Kp, P)[:K]

    t, u, v, tri = unfold(t), unfold(u), unfold(v), unfold(tri)
    if sort:
        n = K * P
        t = t.reshape(n)[inv].reshape(K, P)
        u = u.reshape(n)[inv].reshape(K, P)
        v = v.reshape(n)[inv].reshape(K, P)
        tri = tri.reshape(n)[inv].reshape(K, P)
    return t, u, v, tri


def traverse_with_sun(scene, ro: V3, rd: V3, active, t_min: float,
                      t_max: float, sun_ldir: V3, shadow_bias: float):
    """Fused closest-hit + sun-shadow traversal for (K, P) lane grids.

    `sun_ldir` is the normalized shadow direction (the kernel-negated
    reference quirk already applied by the caller).  Returns
    (t, u, v, tri, blocked) of shape (K, P); `blocked` is meaningful only
    on triangle-hit lanes.  Saves one kernel launch + one XLA round trip
    per bounce wave (the per-call floor dominates sparse waves).
    """
    K, P = ro.x.shape
    assert P == TILE_H * TILE_W, P
    block_h = _block_h()
    group = block_h // TILE_H
    Kp = ((K + group - 1) // group) * group
    pad = Kp - K

    def fold(a):
        if pad:
            a = jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
        return a.reshape(Kp * TILE_H, TILE_W)

    act_f = fold(active.astype(jnp.float32))
    packed = not fits_vmem(scene)
    box_tab = scene.bvh_pk8 if packed else scene.bvh_pack
    tri_tab = scene.tri_pk8 if packed else scene.tri_pack
    thr_tab = scene.thr_pk8 if packed else scene.thr_pack
    sun = jnp.stack([sun_ldir.x, sun_ldir.y, sun_ldir.z,
                     jnp.float32(shadow_bias)]).astype(jnp.float32)
    t, u, v, tri, sh = _run_traverse_sun(
        box_tab, tri_tab, thr_tab, sun,
        fold(ro.x), fold(ro.y), fold(ro.z),
        fold(rd.x), fold(rd.y), fold(rd.z), act_f,
        n_nodes=scene.n_nodes, max_leaf=scene.max_leaf,
        t_min=float(t_min), t_max=float(t_max), k=Kp, packed=packed,
        block_h=block_h)

    def unfold(a):
        return a.reshape(Kp, P)[:K]

    return (unfold(t), unfold(u), unfold(v), unfold(tri),
            unfold(sh) > 0.5)
