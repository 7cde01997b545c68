"""Offline (NumPy, no TPU) traversal-cost proxy for BVH quality A/Bs.

Simulates the fused megakernel's cost model on a sample of 1024-lane
pixel blocks: the kernel walks ONE union front per block, so its costs
are (a) wide-node VISITS (serial ~0.6 us each at ISS scale — the spine)
and (b) leaf TILE scans over each visit's entered-leaf union range
(~0.27 us per 8-tri tile of full-width MT).  This script counts both
for primary waves and one cosine-bounce wave, per tree build method.

Usage: python benchmarks/tree_quality.py [--detail N] [--blocks K]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dsrt_tpu.models.mesh_gen import iss_standin_mesh
from dsrt_tpu.models.bvh_build import build_bvh, collapse_wide, _WIDE_BIG


def _camera_rays(width, height, origin, look_at, vfov=40.0):
    origin = np.asarray(origin, np.float64)
    look_at = np.asarray(look_at, np.float64)
    w = origin - look_at
    w /= np.linalg.norm(w)
    u = np.cross([0.0, 1.0, 0.0], w)
    u /= np.linalg.norm(u)
    v = np.cross(w, u)
    half_h = np.tan(np.radians(vfov) / 2.0)
    half_w = half_h * (width / height)
    px, py = np.meshgrid(np.arange(width), np.arange(height))
    su = (px + 0.5) / (width - 1)
    sv = (py + 0.5) / (height - 1)
    d = ((-half_w + 2 * half_w * su)[..., None] * u
         + (-half_h + 2 * half_h * sv)[..., None] * v - w)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return d.astype(np.float32), px, py


def walk_union(wide, tri, o, d, t_init=None):
    """Union-front wide-BVH walk for one block of rays.

    o: (3,) shared origin or (K,3); d: (K,3).  Returns (visits, tiles,
    best_t, best_tri).  Leaf work counts ceil(span/8) tiles per visit
    over the union [min ptr, max end) of entered leaf children — the
    kernel's union-range contract."""
    A = wide.arity
    tbl = wide.table
    v0, v1, v2 = tri
    K = len(d)
    o = np.broadcast_to(np.asarray(o, np.float32), (K, 3))
    inv = 1.0 / np.where(d == 0, 1e-30, d)
    best = np.full(K, 1e9, np.float32) if t_init is None else t_init.copy()
    best_tri = np.full(K, -1, np.int64)
    visits = 0
    tiles = 0
    stack = [0]
    e1 = v1 - v0
    e2 = v2 - v0
    while stack:
        j = stack.pop()
        visits += 1
        blk = tbl[A * j:A * (j + 1)]
        mn = blk[:, 0:3]
        mx = blk[:, 3:6]
        # slab test: (8 children, K rays)
        t0 = (mn[:, None, :] - o[None]) * inv[None]
        t1 = (mx[:, None, :] - o[None]) * inv[None]
        lo = np.minimum(t0, t1).max(axis=2)
        hi = np.maximum(t0, t1).min(axis=2)
        lo = np.maximum(lo, 1e-3)
        hi = np.minimum(hi, best[None])
        entered = (hi > lo).any(axis=1)          # per child, any ray
        meta = np.asarray(blk[0, 8], np.float32).view(np.int32)
        base = int(meta) // 256
        intmask = int(meta) % 256
        # leaf union range
        leaf_lo, leaf_hi = None, None
        rank = 0
        for c in range(A):
            if blk[c, 0] >= _WIDE_BIG:
                continue
            is_int = (intmask >> c) & 1
            if not entered[c]:
                if is_int:
                    rank += 1
                continue
            if is_int:
                stack.append(base + rank)
                rank += 1
            else:
                p0 = int(blk[c, 6])
                p1 = p0 + int(blk[c, 7])
                leaf_lo = p0 if leaf_lo is None else min(leaf_lo, p0)
                leaf_hi = p1 if leaf_hi is None else max(leaf_hi, p1)
        if leaf_lo is not None:
            span = leaf_hi - leaf_lo
            tiles += (span + 7) // 8
            # full-precision MT over the union range, vectorized
            idx = np.arange(leaf_lo, leaf_hi)
            E1 = e1[idx]
            E2 = e2[idx]
            V0 = v0[idx]
            p = np.cross(d[:, None, :], E2[None])          # (K,T,3)
            det = (E1[None] * p).sum(-1)
            ok = np.abs(det) > 1e-8
            invd = np.where(ok, 1.0 / np.where(det == 0, 1, det), 0.0)
            tv = o[:, None, :] - V0[None]
            uu = (tv * p).sum(-1) * invd
            q = np.cross(tv, E1[None])
            vv = (d[:, None, :] * q).sum(-1) * invd
            tt = (E2[None] * q).sum(-1) * invd
            hit = (ok & (uu >= 0) & (uu <= 1) & (vv >= 0) & (uu + vv <= 1)
                   & (tt > 1e-3) & (tt < best[:, None]))
            tt = np.where(hit, tt, np.inf)
            ti = tt.argmin(axis=1)
            tmin = tt[np.arange(K), ti]
            upd = tmin < best
            best = np.where(upd, tmin.astype(np.float32), best)
            best_tri = np.where(upd, idx[ti], best_tri)
    return visits, tiles, best, best_tri


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--detail", type=int, default=4)
    ap.add_argument("--blocks", type=int, default=12)
    ap.add_argument("--methods", default="sah,sbvh")
    ap.add_argument("--wml", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    m = iss_standin_mesh(args.detail)
    n = len(m.v0)
    print(f"tris: {n}")
    W, H = 800, 450
    d_all, px, py = _camera_rays(W, H, (40.0, 60.0, 190.0), (0, 0, 0))
    origin = np.asarray((40.0, 60.0, 190.0), np.float32)

    rng = np.random.default_rng(args.seed)
    # sample 32x32 pixel tiles (the kernel's block layout) from the
    # central station-covering region — background-only blocks cost one
    # root visit and would dilute the signal
    tys = rng.integers(3, H // 32 - 3, args.blocks)
    txs = rng.integers(6, W // 32 - 6, args.blocks)

    for meth in args.methods.split(","):
        t0 = time.time()
        b = build_bvh(m.v0, m.v1, m.v2, method=meth, prefer_native=False)
        wide = collapse_wide(b, wide_max_leaf=args.wml)
        bt = time.time() - t0
        # permute tri arrays into packed order (what the scene build does)
        perm = b.tri_indices[wide.src]
        tri = (m.v0[perm], m.v1[perm], m.v2[perm])
        fn = np.cross(m.v1[perm] - m.v0[perm], m.v2[perm] - m.v0[perm])
        fn /= np.maximum(np.linalg.norm(fn, axis=1, keepdims=True), 1e-20)

        pv = pt = bv = btl = 0
        for ty, tx in zip(tys, txs):
            dblk = d_all[ty * 32:(ty + 1) * 32,
                         tx * 32:(tx + 1) * 32].reshape(-1, 3)
            v, t, bestt, besti = walk_union(wide, tri, origin, dblk)
            pv += v
            pt += t
            # one cosine bounce wave from the hits
            hitm = besti >= 0
            if hitm.sum() < 8:
                continue
            hp = origin + bestt[:, None] * dblk
            nrm = fn[np.maximum(besti, 0)]
            nrm = np.where((nrm * dblk).sum(1, keepdims=True) > 0,
                           -nrm, nrm)
            r1 = rng.random(len(dblk)).astype(np.float32)
            r2 = rng.random(len(dblk)).astype(np.float32)
            phi = 2 * np.pi * r1
            a = np.where(np.abs(nrm[:, 1:2]) > 0.9, [1.0, 0.0, 0.0],
                         [0.0, 1.0, 0.0]).astype(np.float32)
            tb1 = np.cross(a, nrm)
            tb1 /= np.maximum(np.linalg.norm(tb1, axis=1, keepdims=True),
                              1e-20)
            tb2 = np.cross(nrm, tb1)
            bd = (np.cos(phi)[:, None] * np.sqrt(r2)[:, None] * tb1
                  + np.sin(phi)[:, None] * np.sqrt(r2)[:, None] * tb2
                  + np.sqrt(1 - r2)[:, None] * nrm).astype(np.float32)
            bo = (hp + 1e-3 * nrm).astype(np.float32)
            bo = np.where(hitm[:, None], bo, origin)
            bd = np.where(hitm[:, None], bd, dblk)
            v, t, _, _ = walk_union(wide, tri, bo, bd)
            bv += v
            btl += t
        cost = 0.6 * (pv + bv) + 0.27 * (pt + btl)
        print(f"{meth:6s} build {bt:6.1f}s refs {len(b.tri_indices):7d} "
              f"n_wide {wide.n_wide:6d} | primary vis {pv:6d} tiles {pt:7d}"
              f" | bounce vis {bv:6d} tiles {btl:7d} | cost~ {cost:9.0f}")


if __name__ == "__main__":
    main()
