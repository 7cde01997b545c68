"""Host-side BVH construction over triangle soups.

Two builders emitting the same flat, preorder node table consumed by the
packet traversal (ops/trace.py):

- `method="median"`: the reference's algorithm
  (src/gpu_scene_builder.cpp:343-459): recursive median split on the
  largest-extent centroid axis via nth_element, leaf <= 4 triangles,
  degenerate centroid bounds -> leaf, nodes appended preorder (root = 0),
  internal nodes flagged tri_count == 0.
- `method="sah"`: binned surface-area-heuristic splits (16 bins) — a
  higher-quality tree (fewer node visits per ray) with the same node
  schema.  Traversal results are identical for any valid tree, so this is
  a pure performance knob.

A native C++ builder (native/bvh_builder.cpp) implements the same
algorithms; `build_bvh` dispatches to it when the shared library is
available (see dsrt_tpu.native).

Node schema mirrors GPUBVHNode (inc/gpu_scene.h:77-85):
bbox_min/bbox_max f32[3], left/right child node indices, tri_offset/
tri_count range into the `tri_indices` permutation; tri_count > 0 <=> leaf.
"""

from __future__ import annotations

import dataclasses
import sys

import numpy as np

MAX_LEAF = 4
SAH_BINS = 16

# Degenerate-extent padding.  The reference stores exact triangle bounds, so
# an axis-aligned triangle produces a flat box and the slab test's
# `t_max <= t_min -> miss` (src/gpu_render.cu:312) makes it invisible — a
# latent bug in the CUDA renderer.  We pad near-zero extents like the
# Shirley-series `aabb::pad`, a deliberate correctness deviation.
FLAT_EPS = np.float32(1e-4)


def _pad_flat(mn: np.ndarray, mx: np.ndarray):
    """Expand axes with near-zero extent by FLAT_EPS/2 on each side."""
    flat = (mx - mn) < FLAT_EPS
    return (np.where(flat, mn - FLAT_EPS * 0.5, mn).astype(np.float32),
            np.where(flat, mx + FLAT_EPS * 0.5, mx).astype(np.float32))


@dataclasses.dataclass
class BVH:
    bbox_min: np.ndarray   # (B,3) f32
    bbox_max: np.ndarray   # (B,3) f32
    left: np.ndarray       # (B,) i32
    right: np.ndarray      # (B,) i32
    tri_offset: np.ndarray  # (B,) i32
    tri_count: np.ndarray  # (B,) i32
    tri_indices: np.ndarray  # (N,) i32

    @property
    def num_nodes(self) -> int:
        return len(self.left)

    @property
    def max_leaf_size(self) -> int:
        return int(self.tri_count.max()) if len(self.tri_count) else 0


def _tri_bounds_centroids(v0, v1, v2):
    lo = np.minimum(np.minimum(v0, v1), v2).astype(np.float32)
    hi = np.maximum(np.maximum(v0, v1), v2).astype(np.float32)
    cent = ((v0 + v1 + v2) / 3.0).astype(np.float32)
    return lo, hi, cent


def build_bvh(v0, v1, v2, method: str = "median", prefer_native: bool = True) -> BVH:
    """Build a BVH over triangles given as (N,3) vertex arrays."""
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)
    n = len(v0)
    if n == 0:
        # single dead node so traversal arrays are never empty
        z = np.zeros((1, 3), np.float32)
        return BVH(z, z, -np.ones(1, np.int32), -np.ones(1, np.int32),
                   np.zeros(1, np.int32), np.zeros(1, np.int32),
                   np.zeros(0, np.int32))
    if prefer_native:
        try:
            from dsrt_tpu import native
            out = native.build_bvh(v0, v1, v2, method)
            if out is not None:
                return out
        except ImportError:
            pass
    if method == "median":
        return _build_median(v0, v1, v2)
    if method == "sah":
        return _build_sah(v0, v1, v2)
    raise ValueError(f"unknown BVH method '{method}'")


def _build_median(v0, v1, v2) -> BVH:
    lo, hi, cent = _tri_bounds_centroids(v0, v1, v2)
    n = len(cent)
    indices = np.arange(n, dtype=np.int32)

    bbox_min, bbox_max = [], []
    left, right, tri_offset, tri_count = [], [], [], []

    sys.setrecursionlimit(max(10000, 64 * int(np.log2(n + 2)) + 10000))

    def recurse(start: int, end: int) -> int:
        node = len(left)
        idx = indices[start:end]
        mn, mx = _pad_flat(lo[idx].min(axis=0), hi[idx].max(axis=0))
        bbox_min.append(mn)
        bbox_max.append(mx)
        left.append(-1)
        right.append(-1)
        tri_offset.append(start)
        tri_count.append(end - start)

        count = end - start
        if count <= MAX_LEAF:
            return node

        c = cent[idx]
        cmin, cmax = c.min(axis=0), c.max(axis=0)
        diag = cmax - cmin
        # largest-extent axis with the reference's tie-breaking
        # (builder.cpp:404-406): y wins over x if strictly greater and >= z;
        # z wins over x if strictly greater and >= y; else x.
        axis = 0
        if diag[1] > diag[0] and diag[1] >= diag[2]:
            axis = 1
        elif diag[2] > diag[0] and diag[2] >= diag[1]:
            axis = 2
        if diag[axis] == 0.0:  # degenerate -> keep as leaf
            return node

        mid = (start + end) // 2
        k = mid - start
        part = np.argpartition(c[:, axis], k, kind="introselect")
        indices[start:end] = idx[part]

        tri_offset[node] = 0
        tri_count[node] = 0
        left[node] = recurse(start, mid)
        right[node] = recurse(mid, end)
        return node

    recurse(0, n)
    return BVH(np.asarray(bbox_min, np.float32), np.asarray(bbox_max, np.float32),
               np.asarray(left, np.int32), np.asarray(right, np.int32),
               np.asarray(tri_offset, np.int32), np.asarray(tri_count, np.int32),
               indices)


def _build_sah(v0, v1, v2, max_leaf: int = MAX_LEAF) -> BVH:
    lo, hi, cent = _tri_bounds_centroids(v0, v1, v2)
    n = len(cent)
    indices = np.arange(n, dtype=np.int32)

    bbox_min, bbox_max = [], []
    left, right, tri_offset, tri_count = [], [], [], []

    def surface(mn, mx):
        d = np.maximum(mx - mn, 0.0)
        return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2]
                      + d[..., 2] * d[..., 0])

    def recurse(start: int, end: int) -> int:
        node = len(left)
        idx = indices[start:end]
        nb_min = lo[idx].min(axis=0)
        nb_max = hi[idx].max(axis=0)
        pmn, pmx = _pad_flat(nb_min, nb_max)
        bbox_min.append(pmn)
        bbox_max.append(pmx)
        left.append(-1)
        right.append(-1)
        tri_offset.append(start)
        tri_count.append(end - start)

        count = end - start
        if count <= max_leaf:
            return node

        c = cent[idx]
        cmin, cmax = c.min(axis=0), c.max(axis=0)
        diag = cmax - cmin
        axis = int(np.argmax(diag))
        if diag[axis] <= 0.0:
            return node

        # binned SAH along the widest centroid axis
        rel = (c[:, axis] - cmin[axis]) / diag[axis]
        bins = np.minimum((rel * SAH_BINS).astype(np.int32), SAH_BINS - 1)
        bin_lo = np.full((SAH_BINS, 3), np.inf, np.float32)
        bin_hi = np.full((SAH_BINS, 3), -np.inf, np.float32)
        bin_n = np.zeros(SAH_BINS, np.int64)
        for b in range(SAH_BINS):
            m = bins == b
            if m.any():
                bin_lo[b] = lo[idx[m]].min(axis=0)
                bin_hi[b] = hi[idx[m]].max(axis=0)
                bin_n[b] = int(m.sum())
        # prefix/suffix sweeps
        pre_lo = np.minimum.accumulate(bin_lo, axis=0)
        pre_hi = np.maximum.accumulate(bin_hi, axis=0)
        pre_n = np.cumsum(bin_n)
        suf_lo = np.minimum.accumulate(bin_lo[::-1], axis=0)[::-1]
        suf_hi = np.maximum.accumulate(bin_hi[::-1], axis=0)[::-1]
        suf_n = np.cumsum(bin_n[::-1])[::-1]

        best_cost, best_split = np.inf, -1
        for s in range(SAH_BINS - 1):
            nl, nr = pre_n[s], suf_n[s + 1]
            if nl == 0 or nr == 0:
                continue
            cost = (surface(pre_lo[s], pre_hi[s]) * nl
                    + surface(suf_lo[s + 1], suf_hi[s + 1]) * nr)
            if cost < best_cost:
                best_cost, best_split = cost, s

        leaf_cost = surface(nb_min, nb_max) * count
        if best_split < 0 or (count <= 2 * max_leaf and best_cost >= leaf_cost):
            # fall back to a median split to guarantee progress
            k = count // 2
            part = np.argpartition(c[:, axis], k, kind="introselect")
            indices[start:end] = idx[part]
            mid = start + k
        else:
            go_left = bins <= best_split
            indices[start:end] = np.concatenate([idx[go_left], idx[~go_left]])
            mid = start + int(go_left.sum())

        tri_offset[node] = 0
        tri_count[node] = 0
        left[node] = recurse(start, mid)
        right[node] = recurse(mid, end)
        return node

    sys.setrecursionlimit(max(10000, 64 * int(np.log2(n + 2)) + 10000))
    recurse(0, n)
    return BVH(np.asarray(bbox_min, np.float32), np.asarray(bbox_max, np.float32),
               np.asarray(left, np.int32), np.asarray(right, np.int32),
               np.asarray(tri_offset, np.int32), np.asarray(tri_count, np.int32),
               indices)


def validate_bvh(bvh: BVH, lo: np.ndarray, hi: np.ndarray) -> None:
    """Assert structural invariants (used by tests): preorder children,
    bbox containment, exact leaf partition of tri indices."""
    n_nodes = bvh.num_nodes
    seen = np.zeros(len(bvh.tri_indices), bool)
    for i in range(n_nodes):
        if bvh.tri_count[i] > 0:
            s, c = bvh.tri_offset[i], bvh.tri_count[i]
            tris = bvh.tri_indices[s:s + c]
            assert not seen[tris].any(), "leaf ranges overlap"
            seen[tris] = True
            assert (lo[tris] >= bvh.bbox_min[i] - 1e-4).all()
            assert (hi[tris] <= bvh.bbox_max[i] + 1e-4).all()
        else:
            l, r = bvh.left[i], bvh.right[i]
            assert l == i + 1, "left child must follow parent (preorder)"
            assert r > l, "right child after left subtree"
            for ch in (l, r):
                assert (bvh.bbox_min[ch] >= bvh.bbox_min[i] - 1e-4).all()
                assert (bvh.bbox_max[ch] <= bvh.bbox_max[i] + 1e-4).all()
    assert seen.all(), "every triangle must appear in exactly one leaf"
