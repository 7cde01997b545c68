"""BVH builder invariants and reference-structure checks (SURVEY.md §7
build step 2 golden tests)."""

import numpy as np
import pytest

from dsrt_tpu.models.bvh_build import (BVH, MAX_LEAF, build_bvh,
                                       validate_bvh, _tri_bounds_centroids)


def random_tris(rng, n):
    c = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.4, (n, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.4, (n, 3)).astype(np.float32)
    return c, c + e1, c + e2


@pytest.mark.parametrize("method", ["median", "sah"])
@pytest.mark.parametrize("n", [1, 4, 5, 37, 500])
def test_invariants(rng, method, n):
    v0, v1, v2 = random_tris(rng, n)
    bvh = build_bvh(v0, v1, v2, method=method, prefer_native=False)
    lo, hi, _ = _tri_bounds_centroids(v0, v1, v2)
    validate_bvh(bvh, lo, hi)
    assert bvh.tri_indices.shape == (n,)
    assert sorted(bvh.tri_indices.tolist()) == list(range(n))


def test_median_reference_structure(rng):
    """Median builder: root = node 0, left child = parent+1 (preorder),
    leaves <= 4 tris except degenerate, internal nodes have tri_count 0
    (src/gpu_scene_builder.cpp:343-459 semantics)."""
    v0, v1, v2 = random_tris(rng, 100)
    bvh = build_bvh(v0, v1, v2, method="median", prefer_native=False)
    assert bvh.tri_count[0] == 0 or len(v0) <= MAX_LEAF
    internal = bvh.tri_count == 0
    assert (bvh.left[internal] == np.nonzero(internal)[0] + 1).all()
    assert (bvh.tri_count[~internal] <= MAX_LEAF).all()
    # node count bounded by 2N (full binary tree over ceil(N/1) leaves)
    assert bvh.num_nodes <= 2 * len(v0)


def test_degenerate_centroids_make_leaf():
    """All-identical centroids -> single leaf with every triangle
    (src/gpu_scene_builder.cpp:408-414)."""
    n = 10
    v0 = np.zeros((n, 3), np.float32)
    v1 = np.tile(np.array([[1, 0, 0]], np.float32), (n, 1))
    v2 = np.tile(np.array([[0, 1, 0]], np.float32), (n, 1))
    bvh = build_bvh(v0, v1, v2, method="median", prefer_native=False)
    assert bvh.num_nodes == 1
    assert bvh.tri_count[0] == n
    assert bvh.max_leaf_size == n


def test_empty():
    bvh = build_bvh(np.zeros((0, 3)), np.zeros((0, 3)), np.zeros((0, 3)),
                    prefer_native=False)
    assert bvh.num_nodes == 1
    assert len(bvh.tri_indices) == 0


@pytest.mark.parametrize("method", ["median", "sah"])
def test_native_matches_numpy_if_available(rng, method):
    from dsrt_tpu import native
    if not native.available():
        pytest.skip("native library not built")
    v0, v1, v2 = random_tris(rng, 333)
    a = build_bvh(v0, v1, v2, method=method, prefer_native=False)
    b = native.build_bvh(v0, v1, v2, method)
    lo, hi, _ = _tri_bounds_centroids(v0, v1, v2)
    validate_bvh(b, lo, hi)
    # trees may differ in tie-breaks; both must be valid and complete
    assert sorted(b.tri_indices.tolist()) == list(range(333))
    if method == "median":
        # same split rule => identical node topology/bboxes
        assert a.num_nodes == b.num_nodes
        np.testing.assert_allclose(a.bbox_min, b.bbox_min, atol=1e-6)
        np.testing.assert_allclose(a.bbox_max, b.bbox_max, atol=1e-6)
        np.testing.assert_array_equal(a.left, b.left)
        np.testing.assert_array_equal(a.tri_count, b.tri_count)


def test_wide_combo_bit_pattern(rng):
    """The wide node's (base, intmask) combo is stored as an int32 BIT
    PATTERN in the f32 lane (bvh_build.collapse_wide) — exact for any
    base up to 2^23, unlike the old f32-exact float packing that capped
    the table at 65536 wide nodes (~800k tris)."""
    from dsrt_tpu.models.bvh_build import build_bvh, collapse_wide
    v0, v1, v2 = random_tris(rng, 500)
    bvh = build_bvh(v0, v1, v2, method="sah")
    wide = collapse_wide(bvh)
    nodes = wide.table.reshape(-1, 8, 16)
    seen_interior = False
    for j, blk in enumerate(nodes[:wide.n_wide]):
        combo = int(np.array([blk[0, 8]], np.float32).view(np.int32)[0])
        base, intmask = combo >> 8, combo & 255
        if intmask:
            seen_interior = True
            assert 0 < base < wide.n_wide
        # interior-slot records carry child pointers consistent with
        # the mask rank
        rk = 0
        for c in range(8):
            if (intmask >> c) & 1:
                assert int(blk[c, 6]) == base + rk and blk[c, 7] == 0.0
                rk += 1
    assert seen_interior

    # the pack/unpack round-trip holds far beyond the old 65536 cap
    for base in (1, 65535, 70000, (1 << 23) - 1):
        f = np.array([base * 256 + 0xA5], np.int32).view(np.float32)
        back = int(f.view(np.int32)[0])
        assert back >> 8 == base and back & 255 == 0xA5


# ---- SBVH (spatial splits, r3) ------------------------------------------


def _brute_closest(v0, v1, v2, o, d):
    e1, e2 = v1 - v0, v2 - v0
    p = np.cross(d, e2)
    det = (e1 * p).sum(1)
    ok = np.abs(det) > 1e-8
    inv = np.where(ok, 1.0 / np.where(det == 0, 1, det), 0.0)
    tv = o - v0
    u = (tv * p).sum(1) * inv
    q = np.cross(tv, e1)
    vv = (d * q).sum(1) * inv
    t = (e2 * q).sum(1) * inv
    hit = ok & (u >= 0) & (u <= 1) & (vv >= 0) & (u + vv <= 1) & (t > 1e-3)
    return np.where(hit, t, np.inf).min()


def _bvh_closest(b, v0, v1, v2, o, d):
    inv = 1.0 / np.where(d == 0, 1e-30, d)
    best = np.inf
    stack = [0]
    while stack:
        ni = stack.pop()
        t0 = (b.bbox_min[ni] - o) * inv
        t1 = (b.bbox_max[ni] - o) * inv
        lo = max(np.minimum(t0, t1).max(), 1e-3)
        hi = min(np.maximum(t0, t1).min(), best)
        if hi <= lo:
            continue
        if b.tri_count[ni] > 0:
            s, c = b.tri_offset[ni], b.tri_count[ni]
            ids = b.tri_indices[s:s + c]
            t = _brute_closest(v0[ids], v1[ids], v2[ids], o, d)
            best = min(best, float(t))
        else:
            stack.append(b.left[ni])
            stack.append(b.right[ni])
    return best


def test_sbvh_closest_hit_matches_bruteforce(rng):
    """SBVH duplicates straddling tris with CLIPPED bounds; closest-hit
    results must be exactly the brute-force answer on any ray (every
    point of a triangle is covered by >= 1 referencing node)."""
    from dsrt_tpu.models.bvh_build import collapse_wide, validate_wide
    # long thin diagonal tris (worst case for plain SAH, the SBVH target)
    n = 160
    c = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    e1 = rng.normal(0, 3.0, (n, 3)).astype(np.float32)     # long edges
    e2 = rng.normal(0, 0.05, (n, 3)).astype(np.float32)    # thin
    v0, v1, v2 = c, c + e1, c + e2
    b = build_bvh(v0, v1, v2, method="sbvh")
    assert len(b.tri_indices) >= n                    # reference list
    assert sorted(set(b.tri_indices.tolist())) == list(range(n))
    wide = collapse_wide(b)
    validate_wide(wide, b)                            # packing contract
    for _ in range(120):
        o = rng.normal(0, 8, 3).astype(np.float32)
        d = rng.normal(0, 1, 3).astype(np.float32)
        d /= np.linalg.norm(d)
        tb = _brute_closest(v0, v1, v2, o, d)
        ts = _bvh_closest(b, v0, v1, v2, o, d)
        assert (np.isinf(tb) and np.isinf(ts)) or np.isclose(tb, ts,
                                                             rtol=1e-6)


def test_sbvh_alpha_knob_more_refs_still_exact(rng):
    """sbvh_alpha tunes the spatial-split overlap gate (0 = always try:
    refs grow; measured NET-NEGATIVE for throughput at ISS scale —
    ROADMAP r4 — but the knob must stay CORRECT): the reference list
    still covers every triangle and closest hits equal brute force
    through both the native and Python builders."""
    n = 160
    c = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    e1 = rng.normal(0, 3.0, (n, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.05, (n, 3)).astype(np.float32)
    v0, v1, v2 = c, c + e1, c + e2
    base = build_bvh(v0, v1, v2, method="sbvh")
    for native_pref in (True, False):
        b = build_bvh(v0, v1, v2, method="sbvh", prefer_native=native_pref,
                      sbvh_alpha=0.0, sbvh_ref_budget=3.0)
        assert len(b.tri_indices) >= len(base.tri_indices)
        assert sorted(set(b.tri_indices.tolist())) == list(range(n))
        for _ in range(40):
            o = rng.normal(0, 8, 3).astype(np.float32)
            d = rng.normal(0, 1, 3).astype(np.float32)
            d /= np.linalg.norm(d)
            tb = _brute_closest(v0, v1, v2, o, d)
            ts = _bvh_closest(b, v0, v1, v2, o, d)
            assert (np.isinf(tb) and np.isinf(ts)) or np.isclose(
                tb, ts, rtol=1e-6)


def test_native_sbvh_matches_bruteforce(rng):
    """C++ SBVH (native/bvh_builder.cpp dsrt_build_sbvh): reference list
    covers every triangle; closest hits equal brute force."""
    from dsrt_tpu import native
    if not native.available():
        pytest.skip("native library not built")
    n = 200
    c = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    e1 = rng.normal(0, 3.0, (n, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.05, (n, 3)).astype(np.float32)
    v0, v1, v2 = c, c + e1, c + e2
    b = native.build_bvh(v0, v1, v2, "sbvh")
    assert b is not None and len(b.tri_indices) >= n
    assert sorted(set(b.tri_indices.tolist())) == list(range(n))
    from dsrt_tpu.models.bvh_build import collapse_wide, validate_wide
    for _ in range(100):
        o = rng.normal(0, 8, 3).astype(np.float32)
        d = rng.normal(0, 1, 3).astype(np.float32)
        d /= np.linalg.norm(d)
        tb = _brute_closest(v0, v1, v2, o, d)
        ts = _bvh_closest(b, v0, v1, v2, o, d)
        assert (np.isinf(tb) and np.isinf(ts)) or np.isclose(tb, ts,
                                                             rtol=1e-6)
    # NOTE: collapse_wide MUTATES leaf offsets — only valid after the
    # caller re-permutes tri arrays, so run it last here
    wide = collapse_wide(b)
    validate_wide(wide, b)


def test_sbvh_scene_build_and_tables(rng):
    """SceneBuilder accepts bvh_method='sbvh': tri tables carry one row
    per REFERENCE (n_tris >= unique tris) and the packed wide layout
    validates."""
    from dsrt_tpu.models.mesh_gen import iss_standin_scene
    s_sah = iss_standin_scene(detail=1, bvh_method="sah")
    s_sb = iss_standin_scene(detail=1, bvh_method="sbvh")
    assert s_sb.n_tris >= s_sah.n_tris
    assert s_sb.tri_v0.shape[0] >= s_sah.tri_v0.shape[0]
