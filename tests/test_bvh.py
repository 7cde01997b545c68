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
