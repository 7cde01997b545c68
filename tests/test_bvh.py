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
