"""Per-dispatch ray budget for the fused megakernels
(render._render_fused_auto / exec_opts.fused_dispatch_rays).

A frame whose width*height*spp exceeds the budget renders as several
salted spp chunks through the runtime-spp kernel instead of one
monolithic dispatch, so a close-in 1080p@1000spp frame (2e9+ scene rays,
90-100 s in one kernel at full occupancy) cannot trip the TPU runtime's
hang detection.  The reference has no analogue — its megakernel runs all
spp in one launch regardless of cost (src/gpu_render.cu:993-999, 1078).

Contract tested here:
- at/under budget: byte-identical to the r3 single-dispatch path;
- over budget: chunk 0 carries the parity LCG streams (salt 0), later
  chunks decorrelate — same estimator, so the image agrees with the
  single-dispatch render to Monte-Carlo tolerance, and the exact ray
  count stays exact.
"""

import numpy as np
import pytest

from dsrt_tpu.config import RenderConfig
from dsrt_tpu.exec_opts import OPTS
from dsrt_tpu.models.presets import rtiow_smoke_scene
from dsrt_tpu.ops.camera import make_camera
from dsrt_tpu.render import fused_kind, render_frame_fused

CFG = RenderConfig(width=128, height=72, spp=32, max_depth=8)


@pytest.fixture(scope="module")
def scene():
    return rtiow_smoke_scene()


@pytest.fixture(scope="module")
def cam():
    return make_camera((0, 0.6, 2.0), (0, 0, -1), vfov=50,
                       width=128, height=72)


@pytest.mark.tpu
def test_chunked_dispatch_matches_single(scene, cam):
    if fused_kind(scene, CFG) is None:
        pytest.skip("needs a TPU fused kernel")
    img_one, n_one = render_frame_fused(scene, cam, CFG, with_count=True)
    old = OPTS.fused_dispatch_rays
    try:
        # force 4 chunks of 8 spp (128*72*8 = 73728 primary rays/chunk)
        OPTS.fused_dispatch_rays = 128 * 72 * 8
        img_chunk, n_chunk = render_frame_fused(scene, cam, CFG,
                                                with_count=True)
    finally:
        OPTS.fused_dispatch_rays = old

    # different salts per chunk => not bit-identical, but the estimator
    # is unchanged: u8 Monte-Carlo agreement at 32 spp
    diff = np.abs(img_chunk.astype(int) - img_one.astype(int))
    assert diff.mean() < 6.0, diff.mean()
    # the black background is exactly black in both
    assert img_chunk[0, 0].sum() == 0 and img_one[0, 0].sum() == 0
    # exact ray counting survives chunking: every chunk's buckets are
    # folded in i64 — primary rays alone bound it from below
    assert n_chunk >= CFG.width * CFG.height * CFG.spp
    assert abs(n_chunk - n_one) < 0.2 * n_one


@pytest.mark.tpu
def test_under_budget_is_bit_identical(scene, cam):
    """The budget path must not perturb frames at/under the budget."""
    if fused_kind(scene, CFG) is None:
        pytest.skip("needs a TPU fused kernel")
    img_a, n_a = render_frame_fused(scene, cam, CFG, with_count=True)
    old = OPTS.fused_dispatch_rays
    try:
        OPTS.fused_dispatch_rays = CFG.width * CFG.height * CFG.spp
        img_b, n_b = render_frame_fused(scene, cam, CFG, with_count=True)
    finally:
        OPTS.fused_dispatch_rays = old
    assert np.array_equal(img_a, img_b)
    assert n_a == n_b
