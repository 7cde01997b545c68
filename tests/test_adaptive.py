"""Variance-guided adaptive sampling (render.render_frame_adaptive).

Beyond-reference QoL (the reference renders a fixed spp everywhere,
main.cpp:256): samples are rendered in split-buffer chunks and pixels
whose two half-means agree drop out of later chunks.
"""

import numpy as np
import pytest

from dsrt_tpu.config import RenderConfig
from dsrt_tpu.models.presets import rtiow_smoke_scene
from dsrt_tpu.ops.camera import make_camera
from dsrt_tpu.render import fused_kind, render_frame, render_frame_adaptive

CFG = RenderConfig(width=128, height=72, spp=64, max_depth=8)


@pytest.fixture(scope="module")
def scene():
    return rtiow_smoke_scene()


@pytest.fixture(scope="module")
def cam():
    return make_camera((0, 0.6, 2.0), (0, 0, -1), vfov=50,
                       width=128, height=72)


@pytest.mark.tpu
@pytest.mark.slow
def test_adaptive_saves_samples_and_matches_reference(scene, cam):
    if fused_kind(scene, CFG) is None:
        pytest.skip("needs a TPU fused kernel")
    img_a, stats = render_frame_adaptive(scene, cam, CFG, tol=0.03,
                                         chunk_spp=8, with_count=True)
    img_f = render_frame(scene, cam, CFG)

    # the background (black, zero variance) converges after 2 chunks, so
    # the mean spp must be well under the cap
    assert stats["mean_spp"] < 0.8 * CFG.spp
    assert stats["rounds"] >= 2

    # adaptive output agrees with the fixed-spp render where converged:
    # compare as u8 with a loose Monte-Carlo tolerance on the mean
    diff = np.abs(img_a.astype(int) - img_f.astype(int))
    assert diff.mean() < 6.0
    # the black background is exactly black in both
    assert img_a[0, 0].sum() == 0 and img_f[0, 0].sum() == 0


@pytest.mark.tpu
def test_adaptive_full_cap_on_tiny_tol(scene, cam):
    """tol ~ 0 forces every pixel to the spp cap: mean spp == cfg.spp."""
    if fused_kind(scene, CFG) is None:
        pytest.skip("needs a TPU fused kernel")
    cfg = RenderConfig(width=128, height=72, spp=16, max_depth=8)
    _, stats = render_frame_adaptive(scene, cam, cfg, tol=0.0,
                                     chunk_spp=8, with_count=True)
    assert stats["mean_spp"] == pytest.approx(cfg.spp)
