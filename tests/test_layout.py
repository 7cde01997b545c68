"""Pixel-tile layout (exec_opts.layout): pure pixel permutation — the
rendered image must be IDENTICAL for any tile shape (per-pixel LCG
streams depend only on pixel coords, src/gpu_render.cu:990)."""

import numpy as np

from dsrt_tpu.config import RenderConfig
from dsrt_tpu.exec_opts import OPTS
from dsrt_tpu.models.presets import random_tri_soup_scene
from dsrt_tpu.ops.camera import make_camera
from dsrt_tpu.render import render_frame, lane_layout

W, H = 96, 56
CFG = RenderConfig(width=W, height=H, spp=2, max_depth=6)


def _with_layout(layout, fn):
    old = OPTS.layout
    try:
        OPTS.layout = layout
        return fn()
    finally:
        OPTS.layout = old


def test_lane_layout_covers_all_pixels():
    for layout in ("8x128", "32x32", "16x64", "64x16"):
        def go():
            px, py, valid, _ = lane_layout(W, H)
            seen = set(zip(px[valid].tolist(), py[valid].tolist()))
            assert len(seen) == W * H
            assert all(0 <= x < W and 0 <= y < H for x, y in seen)
        _with_layout(layout, go)


def test_layouts_render_identically():
    scene = random_tri_soup_scene(n=40)
    cam = make_camera((0, 0, 2.0), (0, 0, -3), vfov=55, width=W, height=H)
    ref = _with_layout("8x128",
                       lambda: render_frame(scene, cam, CFG))
    for layout in ("32x32", "64x16"):
        img = _with_layout(layout,
                           lambda: render_frame(scene, cam, CFG))
        np.testing.assert_array_equal(img, ref)
