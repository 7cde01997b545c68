"""Post-processing scripts (reference L7 equivalents): video encoding,
upsampling fallbacks, performance TSV plotting."""

import os

import numpy as np
import pytest

from dsrt_tpu.utils.image_io import read_png, write_png


def _write_frames(tmp_path, n=4, w=32, h=20):
    d = tmp_path / "frames"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(n):
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        write_png(str(d / f"frame_{i:04d}.png"), img)
    return str(d)


def test_frames_to_video(tmp_path):
    pytest.importorskip("cv2")
    from scripts.frames_to_video import main
    d = _write_frames(tmp_path)
    out = str(tmp_path / "out.mp4")
    assert main(["--in", d, "--out", out, "--fps", "10"]) == 0
    assert os.path.getsize(out) > 500


def test_frames_natural_sort(tmp_path):
    from scripts.frames_to_video import collect_frames, natural_key
    d = tmp_path / "f"
    d.mkdir()
    for name in ("frame_10.png", "frame_2.png", "frame_1.png"):
        write_png(str(d / name), np.zeros((4, 4, 3), np.uint8))
    frames = collect_frames(str(d), "frame_*.png")
    assert [os.path.basename(f) for f in frames] == [
        "frame_1.png", "frame_2.png", "frame_10.png"]


def test_upsample_torch_fallback(tmp_path):
    pytest.importorskip("torch")
    from scripts.upsample import process_folder
    d = _write_frames(tmp_path, n=2, w=16, h=10)
    out = str(tmp_path / "up")
    n = process_folder(d, out, scale=2, backend="torch")
    assert n == 2
    up = read_png(os.path.join(out, "frame_0000.png"))
    assert up.shape == (20, 32, 3)


def test_upsample_pil(tmp_path):
    pytest.importorskip("PIL")
    from scripts.upsample import process_folder
    d = _write_frames(tmp_path, n=1, w=8, h=6)
    out = str(tmp_path / "up")
    assert process_folder(d, out, scale=4, backend="pil") == 1
    assert read_png(os.path.join(out, "frame_0000.png")).shape == (24, 32, 3)


def test_performance_plot(tmp_path):
    from dsrt_tpu.utils.timing import StageTimer
    from scripts.performance import main, read_tsv
    t = StageTimer()
    with t.stage("render"):
        pass
    t.log("encode", 0.01)
    t.log("render", 0.02)
    tsv = str(tmp_path / "t.tsv")
    t.write_tsv(tsv)
    stages = read_tsv(tsv)
    assert set(stages) == {"render", "encode"}
    out = str(tmp_path / "perf.png")
    assert main(["--tsv", tsv, "--out", out]) == 0
    if os.path.exists(out):  # matplotlib present
        assert os.path.getsize(out) > 1000
