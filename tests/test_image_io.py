import numpy as np
import pytest

from dsrt_tpu.utils import image_io as io


def test_png_roundtrip(tmp_path, rng):
    img = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    p = str(tmp_path / "x.png")
    io.write_png(p, img)
    back = io.read_png(p)
    np.testing.assert_array_equal(img, back)


def test_png_pil_crosscheck(tmp_path, rng):
    PIL = pytest.importorskip("PIL.Image")
    img = rng.integers(0, 256, (9, 31, 3), dtype=np.uint8)
    p = str(tmp_path / "x.png")
    io.write_png(p, img)
    with PIL.open(p) as im:
        np.testing.assert_array_equal(np.asarray(im.convert("RGB")), img)
    # and read a PIL-written png (filters exercised)
    p2 = str(tmp_path / "y.png")
    PIL.fromarray(img).save(p2, optimize=True)
    np.testing.assert_array_equal(io.read_png(p2), img)


def test_ppm_roundtrip(tmp_path, rng):
    img = rng.integers(0, 256, (7, 11, 3), dtype=np.uint8)
    p = str(tmp_path / "x.ppm")
    io.write_ppm(p, img)
    np.testing.assert_array_equal(io.read_ppm(p), img)


def test_load_image_rgb8_png(tmp_path):
    img = np.zeros((4, 4, 3), np.uint8)
    img[..., 1] = 200
    p = str(tmp_path / "g.png")
    io.write_png(p, img)
    np.testing.assert_array_equal(io.load_image_rgb8(p), img)


def test_native_jpeg_decode_matches_pil(tmp_path):
    """Native baseline-JPEG decoder (utils/jpeg.py, the stb_image
    analogue — VERDICT r2 item 9) vs libjpeg, within DCT rounding."""
    PIL = pytest.importorskip("PIL.Image")
    from dsrt_tpu.utils.jpeg import read_jpeg
    rng = np.random.default_rng(11)
    arr = np.clip(rng.normal(128, 48, (61, 97, 3)), 0, 255).astype(np.uint8)
    for sub, tol in ((0, 4), (2, 6)):  # 4:4:4 and 4:2:0
        p = str(tmp_path / f"t{sub}.jpg")
        PIL.fromarray(arr, "RGB").save(p, quality=92, subsampling=sub)
        ours = read_jpeg(p).astype(int)
        ref = np.asarray(PIL.open(p).convert("RGB"), np.uint8).astype(int)
        assert ours.shape == ref.shape
        assert np.abs(ours - ref).max() <= tol


def test_native_jpeg_grayscale_and_loader_route(tmp_path):
    PIL = pytest.importorskip("PIL.Image")
    from dsrt_tpu.utils.image_io import load_image_rgb8
    g = np.linspace(0, 255, 40 * 50).reshape(40, 50).astype(np.uint8)
    p = str(tmp_path / "g.jpg")
    PIL.fromarray(g, "L").save(p, quality=95)
    out = load_image_rgb8(p)
    assert out.shape == (40, 50, 3)
    ref = np.asarray(PIL.open(p).convert("RGB"), np.uint8)
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 2


def test_native_jpeg_restart_markers(tmp_path):
    PIL = pytest.importorskip("PIL.Image")
    from dsrt_tpu.utils.jpeg import read_jpeg
    rng = np.random.default_rng(12)
    arr = np.clip(rng.normal(120, 40, (64, 160, 3)), 0, 255).astype(np.uint8)
    p = str(tmp_path / "rst.jpg")
    try:
        PIL.fromarray(arr, "RGB").save(p, quality=90, subsampling=0,
                                       restart_marker_rows=1)
    except (TypeError, OSError):
        pytest.skip("PIL build cannot emit restart markers")
    with open(p, "rb") as f:
        assert b"\xff\xdd" in f.read(), "no DRI emitted"
    ours = read_jpeg(p).astype(int)
    ref = np.asarray(PIL.open(p).convert("RGB"), np.uint8).astype(int)
    assert np.abs(ours - ref).max() <= 4
