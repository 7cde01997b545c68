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
