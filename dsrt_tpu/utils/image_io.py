"""Image I/O without external process boundaries.

The reference writes binary PPM P6 from the CUDA host wrapper
(src/gpu_render.cu:1100-1107) and shells out to ImageMagick per frame for
PNG conversion (src/main.cpp:28-36).  Here PNG encoding is an in-process
pure-Python encoder (stdlib zlib), with decoders for PNG/PPM so texture
loading (the stb_image role, inc/stb_image.h) has no hard third-party
dependency.  PIL is used opportunistically for other formats (JPEG, BMP...)
when importable.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def write_png(path: str, rgb8: np.ndarray) -> None:
    """Write an (H,W,3) uint8 array as an RGB PNG."""
    img = np.ascontiguousarray(rgb8, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected (H,W,3) uint8, got {img.shape}")
    h, w = img.shape[:2]
    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))  # filter 0 rows
    idat = zlib.compress(raw, 6)

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    with open(path, "wb") as f:
        f.write(_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
                + chunk(b"IEND", b""))


def _png_unfilter(raw: bytes, w: int, h: int, nch: int, bpp_bytes: int) -> np.ndarray:
    stride = w * nch * bpp_bytes
    out = np.empty((h, stride), np.uint8)
    pos = 0
    fb = bpp_bytes * nch
    prev = np.zeros(stride, np.uint16)
    for r in range(h):
        ftype = raw[pos]
        pos += 1
        row = np.frombuffer(raw, np.uint8, stride, pos).astype(np.uint16)
        pos += stride
        if ftype == 0:
            cur = row
        elif ftype == 1:  # Sub
            cur = row.copy()
            for i in range(fb, stride):
                cur[i] = (cur[i] + cur[i - fb]) & 0xFF
        elif ftype == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = row.copy()
            for i in range(stride):
                a = cur[i - fb] if i >= fb else 0
                cur[i] = (cur[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = row.copy()
            for i in range(stride):
                a = int(cur[i - fb]) if i >= fb else 0
                b = int(prev[i])
                c = int(prev[i - fb]) if i >= fb else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    return out


def read_png(path: str) -> np.ndarray:
    """Minimal PNG decoder -> (H,W,3) uint8.  Supports 8-bit gray / RGB /
    palette / RGBA / gray+alpha, all filter types, no interlace."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    idat = b""
    plte = None
    w = h = depth = ctype = interlace = None
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", payload)
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if depth != 8 or interlace != 0:
        raise ValueError(f"unsupported PNG (depth={depth}, interlace={interlace})")
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    raw = zlib.decompress(idat)
    img = _png_unfilter(raw, w, h, nch, 1).reshape(h, w, nch)
    if ctype == 3:
        img = plte[img[..., 0]]
    elif ctype == 0:
        img = np.repeat(img, 3, axis=2)
    elif ctype == 4:
        img = np.repeat(img[..., :1], 3, axis=2)
    elif ctype == 6:
        img = img[..., :3]
    return np.ascontiguousarray(img)


def write_ppm(path: str, rgb8: np.ndarray) -> None:
    """Binary PPM P6, the reference's native output format
    (src/gpu_render.cu:1100-1107)."""
    img = np.ascontiguousarray(rgb8, dtype=np.uint8)
    h, w = img.shape[:2]
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(img.tobytes())


def read_ppm(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        data = f.read()
    # header: magic, w, h, maxval separated by whitespace/comments
    tokens = []
    pos = 0
    while len(tokens) < 4:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        tokens.append(data[start:pos])
    pos += 1  # single whitespace after maxval
    magic, w, h, maxval = tokens[0], int(tokens[1]), int(tokens[2]), int(tokens[3])
    if magic != b"P6" or maxval != 255:
        raise ValueError("only P6/255 PPM supported")
    img = np.frombuffer(data, np.uint8, w * h * 3, pos).reshape(h, w, 3)
    return np.ascontiguousarray(img)


def read_bmp(path: str) -> np.ndarray:
    """Uncompressed 24/32-bit BI_RGB Windows BMP -> (H,W,3) uint8 (the
    stb_image BMP subset that texture assets actually use)."""
    with open(path, "rb") as fh:
        data = fh.read()
    if data[:2] != b"BM":
        raise ValueError("not a BMP file")
    off = int.from_bytes(data[10:14], "little")
    hdr_size = int.from_bytes(data[14:18], "little")
    if hdr_size < 40:
        raise ValueError("BMP core headers unsupported")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    comp = int.from_bytes(data[30:34], "little")
    if comp not in (0, 3) or bpp not in (24, 32):
        raise ValueError(f"BMP bpp={bpp} compression={comp} unsupported")
    flip = h > 0          # positive height = bottom-up storage
    h = abs(h)
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    rows = np.frombuffer(data, np.uint8, stride * h, off)
    img = rows.reshape(h, stride)[:, :w * nch].reshape(h, w, nch)
    img = img[::-1] if flip else img
    # BGR(A) -> RGB
    return np.ascontiguousarray(img[..., 2::-1])


def read_tga(path: str) -> np.ndarray:
    """TGA type 2 (uncompressed true-color) and type 10 (RLE true-color)
    -> (H,W,3) uint8."""
    with open(path, "rb") as fh:
        data = fh.read()
    idlen, cmap_type, imgtype = data[0], data[1], data[2]
    if cmap_type != 0 or imgtype not in (2, 10):
        raise ValueError(f"TGA type {imgtype}/cmap {cmap_type} unsupported")
    w = int.from_bytes(data[12:14], "little")
    h = int.from_bytes(data[14:16], "little")
    bpp = data[16]
    desc = data[17]
    if bpp not in (24, 32):
        raise ValueError(f"TGA bpp={bpp} unsupported")
    nch = bpp // 8
    pos = 18 + idlen
    if imgtype == 2:
        px = np.frombuffer(data, np.uint8, w * h * nch, pos)
    else:                 # RLE
        out = bytearray()
        need = w * h * nch
        while len(out) < need:
            hdrb = data[pos]
            pos += 1
            cnt = (hdrb & 0x7F) + 1
            if hdrb & 0x80:           # run packet
                out += data[pos:pos + nch] * cnt
                pos += nch
            else:                     # raw packet
                out += data[pos:pos + nch * cnt]
                pos += nch * cnt
        px = np.frombuffer(bytes(out), np.uint8, need)
    img = px.reshape(h, w, nch)
    if not (desc & 0x20):             # bit 5 clear = bottom-up
        img = img[::-1]
    return np.ascontiguousarray(img[..., 2::-1])  # BGR(A) -> RGB


def load_image_rgb8(path: str) -> np.ndarray:
    """Decode any supported image to (H,W,3) uint8 (stbi_load force-RGB
    analogue, src/gpu_scene_builder.cpp:215).  Native decoders cover
    PNG, PPM, baseline JPEG, BMP (24/32-bit BI_RGB), and TGA (types
    2/10) — the formats texture assets actually ship in; anything else
    falls through to PIL when available."""
    lower = path.lower()
    if lower.endswith(".png"):
        try:
            return read_png(path)
        except Exception:
            pass  # fall through to PIL for exotic PNGs
    if lower.endswith((".ppm",)):
        return read_ppm(path)
    if lower.endswith((".jpg", ".jpeg")):
        # native baseline-JPEG decoder (stb_image analogue); progressive
        # or exotic files fall through to PIL
        from dsrt_tpu.utils import jpeg
        try:
            return jpeg.read_jpeg(path)
        except jpeg.UnsupportedJPEG:
            pass
    if lower.endswith(".bmp"):
        try:
            return read_bmp(path)
        except ValueError:
            pass
    if lower.endswith(".tga"):
        try:
            return read_tga(path)
        except ValueError:
            pass
    try:
        from PIL import Image  # optional
        with Image.open(path) as im:
            return np.asarray(im.convert("RGB"), np.uint8)
    except ImportError as e:
        raise IOError(f"cannot decode '{path}': PIL unavailable (native "
                      "decoders cover PNG/PPM/baseline JPEG/BMP/TGA)") from e
