#!/usr/bin/env python
"""Super-resolution post-process for rendered frames.

Equivalent of the reference's scripts/upsample.py (Real-ESRGAN x2/x4,
RRDBNet-23, auto-downloaded weights, fp16 on GPU, upsample.py:26-100).
Real-ESRGAN needs packages (realesrgan/basicsr) and network weight
downloads that are not available in a hermetic environment, so this script
layers fallbacks:

1. jax — the TPU-native RRDBNet inference (dsrt_tpu/models/esrgan.py):
   the official release weights run jitted on TPU, torch only
   deserializes the .pth once (needs cached/downloadable weights);
2. realesrgan (if importable + weights cached locally) — the reference's
   own torch/CUDA stack, kept for parity;
3. torch bicubic upsampling (always available with CPU torch);
4. PIL bicubic.

Usage: python scripts/upsample.py --in dir_or_image --out out_dir
       [--scale 4] [--backend auto|jax|realesrgan|torch|pil]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys


# Official Real-ESRGAN release weights (the URLs the reference
# auto-downloads from, scripts/upsample.py:29-39) + published SHA256.
WEIGHT_URLS = {
    2: ("https://github.com/xinntao/Real-ESRGAN/releases/download/"
        "v0.2.1/RealESRGAN_x2plus.pth",
        "49fafd45f8fd7aa8d31ab2a22d14d91b536c34494a5cfe31eb5d89c2fa266abb"),
    4: ("https://github.com/xinntao/Real-ESRGAN/releases/download/"
        "v0.1.0/RealESRGAN_x4plus.pth",
        "4fa0d38905f75ac06eb49a7951b426670021be3018265fd191d2125df9d682f1"),
}


def fetch_weights(scale: int, allow_download: bool = True) -> str:
    """Return the cached weight path, auto-downloading (with a SHA256
    check) when absent and the network permits — reference parity with
    scripts/upsample.py:29-39, plus integrity verification."""
    import hashlib
    import urllib.request

    name = f"RealESRGAN_x{scale}plus"
    weights = os.path.expanduser(f"~/.cache/realesrgan/{name}.pth")
    if os.path.exists(weights):
        return weights
    if not allow_download:
        raise FileNotFoundError(f"weights not cached at {weights}")
    url, sha = WEIGHT_URLS[scale]
    os.makedirs(os.path.dirname(weights), exist_ok=True)
    tmp = weights + ".part"
    print(f"[+] downloading {url}", file=sys.stderr)
    try:
        urllib.request.urlretrieve(url, tmp)
    except Exception as e:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise FileNotFoundError(
            f"weights not cached at {weights} and download failed ({e}); "
            f"fetch {url} manually") from e
    digest = hashlib.sha256(open(tmp, "rb").read()).hexdigest()
    if digest != sha:
        os.unlink(tmp)
        raise ValueError(f"weight download hash mismatch for {name}: "
                         f"{digest} != {sha}")
    os.replace(tmp, weights)
    return weights


def build_realesrgan(scale: int):
    from basicsr.archs.rrdbnet_arch import RRDBNet
    from realesrgan import RealESRGANer
    import torch

    model = RRDBNet(num_in_ch=3, num_out_ch=3, num_feat=64, num_block=23,
                    num_grow_ch=32, scale=scale)
    weights = fetch_weights(scale)
    half = torch.cuda.is_available()
    return RealESRGANer(scale=scale, model_path=weights, model=model,
                        half=half)


def upsample_torch(img, scale: int):
    import numpy as np
    import torch
    t = torch.from_numpy(img.transpose(2, 0, 1)[None].astype("float32") / 255)
    out = torch.nn.functional.interpolate(
        t, scale_factor=scale, mode="bicubic", align_corners=False)
    out = out.clamp(0, 1).numpy()[0].transpose(1, 2, 0)
    return (out * 255 + 0.5).astype(np.uint8)


def upsample_pil(img, scale: int):
    import numpy as np
    from PIL import Image
    h, w = img.shape[:2]
    return np.asarray(Image.fromarray(img).resize(
        (w * scale, h * scale), Image.BICUBIC))


def process_folder(in_path: str, out_dir: str, scale: int = 4,
                   backend: str = "auto") -> int:
    from dsrt_tpu.utils.image_io import load_image_rgb8, write_png

    os.makedirs(out_dir, exist_ok=True)
    if os.path.isdir(in_path):
        files = sorted(glob.glob(os.path.join(in_path, "*.png")))
    else:
        files = [in_path]

    upsampler = None
    jax_params = None
    if backend in ("auto", "jax"):
        try:
            from dsrt_tpu.models.esrgan import load_torch_checkpoint
            jax_params = load_torch_checkpoint(fetch_weights(scale),
                                               scale=scale)
            backend = "jax"
        except Exception as e:
            if backend == "jax":
                raise
            print(f"jax RRDBNet unavailable ({e}); falling back",
                  file=sys.stderr)
            backend = "auto"
    if backend in ("auto", "realesrgan"):
        try:
            upsampler = build_realesrgan(scale)
            backend = "realesrgan"
        except Exception as e:
            if backend == "realesrgan":
                raise
            print(f"realesrgan unavailable ({e}); falling back", file=sys.stderr)
            backend = "torch"

    n = 0
    for f in files:
        img = load_image_rgb8(f)
        if backend == "jax":
            from dsrt_tpu.models.esrgan import upscale_u8
            out = upscale_u8(jax_params, img, scale)
        elif backend == "realesrgan":
            out, _ = upsampler.enhance(img[:, :, ::-1], outscale=scale)
            out = out[:, :, ::-1]
        elif backend == "torch":
            try:
                out = upsample_torch(img, scale)
            except ImportError:
                out = upsample_pil(img, scale)
        else:
            out = upsample_pil(img, scale)
        write_png(os.path.join(out_dir, os.path.basename(f)), out)
        n += 1
    print(f"[+] upsampled {n} image(s) x{scale} via {backend} -> {out_dir}")
    return n


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--in", dest="in_path", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--scale", type=int, default=4, choices=(2, 4))
    p.add_argument("--backend", default="auto",
                   choices=("auto", "jax", "realesrgan", "torch", "pil"))
    args = p.parse_args(argv)
    process_folder(args.in_path, args.out, args.scale, args.backend)
    return 0


if __name__ == "__main__":
    sys.exit(main())
