"""RRDBNet (Real-ESRGAN generator) inference in pure JAX.

TPU-native equivalent of the reference's Real-ESRGAN upsampler
(/root/reference/scripts/upsample.py:26-100, RRDBNet-23 via basicsr +
torch CUDA): the same architecture implemented as jnp convolutions over
an explicit parameter pytree, so the official release weights
(RealESRGAN_x2plus / x4plus .pth) run jitted on TPU with no torch at
inference time.  torch (CPU) is only needed once, to deserialize the
.pth checkpoint into numpy arrays (`load_torch_checkpoint`).

Architecture (public Real-ESRGAN design):
  conv_first -> 23 x RRDB -> conv_body (+residual) ->
  2 x [nearest x2 upsample -> conv -> lrelu] -> conv_hr -> conv_last
  RRDB       = 3 x ResidualDenseBlock, each residual-scaled by 0.2
  RDB        = 5 densely-connected 3x3 convs, lrelu(0.2) between
  scale 2    = pixel-unshuffle(2) on input (conv_first takes 4*C_in),
               output is still 4x the unshuffled grid = 2x the image

Large frames run through `upscale_tiled`: overlapping tiles are
upscaled independently and the interiors stitched — identical to the
whole-frame result away from a 1-texel seam tolerance, and it bounds
device memory to one tile's activations (the 23-block trunk at full
1080p would need ~8 GB of activations otherwise).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# parameter pytree construction / torch checkpoint conversion
# ---------------------------------------------------------------------------

def _conv_spec(cin: int, cout: int):
    return {"w": (3, 3, cin, cout), "b": (cout,)}


def rrdbnet_spec(num_in_ch: int = 3, num_out_ch: int = 3,
                 num_feat: int = 64, num_block: int = 23,
                 num_grow_ch: int = 32, scale: int = 4) -> dict:
    """Shape spec of the parameter pytree (HWIO conv kernels)."""
    cin = num_in_ch * (4 if scale == 2 else 16 if scale == 1 else 1)
    nf, gc = num_feat, num_grow_ch

    def rdb():
        return {f"conv{i + 1}": _conv_spec(nf + i * gc,
                                           gc if i < 4 else nf)
                for i in range(5)}

    spec = {
        "conv_first": _conv_spec(cin, nf),
        "body": [{f"rdb{j + 1}": rdb() for j in range(3)}
                 for _ in range(num_block)],
        "conv_body": _conv_spec(nf, nf),
        "conv_up1": _conv_spec(nf, nf),
        "conv_up2": _conv_spec(nf, nf),
        "conv_hr": _conv_spec(nf, nf),
        "conv_last": _conv_spec(nf, num_out_ch),
    }
    return spec


def init_params(rng: np.random.Generator, spec: dict,
                dtype=np.float32) -> dict:
    """Random He-style init matching the spec (tests / smoke runs)."""
    def leaf(s):
        if len(s) == 1:
            return np.zeros(s, dtype)
        fan_in = s[0] * s[1] * s[2]
        return (rng.standard_normal(s) * np.sqrt(2.0 / fan_in) * 0.1
                ).astype(dtype)

    def walk(node):
        if isinstance(node, dict):
            if set(node) == {"w", "b"}:
                return {"w": leaf(node["w"]), "b": leaf(node["b"])}
            return {k: walk(v) for k, v in node.items()}
        return [walk(v) for v in node]

    return walk(spec)


def load_torch_checkpoint(path: str, num_block: int = 23,
                          scale: int = 4) -> dict:
    """Convert a Real-ESRGAN .pth checkpoint (basicsr RRDBNet state
    dict, OIHW conv kernels, keys like `body.3.rdb2.conv4.weight`,
    usually nested under 'params_ema'/'params') to the JAX pytree."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=True)
    for k in ("params_ema", "params", "state_dict"):
        if k in raw:
            raw = raw[k]
            break
    sd = {k: np.asarray(v) for k, v in raw.items()}

    def conv(prefix):
        w = sd[f"{prefix}.weight"]          # OIHW
        b = sd[f"{prefix}.bias"]
        return {"w": np.transpose(w, (2, 3, 1, 0)).astype(np.float32),
                "b": b.astype(np.float32)}

    params = {
        "conv_first": conv("conv_first"),
        "body": [
            {f"rdb{j + 1}": {f"conv{i + 1}":
                             conv(f"body.{n}.rdb{j + 1}.conv{i + 1}")
                             for i in range(5)}
             for j in range(3)}
            for n in range(num_block)],
        "conv_body": conv("conv_body"),
        "conv_up1": conv("conv_up1"),
        "conv_up2": conv("conv_up2"),
        "conv_hr": conv("conv_hr"),
        "conv_last": conv("conv_last"),
    }
    return params


# ---------------------------------------------------------------------------
# forward pass
# ---------------------------------------------------------------------------

def _conv3(x, p):
    """3x3 same conv, NHWC x HWIO."""
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(p["w"]), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + jnp.asarray(p["b"])


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.2 * x)


def _rdb(x, p):
    """ResidualDenseBlock: 5 densely connected convs, 0.2 residual."""
    x1 = _lrelu(_conv3(x, p["conv1"]))
    x2 = _lrelu(_conv3(jnp.concatenate([x, x1], -1), p["conv2"]))
    x3 = _lrelu(_conv3(jnp.concatenate([x, x1, x2], -1), p["conv3"]))
    x4 = _lrelu(_conv3(jnp.concatenate([x, x1, x2, x3], -1), p["conv4"]))
    x5 = _conv3(jnp.concatenate([x, x1, x2, x3, x4], -1), p["conv5"])
    return x + 0.2 * x5


def _rrdb(x, p):
    y = _rdb(x, p["rdb1"])
    y = _rdb(y, p["rdb2"])
    y = _rdb(y, p["rdb3"])
    return x + 0.2 * y


def _pixel_unshuffle(x, s: int):
    n, h, w, c = x.shape
    x = x.reshape(n, h // s, s, w // s, s, c)
    return x.transpose(0, 1, 3, 5, 2, 4).reshape(n, h // s, w // s,
                                                 c * s * s)


def _nearest2x(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def rrdbnet_forward(params: dict, x: jnp.ndarray,
                    scale: int = 4) -> jnp.ndarray:
    """RRDBNet forward: NHWC float in [0, 1] -> NHWC, `scale`x size."""
    if scale == 2:
        feat = _pixel_unshuffle(x, 2)
    elif scale == 1:
        feat = _pixel_unshuffle(x, 4)
    else:
        feat = x
    feat = _conv3(feat, params["conv_first"])
    body = feat
    for blk in params["body"]:
        body = _rrdb(body, blk)
    feat = feat + _conv3(body, params["conv_body"])
    feat = _lrelu(_conv3(_nearest2x(feat), params["conv_up1"]))
    feat = _lrelu(_conv3(_nearest2x(feat), params["conv_up2"]))
    return _conv3(_lrelu(_conv3(feat, params["conv_hr"])),
                  params["conv_last"])


@partial(jax.jit, static_argnames=("scale",))
def _forward_jit(params, x, scale: int):
    return rrdbnet_forward(params, x, scale)


# ---------------------------------------------------------------------------
# tiled inference
# ---------------------------------------------------------------------------

def upscale_tiled(params: dict, img: np.ndarray, scale: int = 4,
                  tile: int = 128, overlap: int = 8) -> np.ndarray:
    """Upscale an (H, W, 3) float [0,1] image through RRDBNet in
    overlapping tiles (one jit specialization per tile shape; edge
    tiles are zero-padded to the tile grid and cropped after).  Matches
    whole-image inference except where the network's receptive field
    crosses the overlap margin — visually seamless at overlap >= 8,
    the standard ESRGAN tiling scheme."""
    h, w, _ = img.shape
    if h <= tile and w <= tile:
        out = _forward_jit(params, jnp.asarray(img[None]), scale)
        return np.asarray(jax.device_get(out))[0]

    step = tile - 2 * overlap
    hp = int(np.ceil(max(h - 2 * overlap, 1) / step)) * step + 2 * overlap
    wp = int(np.ceil(max(w - 2 * overlap, 1) / step)) * step + 2 * overlap
    pad = np.pad(img, ((0, hp - h), (0, wp - w), (0, 0)), mode="edge")
    out = np.zeros((hp * scale, wp * scale, 3), np.float32)
    for y0 in range(0, hp - 2 * overlap, step):
        for x0 in range(0, wp - 2 * overlap, step):
            t = pad[y0:y0 + tile, x0:x0 + tile]
            u = np.asarray(jax.device_get(
                _forward_jit(params, jnp.asarray(t[None]), scale)))[0]
            # interior of the upscaled tile (skip the overlap margin,
            # except at the leading image border)
            sy0 = 0 if y0 == 0 else overlap * scale
            sx0 = 0 if x0 == 0 else overlap * scale
            oy0 = y0 * scale + sy0
            ox0 = x0 * scale + sx0
            out[oy0:(y0 + tile) * scale, ox0:(x0 + tile) * scale] = \
                u[sy0:, sx0:]
    return out[:h * scale, :w * scale]


def upscale_u8(params: dict, img_u8: np.ndarray, scale: int = 4,
               tile: int = 128, overlap: int = 8) -> np.ndarray:
    """uint8 (H, W, 3) -> uint8 (sH, sW, 3) through the network."""
    x = img_u8.astype(np.float32) / 255.0
    y = upscale_tiled(params, x, scale, tile, overlap)
    return np.clip(np.rint(y * 255.0), 0, 255).astype(np.uint8)
