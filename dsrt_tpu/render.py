"""Top-level frame rendering: lane layout, sample loop, tonemap.

Replaces render_kernel + gpu_render_scene (src/gpu_render.cu:973-1108).
Pixels are laid out as packets of 1024 lanes shaped as an 8-row x 128-col
pixel tile (one VPU tile per vector component), the packet axis playing the
role of the CUDA grid.  Samples run sequentially per pixel with the
stratified-on-the-diagonal jitter of the reference
(jx = (s + rand)/spp, jy = (s + rand)/spp, src/gpu_render.cu:993-999,
both stratified on the same index s — reproduced verbatim), so the
per-pixel LCG stream is identical to the CUDA renderer's.

Tonemap chain (src/gpu_render.cu:1002-1030): average, clamp negatives,
firefly clamp at 10.0 (dead in practice since ray_color pre-clamps to
[0,1]), gamma via pow(c, 1/gamma), clamp01, vertical flip, u8 with 255.99
scale.  `exposure` is accepted and unused, like the reference (1044).
"""

from __future__ import annotations

import math
from functools import partial


import numpy as np
import jax
import jax.numpy as jnp

from dsrt_tpu.config import RenderConfig
from dsrt_tpu.exec_opts import opts_key
from dsrt_tpu.ops import rng as rngmod
from dsrt_tpu.ops.camera import Camera, camera_rays
from dsrt_tpu.ops.linalg import V3
from dsrt_tpu.ops.shade import trace_paths

TILE_H = 8
TILE_W = 128
PACKET = TILE_H * TILE_W


def _layout_tile():
    """Pixel tile per packet from exec_opts.layout ("THxTW").  Squarer
    tiles shrink a block's traversal-front perimeter (the fused kernel
    walks the UNION front of its block's rays); the mapping is a pure
    pixel permutation, so images are bit-identical at any shape."""
    from dsrt_tpu.exec_opts import OPTS
    th, tw = (int(v) for v in OPTS.layout.split("x"))
    assert th * tw == PACKET, OPTS.layout
    return th, tw


def lane_layout(width: int, height: int):
    """Pixel-to-lane mapping: (K, 1024) arrays px, py, valid where each
    packet is a TH x TW pixel tile (spatially coherent for traversal;
    shape from exec_opts.layout, default 32x32)."""
    th, tw = _layout_tile()
    tx = math.ceil(width / tw)
    ty = math.ceil(height / th)
    hp, wp = ty * th, tx * tw
    ys, xs = np.mgrid[0:hp, 0:wp]

    def to_lanes(a):
        return (a.reshape(ty, th, tx, tw)
                .transpose(0, 2, 1, 3)
                .reshape(ty * tx, PACKET))

    px = to_lanes(xs).astype(np.int32)
    py = to_lanes(ys).astype(np.int32)
    valid = (px < width) & (py < height)
    return px, py, valid, (ty, tx)


def lanes_to_image(vals: jnp.ndarray, ty: int, tx: int) -> jnp.ndarray:
    """(K, P) lane array -> (Hp, Wp) padded image (inverse of
    lane_layout's mapping; reads the same exec_opts.layout)."""
    th, tw = _layout_tile()
    return (vals.reshape(ty, tx, th, tw)
            .transpose(0, 2, 1, 3)
            .reshape(ty * th, tx * tw))


@partial(jax.jit, static_argnames=("cfg", "ty", "tx", "_opts"))
def _render_lanes(scene, cam: Camera, px, py, valid, cfg: RenderConfig,
                  ty: int, tx: int, _opts=None):
    spp = cfg.resolved_spp()
    state = rngmod.seed_pixels(px, py, cam.width, scene.seed)
    zero = jnp.zeros(px.shape, jnp.float32)

    def sample_body(s, carry):
        accum, state = carry
        jxu, state = rngmod.draw(state, valid)
        jyu, state = rngmod.draw(state, valid)
        sf = s.astype(jnp.float32)
        jx = (sf + jxu) / jnp.float32(spp)
        jy = (sf + jyu) / jnp.float32(spp)
        ro, rd, state = camera_rays(cam, px, py, jx, jy, state, valid,
                                    cfg.aperture > 0)
        if cfg.time1 > cfg.time0:
            # camera shutter: ONE draw after jitter/aperture, driving
            # moving-sphere centers (inc/sphere.h:143-146 semantics)
            ut, state = rngmod.draw(state, valid)
            time = cfg.time0 + ut * (cfg.time1 - cfg.time0)
        else:
            time = None
        L, state = trace_paths(scene, cfg, ro, rd, state, valid, time=time)
        return (accum + L, state)

    accum, _ = jax.lax.fori_loop(
        0, spp, sample_body, (V3(zero, zero, zero), state))

    inv_spp = jnp.float32(1.0 / spp)
    inv_gamma = jnp.float32(1.0 / cfg.gamma)

    def tonemap(c):
        c = c * inv_spp
        c = jnp.maximum(c, 0.0)
        c = jnp.minimum(c, cfg.firefly_clamp)
        c = jnp.power(c, inv_gamma)
        c = jnp.clip(c, 0.0, 1.0)
        return (255.99 * c).astype(jnp.uint8)

    chans = [tonemap(accum.x), tonemap(accum.y), tonemap(accum.z)]
    padded = jnp.stack([lanes_to_image(c, ty, tx) for c in chans], axis=-1)
    img = padded[:cfg.height, :cfg.width][::-1]  # vertical flip (cu:1027)
    return img


def render_frame(scene, cam: Camera, cfg: RenderConfig | None = None,
                 spp_batch: int = 1) -> np.ndarray:
    """Render one frame; returns (H, W, 3) uint8 (row 0 = top).

    spp_batch = 1 (default): samples per pixel run sequentially on one LCG
    stream — bit-identical to the CUDA reference.  spp_batch = B > 1:
    throughput mode — B samples per pixel are traced concurrently as extra
    lane packets with decorrelated per-slot streams (statistically
    equivalent; the `rng_mode` knob the reference reserved unimplemented,
    inc/gpu_scene.h:103).  B must divide spp.
    """
    if cfg is None:
        cfg = RenderConfig(width=cam.width, height=cam.height)
    px, py, valid, (ty, tx) = lane_layout(cfg.width, cfg.height)
    if spp_batch <= 1:
        img = _render_lanes(scene, cam, jnp.asarray(px), jnp.asarray(py),
                            jnp.asarray(valid), cfg, ty, tx,
                            _opts=opts_key())
    else:
        spp = cfg.resolved_spp()
        if spp % spp_batch != 0:
            raise ValueError(f"spp_batch={spp_batch} must divide spp={spp}")
        img = _render_lanes_batched(scene, cam, jnp.asarray(px),
                                    jnp.asarray(py), jnp.asarray(valid),
                                    cfg, ty, tx, spp_batch,
                                    _opts=opts_key())
    return np.asarray(jax.device_get(img))


SLOT_SEED_MIX = 0x9E3779B9  # golden-ratio mix for per-slot decorrelation


def render_frame_wavefront(scene, cam: Camera, cfg: RenderConfig,
                           spp_batch: int = 8, with_count: bool = False):
    """Throughput-mode render via the persistent wavefront with per-lane
    sample regeneration (ops/wavefront.py).  `spp_batch` concurrent sample
    slots per pixel; must divide spp.  Statistically equivalent to the
    parity renderer (decorrelated RNG slots).  with_count=True also
    returns the exact in-loop ray count."""
    spp = cfg.resolved_spp()
    if spp % spp_batch != 0:
        raise ValueError(f"spp_batch={spp_batch} must divide spp={spp}")
    px, py, valid, (ty, tx) = lane_layout(cfg.width, cfg.height)
    k = px.shape[0]
    pxb = jnp.tile(jnp.asarray(px), (spp_batch, 1))
    pyb = jnp.tile(jnp.asarray(py), (spp_batch, 1))
    validb = jnp.tile(jnp.asarray(valid), (spp_batch, 1))
    slot = jnp.repeat(jnp.arange(spp_batch, dtype=jnp.uint32), k)[:, None]
    slot = jnp.broadcast_to(slot, pxb.shape)
    img, nrays = _render_wavefront(scene, cam, pxb, pyb, validb, slot, cfg,
                                   ty, tx, spp_batch, with_count,
                                   _opts=opts_key())
    img = np.asarray(jax.device_get(img))
    if with_count:
        return img, int(jax.device_get(nrays))
    return img


def render_frame_fused(scene, cam: Camera, cfg: RenderConfig,
                       with_count: bool = False):
    """Fastest mode on supported scenes (ops/pallas_path.py): the whole
    sample loop runs in ONE persistent Pallas kernel per frame, with the
    exact per-pixel LCG schedule of the parity renderer (bit-identical
    streams).  Fallback is the caller's job: check
    `pallas_path.fused_supported(scene, cfg)` first.

    with_count=True also returns the exact in-kernel ray count (every
    scene-intersection query) for honest Mrays telemetry — free, the
    kernel always counts."""
    px, py, valid, (ty, tx) = lane_layout(cfg.width, cfg.height)
    img, nrays = _render_fused_auto(scene, cam, jnp.asarray(px),
                                    jnp.asarray(py), jnp.asarray(valid),
                                    cfg, ty, tx)
    img = np.asarray(jax.device_get(img))
    if with_count:
        # per-block i32 counts summed in int64 (device i32 sum would
        # overflow at 1080p @ 1000 spp)
        return img, int(np.asarray(jax.device_get(nrays),
                                   np.int64).sum())
    return img


def fused_kind(scene, cfg) -> str | None:
    """Which fused megakernel covers this scene: 'tri'
    (ops/pallas_path.py), 'sphere' (ops/pallas_sphere.py), or None."""
    from dsrt_tpu.ops.pallas_path import fused_supported
    from dsrt_tpu.ops.pallas_sphere import sphere_fused_supported
    if fused_supported(scene, cfg):
        return "tri"
    if sphere_fused_supported(scene, cfg):
        return "sphere"
    return None


@partial(jax.jit, static_argnames=("cfg", "ty", "tx", "_opts"))
def _render_fused(scene, cam: Camera, px, py, valid, cfg: RenderConfig,
                  ty: int, tx: int, _opts=None):
    # n_tris/n_quads are scene META (static under jit): scenes with
    # tris or quads take the wide-BVH megakernel (quads run in its
    # pre-walk primitive pass; a 0-tri walk is a no-op), sphere-only
    # scenes its sibling
    if scene.n_tris > 0 or scene.n_quads > 0:
        from dsrt_tpu.ops.pallas_path import trace_fused
        accum, nrays = trace_fused(scene, cfg, cam, px, py, valid)
    else:
        from dsrt_tpu.ops.pallas_sphere import trace_fused_spheres
        accum, nrays = trace_fused_spheres(scene, cfg, cam, px, py, valid)
    inv_spp = jnp.float32(1.0 / cfg.resolved_spp())
    inv_gamma = jnp.float32(1.0 / cfg.gamma)

    def tonemap(c):
        c = c * inv_spp
        c = jnp.maximum(c, 0.0)
        c = jnp.minimum(c, cfg.firefly_clamp)
        c = jnp.power(c, inv_gamma)
        c = jnp.clip(c, 0.0, 1.0)
        return (255.99 * c).astype(jnp.uint8)

    chans = [tonemap(accum.x), tonemap(accum.y), tonemap(accum.z)]
    padded = jnp.stack([lanes_to_image(c, ty, tx) for c in chans], axis=-1)
    return padded[:cfg.height, :cfg.width][::-1], nrays


@partial(jax.jit, static_argnames=("cfg", "ty", "tx", "spp_total", "_opts"))
def _fused_finish(ax, ay, az, counts, cfg: RenderConfig, ty: int, tx: int,
                  spp_total: int, _opts=None):
    """Tonemap summed fused accumulators (same chain as _render_fused).
    The stacked per-chunk bucketed i32 ray counts pass through UNsummed:
    device i64 is unavailable without x64 mode and an i32 sum overflows
    at 1080p@1000spp scale (2.5e9 rays) — callers sum host-side in i64,
    same contract as the single-dispatch buckets."""
    inv_spp = jnp.float32(1.0 / spp_total)
    inv_gamma = jnp.float32(1.0 / cfg.gamma)

    def tonemap(c):
        c = c * inv_spp
        c = jnp.maximum(c, 0.0)
        c = jnp.minimum(c, cfg.firefly_clamp)
        c = jnp.power(c, inv_gamma)
        c = jnp.clip(c, 0.0, 1.0)
        return (255.99 * c).astype(jnp.uint8)

    chans = [tonemap(ax), tonemap(ay), tonemap(az)]
    padded = jnp.stack([lanes_to_image(c, ty, tx) for c in chans], axis=-1)
    return padded[:cfg.height, :cfg.width][::-1], counts


def _fused_chunk_spp(cfg: RenderConfig) -> int | None:
    """spp per fused dispatch, or None for the single-dispatch path.
    Bounds one kernel's primary-ray count by exec_opts
    fused_dispatch_rays so a close-in 1080p@1000spp frame (2e9+ scene
    rays, 90-100 s in one kernel) cannot trip the TPU runtime's hang
    detection; everything at or under the budget keeps the r3
    single-dispatch path (bit-identical images)."""
    from dsrt_tpu.exec_opts import OPTS
    budget = int(OPTS.fused_dispatch_rays)
    spp = cfg.resolved_spp()
    per_spp = cfg.width * cfg.height
    if budget <= 0 or per_spp * spp <= budget:
        return None
    return max(1, budget // per_spp)


def _render_fused_auto(scene, cam: Camera, px, py, valid,
                       cfg: RenderConfig, ty: int, tx: int):
    """Fused-frame dispatch with the per-kernel ray budget applied.
    Over-budget frames render as ceil(spp/chunk) salted spp chunks
    through the runtime-spp kernel (`_fused_accum`, one compile for
    all chunks); chunk 0 carries salt 0, so its streams are the parity
    LCG streams, and later chunks decorrelate with the adaptive path's
    golden-ratio salt.  Dispatches are enqueued without blocking, so
    the driver's frame pipeline overlap is preserved."""
    chunk = _fused_chunk_spp(cfg)
    if chunk is None:
        return _render_fused(scene, cam, px, py, valid, cfg, ty, tx,
                             _opts=opts_key())
    spp = cfg.resolved_spp()
    salt_mix = 0x9E3779B9
    ax = ay = az = None
    counts = []
    done = 0
    i = 0
    while done < spp:
        spp_c = min(chunk, spp - done)
        salt = (np.uint32((i * salt_mix) & 0xFFFFFFFF).astype(np.int32)
                if i else np.int32(0))
        accum, nr = _fused_accum(scene, cam, px, py, valid, cfg,
                                 jnp.asarray(spp_c, jnp.int32),
                                 jnp.asarray(salt), _opts=opts_key())
        ax = accum.x if ax is None else ax + accum.x
        ay = accum.y if ay is None else ay + accum.y
        az = accum.z if az is None else az + accum.z
        counts.append(nr)
        done += spp_c
        i += 1
    return _fused_finish(ax, ay, az, jnp.stack(counts), cfg, ty, tx, spp,
                         _opts=opts_key())


@partial(jax.jit, static_argnames=("cfg", "_opts"))
def _fused_accum(scene, cam: Camera, px, py, valid, cfg: RenderConfig,
                 spp, salt, _opts=None):
    """Raw fused-kernel accumulators (sum of clamp01(L)) for an
    arbitrary lane set; spp/salt are RUNTIME scalars so every adaptive
    chunk reuses one compiled kernel per lane-count bucket."""
    if scene.n_tris > 0 or scene.n_quads > 0:
        from dsrt_tpu.ops.pallas_path import trace_fused
        return trace_fused(scene, cfg, cam, px, py, valid, spp=spp,
                           salt=salt)
    from dsrt_tpu.ops.pallas_sphere import trace_fused_spheres
    return trace_fused_spheres(scene, cfg, cam, px, py, valid, spp=spp,
                               salt=salt)


def render_frame_adaptive(scene, cam: Camera, cfg: RenderConfig,
                          tol: float = 0.02, chunk_spp: int | None = None,
                          with_count: bool = False):
    """Variance-guided adaptive sampling over the fused megakernels
    (ROADMAP QoL; beyond-reference — the reference renders a fixed
    1000 spp everywhere, main.cpp:256).

    Samples are rendered in chunks that alternate between two buckets
    A/B with decorrelated LCG streams (runtime salt); a pixel is
    converged when its two half-means agree — the classic split-buffer
    error estimate, |mean_A - mean_B| <= tol * (luminance + 0.02) —
    and converged pixels drop out of later chunks (the lane grid is
    rebuilt from the surviving pixel set each round, padded to a
    power-of-two packet count so compiles stay bounded).  cfg.spp is
    the per-pixel CAP; background/flat regions typically stop after
    the first two chunks, concentrating samples on high-variance
    pixels (mesh edges, shadow boundaries).

    Returns (H, W, 3) u8 (and with `with_count` a stats dict with the
    exact ray count and total samples).
    """
    kind = fused_kind(scene, cfg)
    if kind is None:
        raise ValueError("adaptive sampling needs a fused-supported "
                         "scene (render_frame_wavefront covers the rest)")
    max_spp = cfg.resolved_spp()
    if chunk_spp is None:
        chunk_spp = max(4, max_spp // 8)

    H, W = cfg.height, cfg.width
    npix = H * W
    ys, xs = np.mgrid[0:H, 0:W]
    pxf = xs.reshape(-1).astype(np.int32)
    pyf = ys.reshape(-1).astype(np.int32)

    sums = np.zeros((2, npix, 3), np.float64)   # bucket A/B accumulators
    ns = np.zeros((2, npix), np.int64)
    active = np.ones(npix, bool)
    total_rays = 0
    salt_mix = 0x9E3779B9

    rounds = 0
    spp_done = 0    # active pixels all carry the same total
    while active.any() and spp_done < max_spp:
        idx = np.nonzero(active)[0]
        n_act = len(idx)
        k = max(1, int(2 ** math.ceil(math.log2(
            max(1, (n_act + PACKET - 1) // PACKET)))))
        pad = k * PACKET - n_act
        pxl = jnp.asarray(np.pad(pxf[idx], (0, pad)).reshape(k, PACKET))
        pyl = jnp.asarray(np.pad(pyf[idx], (0, pad)).reshape(k, PACKET))
        val = jnp.asarray((np.arange(k * PACKET) < n_act
                           ).reshape(k, PACKET))
        bucket = rounds % 2
        spp_c = min(chunk_spp, max_spp - spp_done)
        # i32-wrapped stream salt (0 on round 0: x ^ 0 == x)
        salt = np.uint32((rounds * salt_mix) & 0xFFFFFFFF
                         ).astype(np.int32) if rounds else np.int32(0)
        accum, nr = _fused_accum(scene, cam, pxl, pyl, val, cfg,
                                 jnp.asarray(spp_c, jnp.int32),
                                 jnp.asarray(salt), _opts=opts_key())
        total_rays += int(np.asarray(jax.device_get(nr), np.int64).sum())
        av = np.stack([np.asarray(jax.device_get(c)).reshape(-1)[:n_act]
                       for c in (accum.x, accum.y, accum.z)], axis=-1)
        sums[bucket, idx] += av
        ns[bucket, idx] += spp_c
        spp_done += spp_c
        rounds += 1
        if rounds < 2:
            continue                     # need both buckets to compare
        # split-buffer convergence test on the active set
        a, b = sums[0, idx], sums[1, idx]
        na = np.maximum(ns[0, idx], 1)[:, None]
        nb = np.maximum(ns[1, idx], 1)[:, None]
        ma, mb = a / na, b / nb
        err = np.abs(ma - mb).max(axis=-1)
        lum = 0.5 * (ma + mb) @ np.array([0.2126, 0.7152, 0.0722])
        done = err <= tol * (lum + 0.02)
        active[idx[done]] = False

    n_tot = np.maximum(ns.sum(0), 1)[:, None]
    c = sums.sum(0) / n_tot
    # the reference tonemap chain (src/gpu_render.cu:1002-1030)
    c = np.maximum(c, 0.0)
    c = np.minimum(c, cfg.firefly_clamp)
    c = np.power(c, 1.0 / cfg.gamma)
    c = np.clip(c, 0.0, 1.0)
    img = (255.99 * c).astype(np.uint8).reshape(H, W, 3)[::-1]
    if with_count:
        return img, dict(rays=total_rays, samples=int(ns.sum()),
                         mean_spp=float(ns.sum() / npix), rounds=rounds)
    return img


def render_frame_queue(scene, cam: Camera, cfg: RenderConfig,
                       pool_packets: int = 0) -> np.ndarray:
    """Global-work-queue wavefront (ops/wavefront.trace_queue).
    Load-balanced across all (pixel, sample) units; occupancy ~100%.
    `pool_packets` = lanes/1024 in flight (0 = auto: one frame's packets).

    Frames whose (pixel, sample) id space would overflow int32 (e.g.
    4k @ 1000 spp) are AUTO-BANDED: split into horizontal bands rendered
    through the same queue, each with a band-local id space (per-pixel
    LCG seeds use true frame coordinates, so output is identical)."""
    px, _, _, (ty, tx) = lane_layout(cfg.width, cfg.height)
    k = pool_packets or px.shape[0]
    spp = cfg.resolved_spp()
    pool = k * PACKET
    band_h = cfg.height
    while cfg.width * band_h * spp + pool >= 2 ** 31 - 1:
        band_h = (band_h + 1) // 2
    if band_h == cfg.height:
        img = _render_queue(scene, cam, cfg, k, 0, cfg.height,
                            _opts=opts_key())
        return np.asarray(jax.device_get(img))
    bands = []
    y0 = 0
    while y0 < cfg.height:
        bh = min(band_h, cfg.height - y0)
        bands.append(np.asarray(jax.device_get(
            _render_queue(scene, cam, cfg, k, y0, bh,
                          _opts=opts_key()))))
        y0 += bh
    # bands are already vertically flipped internally; frame row 0 = top =
    # highest y -> concatenate in reverse band order
    return np.concatenate(bands[::-1], axis=0)


@partial(jax.jit, static_argnames=("cfg", "k", "y0", "band_h", "_opts"))
def _render_queue(scene, cam: Camera, cfg: RenderConfig, k: int, y0: int,
                  band_h: int, _opts=None):
    from dsrt_tpu.ops.wavefront import trace_queue
    accum, _ = trace_queue(scene, cfg, cam, cfg.width, band_h,
                           (k, PACKET), y0=y0)
    inv_spp = jnp.float32(1.0 / cfg.resolved_spp())
    inv_gamma = jnp.float32(1.0 / cfg.gamma)
    c = accum * inv_spp
    c = jnp.maximum(c, 0.0)
    c = jnp.minimum(c, cfg.firefly_clamp)
    c = jnp.power(c, inv_gamma)
    c = jnp.clip(c, 0.0, 1.0)
    img = (255.99 * c).astype(jnp.uint8).reshape(band_h, cfg.width, 3)
    return img[::-1]  # vertical flip (cu:1027)


@partial(jax.jit, static_argnames=("cfg", "ty", "tx", "batch", "count",
                                   "_opts"))
def _render_wavefront(scene, cam: Camera, pxb, pyb, validb, slot,
                      cfg: RenderConfig, ty: int, tx: int, batch: int,
                      count: bool = False, _opts=None):
    from dsrt_tpu.ops.wavefront import trace_accumulate
    spp = cfg.resolved_spp()
    k = pxb.shape[0] // batch
    accum, nrays = trace_accumulate(scene, cfg, cam, pxb, pyb, validb, slot,
                                    spp // batch, count_rays=count)

    def fold(c):
        return c.reshape(batch, k, PACKET).sum(axis=0)

    inv_spp = jnp.float32(1.0 / spp)
    inv_gamma = jnp.float32(1.0 / cfg.gamma)

    def tonemap(c):
        c = fold(c) * inv_spp
        c = jnp.maximum(c, 0.0)
        c = jnp.minimum(c, cfg.firefly_clamp)
        c = jnp.power(c, inv_gamma)
        c = jnp.clip(c, 0.0, 1.0)
        return (255.99 * c).astype(jnp.uint8)

    chans = [tonemap(accum.x), tonemap(accum.y), tonemap(accum.z)]
    padded = jnp.stack([lanes_to_image(c, ty, tx) for c in chans], axis=-1)
    return padded[:cfg.height, :cfg.width][::-1], nrays


@partial(jax.jit, static_argnames=("cfg", "ty", "tx", "batch", "_opts"))
def _render_lanes_batched(scene, cam: Camera, px, py, valid,
                          cfg: RenderConfig, ty: int, tx: int, batch: int,
                          _opts=None):
    """Throughput mode: lanes (B*K, P); slot b traces sample strata
    s = i*B + b, so the bounce-loop tail is amortized over B samples."""
    spp = cfg.resolved_spp()
    iters = spp // batch

    k = px.shape[0]
    pxb = jnp.tile(px, (batch, 1))
    pyb = jnp.tile(py, (batch, 1))
    validb = jnp.tile(valid, (batch, 1))
    slot = jnp.repeat(jnp.arange(batch, dtype=jnp.uint32), k)[:, None]

    seed = rngmod.seed_pixels(pxb, pyb, cam.width, scene.seed)
    state = seed ^ (slot * jnp.uint32(SLOT_SEED_MIX))
    zero = jnp.zeros(pxb.shape, jnp.float32)

    def sample_body(i, carry):
        accum, state = carry
        jxu, state = rngmod.draw(state, validb)
        jyu, state = rngmod.draw(state, validb)
        s_global = (i * batch).astype(jnp.float32) + slot.astype(jnp.float32)
        jx = (s_global + jxu) / jnp.float32(spp)
        jy = (s_global + jyu) / jnp.float32(spp)
        ro, rd, state = camera_rays(cam, pxb, pyb, jx, jy, state, validb,
                                    cfg.aperture > 0)
        L, state = trace_paths(scene, cfg, ro, rd, state, validb)
        return (accum + L, state)

    accum, _ = jax.lax.fori_loop(
        0, iters, sample_body, (V3(zero, zero, zero), state))

    # fold the slot axis
    def fold(c):
        return c.reshape(batch, k, PACKET).sum(axis=0)

    inv_spp = jnp.float32(1.0 / spp)
    inv_gamma = jnp.float32(1.0 / cfg.gamma)

    def tonemap(c):
        c = fold(c) * inv_spp
        c = jnp.maximum(c, 0.0)
        c = jnp.minimum(c, cfg.firefly_clamp)
        c = jnp.power(c, inv_gamma)
        c = jnp.clip(c, 0.0, 1.0)
        return (255.99 * c).astype(jnp.uint8)

    chans = [tonemap(accum.x), tonemap(accum.y), tonemap(accum.z)]
    padded = jnp.stack([lanes_to_image(c, ty, tx) for c in chans], axis=-1)
    return padded[:cfg.height, :cfg.width][::-1]


def render_radiance(scene, cam: Camera, cfg: RenderConfig) -> np.ndarray:
    """Float radiance image (pre-tonemap average of clamped samples), used
    by tests and metrics: (H, W, 3) float32."""
    px, py, valid, (ty, tx) = lane_layout(cfg.width, cfg.height)
    img = _render_lanes_radiance(scene, cam, jnp.asarray(px), jnp.asarray(py),
                                 jnp.asarray(valid), cfg, ty, tx,
                                 _opts=opts_key())
    return np.asarray(jax.device_get(img))


@partial(jax.jit, static_argnames=("cfg", "ty", "tx", "_opts"))
def _render_lanes_radiance(scene, cam, px, py, valid, cfg: RenderConfig,
                           ty: int, tx: int, _opts=None):
    spp = cfg.resolved_spp()
    state = rngmod.seed_pixels(px, py, cam.width, scene.seed)
    zero = jnp.zeros(px.shape, jnp.float32)

    def sample_body(s, carry):
        accum, state = carry
        jxu, state = rngmod.draw(state, valid)
        jyu, state = rngmod.draw(state, valid)
        sf = s.astype(jnp.float32)
        jx = (sf + jxu) / jnp.float32(spp)
        jy = (sf + jyu) / jnp.float32(spp)
        ro, rd, state = camera_rays(cam, px, py, jx, jy, state, valid,
                                    cfg.aperture > 0)
        if cfg.time1 > cfg.time0:
            # camera shutter: ONE draw after jitter/aperture, driving
            # moving-sphere centers (inc/sphere.h:143-146 semantics)
            ut, state = rngmod.draw(state, valid)
            time = cfg.time0 + ut * (cfg.time1 - cfg.time0)
        else:
            time = None
        L, state = trace_paths(scene, cfg, ro, rd, state, valid, time=time)
        return (accum + L, state)

    accum, _ = jax.lax.fori_loop(
        0, spp, sample_body, (V3(zero, zero, zero), state))
    inv_spp = jnp.float32(1.0 / spp)
    chans = [accum.x * inv_spp, accum.y * inv_spp, accum.z * inv_spp]
    padded = jnp.stack([lanes_to_image(c, ty, tx) for c in chans], axis=-1)
    return padded[:cfg.height, :cfg.width][::-1]


def render_frame_debug(scene, cam: Camera, cfg: RenderConfig) -> np.ndarray:
    """Flat-shade debug render (ray_color_debug, src/gpu_render.cu:663-710,
    unreferenced by the reference kernel — productized here as the visual
    smoke test SURVEY.md §4 recommends): one scene intersection per sample;
    lights render white, surfaces render albedo x texture (clamped), misses
    render the sky (solid color or the gradient 0.5(y+1) lerp).  Jittered
    like the path tracer for anti-aliasing; same tonemap chain."""
    px, py, valid, (ty, tx) = lane_layout(cfg.width, cfg.height)
    img = _render_debug(scene, cam, jnp.asarray(px), jnp.asarray(py),
                        jnp.asarray(valid), cfg, ty, tx,
                        _opts=opts_key())
    return np.asarray(jax.device_get(img))


@partial(jax.jit, static_argnames=("cfg", "ty", "tx", "_opts"))
def _render_debug(scene, cam: Camera, px, py, valid, cfg: RenderConfig,
                  ty: int, tx: int, _opts=None):
    from dsrt_tpu.models.materials import DIFFUSE_LIGHT
    from dsrt_tpu.ops import textures as texmod
    from dsrt_tpu.ops.linalg import normalize, where as vwhere
    from dsrt_tpu.ops.shade import _vmapped_scene_hit

    spp = cfg.resolved_spp()
    state = rngmod.seed_pixels(px, py, cam.width, scene.seed)
    zero = jnp.zeros(px.shape, jnp.float32)

    def sample_body(s, carry):
        accum, state = carry
        jxu, state = rngmod.draw(state, valid)
        jyu, state = rngmod.draw(state, valid)
        sf = s.astype(jnp.float32)
        jx = (sf + jxu) / jnp.float32(spp)
        jy = (sf + jyu) / jnp.float32(spp)
        ro, rd, state = camera_rays(cam, px, py, jx, jy, state, valid,
                                    cfg.aperture > 0)
        hit, state = _vmapped_scene_hit(scene, ro, rd, float(cfg.hit_eps),
                                        1e30, valid, state)
        # sky for misses (SkyType semantics, gpu_render.cu:691-706)
        if cfg.sky_type == "gradient":
            ud = normalize(rd)
            t = 0.5 * (ud.y + 1.0)
            sky = V3(cfg.sky_bottom[0] * (1.0 - t) + cfg.sky_top[0] * t,
                     cfg.sky_bottom[1] * (1.0 - t) + cfg.sky_top[1] * t,
                     cfg.sky_bottom[2] * (1.0 - t) + cfg.sky_top[2] * t)
        else:
            sky = V3(jnp.full_like(zero, cfg.sky_solid[0]),
                     jnp.full_like(zero, cfg.sky_solid[1]),
                     jnp.full_like(zero, cfg.sky_solid[2]))
        mp = scene.mat_pack[hit.mat]
        base = V3(mp[..., 1], mp[..., 2], mp[..., 3])
        if scene.has_image_tex:
            tex_rgb = texmod.sample_image(scene, hit.tex, hit.tu, hit.tv)
            base = vwhere(hit.tex >= 0, base * tex_rgb, base)
        is_light = mp[..., 0].astype(jnp.int32) == DIFFUSE_LIGHT
        one = jnp.ones_like(zero)
        base = vwhere(is_light, V3(one, one, one), base)
        from dsrt_tpu.ops.linalg import clamp01
        col = vwhere(hit.hit, clamp01(base), sky)
        return (accum + col, state)

    accum, _ = jax.lax.fori_loop(0, spp, sample_body,
                                 (V3(zero, zero, zero), state))
    inv_spp = jnp.float32(1.0 / spp)
    inv_gamma = jnp.float32(1.0 / cfg.gamma)

    def tonemap(c):
        c = c * inv_spp
        c = jnp.maximum(c, 0.0)
        c = jnp.minimum(c, cfg.firefly_clamp)
        c = jnp.power(c, inv_gamma)
        c = jnp.clip(c, 0.0, 1.0)
        return (255.99 * c).astype(jnp.uint8)

    chans = [tonemap(accum.x), tonemap(accum.y), tonemap(accum.z)]
    padded = jnp.stack([lanes_to_image(c, ty, tx) for c in chans], axis=-1)
    return padded[:cfg.height, :cfg.width][::-1]


def render_frame_async(scene, cam: Camera, cfg: RenderConfig,
                       mode: str = "fused", spp_batch: int = 8):
    """Dispatch one frame WITHOUT materializing it: returns
    (device_img, device_counts_or_None).  JAX dispatch is asynchronous, so
    the caller can overlap host work (PNG encode of the previous frame,
    pose transforms) with the device render — the frame-pipeline overlap
    SURVEY.md §2.6 lists as the PP analogue (the reference's frame loop is
    fully serial, src/main.cpp:310-431).  Materialize with
    np.asarray(jax.device_get(img))."""
    px, py, valid, (ty, tx) = lane_layout(cfg.width, cfg.height)
    if mode == "fused":
        img, nrays = _render_fused_auto(scene, cam, jnp.asarray(px),
                                        jnp.asarray(py), jnp.asarray(valid),
                                        cfg, ty, tx)
        return img, nrays
    # wavefront
    spp = cfg.resolved_spp()
    batch = spp_batch
    while spp % batch != 0:
        batch //= 2
    batch = max(batch, 1)
    k = px.shape[0]
    pxb = jnp.tile(jnp.asarray(px), (batch, 1))
    pyb = jnp.tile(jnp.asarray(py), (batch, 1))
    validb = jnp.tile(jnp.asarray(valid), (batch, 1))
    slot = jnp.repeat(jnp.arange(batch, dtype=jnp.uint32), k)[:, None]
    slot = jnp.broadcast_to(slot, pxb.shape)
    img, nrays = _render_wavefront(scene, cam, pxb, pyb, validb, slot, cfg,
                                   ty, tx, batch, True, _opts=opts_key())
    return img, nrays
