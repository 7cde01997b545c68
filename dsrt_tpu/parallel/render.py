"""Multi-chip sharded rendering via shard_map over a ('sp','dp') mesh.

Replaces the reference's (nonexistent) communication backend with the
TPU-native design from SURVEY.md §2.6/§5:

- scene and camera pytrees are REPLICATED (one transfer per scene, not per
  frame — the reference re-uploads everything every frame);
- the packet axis is sharded over 'dp' (pixel tiles are independent);
- spp is sharded over 'sp'; each sp-slice traces its spp/sp samples with
  globally-stratified jitter indices, then radiance accumulators are
  reduced with `jax.lax.psum` over 'sp' (an ICI all-reduce);
- tonemap runs replicated post-psum; output stays 'dp'-sharded until the
  host gathers the frame.

RNG: with sp=1 the per-pixel LCG streams are untouched, so a dp-sharded
render is bit-identical to single-chip (pixel streams are independent by
construction: seed = (x + y W) ^ seed, src/gpu_render.cu:990).  With sp>1 a
sequential stream cannot be split, so each sp-slice perturbs the seed with
a golden-ratio mix — statistically equivalent, documented as the
`rng_mode` the reference reserved but never implemented
(inc/gpu_scene.h:103).
"""

from __future__ import annotations

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map as _shard_map  # jax >= 0.8

    def shard_map(f, **kw):  # new API renamed check_rep -> check_vma
        kw["check_vma"] = kw.pop("check_rep")
        return _shard_map(f, **kw)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from dsrt_tpu.config import RenderConfig
from dsrt_tpu.exec_opts import opts_key
from dsrt_tpu.ops import rng as rngmod
from dsrt_tpu.ops.camera import Camera, camera_rays
from dsrt_tpu.ops.linalg import V3
from dsrt_tpu.ops.shade import trace_paths
from dsrt_tpu.render import PACKET, lane_layout, lanes_to_image

SP_SEED_MIX = 0x9E3779B9  # golden-ratio constant for sp-slice decorrelation


def _pad_packets(a: np.ndarray, k_pad: int):
    if a.shape[0] == k_pad:
        return a
    pad = np.zeros((k_pad - a.shape[0],) + a.shape[1:], a.dtype)
    return np.concatenate([a, pad], axis=0)


@partial(jax.jit, static_argnames=("cfg", "ty", "tx", "mesh", "spp_local",
                                   "_opts"))
def _render_sharded(scene, cam: Camera, px, py, valid, cfg: RenderConfig,
                    ty: int, tx: int, mesh: Mesh, spp_local: int,
                    _opts=None):
    # px/py/valid may carry dead padding packets beyond ty*tx (dp rounding);
    # they are sliced off before image assembly.
    spp_total = cfg.resolved_spp()

    def shard_body(px, py, valid):
        sp_idx = jax.lax.axis_index("sp")
        seed = rngmod.seed_pixels(px, py, cam.width, scene.seed)
        # decorrelate sample slices (no-op when sp == 1)
        state = jnp.where(sp_idx == 0, seed,
                          seed ^ (sp_idx.astype(jnp.uint32)
                                  * jnp.uint32(SP_SEED_MIX)))
        zero = jnp.zeros(px.shape, jnp.float32)

        def sample_body(s, carry):
            accum, state = carry
            s_global = sp_idx * spp_local + s  # global stratum index
            jxu, state = rngmod.draw(state, valid)
            jyu, state = rngmod.draw(state, valid)
            sf = s_global.astype(jnp.float32)
            jx = (sf + jxu) / jnp.float32(spp_total)
            jy = (sf + jyu) / jnp.float32(spp_total)
            ro, rd, state = camera_rays(cam, px, py, jx, jy, state, valid,
                                        cfg.aperture > 0)
            L, state = trace_paths(scene, cfg, ro, rd, state, valid)
            return (accum + L, state)

        accum, _ = jax.lax.fori_loop(0, spp_local, sample_body,
                                     (V3(zero, zero, zero), state))
        # ICI all-reduce over the sample axis
        ax = jax.lax.psum(accum.x, "sp")
        ay = jax.lax.psum(accum.y, "sp")
        az = jax.lax.psum(accum.z, "sp")

        inv_spp = jnp.float32(1.0 / spp_total)
        inv_gamma = jnp.float32(1.0 / cfg.gamma)

        def tonemap(c):
            c = c * inv_spp
            c = jnp.maximum(c, 0.0)
            c = jnp.minimum(c, cfg.firefly_clamp)
            c = jnp.power(c, inv_gamma)
            c = jnp.clip(c, 0.0, 1.0)
            return (255.99 * c).astype(jnp.uint8)

        return jnp.stack([tonemap(ax), tonemap(ay), tonemap(az)], axis=-1)

    out = shard_map(
        shard_body, mesh=mesh,
        in_specs=(P("dp", None), P("dp", None), P("dp", None)),
        out_specs=P("dp", None, None),
        check_rep=False,
    )(px, py, valid)

    out = out[:ty * tx]  # drop dp-rounding padding packets
    img = jnp.stack([lanes_to_image(out[..., c], ty, tx) for c in range(3)],
                    axis=-1)
    return img[:cfg.height, :cfg.width][::-1]


def render_frame_sp_emulated(scene, cam: Camera, cfg: RenderConfig,
                             sp: int) -> np.ndarray:
    """Single-chip render that runs the EXACT sp-slice schedule of
    `_render_sharded` (seed ^ i*SP_SEED_MIX per slice, spp/sp strata
    each, accumulators summed in slice order) — the deterministic
    ground truth for sp>1 sharded renders.  At sp=2 the psum is one fp
    add, so the sharded image must equal this BIT-FOR-BIT (VERDICT r4
    weak #5; used by tests/test_parallel.py and the multichip dryrun)."""
    spp_total = cfg.resolved_spp()
    if spp_total % sp != 0:
        raise ValueError(f"sp={sp} must divide spp={spp_total}")
    spp_local = spp_total // sp
    px, py, valid, (ty, tx) = lane_layout(cfg.width, cfg.height)
    pxj, pyj, vj = (jnp.asarray(px), jnp.asarray(py), jnp.asarray(valid))

    def slice_accum(i):
        seed = rngmod.seed_pixels(pxj, pyj, cam.width, scene.seed)
        state = seed if i == 0 else seed ^ jnp.uint32(i * SP_SEED_MIX)
        zero = jnp.zeros(pxj.shape, jnp.float32)
        accum = V3(zero, zero, zero)
        for s in range(spp_local):
            s_global = i * spp_local + s
            jxu, state = rngmod.draw(state, vj)
            jyu, state = rngmod.draw(state, vj)
            sf = jnp.float32(s_global)
            jx = (sf + jxu) / jnp.float32(spp_total)
            jy = (sf + jyu) / jnp.float32(spp_total)
            ro, rd, state = camera_rays(cam, pxj, pyj, jx, jy, state, vj,
                                        cfg.aperture > 0)
            L, state = trace_paths(scene, cfg, ro, rd, state, vj)
            accum = V3(accum.x + L.x, accum.y + L.y, accum.z + L.z)
        return accum

    parts = [slice_accum(i) for i in range(sp)]
    ax, ay, az = parts[0].x, parts[0].y, parts[0].z
    for p in parts[1:]:
        ax, ay, az = ax + p.x, ay + p.y, az + p.z

    inv_spp = jnp.float32(1.0 / spp_total)
    inv_gamma = jnp.float32(1.0 / cfg.gamma)

    def tonemap(c):
        c = c * inv_spp
        c = jnp.maximum(c, 0.0)
        c = jnp.minimum(c, cfg.firefly_clamp)
        c = jnp.power(c, inv_gamma)
        c = jnp.clip(c, 0.0, 1.0)
        return (255.99 * c).astype(jnp.uint8)

    out = jnp.stack([tonemap(ax), tonemap(ay), tonemap(az)], axis=-1)
    img = jnp.stack([lanes_to_image(out[..., c], ty, tx)
                     for c in range(3)], axis=-1)
    return np.asarray(jax.device_get(img[:cfg.height, :cfg.width][::-1]))


@partial(jax.jit, static_argnames=("cfg", "ty", "tx", "mesh", "_opts"))
def _render_fused_sharded(scene, cam: Camera, px, py, valid,
                          cfg: RenderConfig, ty: int, tx: int, mesh: Mesh,
                          _opts=None):
    def shard_body(px, py, valid):
        if scene.n_tris > 0:
            from dsrt_tpu.ops.pallas_path import trace_fused
            accum, nrays = trace_fused(scene, cfg, cam, px, py, valid)
        else:
            from dsrt_tpu.ops.pallas_sphere import trace_fused_spheres
            accum, nrays = trace_fused_spheres(scene, cfg, cam, px, py,
                                               valid)
        inv_spp = jnp.float32(1.0 / cfg.resolved_spp())
        inv_gamma = jnp.float32(1.0 / cfg.gamma)

        def tonemap(c):
            c = c * inv_spp
            c = jnp.maximum(c, 0.0)
            c = jnp.minimum(c, cfg.firefly_clamp)
            c = jnp.power(c, inv_gamma)
            c = jnp.clip(c, 0.0, 1.0)
            return (255.99 * c).astype(jnp.uint8)

        out = jnp.stack([tonemap(accum.x), tonemap(accum.y),
                         tonemap(accum.z)], axis=-1)
        return out, nrays

    out, nrays = shard_map(
        shard_body, mesh=mesh,
        in_specs=(P("dp", None), P("dp", None), P("dp", None)),
        out_specs=(P("dp", None, None), P("dp")),
        check_rep=False,
    )(px, py, valid)
    out = out[:ty * tx]
    img = jnp.stack([lanes_to_image(out[..., c], ty, tx) for c in range(3)],
                    axis=-1)
    return img[:cfg.height, :cfg.width][::-1], nrays


def render_frame_fused_sharded(scene, cam: Camera, cfg: RenderConfig,
                               mesh: Mesh, with_count: bool = False):
    """dp-sharded FUSED megakernel: every device runs the persistent
    Pallas path-tracing kernel (ops/pallas_path.py) over its own pixel-
    packet shard.  Per-pixel LCG streams are independent by construction,
    so the result is bit-identical to the single-chip fused render.

    The fused kernel owns the whole sample loop, so the mesh must be
    dp-only (sp == 1); use render_frame_sharded for sp sharding (XLA
    path).  Callers gate on `pallas_path.fused_supported(scene, cfg)`.
    """
    if mesh.shape.get("sp", 1) != 1:
        raise ValueError("fused sharding is dp-only; build the mesh with "
                         f"sp=1 (got sp={mesh.shape['sp']})")
    dp = mesh.shape["dp"]
    px, py, valid, (ty, tx) = lane_layout(cfg.width, cfg.height)
    k = px.shape[0]
    k_pad = math.ceil(k / dp) * dp
    if k_pad != k:
        extra = k_pad - k
        px = _pad_packets(px, k_pad)
        py = _pad_packets(py, k_pad)
        valid = np.concatenate(
            [valid, np.zeros((extra, PACKET), bool)], axis=0)

    dp_sharding = NamedSharding(mesh, P("dp", None))
    pxj = jax.device_put(jnp.asarray(px), dp_sharding)
    pyj = jax.device_put(jnp.asarray(py), dp_sharding)
    vj = jax.device_put(jnp.asarray(valid), dp_sharding)
    img, nrays = _render_fused_sharded(scene, cam, pxj, pyj, vj, cfg, ty,
                                       tx, mesh, _opts=opts_key())
    img = np.asarray(jax.device_get(img))
    if with_count:
        # exact in-kernel counts, bucketed per shard; int64 host sum
        return img, int(np.asarray(jax.device_get(nrays),
                                   np.int64).sum())
    return img


def render_frame_sharded(scene, cam: Camera, cfg: RenderConfig,
                         mesh: Mesh) -> np.ndarray:
    """Render one frame across the mesh; returns (H, W, 3) uint8."""
    sp = mesh.shape["sp"]
    dp = mesh.shape["dp"]
    spp = cfg.resolved_spp()
    if spp % sp != 0:
        raise ValueError(f"spp={spp} must be divisible by sp={sp}")

    px, py, valid, (ty, tx) = lane_layout(cfg.width, cfg.height)
    k = px.shape[0]
    k_pad = math.ceil(k / dp) * dp
    if k_pad != k:
        # pad with dead packets; padded rows fall outside the crop
        extra = k_pad - k
        px = _pad_packets(px, k_pad)
        py = _pad_packets(py, k_pad)
        valid = np.concatenate(
            [valid, np.zeros((extra, PACKET), bool)], axis=0)

    dp_sharding = NamedSharding(mesh, P("dp", None))
    pxj = jax.device_put(jnp.asarray(px), dp_sharding)
    pyj = jax.device_put(jnp.asarray(py), dp_sharding)
    vj = jax.device_put(jnp.asarray(valid), dp_sharding)

    img = _render_sharded(scene, cam, pxj, pyj, vj, cfg, ty, tx, mesh,
                          spp // sp, _opts=opts_key())
    return np.asarray(jax.device_get(img))
