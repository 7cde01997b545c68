"""Fused persistent path-tracing megakernel (Pallas TPU).

One `pallas_call` renders the whole frame: each grid step owns a block of
pixels (block_h x 128 lanes, pixel-pinned) and runs the ENTIRE sample loop
for that block on-core — camera raygen, LCG RNG, BVH traversal, sun-shadow
any-hit, material shading, Russian roulette, per-lane sample regeneration
and radiance banking.  This removes the two costs that dominate the split
wavefront design (ops/wavefront.py + ops/pallas_trace.py):

- the per-wave XLA glue (RNG/raygen/shading between kernel launches,
  ~10 ms/wave at full width, measured on v5e), and
- the per-wave kernel launch + full-width occupancy tax: a wave with 5%
  live lanes still paid every block; here each block only runs waves for
  its OWN outstanding work (a background block finishes in ~spp waves of
  one root-miss each).

Functionally this is the reference megakernel (src/gpu_render.cu:973-1031,
one CUDA thread = one pixel running all spp x bounces) re-shaped for the
VPU: 1024-lane pixel blocks in lockstep with masked-lane control flow, a
shared 8-ary wide-BVH stack traversal (8 child boxes tested per serial
visit, see _closest_hit), and the
exact per-pixel LCG draw schedule (seed (x + y W) ^ seed, cu:990; draws
only on the lanes the scalar control flow would draw on), so each pixel's
sample stream is bit-identical to the parity renderer and the scalar
oracle.

Scope (see `fused_supported`): triangle scenes with the directional sun
and lambertian/metal/dielectric/diffuse-light materials — the flagship
ISS pipeline.  Sphere scenes (with media, procedural textures, and
sphere area lights) have their own sibling megakernel
(ops/pallas_sphere.py); mixed tri+sphere/quad scenes fall back to the
split wavefront path.
"""

from __future__ import annotations

from functools import partial

import math

import jax
import jax.numpy as jnp
import jax.lax as lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dsrt_tpu.exec_opts import OPTS as _OPTS
from dsrt_tpu.models.materials import (PTEX_CHECKER, PTEX_MARBLE,
                                       PTEX_NOISE)
from dsrt_tpu.ops.linalg import V3
from dsrt_tpu.ops.pallas_trace import (_load_many, fits_vmem_fused,
                                       fits_vmem_fused_packed,
                                       fits_vmem_fused_hbm,
                                       backend_is_tpu, TILE_H, TILE_W)
from dsrt_tpu.models.materials import (DIELECTRIC, DIFFUSE_LIGHT, LAMBERTIAN,
                                       METAL)

PI_F = 3.14159265358979323846
# LCG constants as Python ints (Pallas kernels cannot capture traced
# constants; weak-typed scalars fold into the jaxpr as literals)
LCG_A = 1664525
LCG_C = 1013904223
MANT = 0x00FFFFFF
INV_2_24 = 1.0 / 16777216.0


TEX_CHUNK_ROWS = 2048   # one-hot gather width per chunk ((.,128) texel
#                         rows/channel, ~512x512 RGB — the r3-era
#                         whole-pool cap, now the chunk granularity)
TEX_ROWS_MAX = 32768  # texture plane rows ((.,128) texels/channel) the
#                       fused path accepts: pools wider than one chunk
#                       gather per TEX_CHUNK_ROWS chunk under scalar
#                       any-lane-needs-it branches (_pool_fetch_rows_ref)
#                       so per-wave compute scales with the chunks a
#                       wave's UVs actually touch, not the pool size.
#                       32768 rows = 50 MB of VMEM planes (4x 1024^2
#                       RGB); the fits_vmem_fused_* checks gate the
#                       real budget via `extra` rows.


def _tex_plane_rows(scene) -> int:
    """Rows of 128 texels per channel in the de-interleaved pool."""
    if not (scene.has_image_tex or scene.env_tex >= 0):
        return 0
    return max((int(scene.tex_pool.shape[0]) // 3 + TILE_W - 1) // TILE_W,
               1)


def _tex_plane_rows_eff(scene) -> int:
    """Plane rows of the pool the kernels will actually hold resident:
    the 32x32-tiled relayout under exec_opts.tex_tiled (images padded
    to tile multiples, so slightly more rows), else the raw pool."""
    if not (scene.has_image_tex or scene.env_tex >= 0):
        return 0
    if _OPTS.tex_tiled:
        return max((int(scene.tex_pool_tiled.shape[0]) // 3 + TILE_W - 1)
                   // TILE_W, 1)
    return _tex_plane_rows(scene)


def fused_supported(scene, cfg) -> bool:
    """Whether the fused megakernel covers this scene/config.  Image-
    textured and smooth-shaded (vn) triangle meshes are in scope — the
    real NASA ISS OBJ carries per-triangle map_Kd textures
    (/root/reference/inc/triangle_mesh.h:244-251) and the reference
    samples them inside its one kernel (tex2D,
    /root/reference/src/gpu_render.cu:232-259, UV interp :763-774) —
    provided the texture pool fits the in-kernel gather budget."""
    if _OPTS.pallas == "off":
        return False
    if ((scene.has_image_tex or scene.env_tex >= 0)
            and _tex_plane_rows_eff(scene) > TEX_ROWS_MAX):
        return False
    shaded = scene.has_image_tex or scene.has_smooth
    # flat-textured scenes on the in-record-UV engine keep no aux
    # table resident (UVs ride the MT record's spare lanes)
    aux_res = (shaded and not (_OPTS.uvrec and scene.has_image_tex
                               and not scene.has_smooth
                               and not _OPTS.defer_aux))
    extra = ((scene.tri_tile.shape[0] if aux_res else 0)
             + 3 * _tex_plane_rows_eff(scene))
    fits = fits_vmem_fused_packed(scene, extra)
    if not fits and _hbm_eligible(scene):
        # HBM-streamed leaf mode: only the wide BVH (+ the texture
        # planes, which the in-kernel gather needs resident) stays in
        # VMEM; tri tile + aux tables ride leaf-window DMAs
        fits = fits_vmem_fused_hbm(scene, 3 * _tex_plane_rows_eff(scene))
    return ((scene.n_tris > 0 or scene.n_quads > 0)
            and scene.n_spheres <= MIX_MAX_SPH
            and scene.n_quads <= MIX_MAX_QUADS
            and scene.n_lights <= MIX_MAX_LIGHTS
            and scene.n_media <= MIX_MAX_MED
            and fits and backend_is_tpu())


def _hbm_gw(scene) -> int:
    """Leaf window size in (8,128) tile groups: covers any wide node's
    contiguous leaf span plus tile/group misalignment and the engine's
    trailing duplicate tile."""
    span = max(int(getattr(scene, "wide_max_span", 64)), 1)
    tiles = (span + 7) // 8 + 2
    return (tiles + 7) // 8 + 1


def _hbm_eligible(scene) -> bool:
    """Whether the HBM-streamed leaf mode can serve this scene at all
    (knob not off; a real tile table at least one window big).  Shaded
    scenes ride an aux window per slot through the same DMA scheme;
    the texture pool itself stays VMEM-resident (<= TEX_ROWS_MAX)."""
    if _OPTS.hbm_tris == "off":
        return False
    return (scene.n_tris > 0
            and scene.tri_tile.shape[0] >= 8 * _hbm_gw(scene))


def _hbm_mode(scene, extra_rows: int) -> bool:
    """Resolve exec_opts.hbm_tris for this scene: "auto" engages only
    when the VMEM-resident mode no longer fits."""
    if not _hbm_eligible(scene):
        return False
    if _OPTS.hbm_tris == "on":
        return True
    return not fits_vmem_fused_packed(scene, extra_rows)


# ---------------------------------------------------------------------------
# in-kernel helpers (masked-lane contract identical to ops/rng.py /
# ops/shade.py so the per-pixel draw schedule is reproduced exactly)
# ---------------------------------------------------------------------------

def _draw(state, mask):
    ns = state * LCG_A + LCG_C
    ns = jnp.where(mask, ns, state)
    # Mosaic has no u32->f32 cast; the 24-bit mantissa fits i32 exactly
    u = (ns & MANT).astype(jnp.int32).astype(jnp.float32) * INV_2_24
    return u, ns


# ---------------------------------------------------------------------
# in-kernel procedural textures (scalar-triplet forms of ops/textures.py
# — the gather-free hash-gradient Perlin; shared by both megakernels)

def _hash3(i, j, k):
    h = (i.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
         ^ j.astype(jnp.uint32) * jnp.uint32(0x85EBCA77)
         ^ k.astype(jnp.uint32) * jnp.uint32(0xC2B2AE3D))
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0x27D4EB2F)
    h = h ^ (h >> 16)
    return h


def _grad_dot(h, x, y, z):
    hh = (h & jnp.uint32(15)).astype(jnp.int32)
    u = jnp.where(hh < 8, x, y)
    v = jnp.where(hh < 4, y, jnp.where((hh == 12) | (hh == 14), x, z))
    return (jnp.where((hh & 1) == 0, u, -u)
            + jnp.where((hh & 2) == 0, v, -v))


def _perlin_noise(px, py, pz):
    u = px - jnp.floor(px)
    v = py - jnp.floor(py)
    w = pz - jnp.floor(pz)
    i = jnp.floor(px).astype(jnp.int32)
    j = jnp.floor(py).astype(jnp.int32)
    k = jnp.floor(pz).astype(jnp.int32)
    uu = u * u * (3.0 - 2.0 * u)
    vv = v * v * (3.0 - 2.0 * v)
    ww = w * w * (3.0 - 2.0 * w)
    accum = jnp.zeros_like(u)
    for di in (0, 1):
        for dj in (0, 1):
            for dk in (0, 1):
                h = _hash3(i + di, j + dj, k + dk)
                dotv = _grad_dot(h, u - di, v - dj, w - dk)
                wt = ((uu if di else 1.0 - uu) * (vv if dj else 1.0 - vv)
                      * (ww if dk else 1.0 - ww))
                accum = accum + wt * dotv
    return accum * 0.5


def _perlin_turb(px, py, pz, depth: int = 7):
    accum = jnp.zeros_like(px)
    weight = 1.0
    qx, qy, qz = px, py, pz
    for _ in range(depth):
        accum = accum + weight * _perlin_noise(qx, qy, qz)
        weight *= 0.5
        qx, qy, qz = qx * 2.0, qy * 2.0, qz * 2.0
    return jnp.abs(accum)


def _pool_fetch_rows(poolT, pidx, n_rows: int):
    """Per-lane texel fetch from the de-interleaved pool planes
    (poolT[j, ch*Rp + c] = channel ch of texel c*TILE_W + j) via
    one-hot matmul — exact at precision=HIGHEST
    (benchmarks/proto_gather.py).  pidx: (n_rows, TILE_W) clipped texel
    indices.  -> (r, g, b) planes.  Shared by both megakernels (tri
    texture/env gather; sphere env gather)."""
    Rp = poolT.shape[1] // 3
    c_all = pidx // TILE_W
    j_all = pidx % TILE_W
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_W), 1)
    crange = jax.lax.broadcasted_iota(jnp.int32, (1, Rp), 1)
    # bf16 pools (Scene.tex_bf16 source quantization) run the permute
    # matmul at the MXU's native bf16 rate; one-hot x bf16 -> f32 is
    # still EXACT (one nonzero 1.0 term, bf16 values round-trip f32)
    bf16 = poolT.dtype == jnp.bfloat16
    prec = None if bf16 else jax.lax.Precision.HIGHEST
    trs, tgs, tbs = [], [], []
    for s in range(n_rows):
        jT = jnp.transpose(j_all[s:s + 1, :])
        cT = jnp.transpose(c_all[s:s + 1, :])
        onehot = (jT == lane).astype(poolT.dtype)
        tmp = jax.lax.dot_general(
            onehot, poolT, (((1,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32)
        selm = cT == crange
        vr = jnp.sum(jnp.where(selm, tmp[:, :Rp], 0.0),
                     axis=1, keepdims=True)
        vg = jnp.sum(jnp.where(selm, tmp[:, Rp:2 * Rp], 0.0),
                     axis=1, keepdims=True)
        vb = jnp.sum(jnp.where(selm, tmp[:, 2 * Rp:], 0.0),
                     axis=1, keepdims=True)
        trs.append(jnp.transpose(vr))
        tgs.append(jnp.transpose(vg))
        tbs.append(jnp.transpose(vb))
    return (jnp.concatenate(trs, axis=0),
            jnp.concatenate(tgs, axis=0),
            jnp.concatenate(tbs, axis=0))


def _pool_fetch_rows_ref(texT_ref, pidx, n_rows: int,
                         chunk: int = TEX_CHUNK_ROWS):
    """Per-lane texel fetch from the VMEM-resident plane-table REF.

    Pools up to one `chunk` run the single whole-pool one-hot gather
    (_pool_fetch_rows).  Wider pools (big map_Kd textures / equirect
    HDRs — the reference samples pools of any size from global
    memory, /root/reference/src/gpu_render.cu:232-259 over the
    unbounded concat of /root/reference/src/gpu_scene_builder.cpp:513-555)
    gather per `chunk` rows, each chunk under a scalar
    any-lane-in-chunk branch: per-wave table-load + matmul work
    scales with the chunks the wave's texel indices actually TOUCH
    (UV/direction coherence keeps that small), never with the pool
    size — the whole-pool form was measured to cost +10.9 us/wave at
    Rp=2048 (exec_opts.tex_chunk docstring).  Exact: each lane's
    texel is selected (not summed) from the one chunk that contains
    it.  chunk <= 0 forces the whole-pool gather (A/B)."""
    Rp = texT_ref.shape[1] // 3
    if chunk <= 0 or Rp <= chunk:
        return _pool_fetch_rows(texT_ref[...], pidx, n_rows)
    c_all = pidx // TILE_W
    j_all = pidx % TILE_W
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_W), 1)
    n_chunks = (Rp + chunk - 1) // chunk
    # per-row one-hot lane selectors + transposed chunk-row ids,
    # hoisted out of the chunk loop
    bf16 = texT_ref.dtype == jnp.bfloat16
    prec = None if bf16 else jax.lax.Precision.HIGHEST
    oneh = []
    cTs = []
    for s in range(n_rows):
        oneh.append((jnp.transpose(j_all[s:s + 1, :]) == lane)
                    .astype(texT_ref.dtype))
        cTs.append(jnp.transpose(c_all[s:s + 1, :]))
    acc = tuple(jnp.zeros((TILE_W, 1), jnp.float32)
                for _ in range(3 * n_rows))
    for kc in range(n_chunks):
        c0 = kc * chunk
        CK = min(Rp, c0 + chunk) - c0
        inch = (c_all >= c0) & (c_all < c0 + CK)

        def chunk_hit(a, c0=c0, CK=CK):
            sub = jnp.concatenate(
                [texT_ref[:, ch * Rp + c0:ch * Rp + c0 + CK]
                 for ch in range(3)], axis=1)
            crange = c0 + jax.lax.broadcasted_iota(
                jnp.int32, (1, CK), 1)
            out = list(a)
            for s in range(n_rows):
                tmp = jax.lax.dot_general(
                    oneh[s], sub, (((1,), (0,)), ((), ())),
                    precision=prec, preferred_element_type=jnp.float32)
                selm = cTs[s] == crange
                # in-chunk mask in transposed space (Mosaic cannot
                # transpose i1 vectors; cTs is already (TILE_W, 1))
                inT = (cTs[s] >= c0) & (cTs[s] < c0 + CK)
                for ch in range(3):
                    v = jnp.sum(
                        jnp.where(selm, tmp[:, ch * CK:(ch + 1) * CK],
                                  0.0), axis=1, keepdims=True)
                    # select (not add): exact for every bit pattern
                    out[3 * s + ch] = jnp.where(inT, v, out[3 * s + ch])
            return tuple(out)

        acc = lax.cond(jnp.any(inch), chunk_hit, lambda a: a, acc)
    return tuple(
        jnp.concatenate([jnp.transpose(acc[3 * s + ch])
                         for s in range(n_rows)], axis=0)
        for ch in range(3))


def _rand_in_unit_disk(state, mask, max_tries: int = 64):
    """Rejection-sample the unit disk (2 draws/attempt): the in-kernel
    mirror of ops/camera.random_in_unit_disk (same masked draw
    schedule), used by the thin-lens raygen when aperture > 0."""
    def attempt(state, need):
        x, state = _draw(state, need)
        y, state = _draw(state, need)
        return x * 2.0 - 1.0, y * 2.0 - 1.0, state

    x0, y0, state = attempt(state, mask)

    # masks carried as f32 — i1 vectors in scf loop carries trip a Mosaic
    # layout bug (same workaround as _rand_in_unit_sphere)
    def cond(c):
        i, _, _, _, need_f = c
        return jnp.logical_and(i < max_tries, jnp.any(need_f > 0.5))

    def body(c):
        i, x, y, state, need_f = c
        need = need_f > 0.5
        cx, cy, state = attempt(state, need)
        accept = cx * cx + cy * cy < 1.0
        x = jnp.where(need, cx, x)
        y = jnp.where(need, cy, y)
        need_f = jnp.where(need & ~accept, 1.0, 0.0)
        return i + 1, x, y, state, need_f

    need0 = jnp.where(
        jnp.logical_and(mask, (x0 * x0 + y0 * y0) >= 1.0), 1.0, 0.0)
    _, x, y, state, _ = lax.while_loop(
        cond, body, (jnp.int32(0), x0, y0, state, need0))
    return x, y, state


def _rand_in_unit_sphere(state, mask, max_tries: int = 64):
    """Rejection sampler, 3 draws/attempt (src/gpu_render.cu:82-91);
    per-lane retry under mask, same draw count as the scalar loop."""

    def attempt(state, need):
        x, state = _draw(state, need)
        y, state = _draw(state, need)
        z, state = _draw(state, need)
        return (x * 2.0 - 1.0, y * 2.0 - 1.0, z * 2.0 - 1.0), state

    p0, state = attempt(state, mask)

    # masks carried as f32 — i1 vectors in scf loop carries trip a Mosaic
    # layout bug (same workaround as the shadow pass in pallas_trace.py)
    def cond(c):
        i, _, _, _, _, need_f = c
        return jnp.logical_and(i < max_tries, jnp.any(need_f > 0.5))

    def body(c):
        i, px, py, pz, state, need_f = c
        need = need_f > 0.5
        (cx, cy, cz), state = attempt(state, need)
        accept = (cx * cx + cy * cy + cz * cz) < 1.0
        px = jnp.where(need, cx, px)
        py = jnp.where(need, cy, py)
        pz = jnp.where(need, cz, pz)
        need_f = jnp.where(need & ~accept, 1.0, 0.0)
        return i + 1, px, py, pz, state, need_f

    need0 = jnp.where(
        jnp.logical_and(
            mask, (p0[0] * p0[0] + p0[1] * p0[1] + p0[2] * p0[2]) >= 1.0),
        1.0, 0.0)
    _, px, py, pz, state, _ = lax.while_loop(
        cond, body, (jnp.int32(0), p0[0], p0[1], p0[2], state, need0))
    return (px, py, pz), state


def _normalize3(x, y, z):
    """Reference f3_norm: zero vector for L2 <= 0 (gpu_render.cu:40-46)."""
    l2 = x * x + y * y + z * z
    inv = jnp.where(l2 > 0.0, 1.0 / jnp.sqrt(jnp.maximum(l2, 1e-38)), 0.0)
    return x * inv, y * inv, z * inv


def _cosine_hemisphere(nx, ny, nz, state, mask):
    """sample_cosine_hemisphere of ops/shade.py in scalar-triplet form:
    2 draws, ONB about n, returns (dir, pdf, state)."""
    r1, state = _draw(state, mask)
    r2, state = _draw(state, mask)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - r2))
    phi = 2.0 * jnp.float32(PI_F) * r1
    sq = jnp.sqrt(jnp.maximum(r2, 0.0))
    lx = jnp.cos(phi) * sq
    ly = jnp.sin(phi) * sq
    # build_onb (src/gpu_render.cu:112-118)
    wx, wy, wz = _normalize3(nx, ny, nz)
    big = jnp.abs(wx) > 0.9
    ax = jnp.where(big, 0.0, 1.0)
    ay = jnp.where(big, 1.0, 0.0)
    # v = normalize(cross(w, a)); a = (ax, ay, 0)
    cvx = wy * 0.0 - wz * ay
    cvy = wz * ax - wx * 0.0
    cvz = wx * ay - wy * ax
    vx, vy, vz = _normalize3(cvx, cvy, cvz)
    # u = cross(v, w)
    ux = vy * wz - vz * wy
    uy = vz * wx - vx * wz
    uz = vx * wy - vy * wx
    dx = ux * lx + vx * ly + wx * z
    dy = uy * lx + vy * ly + wy * z
    dz = uz * lx + vz * ly + wz * z
    dx, dy, dz = _normalize3(dx, dy, dz)
    cos_t = jnp.maximum(0.0, dx * nx + dy * ny + dz * nz)
    pdf = jnp.where(cos_t > 0.0, cos_t / jnp.float32(PI_F), 0.0)
    return (dx, dy, dz), pdf, state


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

# mixed-scene bounds: spheres/quads run as unrolled per-wave loops after
# the BVH result (scene_hit order, src/gpu_render.cu:509-551), area
# lights as an unrolled select in the mixture sampler
MIX_MAX_SPH = 12
MIX_MAX_MED = 4       # unrolled constant-medium loop bound (per wave:
#                       1 draw + ~60 vector ops per medium)
MIX_MAX_QUADS = 24       # a Cornell box with two boxes is 18 quads
MIX_MAX_LIGHTS = 8

STACK = 256          # wide-traversal stack bound: depth*(arity-1) << 256
ROW_SSEG = 64        # per-row stack segment (rowtrav mode): depth*7 < 63
RQCAP = 127          # streamed-walk range queue capacity (pairs; +dump)
LEAF_CHAINS = 8      # independent leaf-test accumulator chains (ILP)
STATS_ROWS = 1024    # telemetry buckets (block pid accumulates mod this)


def _path_kernel(wide_ref, tri_ref, tile_ref, aux_ref, texT_ref, mat_ref,
                 matT_ref, cam_ref, sun_ref, spp_ref, hdr_ref,
                 sph_ref, quad_ref, lit_ref, med_ref,
                 px_ref, py_ref, valid_ref,
                 acc_r_ref, acc_g_ref, acc_b_ref, nray_ref, stack_ref,
                 rq_ref, tilewin_ref, dmasem_ref, auxwin_ref,
                 dmasem2_ref,
                 *, n_mats: int,
                 max_depth: int, width: int, height: int, seed: int,
                 rr_start: int, rr_max_p: float, t_min: float, t_max: float,
                 sun_on: bool, packed: bool, ordered: bool,
                 pops: int = 3, regen_thresh: float = 1.0,
                 defer_shadow: bool = True, rowtrav: bool = False,
                 row_pops: int = 2, stream: bool = True,
                 stream_tiles: int = 4, smooth: bool = False,
                 textured: bool = False, n_texs: int = 0,
                 dup: str = "", sun_pops: int = 2,
                 chain_fuse: bool = False, n_sph: int = 0,
                 n_quads: int = 0, n_lights: int = 0, n_med: int = 0,
                 leaf_parts: int = 1, hbm: bool = False, gw: int = 2,
                 leaf_tail: str = "pad", env_id: int = -1,
                 env_rot: float = 0.0, env_scale: float = 1.0,
                 defer_aux: bool = False, has_ptex: bool = False,
                 aperture_on: bool = False, motion_on: bool = False,
                 time0: float = 0.0, time1: float = 0.0,
                 uvrec: bool = True, uvcarry: bool = False,
                 dual_union: bool = False,
                 tex_chunk: int = TEX_CHUNK_ROWS, tiled: bool = False,
                 fronts: int = 1, unroll: int = 1):
    POPS = pops
    # perf-triage duplication set (exec_opts.ExecOptions.dup): named
    # segments run twice, folded via an identity, to measure their cost
    dup_set = frozenset(s for s in dup.split(",") if s)
    # aux shading table (interpolated vn normals / UVs / texture ids)
    # rides the leaf engine only when the scene needs it
    shaded = smooth or textured
    # Deferred-attribute mode (VMEM-resident shaded scenes): the leaf
    # engine records only (tri-row id, bary u, bary v) per accept — the
    # same select count as the unshaded engine, no per-tile UV/normal
    # interpolation, no aux tile loads — and the winning triangle's
    # full aux record is gathered once per wave at walk end.  Measured
    # NET-NEGATIVE 2.4x on v5e at 47.7k tris (sweep50k15: 165 -> 398 ms
    # at tex16): the 3-field texture-pool gather is ~free per wave
    # ('texg' attribution), but this one is a (128,128)x(128,16*Ta)
    # matmul + 128 masked (1,Ta) sums per wave (Ta = tri_rows/128 =
    # 374 at ISS scale) — ~25x the pool gather's width.  Bit-identical
    # (tested: test_fused_shaded A/B).  Kept as an opt-in knob; the
    # in-engine (8,1)x(1,128) interpolation is the efficient design.
    defer_attrs = shaded and not hbm and defer_aux
    # In-record UV engine (flat textured scenes): per-vertex UVs ride
    # the MT record's spare lanes 13-15 as bf16 pairs (models/scene.py
    # tri_pack) and the texture id resolves from the winning material
    # row at walk end (mat_pack col 14) — the leaf engine then loads NO
    # aux tiles and carries one fewer candidate plane.  Smooth scenes
    # keep the aux-tile engine (3 vn vectors don't fit the record).
    texrec = textured and not smooth and not defer_attrs and uvrec
    # Carried-UV variant of the in-record engine: accepts select the
    # RAW packed uv lanes (as int32 bit patterns — f32 views of bf16
    # pairs can be denormal, and TPU float arithmetic flushes denormals)
    # plus the barycentric (u, v) into the candidate state, and the
    # interpolation runs ONCE per wave at walk end on the tournament
    # winners.  Replaces 12 interpolation vector ops per accepted
    # tile-row with 3 integer selects; bit-identical (same formula over
    # the same bits, evaluated on the winning accept's exact inputs).
    carry = texrec and uvcarry
    # deferred-shadow mode only matters when the sun is on; the chain
    # walk has no shading-field tracking (trace_fused forces it off)
    assert not (shaded and defer_shadow and sun_on)
    fuse = defer_shadow and sun_on
    pxf = px_ref[...].astype(jnp.float32)
    pyf = py_ref[...].astype(jnp.float32)
    valid = valid_ref[...] > 0
    shape = pxf.shape

    tmin_f = jnp.float32(t_min)
    tmax_f = jnp.float32(t_max)
    inv_w1 = jnp.float32(1.0 / (width - 1))
    inv_h1 = jnp.float32(1.0 / (height - 1))
    # spp is a runtime scalar (SMEM) so one compiled kernel serves every
    # sample count; the jitter uses DIVISION like the parity renderer
    # (a reciprocal multiply differs in ulp for non-power-of-two spp)
    spp = spp_ref[0]
    spp_f = spp.astype(jnp.float32)

    cam_ox = cam_ref[0]
    cam_oy = cam_ref[1]
    cam_oz = cam_ref[2]
    ll = (cam_ref[3], cam_ref[4], cam_ref[5])
    hz = (cam_ref[6], cam_ref[7], cam_ref[8])
    vt = (cam_ref[9], cam_ref[10], cam_ref[11])
    sdx, sdy, sdz = sun_ref[0], sun_ref[1], sun_ref[2]
    sun_r, sun_g, sun_b = sun_ref[3], sun_ref[4], sun_ref[5]
    sh_bias = sun_ref[6]

    # per-pixel LCG seed (src/gpu_render.cu:990); spp_ref[1] is a runtime
    # stream salt (0 in parity mode — x ^ 0 == x — nonzero for adaptive
    # sampling's decorrelated chunks, the SP_SEED_MIX pattern)
    state0 = (px_ref[...].astype(jnp.uint32)
              + py_ref[...].astype(jnp.uint32) * jnp.uint32(width)
              ) ^ jnp.uint32(seed & 0xFFFFFFFF) \
        ^ spp_ref[1].astype(jnp.uint32)

    f0 = jnp.zeros(shape, jnp.float32)
    f1 = jnp.ones(shape, jnp.float32)
    i0 = jnp.zeros(shape, jnp.int32)

    # last valid triangle record (over-read clamp for masked leaf slots)
    max_tri_row = (tri_ref.shape[0] * 8 - 1) if packed else (
        tri_ref.shape[0] - 1)

    # --- 8-ary wide-BVH stack traversal --------------------------------
    # The traversal loop is LATENCY-bound, not throughput-bound (measured
    # on v5e: a bare chained scalar load costs ~160 ns/visit and the
    # verdict reduce ~130 ns, while the binary slab test's vector work is
    # ~80 ns) — so each serial step must retire as many box tests as
    # possible.  A visit pops one wide node (models/bvh_build.collapse_
    # wide), loads its 8 child records as ONE (8,16) sublane block, slab-
    # tests all 8 children against every ray row via (8,1)x(1,128)
    # broadcasts, and reduces to a single pow2-packed verdict scalar:
    # 8 child tests per pop+load+reduce chain instead of 1.  Entered leaf
    # children are scanned as one contiguous [min ptr, max end) Moller-
    # Trumbore loop (triangles are re-grouped per wide node by the
    # builder; gap leaves are provably miss-only).  Entered interior
    # children have consecutive wide indices (base + rank), so pushes are
    # pure scalar bit arithmetic on the verdict mask — no pointer loads.
    # Pops are in ascending-slot order (descending pushes), preserving
    # the binary preorder's left-to-right leaf sequence.
    pow2_col = jnp.int32(1) << jax.lax.broadcasted_iota(
        jnp.int32, (8, 1), 0)
    n_rows = shape[0]

    # --- HBM-streamed leaf windows (exec_opts.hbm_tris) ----------------
    # When the triangle tile table lives in HBM, each entered leaf range
    # is DMA'd into a per-pop VMEM window slot of `gw` (8,128) tile
    # groups before scanning.  A wide node's leaf children cover ONE
    # contiguous tri block (bvh_build.collapse_wide regroups), and gw is
    # sized from Scene.wide_max_span, so one window always covers the
    # whole range; the trailing-duplicate / clamped tiles the engine
    # re-tests are real in-window records (idempotent accepts).

    def _tile_fetch(t_, win=None):
        """(8,16) tile `t_` from the VMEM table, or from window slot
        `win = (slot, gs)` (gs = first group resident in the slot)."""
        if win is None:
            grp = tile_ref[pl.ds(8 * (t_ // 8), 8), :]
            return pltpu.roll(grp, -16 * (t_ % 8), 1)[:, :16]
        slot, gs = win
        lt = jnp.clip(t_ - 8 * gs, 0, 8 * gw - 1)
        grp = tilewin_ref[pl.ds(slot * 8 * gw + 8 * (lt // 8), 8), :]
        return pltpu.roll(grp, -16 * (lt % 8), 1)[:, :16]

    def _leaf_windows(rlist, with_aux=False):
        """Start one async copy per (r0, r1, ...) leaf range into its
        per-pop window slot (64 tris/group -> slot group gs = r0//64,
        clamped so the window stays inside the table); `with_aux` also
        copies the matching tri_aux_tile window (shaded scenes).  All
        copies are issued before any wait, so they overlap each other
        and the surrounding scalar work.  Returns [(gs, [copies])]
        aligned with rlist; empty ranges start nothing (their waits
        are skipped under the same predicate)."""
        gtot = tile_ref.shape[0] // 8
        out = []
        for p, rng_ in enumerate(rlist):
            r0, r1 = rng_[0], rng_[1]
            gs = jnp.clip(r0 // 64, 0, gtot - gw)
            cps = [pltpu.make_async_copy(
                tile_ref.at[pl.ds(8 * gs, 8 * gw)],
                tilewin_ref.at[pl.ds(p * 8 * gw, 8 * gw)],
                dmasem_ref.at[p])]
            if with_aux:
                cps.append(pltpu.make_async_copy(
                    aux_ref.at[pl.ds(8 * gs, 8 * gw)],
                    auxwin_ref.at[pl.ds(p * 8 * gw, 8 * gw)],
                    dmasem2_ref.at[p]))
            for cp in cps:
                @pl.when(r1 > r0)
                def _start(cp=cp):
                    cp.start()

            out.append((gs, cps))
        return out

    def _load_wide(node):
        """Load wide node `node`: (W (8,16), base, intmask).  Two static
        layouts, keyed off the table shape: dense sublane rows
        ((8*Nw,16): direct (8,16) block + scalar field loads) and
        lane-packed ((~Nw,128), 8 nodes per tile, bvh_build.
        lane_pack_wide): one (8,128) tile load, a dynamic lane roll to
        bring this node's 16-lane group to the front, a static slice,
        and base+intmask extracted from the ONE f32-exact combo field
        (child record 0, lane 8) with a degenerate reduce."""
        # the combo lane holds an int32 BIT PATTERN (bvh_build stores
        # base*256+intmask via .view(float32)); extract with a bitcast
        # and integer sum — loads/rolls/slices are bit-preserving, and
        # no float arithmetic may touch the lane (small-int patterns
        # are f32 denormals, which the VPU would flush to zero)
        if wide_ref.shape[1] == 128:     # lane-packed
            grp = wide_ref[pl.ds(8 * (node // 8), 8), :]
            W = pltpu.roll(grp, -16 * (node % 8), 1)[:, :16]
            combo = jnp.sum(jax.lax.bitcast_convert_type(
                W[0:1, 8:9], jnp.int32))
        else:                            # dense sublane rows
            W = wide_ref[pl.ds(8 * node, 8), :]
            combo = jnp.sum(jax.lax.bitcast_convert_type(
                W[0:1, 8:9], jnp.int32))
        if "load" in dup_set:            # perf triage: 2x the node load
            if wide_ref.shape[1] == 128:
                grp2 = wide_ref[pl.ds(8 * (node // 8), 8), :]
                W2 = pltpu.roll(grp2, -16 * (node % 8), 1)[:, :16]
            else:
                W2 = wide_ref[pl.ds(8 * node, 8), :]
            combo2 = jnp.sum(jax.lax.bitcast_convert_type(
                W2[0:1, 8:9], jnp.int32))
            W = jnp.maximum(W, W2)
            combo = jnp.maximum(combo, combo2)
        return W, combo >> 8, combo & 255

    def _visit_bits(node, ray_sets, split0=1):
        """Load wide node `node` and box-test its 8 children against every
        ray row of every set in `ray_sets` (a list of (ros, invs, clamp)
        triples — the combined walk passes the extension rays AND the
        pending sun-shadow rays; the verdict is the UNION, which enters a
        superset of each set's own walk so no hit/occluder is ever
        missed).  A set may carry a 4th element (an iterable of row
        indices) to box-test only THOSE rows (split-front walks: each
        front's verdict is the union over its own rows only).  Returns
        (W (8,16), hitbits, leafbits, base, intmask) — the verdict
        scalars pack child c at bit c."""
        W, base, intmask = _load_wide(node)
        minx, miny, minz = W[:, 0:1], W[:, 1:2], W[:, 2:3]
        maxx, maxy, maxz = W[:, 3:4], W[:, 4:5], W[:, 5:6]

        def box_rows(ros, invs, clamp, rows=None):
            acc = jnp.zeros((8, TILE_W), jnp.float32)
            for r in (range(n_rows) if rows is None else rows):
                ivx = invs[0][r:r + 1, :] if invs[0].ndim else invs[0]
                ivy = invs[1][r:r + 1, :] if invs[1].ndim else invs[1]
                ivz = invs[2][r:r + 1, :] if invs[2].ndim else invs[2]
                tx0 = (minx - ros[0][r:r + 1, :]) * ivx
                tx1 = (maxx - ros[0][r:r + 1, :]) * ivx
                ty0 = (miny - ros[1][r:r + 1, :]) * ivy
                ty1 = (maxy - ros[1][r:r + 1, :]) * ivy
                tz0 = (minz - ros[2][r:r + 1, :]) * ivz
                tz1 = (maxz - ros[2][r:r + 1, :]) * ivz
                lo = jnp.maximum(
                    jnp.maximum(jnp.minimum(tx0, tx1),
                                jnp.minimum(ty0, ty1)),
                    jnp.maximum(jnp.minimum(tz0, tz1), tmin_f))
                hi = jnp.minimum(
                    jnp.minimum(jnp.maximum(tx0, tx1),
                                jnp.maximum(ty0, ty1)),
                    jnp.minimum(jnp.maximum(tz0, tz1),
                                clamp[r:r + 1, :]))
                acc = acc + jnp.where(hi > lo, 1.0, 0.0)
            return acc

        def box_rows_split(ros, invs, clamp, parts):
            """Set-0 box rows split into `parts` row-group accumulators
            (groups of n_rows/parts consecutive rows) so the leaf
            engine can scan each group's entered leaves with only that
            group's MT row updates (exec_opts.leaf_split)."""
            halves = []
            pr = n_rows // parts
            for pi in range(parts):
                acc = jnp.zeros((8, TILE_W), jnp.float32)
                for r in range(pi * pr, (pi + 1) * pr):
                    ivx = invs[0][r:r + 1, :] if invs[0].ndim else invs[0]
                    ivy = invs[1][r:r + 1, :] if invs[1].ndim else invs[1]
                    ivz = invs[2][r:r + 1, :] if invs[2].ndim else invs[2]
                    tx0 = (minx - ros[0][r:r + 1, :]) * ivx
                    tx1 = (maxx - ros[0][r:r + 1, :]) * ivx
                    ty0 = (miny - ros[1][r:r + 1, :]) * ivy
                    ty1 = (maxy - ros[1][r:r + 1, :]) * ivy
                    tz0 = (minz - ros[2][r:r + 1, :]) * ivz
                    tz1 = (maxz - ros[2][r:r + 1, :]) * ivz
                    lo = jnp.maximum(
                        jnp.maximum(jnp.minimum(tx0, tx1),
                                    jnp.minimum(ty0, ty1)),
                        jnp.maximum(jnp.minimum(tz0, tz1), tmin_f))
                    hi = jnp.minimum(
                        jnp.minimum(jnp.maximum(tx0, tx1),
                                    jnp.maximum(ty0, ty1)),
                        jnp.minimum(jnp.maximum(tz0, tz1),
                                    clamp[r:r + 1, :]))
                    acc = acc + jnp.where(hi > lo, 1.0, 0.0)
                halves.append(acc)
            return halves

        leafc = W[:, 7:8] > 0.0
        hit_sets, leaf_sets = [], []
        leaf_half = None
        for si, s in enumerate(ray_sets):
            if split0 > 1 and si == 0:
                accs = box_rows_split(*s, split0)
                if "box" in dup_set:
                    accs = [jnp.maximum(a, b) for a, b in
                            zip(accs, box_rows_split(*s, split0))]
                nhs = [jnp.sum(a, axis=1, keepdims=True) > 0.0
                       for a in accs]
                lbs_g = [jnp.sum(jnp.where(nh & leafc, pow2_col, 0))
                         for nh in nhs]
                nodehit = nhs[0]
                for nh in nhs[1:]:
                    nodehit = nodehit | nh
                hb = jnp.sum(jnp.where(nodehit, pow2_col, 0))
                lb = lbs_g[0]
                for x in lbs_g[1:]:
                    lb = lb | x
                leaf_half = tuple(lbs_g)
                hit_sets.append(hb)
                leaf_sets.append(lb)
                continue
            acc = box_rows(*s)
            if "box" in dup_set:         # perf triage: 2x the box rows
                acc = jnp.maximum(acc, box_rows(*s))
            nodehit = jnp.sum(acc, axis=1, keepdims=True) > 0.0  # (8,1)
            hb = jnp.sum(jnp.where(nodehit, pow2_col, 0))
            lb = jnp.sum(jnp.where(nodehit & leafc, pow2_col, 0))
            if "visitred" in dup_set:    # perf triage: 2x the reduces
                nodehit2 = jnp.sum(acc, axis=1, keepdims=True) > 0.0
                hb = hb | jnp.sum(jnp.where(nodehit2, pow2_col, 0))
                lb = lb | jnp.sum(
                    jnp.where(nodehit2 & leafc, pow2_col, 0))
            hit_sets.append(hb)
            leaf_sets.append(lb)
        hitbits = hit_sets[0]
        leafbits = leaf_sets[0]
        for hb, lb in zip(hit_sets[1:], leaf_sets[1:]):
            hitbits = hitbits | hb
            leafbits = leafbits | lb
        return W, hitbits, leafbits, base, intmask, leaf_sets, leaf_half

    def _visit_row(node, oxr, oyr, ozr, ivxr, ivyr, ivzr, clamp_r):
        """Single-ROW visit (rowtrav mode): box-test the 8 children of
        `node` against one (1,128) ray row only.  Same verdict packing
        as _visit_bits."""
        W, base, intmask = _load_wide(node)
        minx, miny, minz = W[:, 0:1], W[:, 1:2], W[:, 2:3]
        maxx, maxy, maxz = W[:, 3:4], W[:, 4:5], W[:, 5:6]
        tx0 = (minx - oxr) * ivxr
        tx1 = (maxx - oxr) * ivxr
        ty0 = (miny - oyr) * ivyr
        ty1 = (maxy - oyr) * ivyr
        tz0 = (minz - ozr) * ivzr
        tz1 = (maxz - ozr) * ivzr
        lo = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.maximum(jnp.minimum(tz0, tz1), tmin_f))
        hi = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.minimum(jnp.maximum(tz0, tz1), clamp_r))
        nodehit = jnp.sum(jnp.where(hi > lo, 1.0, 0.0),
                          axis=1, keepdims=True) > 0.0      # (8,1)
        leafc = W[:, 7:8] > 0.0
        hitbits = jnp.sum(jnp.where(nodehit, pow2_col, 0))
        leafbits = jnp.sum(jnp.where(nodehit & leafc, pow2_col, 0))
        return W, hitbits, leafbits, base, intmask

    def _node_order(W, node, octant):
        """(prank, perm) packed scalars for the ordered push: prank is
        the 3-bit rank-among-interior-slots per slot; perm the octant's
        far-to-near 3-bit slot permutation (bvh_build.collapse_wide)."""
        if wide_ref.shape[1] == 128:     # lane-packed: reduce from W
            prank = jnp.sum(W[0:1, 9:10]).astype(jnp.int32)
            row_io = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
            perm = jnp.sum(jnp.where(row_io == octant, W[:, 10:11], 0.0)
                           ).astype(jnp.int32)
        else:
            prank = wide_ref[8 * node, 9].astype(jnp.int32)
            perm = wide_ref[8 * node + octant, 10].astype(jnp.int32)
        return prank, perm

    def _leaf_range(W, leafbits, with_ideal=True):
        """Union tri range [r0, r1) over entered leaf children, plus the
        entered children's OWN triangle count (the range minus the
        non-entered siblings caught inside it — telemetry for how much
        of the contiguous scan is provably-miss overscan; skipped when
        `with_ideal` is off — every reduce here rides the serial visit
        chain)."""
        lmask = (pow2_col & leafbits) > 0
        offc = W[:, 6:7]
        endc = offc + W[:, 7:8]
        r0f = jnp.min(jnp.where(lmask, offc, jnp.float32(3e38)))
        r1f = jnp.max(jnp.where(lmask, endc, jnp.float32(-1.0)))
        r0 = jnp.where(leafbits > 0, r0f, 0.0).astype(jnp.int32)
        r1 = jnp.where(leafbits > 0, r1f, 0.0).astype(jnp.int32)
        if not with_ideal:
            return r0, r1, jnp.int32(0)
        ideal = jnp.sum(jnp.where(lmask, W[:, 7:8], 0.0)).astype(jnp.int32)
        return r0, r1, ideal

    def _push_children(sp, hitbits, leafbits, base, intmask, soff=0,
                       dump=STACK - 1):
        """Push entered interior children.  The wide index of the
        interior child at slot c is base + popcount(intmask below c) —
        ranked over ALL interior slots (the build-time allocation), not
        just the entered ones.  Descending slot order so pops ascend.
        `soff` selects a per-row stack region (rowtrav mode); `dump` is
        the scratch slot masked pushes write to."""
        intbits = hitbits & ~leafbits & intmask
        npush = _popcount8(intbits)
        _push_children_at(sp, intbits, base, intmask, soff=soff,
                          dump=dump, k0=npush)
        return sp + npush

    def _popcount8(bits):
        k = bits & 1
        for c in range(1, 8):
            k = k + ((bits >> c) & 1)
        return k

    def _push_children_at(sp, intbits, base, intmask, soff=0,
                          dump=STACK - 1, k0=None):
        """The store half of _push_children at a precomputed stack base:
        callers that know every pop's push count up front (a scalar
        prefix sum — 1 add per pop) issue all pops' stores with
        INDEPENDENT address chains instead of threading sp serially
        through P x 8 conditional-store k-updates (sweep50k8 priced the
        pushes at ~8 ms/frame on the serial visit spine)."""
        k = _popcount8(intbits) if k0 is None else k0
        irank = _popcount8(intmask)
        for c in range(7, -1, -1):
            irank = irank - ((intmask >> c) & 1)
            bc = (intbits >> c) & 1
            k = k - bc
            idx = jnp.where(bc > 0, soff + sp + k, dump)
            stack_ref[idx] = base + irank

    def _push_children_ordered(sp, hitbits, leafbits, intmask, base,
                               prank, perm):
        """Ordered push: walk the octant's far-to-near slot permutation,
        pushing entered interior children so pops run NEAR-first —
        early closest shrink then prunes far siblings' subtrees."""
        intbits = hitbits & ~leafbits & intmask
        np_ = jnp.int32(0)
        for jj in range(8):
            c = (perm >> (3 * jj)) & 7
            bc = (intbits >> c) & 1
            pr = (prank >> (3 * c)) & 7
            idx = jnp.where(bc > 0, sp + np_, STACK - 1)
            stack_ref[idx] = base + pr
            np_ = np_ + bc
        return sp + np_

    def _multi_pop_visit(sp, ray_sets, octant=None, npops=None,
                         split0=1):
        """Pop up to `npops` (default POPS) nodes, box-test each
        (independent chains, the VLIW scheduler overlaps them), push all
        entered interior children (later pops' children pushed first so
        the preorder-earliest node's children pop next).  When the stack
        holds fewer entries, the clamped reads return stale slots
        (always valid node ids — every written slot held one) and their
        verdict bits are masked to zero.  With `octant`, pushes run
        far-to-near along that direction octant instead of slot order
        (ordered descent).  Returns (sp, [(r0, r1, idl)] over pops
        (UNION-entered leaf ranges), npop, [leafbits] over pops, and
        per-SET leaf ranges [[(r0, r1, idl)] over pops] — one list per
        ray set — so a multi-set caller can scan each set's own entered
        leaves only."""
        P = POPS if npops is None else npops
        nodes, valids = [], []
        for p in range(P):
            nodes.append(stack_ref[jnp.maximum(sp - 1 - p, 0)])
            valids.append(None if p == 0 else (sp >= p + 1))
        npop = jnp.int32(1)
        for p in range(1, P):
            npop = npop + valids[p].astype(jnp.int32)
        sp = sp - npop
        outs = []
        for p in range(P):
            W, hb, lb, base, im, lb_sets, lb_half = _visit_bits(
                nodes[p], ray_sets, split0=split0)
            if p > 0:
                hb = jnp.where(valids[p], hb, 0)
                lb = jnp.where(valids[p], lb, 0)
                lb_sets = [jnp.where(valids[p], x, 0) for x in lb_sets]
                if lb_half is not None:
                    lb_half = tuple(jnp.where(valids[p], x, 0)
                                    for x in lb_half)
            if octant is not None:
                prank, perm = _node_order(W, nodes[p], octant)
            else:
                prank = perm = None
            outs.append((W, hb, lb, base, im, prank, perm, lb_sets,
                         lb_half))
        if octant is not None:
            for p in range(P - 1, -1, -1):
                W, hb, lb, base, im, prank, perm = outs[p][:7]
                sp = _push_children_ordered(sp, hb, lb, im, base, prank,
                                            perm)
        else:
            # parallel push bases: each pop's push count is a scalar
            # popcount independent of the others, so the cross-pop
            # dependency collapses to a P-add prefix sum and all pops'
            # conditional stores issue on independent address chains
            # (identical addresses/values to the serial form)
            ibs = []
            for p in range(P - 1, -1, -1):
                _, hb, lb, base, im = outs[p][:5]
                ibs.append((hb & ~lb & im, base, im))
            np_list = [_popcount8(ib) for ib, _, _ in ibs]
            s = sp
            for (ib, base, im), np_ in zip(ibs, np_list):
                _push_children_at(s, ib, base, im, k0=np_)
                s = s + np_
            sp = s
        if "push" in dup_set:            # perf triage: 2x the pushes,
            sp2 = sp                     # into a scratch stack segment
            for p in range(P - 1, -1, -1):
                W, hb, lb, base, im, prank, perm = outs[p][:7]
                sp2 = _push_children(sp2, hb, lb, base, im, soff=STACK,
                                     dump=2 * STACK - 1)
        if split0 > 1:
            # every reduce below rides the serial visit chain: with the
            # row groups' own ranges in hand, neither the union ranges
            # nor set 0's ranges are needed (the leaf engine scans per
            # group)
            ranges = None
            ranges_sets = [None] + [
                [_leaf_range(o[0], o[7][s]) for o in outs]
                for s in range(1, len(ray_sets))]
            ranges_half = tuple(
                [_leaf_range(o[0], o[8][g], with_ideal=False)
                 for o in outs]
                for g in range(split0))
        else:
            ranges = [_leaf_range(o[0], o[2]) for o in outs]
            ranges_sets = [[_leaf_range(o[0], o[7][s]) for o in outs]
                           for s in range(len(ray_sets))]
            ranges_half = None
        return (sp, ranges, npop, [o[2] for o in outs], ranges_sets,
                ranges_half)

    def _front_pop_visit(sp, ray_sets, soff, npops=None):
        """_multi_pop_visit for ONE front of a split-front walk: pops
        come from the stack segment at `soff`, EVERY pop (including the
        first) is masked by the front's own depth (a front may be
        exhausted while the other keeps the loop alive), and pushes go
        back to the same segment (dump slot soff+STACK-1).  ray_sets
        entries carry the front's row subset (4-tuples, _visit_bits).
        Returns (sp, npop, leafbits-per-pop, per-set leaf ranges)."""
        P = POPS if npops is None else npops
        nodes, valids = [], []
        for p in range(P):
            nodes.append(stack_ref[soff + jnp.maximum(sp - 1 - p, 0)])
            valids.append(sp >= p + 1)
        npop = jnp.int32(0)
        for v in valids:
            npop = npop + v.astype(jnp.int32)
        sp = sp - npop
        outs = []
        for p in range(P):
            W, hb, lb, base, im, lb_sets, _lh = _visit_bits(
                nodes[p], ray_sets)
            hb = jnp.where(valids[p], hb, 0)
            lb = jnp.where(valids[p], lb, 0)
            lb_sets = [jnp.where(valids[p], x, 0) for x in lb_sets]
            outs.append((W, hb, lb, base, im, lb_sets))
        # parallel push bases (the _multi_pop_visit form), offset into
        # this front's segment
        ibs = []
        for p in range(P - 1, -1, -1):
            _, hb, lb, base, im, _ls = outs[p]
            ibs.append((hb & ~lb & im, base, im))
        np_list = [_popcount8(ib) for ib, _, _ in ibs]
        s = sp
        for (ib, base, im), np_ in zip(ibs, np_list):
            _push_children_at(s, ib, base, im, soff=soff,
                              dump=soff + STACK - 1, k0=np_)
            s = s + np_
        sp = s
        ranges_sets = [[_leaf_range(o[0], o[5][si]) for o in outs]
                       for si in range(len(ray_sets))]
        return sp, npop, [o[2] for o in outs], ranges_sets

    def _closest_hit(ox, oy, oz, dx, dy, dz, act,
                     sox=None, soy=None, soz=None, pot=None, tm=None):
        """Wide-stack closest hit.  Returns (hitmask f32, t, mat i32,
        n(3) face-flipped, front f32, [blocked f32,] node-visit count,
        tri-test count).  Inactive lanes carry closest == t_min so every
        box test and triangle acceptance fails for them (no explicit
        masking).

        With (sox, soy, soz, pot) the walk ALSO resolves the deferred
        sun-shadow any-hit for `pot` lanes in the SAME traversal: node
        verdicts are the union of the extension-ray and shadow-ray slab
        tests (a superset of each set's own walk, so no hit or occluder
        is ever missed — see _visit_bits), and every leaf triangle load
        feeds both the Moller-Trumbore closest-hit update and the
        (uniform-direction, scalar-p-vector) occlusion test.  Extension
        and shadow rays share origins (the shadow ray starts at the
        previous bounce's hit point), so the union front is far smaller
        than two passes — the ROADMAP's 'share the node front between
        the extension and sun-shadow passes'.  Once every pot lane is
        blocked the shadow clamp rows collapse to t_min and the walk
        degenerates to the extension-only walk automatically."""
        with_shadow = sox is not None
        inv_dx = 1.0 / dx
        inv_dy = 1.0 / dy
        inv_dz = 1.0 / dz
        ros = (ox, oy, oz)
        invs = (inv_dx, inv_dy, inv_dz)
        closest0 = jnp.where(act, tmax_f, tmin_f)
        if n_sph or n_quads:
            # primitives FIRST, seeding the walk clamp: rays that hit a
            # sphere/quad then prune every BVH subtree behind it (helps
            # enclosing-geometry scenes like Cornell walls; free
            # elsewhere).  NOTE the r3 "mixed scenes double the union
            # front" measurement that motivated this was a confound —
            # iss_mixed_scene was silently building a MEDIAN BVH while
            # the plain benchmark used SAH; with matching builders the
            # mixed walk costs the same as the plain one.  The final
            # hit is unchanged: a tri is accepted only at t <= clamp,
            # and the end-of-walk merge gives primitives the <=-tie win
            # exactly like the split path's later-pass ordering.
            prim0 = _sphere_quad_pass(
                ox, oy, oz, dx, dy, dz, act,
                f0, closest0, i0, f0, f0, f1, f0,
                aux=((f0, f0, f0 - 1.0) if shaded else None), tm=tm)
            if shaded:
                (hitm_p, bt_p, bm_p, pnx, pny, pnz, pfr, paux) = prim0
            else:
                hitm_p, bt_p, bm_p, pnx, pny, pnz, pfr = prim0
            closest0 = bt_p
        if with_shadow:
            sros = (sox, soy, soz)
            s_invs = (1.0 / sdx, 1.0 / sdy, 1.0 / sdz)   # scalars
            sc_pot = jnp.where(pot, tmax_f, tmin_f)

        if ordered and not with_shadow:
            # block-majority direction octant (any octant is CORRECT —
            # ordering only changes visit order); 3 reduces per wave
            actf = jnp.where(act, 1.0, 0.0)
            half = 0.5 * jnp.maximum(jnp.sum(actf), 1.0)
            bx = jnp.sum(jnp.where(act & (dx < 0.0), 1.0, 0.0)) > half
            by = jnp.sum(jnp.where(act & (dy < 0.0), 1.0, 0.0)) > half
            bz = jnp.sum(jnp.where(act & (dz < 0.0), 1.0, 0.0)) > half
            octant = (bx.astype(jnp.int32) + 2 * by.astype(jnp.int32)
                      + 4 * bz.astype(jnp.int32))
        else:
            octant = None

        stack_ref[0] = jnp.int32(0)
        any_work = jnp.any(act) if not with_shadow else (
            jnp.any(act) | jnp.any(pot))
        sp0 = jnp.where(any_work, jnp.int32(1), jnp.int32(0))

        if not with_shadow or not chain_fuse:
            # ---- vectorized tile leaf engine (the default path; also
            # the fused combined walk unless OPTS.chain_fuse) ----------
            # Leaf triangles stream as (8,16) TILES (one vector load +
            # lane roll from the tile-packed table, _tile_pack) whose
            # field c is the (8,1) column — the Moller-Trumbore test then
            # runs as (8,1)x(1,128) broadcasts per ray row: 8 triangles
            # against 128 rays per ~45 vector ops, no per-field scalar
            # loads (the old chain engine's 104 chained scalar loads per
            # 8 triangles were the leaf bottleneck at ISS scale).
            # Candidate state is per (ray row x tri row): each of the 8
            # tri-row slots prunes on its own closest (weaker pruning,
            # identical acceptance set — the multi-chain argument), and
            # one 3-round cyclic-roll tournament per WALK merges them.
            max_tile = tile_ref.shape[0] - 1

            def tile_update_row(W, r, st, Wa=None):
                """Test one (8,16) triangle tile against ray row r:
                fields are (8,1) columns, Moller-Trumbore runs as
                (8,1)x(1,128) broadcasts; candidate state is per
                (tri-row slot x lane).  Under `shaded`, `Wa` is the
                matching tri_aux tile ([n0 n1 n2 uv0 uv1 uv2 tex],
                models/scene.py) and accepts also record the
                barycentric-interpolated UV / vn normal / texture id
                (same formulas as the split path, ops/trace.py:158-192,
                so streams stay bit-identical)."""
                v0x, v0y, v0z = W[:, 0:1], W[:, 1:2], W[:, 2:3]
                e1x, e1y, e1z = W[:, 3:4], W[:, 4:5], W[:, 5:6]
                e2x, e2y, e2z = W[:, 6:7], W[:, 7:8], W[:, 8:9]
                mat_f = W[:, 9:10]
                fnx, fny, fnz = W[:, 10:11], W[:, 11:12], W[:, 12:13]
                if defer_attrs:
                    # (closest, mat, tri-row id, bary u, bary v): same
                    # select count as the UNSHADED engine — normals/UV/
                    # texture resolve from ONE aux gather at walk end
                    cl, mf, tid_, u_, v_ = st
                elif carry:
                    # in-record UVs, carried: bary (u, v) + the 3 raw
                    # packed lanes as int32 planes; interp at walk end
                    cl, mf, nx_, ny_, nz_, u_, v_, bA, bB, bC = st
                elif texrec:
                    # in-record UVs: no texture-id plane (resolved from
                    # the winning material row at walk end)
                    cl, mf, nx_, ny_, nz_, iu_, iv_ = st
                elif shaded:
                    cl, mf, nx_, ny_, nz_, iu_, iv_, tx_ = st
                else:
                    cl, mf, nx_, ny_, nz_ = st
                dxr = dx[r:r + 1, :]
                dyr = dy[r:r + 1, :]
                dzr = dz[r:r + 1, :]
                pvx = dyr * e2z - dzr * e2y
                pvy = dzr * e2x - dxr * e2z
                pvz = dxr * e2y - dyr * e2x
                det = e1x * pvx + e1y * pvy + e1z * pvz
                ok = jnp.abs(det) >= 1e-8
                inv_det = 1.0 / jnp.where(ok, det, 1.0)
                tvx = ox[r:r + 1, :] - v0x
                tvy = oy[r:r + 1, :] - v0y
                tvz = oz[r:r + 1, :] - v0z
                u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                # u<=1 is implied by v>=0 & u+v<=1 (and NaN u fails
                # u>=0 anyway): identical acceptance set, 2 fewer ops
                ok = ok & (u >= 0.0)
                qvx = tvy * e1z - tvz * e1y
                qvy = tvz * e1x - tvx * e1z
                qvz = tvx * e1y - tvy * e1x
                v = (dxr * qvx + dyr * qvy + dzr * qvz) * inv_det
                ok = ok & (v >= 0.0) & (u + v <= 1.0)
                t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                ok = ok & (t >= tmin_f) & (t <= cl)
                cl = jnp.where(ok, t, cl)
                mf = jnp.where(ok, mat_f, mf)
                if defer_attrs:
                    tid_ = jnp.where(ok, Wa, tid_)
                    u_ = jnp.where(ok, u, u_)
                    v_ = jnp.where(ok, v, v_)
                    return (cl, mf, tid_, u_, v_)
                if carry:
                    # carried form: 2 f32 + 3 int32 selects per row; Wa
                    # is the tile's 3 packed lanes as int32 (8,1) columns
                    u_ = jnp.where(ok, u, u_)
                    v_ = jnp.where(ok, v, v_)
                    bA = jnp.where(ok, Wa[0], bA)
                    bB = jnp.where(ok, Wa[1], bB)
                    bC = jnp.where(ok, Wa[2], bC)
                    nx_ = jnp.where(ok, fnx, nx_)
                    ny_ = jnp.where(ok, fny, ny_)
                    nz_ = jnp.where(ok, fnz, nz_)
                    return (cl, mf, nx_, ny_, nz_, u_, v_, bA, bB, bC)
                if texrec:
                    # UV interp from the record's unpacked bf16 pairs —
                    # the aux engine's exact expression over the same
                    # quantized values (ops/trace.py:158-192 order).
                    # `Wa` carries the 6 unpacked (8,1) columns (hoisted
                    # once per tile by the callers).
                    u0c, v0c, u1c, v1c, u2c, v2c = Wa
                    wb = 1.0 - u - v
                    tu = wb * u0c + u * u1c + v * u2c
                    tv = wb * v0c + u * v1c + v * v2c
                    iu_ = jnp.where(ok, tu, iu_)
                    iv_ = jnp.where(ok, tv, iv_)
                    nx_ = jnp.where(ok, fnx, nx_)
                    ny_ = jnp.where(ok, fny, ny_)
                    nz_ = jnp.where(ok, fnz, nz_)
                    return (cl, mf, nx_, ny_, nz_, iu_, iv_)
                if shaded:
                    wb = 1.0 - u - v
                    if smooth:
                        # n = w*n0 + u*n1 + v*n2 (normalize deferred to
                        # walk end — selection commutes with it)
                        nxi = wb * Wa[:, 0:1] + u * Wa[:, 3:4] \
                            + v * Wa[:, 6:7]
                        nyi = wb * Wa[:, 1:2] + u * Wa[:, 4:5] \
                            + v * Wa[:, 7:8]
                        nzi = wb * Wa[:, 2:3] + u * Wa[:, 5:6] \
                            + v * Wa[:, 8:9]
                        nx_ = jnp.where(ok, nxi, nx_)
                        ny_ = jnp.where(ok, nyi, ny_)
                        nz_ = jnp.where(ok, nzi, nz_)
                    else:
                        nx_ = jnp.where(ok, fnx, nx_)
                        ny_ = jnp.where(ok, fny, ny_)
                        nz_ = jnp.where(ok, fnz, nz_)
                    tu = wb * Wa[:, 9:10] + u * Wa[:, 11:12] \
                        + v * Wa[:, 13:14]
                    tv = wb * Wa[:, 10:11] + u * Wa[:, 12:13] \
                        + v * Wa[:, 14:15]
                    iu_ = jnp.where(ok, tu, iu_)
                    iv_ = jnp.where(ok, tv, iv_)
                    tx_ = jnp.where(ok, Wa[:, 15:16], tx_)
                    return (cl, mf, nx_, ny_, nz_, iu_, iv_, tx_)
                nx_ = jnp.where(ok, fnx, nx_)
                ny_ = jnp.where(ok, fny, ny_)
                nz_ = jnp.where(ok, fnz, nz_)
                return (cl, mf, nx_, ny_, nz_)

            def _unpack_uv(W):
                """The record's uv lanes as 6 (8,1) f32 columns: bf16
                bit pairs extracted with bitcasts + integer masks only
                (bf16-in-f32 patterns can be denormal — no float math
                may touch the packed lanes)."""
                cols = []
                for lane in (13, 14, 15):
                    bits = jax.lax.bitcast_convert_type(
                        W[:, lane:lane + 1], jnp.int32)
                    cols.append(jax.lax.bitcast_convert_type(
                        bits & jnp.int32(-65536), jnp.float32))
                    cols.append(jax.lax.bitcast_convert_type(
                        bits << 16, jnp.float32))
                return tuple(cols)

            def _carry_bits(W):
                """The record's 3 packed-uv lanes as int32 (8,1)
                columns — bit-preserving (see `carry`)."""
                return tuple(jax.lax.bitcast_convert_type(
                    W[:, lane:lane + 1], jnp.int32)
                    for lane in (13, 14, 15))

            def tile_update(W, SR, Wa=None, rows=None):
                if carry:
                    Wa = _carry_bits(W)  # once per tile, all rows share
                elif texrec:
                    Wa = _unpack_uv(W)   # once per tile, all rows share
                if rows is None:
                    return tuple(tile_update_row(W, r, SR[r], Wa)
                                 for r in range(n_rows))
                keep = set(rows)
                return tuple(tile_update_row(W, r, SR[r], Wa)
                             if r in keep else SR[r]
                             for r in range(n_rows))

            def load_aux(t_, win=None):
                if not shaded or texrec:
                    return None
                if defer_attrs:
                    # deferred-attribute mode: the engine records only
                    # the packed tri-row id per accept; the aux record
                    # is gathered ONCE per wave at walk end.  "Wa" is
                    # the (8,1) tri-row-id column of this tile.
                    io8c = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
                    return (t_ * 8 + io8c).astype(jnp.float32)
                if win is None:
                    ga = aux_ref[pl.ds(8 * (t_ // 8), 8), :]
                    return pltpu.roll(ga, -16 * (t_ % 8), 1)[:, :16]
                slot, gs = win
                lt = jnp.clip(t_ - 8 * gs, 0, 8 * gw - 1)
                ga = auxwin_ref[pl.ds(slot * 8 * gw + 8 * (lt // 8), 8),
                                :]
                return pltpu.roll(ga, -16 * (lt % 8), 1)[:, :16]

            def run_tiles(SR, r0, r1, rows=None, win=None):
                # tile granularity matches the old packed chains: up to
                # 7 boundary extras per side, all REAL triangle records
                # or zero padding — testing a superset of the range is
                # always correct for closest-hit (a genuine intersection
                # accepted early is still a genuine intersection).
                # 2 tiles per iteration: the two load+roll chains are
                # independent (ILP).  Tail handling per exec_opts.
                # leaf_tail: "pad" rounds up to pairs (a clamped
                # duplicate tile re-tests identical triangles —
                # idempotent accepts, but full wasted MT vector work on
                # the dominant 1-tile ranges), "cond" adds a lax.cond
                # single-tile tail, "single" drops the unroll entirely.
                # `win` routes the loads through an HBM leaf window slot.
                tile0 = r0 // 8
                ntiles = (r1 + 7) // 8 - tile0

                def single(k, SR):
                    t0_ = jnp.minimum(tile0 + k, max_tile)
                    return tile_update(_tile_fetch(t0_, win), SR,
                                       load_aux(t0_, win), rows=rows)

                if leaf_tail == "single":
                    return lax.fori_loop(0, ntiles, single, SR)

                n_it = (ntiles + 1) // 2 if leaf_tail == "pad" \
                    else ntiles // 2

                def tbody(k, SR):
                    t0_ = jnp.minimum(tile0 + 2 * k, max_tile)
                    t1_ = jnp.minimum(tile0 + 2 * k + 1, max_tile)
                    W0 = _tile_fetch(t0_, win)
                    W1 = _tile_fetch(t1_, win)
                    return tile_update(W1, tile_update(W0, SR,
                                                      load_aux(t0_, win),
                                                      rows=rows),
                                       load_aux(t1_, win), rows=rows)

                SR = lax.fori_loop(0, n_it, tbody, SR)
                if leaf_tail == "cond":
                    SR = lax.cond(ntiles != 2 * n_it,
                                  lambda s: single(2 * n_it, s),
                                  lambda s: s, SR)
                return SR

            def tcond(c):
                return c[0] > 0

            def shadow_tile(W, blocked, sc, rows=None):
                """Occlusion along the uniform sun direction against one
                (8,16) triangle tile: the p-vector and determinant are
                per-TRIANGLE columns (direction scalar), so only the
                origin-dependent half of Moller-Trumbore pays per-row
                vector work.  Any accepted tri marks the lane blocked
                (idempotent; clamp rows sc gate pot/blocked lanes).
                `rows` restricts the test to a row subset (split-front
                walks); excluded rows keep their blocked value."""
                v0x, v0y, v0z = W[:, 0:1], W[:, 1:2], W[:, 2:3]
                e1x, e1y, e1z = W[:, 3:4], W[:, 4:5], W[:, 5:6]
                e2x, e2y, e2z = W[:, 6:7], W[:, 7:8], W[:, 8:9]
                spvx = sdy * e2z - sdz * e2y      # (8,1) columns
                spvy = sdz * e2x - sdx * e2z
                spvz = sdx * e2y - sdy * e2x
                sdet = e1x * spvx + e1y * spvy + e1z * spvz
                sok0 = jnp.abs(sdet) >= 1e-8
                sinv = 1.0 / jnp.where(sok0, sdet, 1.0)
                keep = None if rows is None else set(rows)
                hit_rows = []
                for r in range(n_rows):
                    if keep is not None and r not in keep:
                        hit_rows.append(
                            jnp.zeros((1, TILE_W), jnp.float32))
                        continue
                    stx = sox[r:r + 1, :] - v0x
                    sty = soy[r:r + 1, :] - v0y
                    stz = soz[r:r + 1, :] - v0z
                    su = (stx * spvx + sty * spvy + stz * spvz) * sinv
                    ok = sok0 & (su >= 0.0)
                    sqx = sty * e1z - stz * e1y
                    sqy = stz * e1x - stx * e1z
                    sqz = stx * e1y - sty * e1x
                    sv_ = (sdx * sqx + sdy * sqy + sdz * sqz) * sinv
                    ok = ok & (sv_ >= 0.0) & (su + sv_ <= 1.0)
                    st_ = (e2x * sqx + e2y * sqy + e2z * sqz) * sinv
                    ok = ok & (st_ >= tmin_f) & (st_ <= sc[r:r + 1, :])
                    hit_rows.append(jnp.max(jnp.where(ok, 1.0, 0.0),
                                            axis=0, keepdims=True))
                return jnp.maximum(blocked,
                                   jnp.concatenate(hit_rows, axis=0))

            def run_shadow_tiles(blocked, sc, r0, r1, rows=None):
                tile0 = r0 // 8
                ntiles = (r1 + 7) // 8 - tile0

                def sng(k, blocked):
                    t0_ = jnp.minimum(tile0 + k, max_tile)
                    return shadow_tile(_tile_fetch(t0_), blocked, sc,
                                       rows=rows)

                if leaf_tail == "single":
                    return lax.fori_loop(0, ntiles, sng, blocked)

                n_it = (ntiles + 1) // 2 if leaf_tail == "pad" \
                    else ntiles // 2

                def tb(k, blocked):
                    t0_ = jnp.minimum(tile0 + 2 * k, max_tile)
                    t1_ = jnp.minimum(tile0 + 2 * k + 1, max_tile)
                    g0 = tile_ref[pl.ds(8 * (t0_ // 8), 8), :]
                    g1 = tile_ref[pl.ds(8 * (t1_ // 8), 8), :]
                    W0 = pltpu.roll(g0, -16 * (t0_ % 8), 1)[:, :16]
                    W1 = pltpu.roll(g1, -16 * (t1_ % 8), 1)[:, :16]
                    return shadow_tile(W1,
                                       shadow_tile(W0, blocked, sc,
                                                   rows=rows),
                                       sc, rows=rows)

                blocked = lax.fori_loop(0, n_it, tb, blocked)
                if leaf_tail == "cond":
                    blocked = lax.cond(ntiles != 2 * n_it,
                                       lambda b: sng(2 * n_it, b),
                                       lambda b: b, blocked)
                return blocked

            def tbody_w(c):
                if with_shadow:
                    sp, SR, closest, blocked, nv, nt, ni, sv, st = c
                    # blocked lanes (and non-pot lanes) carry a t_min
                    # clamp row: their slab tests and tri accepts can
                    # never pass (automatic parking)
                    sc = jnp.minimum(sc_pot,
                                     jnp.where(blocked > 0.5, tmin_f,
                                               tmax_f))
                    rsets = [(ros, invs, closest), (sros, s_invs, sc)]
                else:
                    sp, SR, closest, nv, nt, ni = c
                    rsets = [(ros, invs, closest)]
                (sp, ranges, npop, lbs, ranges_sets,
                 ranges_half) = _multi_pop_visit(sp, rsets, octant,
                                                 split0=leaf_parts)

                def leaf_branch(a):
                    if with_shadow:
                        SR, blocked = a
                    else:
                        SR = a
                    if ("unirange" in dup_set and not with_shadow
                            and leaf_parts == 1 and not hbm):
                        # perf triage: ONE fori over the union of the
                        # pops' ranges instead of POPS sequential loops
                        # (empty ranges are (0,0); a genuine range never
                        # starts at tile 0 unless it is the root leaf)
                        r0u, r1u = None, None
                        for r0, r1, _ in ranges:
                            big = jnp.int32(1 << 29)
                            r0x = jnp.where(r1 > 0, r0, big)
                            r0u = r0x if r0u is None else \
                                jnp.minimum(r0u, r0x)
                            r1u = r1 if r1u is None else \
                                jnp.maximum(r1u, r1)
                        r0u = jnp.where(r1u > 0, r0u, 0)
                        return run_tiles(SR, r0u, r1u)
                    # extension rays scan THEIR entered leaves only
                    if hbm and leaf_parts > 1:
                        # HBM x row-group masking composed: the DMA
                        # window covers each pop's UNION range — its
                        # bounds come from the groups' own range
                        # scalars (scalar min/max, no extra vector
                        # reduces on the visit chain) — and each row
                        # group then scans only ITS entered sub-range
                        # inside the window
                        pr = n_rows // leaf_parts
                        grps = list(zip(*ranges_half))
                        uni = []
                        for grp in grps:
                            big = jnp.int32(1 << 29)
                            r0u = jnp.where(grp[0][1] > 0, grp[0][0], big)
                            r1u = grp[0][1]
                            for rg in grp[1:]:
                                r0u = jnp.minimum(
                                    r0u, jnp.where(rg[1] > 0, rg[0], big))
                                r1u = jnp.maximum(r1u, rg[1])
                            r0u = jnp.where(r1u > 0, r0u, 0)
                            uni.append((r0u, r1u, jnp.int32(0)))
                        wins = _leaf_windows(uni,
                                             with_aux=shaded and
                                             not texrec)
                        for p, (grp, (r0u, r1u, _), (gs, cps)) in \
                                enumerate(zip(grps, uni, wins)):
                            for cp in cps:
                                @pl.when(r1u > r0u)
                                def _wait(cp=cp):
                                    cp.wait()

                            for gi, rg in enumerate(grp):
                                SR = run_tiles(
                                    SR, rg[0], rg[1],
                                    rows=range(gi * pr, (gi + 1) * pr),
                                    win=(p, gs))
                    elif hbm:
                        # HBM mode: start every pop's leaf-window copy
                        # first (they overlap each other and the wait-
                        # free scans before them), then wait + scan
                        wins = _leaf_windows(ranges_sets[0],
                                             with_aux=shaded and
                                             not texrec)
                        for p, ((r0, r1, _), (gs, cps)) in enumerate(
                                zip(ranges_sets[0], wins)):
                            for cp in cps:
                                @pl.when(r1 > r0)
                                def _wait(cp=cp):
                                    cp.wait()

                            SR = run_tiles(SR, r0, r1, win=(p, gs))
                    elif leaf_parts == 2 and dual_union:
                        # dual-entered ranges (both halves entered
                        # leaves of the SAME node, ~7% of entered
                        # ranges) are scanned ONCE over the union range
                        # at full rows instead of twice at half rows —
                        # near-identical MT row work (dual halves'
                        # ranges overlap almost entirely), half the
                        # tile load+roll chains.  Bit-identical:
                        # scanning a superset of a row's entered range
                        # only adds misses (a genuine hit implies the
                        # row's half entered that leaf).
                        pr = n_rows // 2
                        for grp in zip(*ranges_half):
                            (ra0, ra1, _), (rb0, rb1, _) = grp
                            dual = (ra1 > ra0) & (rb1 > rb0)

                            def scan_union(SR, ra0=ra0, ra1=ra1,
                                           rb0=rb0, rb1=rb1):
                                return run_tiles(
                                    SR, jnp.minimum(ra0, rb0),
                                    jnp.maximum(ra1, rb1))

                            def scan_halves(SR, ra0=ra0, ra1=ra1,
                                            rb0=rb0, rb1=rb1):
                                SR = run_tiles(SR, ra0, ra1,
                                               rows=range(0, pr))
                                return run_tiles(SR, rb0, rb1,
                                                 rows=range(pr, n_rows))

                            SR = lax.cond(dual, scan_union,
                                          scan_halves, SR)
                    elif leaf_parts > 1:
                        # ... and each row group scans only the leaves
                        # ITS rays entered: a range entered by one
                        # group alone costs 1/leaf_parts of the MT row
                        # work, and an empty group range is a zero-trip
                        # fori
                        pr = n_rows // leaf_parts
                        for grp in zip(*ranges_half):
                            for gi, rg in enumerate(grp):
                                SR = run_tiles(
                                    SR, rg[0], rg[1],
                                    rows=range(gi * pr, (gi + 1) * pr))
                    else:
                        for r0, r1, _ in ranges_sets[0]:
                            SR = run_tiles(SR, r0, r1)
                            if "leaf" in dup_set:  # perf triage: 2x
                                SR = run_tiles(SR, r0, r1)  # idempotent
                    if with_shadow:
                        # ... and shadow rays theirs (the cheap
                        # scalar-direction any-hit)
                        for r0, r1, _ in ranges_sets[1]:
                            blocked = run_shadow_tiles(blocked, sc,
                                                       r0, r1)
                        return SR, blocked
                    return SR

                anylb = lbs[0]
                for lb in lbs[1:]:
                    anylb = anylb | lb
                if with_shadow:
                    SR, blocked = lax.cond(anylb != 0, leaf_branch,
                                           lambda a: a, (SR, blocked))
                elif "nolc" in dup_set:
                    # perf triage: skip the cond dispatch (the branch's
                    # ~40 carried vregs may spill per iteration); empty
                    # ranges cost a zero-trip fori only
                    SR = leaf_branch(SR)
                else:
                    SR = lax.cond(anylb != 0, leaf_branch, lambda a: a,
                                  SR)
                # per-lane closest = min over the 8 tri-row candidates
                rows = [jnp.min(SR[r][0], axis=0, keepdims=True)
                        for r in range(n_rows)]
                closest = jnp.concatenate(rows, axis=0)
                if "merge" in dup_set:          # perf triage: 2x merge
                    rows2 = [jnp.min(SR[r][0], axis=0, keepdims=True)
                             for r in range(n_rows)]
                    closest = jnp.minimum(closest,
                                          jnp.concatenate(rows2, axis=0))
                nv = nv + npop
                if leaf_parts > 1:
                    # nt counts GROUP-scans here (a tri scanned by k of
                    # the row groups counts k times — proportional to
                    # MT row work within one leaf_split setting)
                    for grp in zip(*ranges_half):
                        if leaf_parts == 2 and dual_union:
                            (ra0, ra1, idl), (rb0, rb1, _) = grp
                            dual = (ra1 > ra0) & (rb1 > rb0)
                            uni2 = 2 * (jnp.maximum(ra1, rb1)
                                        - jnp.minimum(ra0, rb0))
                            nt = nt + jnp.where(
                                dual, uni2, (ra1 - ra0) + (rb1 - rb0))
                            ni = ni + idl
                            continue
                        for rg in grp:
                            nt = nt + (rg[1] - rg[0])
                            ni = ni + rg[2]
                else:
                    for r0, r1, idl in ranges_sets[0]:
                        nt = nt + (r1 - r0)      # 0 when not entered
                        ni = ni + idl
                if with_shadow:
                    for r0, r1, _idl in ranges_sets[1]:
                        st = st + (r1 - r0)
                        sv = sv + (r1 > r0).astype(jnp.int32)
                    return sp, SR, closest, blocked, nv, nt, ni, sv, st
                return sp, SR, closest, nv, nt, ni

            zt = jnp.zeros((8, TILE_W), jnp.float32)
            if defer_attrs:
                # (closest, mat, tri-row id, bary u, bary v)
                SR0 = tuple(
                    (zt + closest0[r:r + 1, :], zt, zt, zt, zt)
                    for r in range(n_rows))
            elif carry:
                # + bary (u, v) and the 3 raw packed-uv lanes (int32)
                zti = jnp.zeros((8, TILE_W), jnp.int32)
                SR0 = tuple(
                    (zt + closest0[r:r + 1, :], zt, zt, zt, zt, zt, zt,
                     zti, zti, zti)
                    for r in range(n_rows))
            elif texrec:
                # + interpolated (iu, iv); texture id resolves from the
                # winning material row at walk end
                SR0 = tuple(
                    (zt + closest0[r:r + 1, :], zt, zt, zt, zt, zt, zt)
                    for r in range(n_rows))
            elif shaded:
                # + interpolated (iu, iv) and texture id (-1 = none)
                SR0 = tuple(
                    (zt + closest0[r:r + 1, :], zt, zt, zt, zt, zt, zt,
                     zt - 1.0)
                    for r in range(n_rows))
            else:
                SR0 = tuple(
                    (zt + closest0[r:r + 1, :], zt, zt, zt, zt)
                    for r in range(n_rows))

            if fronts == 2 and not hbm:
                # ---- split-front walk (exec_opts.front_split): the ----
                # block's row halves walk the BVH as two independent
                # fronts — own SMEM stack segment, own pop pipeline —
                # inside ONE loop iteration.  The kernel is serial-
                # visit-bound (r4/r5 dup attributions: every vector
                # segment 2x-free), so the two textually independent
                # visit chains overlap on each other's latency bubbles;
                # each front's visits are the union over only ITS 4
                # rows (a tighter front than the block union), and its
                # leaf scans update only its rows (the leaf_split
                # benefit, subsumed).  Identical accept set per lane: a
                # front enters every node any of its rows hit — a
                # superset of each lane's own walk.  The loop runs
                # until BOTH stacks drain; an exhausted front's pops
                # are fully masked (_front_pop_visit).
                ph = n_rows // 2
                rowsA = tuple(range(0, ph))
                rowsB = tuple(range(ph, n_rows))
                stack_ref[STACK] = jnp.int32(0)
                awA = jnp.any(act[:ph])
                awB = jnp.any(act[ph:])
                if with_shadow:
                    awA = awA | jnp.any(pot[:ph])
                    awB = awB | jnp.any(pot[ph:])
                spA0 = jnp.where(awA, jnp.int32(1), jnp.int32(0))
                spB0 = jnp.where(awB, jnp.int32(1), jnp.int32(0))

                def fcond(c):
                    return (c[0] + c[1]) > 0

                def fbody(c):
                    if with_shadow:
                        (spA, spB, SR, closest, blocked,
                         nv, nt, ni, sv, st) = c
                        sc = jnp.minimum(sc_pot,
                                         jnp.where(blocked > 0.5,
                                                   tmin_f, tmax_f))
                        rsA = [(ros, invs, closest, rowsA),
                               (sros, s_invs, sc, rowsA)]
                        rsB = [(ros, invs, closest, rowsB),
                               (sros, s_invs, sc, rowsB)]
                    else:
                        spA, spB, SR, closest, nv, nt, ni = c
                        rsA = [(ros, invs, closest, rowsA)]
                        rsB = [(ros, invs, closest, rowsB)]
                    spA, npA, lbsA, rngA = _front_pop_visit(spA, rsA, 0)
                    spB, npB, lbsB, rngB = _front_pop_visit(spB, rsB,
                                                            STACK)
                    anylb = jnp.int32(0)
                    for lb in lbsA + lbsB:
                        anylb = anylb | lb

                    def leaf_branch(a):
                        if with_shadow:
                            SR, blocked = a
                        else:
                            SR = a
                        for r0, r1, _ in rngA[0]:
                            SR = run_tiles(SR, r0, r1, rows=rowsA)
                        for r0, r1, _ in rngB[0]:
                            SR = run_tiles(SR, r0, r1, rows=rowsB)
                        if with_shadow:
                            for r0, r1, _ in rngA[1]:
                                blocked = run_shadow_tiles(
                                    blocked, sc, r0, r1, rows=rowsA)
                            for r0, r1, _ in rngB[1]:
                                blocked = run_shadow_tiles(
                                    blocked, sc, r0, r1, rows=rowsB)
                            return SR, blocked
                        return SR

                    if with_shadow:
                        SR, blocked = lax.cond(anylb != 0, leaf_branch,
                                               lambda a: a,
                                               (SR, blocked))
                    else:
                        SR = lax.cond(anylb != 0, leaf_branch,
                                      lambda a: a, SR)
                    rows_min = [jnp.min(SR[r][0], axis=0, keepdims=True)
                                for r in range(n_rows)]
                    closest = jnp.concatenate(rows_min, axis=0)
                    nv = nv + npA + npB
                    for r0, r1, idl in rngA[0] + rngB[0]:
                        nt = nt + (r1 - r0)
                        ni = ni + idl
                    if with_shadow:
                        for r0, r1, _i in rngA[1] + rngB[1]:
                            st = st + (r1 - r0)
                            sv = sv + (r1 > r0).astype(jnp.int32)
                        return (spA, spB, SR, closest, blocked,
                                nv, nt, ni, sv, st)
                    return spA, spB, SR, closest, nv, nt, ni

                if with_shadow:
                    (_, _, SR, closest, blkd_f, nv, nt, ni, sv, st) = \
                        lax.while_loop(
                            fcond, fbody,
                            (spA0, spB0, SR0, closest0, f0,
                             jnp.int32(0), jnp.int32(0), jnp.int32(0),
                             jnp.int32(0), jnp.int32(0)))
                else:
                    (_, _, SR, closest, nv, nt, ni) = lax.while_loop(
                        fcond, fbody,
                        (spA0, spB0, SR0, closest0, jnp.int32(0),
                         jnp.int32(0), jnp.int32(0)))
            elif stream and not with_shadow:
                # ---- streamed walk: node visits + leaf tiles in ONE ---
                # straight-line iteration body.  Entered leaf ranges are
                # enqueued (tile cursor pairs) to the SMEM range queue
                # and drained at `stream_tiles` tile tests per iteration
                # ALONGSIDE the next `pops` node visits — the tile
                # load+roll chains overlap the node load chains instead
                # of serializing after them in a lax.cond leaf branch.
                # Identical accept set: every enqueued range is fully
                # drained before the loop can end (cond checks sp, the
                # queue, and the open cursor), pruning clamps only ever
                # lag behind (= superset walks), and idle tile slots
                # re-test clamped REAL tiles (idempotent accepts).
                # Queue backpressure: node pops stall while the queue
                # is within POPS of capacity, so enqueues never spill.
                T = stream_tiles

                def scond(c):
                    return (c[0] > 0) | (c[3] > 0) | (c[1] < c[2])

                def sbody(c):
                    sp, cur, cend, rq, SR, nv, nt, ni = c
                    closr = [jnp.min(SR[r][0], axis=0, keepdims=True)
                             for r in range(n_rows)]
                    closest = jnp.concatenate(closr, axis=0)
                    # phase 1: T tile tests with inline queue refill —
                    # FIRST, so the tile load addresses depend only on
                    # loop-carried scalars (cur/cend/rq), not on this
                    # iteration's visit verdicts: the tile chains issue
                    # at iteration top and overlap the node visit chains
                    # below (tiles drain the PREVIOUS iterations' queue)
                    for j in range(T):
                        need = (cur >= cend) & (rq > 0)
                        rq = rq - need.astype(jnp.int32)
                        qa = jnp.where(need, 2 * rq, 2 * RQCAP)
                        cur = jnp.where(need, rq_ref[qa], cur)
                        cend = jnp.where(need, rq_ref[qa + 1], cend)
                        t_ = jnp.minimum(cur, max_tile)
                        grp = tile_ref[pl.ds(8 * (t_ // 8), 8), :]
                        Wt = pltpu.roll(grp, -16 * (t_ % 8), 1)[:, :16]
                        SR = tile_update(Wt, SR, load_aux(t_))
                        cur = cur + (cur < cend).astype(jnp.int32)
                    # phase 2: pop + visit (every pop masked — the loop
                    # runs on after the node stack empties to drain the
                    # tile queue)
                    can_pop = rq < RQCAP - POPS
                    nodes, vlds = [], []
                    for p in range(POPS):
                        nodes.append(stack_ref[jnp.maximum(sp - 1 - p, 0)])
                        vlds.append((sp >= p + 1) & can_pop)
                    npop = jnp.int32(0)
                    for v in vlds:
                        npop = npop + v.astype(jnp.int32)
                    sp = sp - npop
                    outs = []
                    for p in range(POPS):
                        W, hb, lb, base, im, _ls, _lh = _visit_bits(
                            nodes[p], [(ros, invs, closest)])
                        hb = jnp.where(vlds[p], hb, 0)
                        lb = jnp.where(vlds[p], lb, 0)
                        outs.append((W, hb, lb, base, im))
                    for W, hb, lb, base, im in reversed(outs):
                        sp = _push_children(sp, hb, lb, base, im)
                    nv = nv + npop
                    # phase 3: enqueue entered leaf ranges
                    for W, hb, lb, base, im in outs:
                        r0, r1, idl = _leaf_range(W, lb)
                        haslb = lb != 0
                        qi = jnp.where(haslb, 2 * rq, 2 * RQCAP)
                        rq_ref[qi] = r0 // 8
                        rq_ref[qi + 1] = (r1 + 7) // 8
                        rq = rq + haslb.astype(jnp.int32)
                        nt = nt + jnp.where(haslb, r1 - r0, 0)
                        ni = ni + jnp.where(haslb, idl, 0)
                    return sp, cur, cend, rq, SR, nv, nt, ni

                (_, _, _, _, SR, nv, nt, ni) = lax.while_loop(
                    scond, sbody,
                    (sp0, jnp.int32(0), jnp.int32(0), jnp.int32(0), SR0,
                     jnp.int32(0), jnp.int32(0), jnp.int32(0)))
            elif rowtrav and not with_shadow:
                # ---- per-row traversal: each ray row walks the wide ---
                # BVH with its own cursor + stack segment and only box/
                # leaf-tests its OWN 128 lanes (the block-union walk
                # tests every popped node and leaf tile against ALL
                # rows).  The n_rows x row_pops visit chains per
                # iteration are textually independent — SMEM reads all
                # happen in phase 1 and pushes in phase 2, so a row's
                # stack stores never order-block another row's pops —
                # the per-row analogue of the multi-pop ILP form.
                # Identical accept set: each row enters every leaf its
                # own 128-ray walk would enter.  `ordered` is ignored
                # here (per-row fronts are already small).
                R = n_rows
                RP = row_pops
                for r in range(R):
                    stack_ref[r * ROW_SSEG] = jnp.int32(0)
                sps0 = tuple(
                    jnp.where(jnp.any(act[r:r + 1, :]),
                              jnp.int32(1), jnp.int32(0))
                    for r in range(R))

                def rcond(c):
                    t = c[0][0]
                    for s in c[0][1:]:
                        t = t + s
                    return t > 0

                def rbody(c):
                    sps, SR, nv, nt, ni = c
                    closr = [jnp.min(SR[r][0], axis=0, keepdims=True)
                             for r in range(R)]
                    # phase 1: pop + visit (SMEM reads only)
                    infos = []
                    for r in range(R):
                        sp = sps[r]
                        outs_r = []
                        for p in range(RP):
                            node = stack_ref[
                                r * ROW_SSEG + jnp.maximum(sp - 1 - p, 0)]
                            vld = sp >= (p + 1)
                            W, hb, lb, base, im = _visit_row(
                                node, ox[r:r + 1, :], oy[r:r + 1, :],
                                oz[r:r + 1, :], inv_dx[r:r + 1, :],
                                inv_dy[r:r + 1, :], inv_dz[r:r + 1, :],
                                closr[r])
                            hb = jnp.where(vld, hb, 0)
                            lb = jnp.where(vld, lb, 0)
                            outs_r.append((W, hb, lb, base, im, vld))
                        infos.append(outs_r)
                    # phase 2: pushes into per-row stack segments
                    new_sps = []
                    for r in range(R):
                        sp = sps[r]
                        npop = jnp.int32(0)
                        for info in infos[r]:
                            npop = npop + info[5].astype(jnp.int32)
                        sp = sp - npop
                        for W, hb, lb, base, im, vld in reversed(infos[r]):
                            sp = _push_children(
                                sp, hb, lb, base, im, soff=r * ROW_SSEG,
                                dump=r * ROW_SSEG + ROW_SSEG - 1)
                        new_sps.append(sp)
                        nv = nv + npop
                    # phase 3: leaf tiles, merged across rows — one trip-
                    # counted loop per pop slot; every row streams its
                    # own range's tiles (8 independent load+roll chains
                    # per iteration); rows past their own range re-test
                    # clamped REAL tiles (idempotent accepts — the
                    # superset argument)
                    anylb = jnp.int32(0)
                    spans = []
                    for p in range(RP):
                        per = []
                        for r in range(R):
                            W, hb, lb = infos[r][p][:3]
                            r0, r1, idl = _leaf_range(W, lb)
                            per.append((r0 // 8, (r1 + 7) // 8 - r0 // 8))
                            anylb = anylb | lb
                            nt = nt + jnp.where(lb != 0, r1 - r0, 0)
                            ni = ni + jnp.where(lb != 0, idl, 0)
                        spans.append(per)

                    def leaf_branch(SR):
                        for p in range(RP):
                            per = spans[p]
                            nit = per[0][1]
                            for r in range(1, R):
                                nit = jnp.maximum(nit, per[r][1])

                            def tbody(k, SR, per=per):
                                out = []
                                for r in range(R):
                                    t_ = jnp.minimum(per[r][0] + k,
                                                     max_tile)
                                    grp = tile_ref[
                                        pl.ds(8 * (t_ // 8), 8), :]
                                    Wt = pltpu.roll(
                                        grp, -16 * (t_ % 8), 1)[:, :16]
                                    out.append(tile_update_row(
                                        Wt, r, SR[r],
                                        _carry_bits(Wt) if carry
                                        else _unpack_uv(Wt) if texrec
                                        else load_aux(t_)))
                                return tuple(out)

                            SR = lax.fori_loop(0, nit, tbody, SR)
                        return SR

                    SR = lax.cond(anylb != 0, leaf_branch,
                                  lambda a: a, SR)
                    return tuple(new_sps), SR, nv, nt, ni

                (_, SR, nv, nt, ni) = lax.while_loop(
                    rcond, rbody,
                    (sps0, SR0, jnp.int32(0), jnp.int32(0),
                     jnp.int32(0)))
            elif with_shadow:
                (_, SR, closest, blkd_f, nv, nt, ni, sv, st) = \
                    lax.while_loop(
                        tcond, tbody_w,
                        (sp0, SR0, closest0, f0, jnp.int32(0),
                         jnp.int32(0), jnp.int32(0), jnp.int32(0),
                         jnp.int32(0)))
            else:
                (_, SR, closest, nv, nt, ni) = lax.while_loop(
                    tcond, tbody_w,
                    (sp0, SR0, closest0, jnp.int32(0), jnp.int32(0),
                     jnp.int32(0)))

            # merge the tri-row candidates: 3-round cyclic-roll
            # tournament on (t, slot-index) ONLY — the attribute fields
            # are resolved afterwards from their ORIGINAL rows via the
            # winning slot's one-hot (a masked sublane sum with exactly
            # one nonzero term, so exact).  The index rides the same
            # take decisions as the old all-fields tournament (strict <
            # keeps the lower slot on exact ties), so the winner — and
            # every resolved attribute — is bit-identical, for 2 rolled
            # fields instead of 5-8 (rolls are the expensive part:
            # sweep50k8 attributed ~8 ms/frame to the 120 rolls).
            def tournament():
                io8 = jax.lax.broadcasted_iota(
                    jnp.int32, (8, TILE_W), 0)
                frows = []
                for r in range(n_rows):
                    fields = SR[r]
                    tt, idx = fields[0], io8
                    for shift in (4, 2, 1):
                        rt = pltpu.roll(tt, shift, 0)
                        ri = pltpu.roll(idx, shift, 0)
                        take = rt < tt
                        tt = jnp.where(take, rt, tt)
                        idx = jnp.where(take, ri, idx)
                    onehot = io8 == idx[0:1, :]
                    # dtype-preserving masked sum: exactly one nonzero
                    # term, so exact for f32 AND for the carry mode's
                    # int32 bit planes (int adds never flush/round)
                    frows.append((tt[0:1, :],) + tuple(
                        jnp.sum(jnp.where(onehot, f, jnp.zeros_like(f)),
                                axis=0, keepdims=True)
                        for f in fields[1:]))
                return frows

            frows = tournament()
            if "tourn" in dup_set:       # perf triage: 2x the tournament
                frows2 = tournament()
                frows = [tuple(jnp.minimum(a, b)
                               for a, b in zip(fa, fb))
                         for fa, fb in zip(frows, frows2)]
            closest = jnp.concatenate([fr[0] for fr in frows], axis=0)
            bm = jnp.concatenate([fr[1] for fr in frows],
                                 axis=0).astype(jnp.int32)
            if defer_attrs:
                # resolve the winning triangle's aux record from its
                # recorded row id: one one-hot gather per wave replaces
                # the engine's per-tile interpolation.  Interp formulas
                # are the engine's exact expressions (bit-identity).
                btid = jnp.concatenate([fr[2] for fr in frows], axis=0)
                bu = jnp.concatenate([fr[3] for fr in frows], axis=0)
                bv = jnp.concatenate([fr[4] for fr in frows], axis=0)
                Ta = aux_ref.shape[1] // 16
                auxT = aux_ref[...]
                tid_i = jnp.clip(btid.astype(jnp.int32), 0,
                                 Ta * TILE_W - 1)
                c_all = tid_i // TILE_W
                j_all = tid_i % TILE_W
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_W), 1)
                crange = jax.lax.broadcasted_iota(jnp.int32, (1, Ta), 1)
                cols = [[] for _ in range(16)]
                for s in range(n_rows):
                    jT = jnp.transpose(j_all[s:s + 1, :])
                    cT = jnp.transpose(c_all[s:s + 1, :])
                    onehot = (jT == lane).astype(jnp.float32)
                    tmp = jax.lax.dot_general(
                        onehot, auxT, (((1,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST)
                    selm = cT == crange
                    for f in range(16):
                        vf = jnp.sum(
                            jnp.where(selm, tmp[:, f * Ta:(f + 1) * Ta],
                                      0.0), axis=1, keepdims=True)
                        cols[f].append(jnp.transpose(vf))
                flds = [jnp.concatenate(cols[f], axis=0)
                        for f in range(16)]
                wb = 1.0 - bu - bv
                if smooth:
                    # n = w*n0 + u*n1 + v*n2 (engine formula verbatim)
                    bnx = wb * flds[0] + bu * flds[3] + bv * flds[6]
                    bny = wb * flds[1] + bu * flds[4] + bv * flds[7]
                    bnz = wb * flds[2] + bu * flds[5] + bv * flds[8]
                else:
                    bnx, bny, bnz = flds[0], flds[1], flds[2]
                aux3 = (wb * flds[9] + bu * flds[11] + bv * flds[13],
                        wb * flds[10] + bu * flds[12] + bv * flds[14],
                        flds[15])
            else:
                bnx = jnp.concatenate([fr[2] for fr in frows], axis=0)
                bny = jnp.concatenate([fr[3] for fr in frows], axis=0)
                bnz = jnp.concatenate([fr[4] for fr in frows], axis=0)
            if smooth:
                # normalize the interpolated vn normal — exact formula
                # of the split path (ops/trace.py:164-167)
                nlen = jnp.sqrt(bnx * bnx + bny * bny + bnz * bnz)
                ninv = jnp.where(nlen > 0,
                                 1.0 / jnp.maximum(nlen, 1e-38), 0.0)
                bnx = bnx * ninv
                bny = bny * ninv
                bnz = bnz * ninv
            hitm = jnp.where(act & (closest < tmax_f), 1.0, 0.0)
            front_b = (dx * bnx + dy * bny + dz * bnz) < 0.0
            sgn = jnp.where(front_b, 1.0, -1.0)
            fl = (hitm, closest, bm, sgn * bnx, sgn * bny, sgn * bnz,
                  jnp.where(front_b, 1.0, 0.0))
            if texrec:
                # texture id from the winning material row (exact: tex
                # is a pure function of the material, models/scene.py
                # upsert); misses carry -1 like the aux engine's init
                btex = jnp.where(hitm > 0.5, _mat_field(bm, 14), -1.0)
                if carry:
                    # walk-end interpolation on the tournament winners:
                    # the engine's exact expression (tile_update_row
                    # texrec branch) over the winning accept's exact
                    # bary (u, v) and packed-lane bits — once per wave
                    # instead of per accepted tile-row
                    bu = jnp.concatenate([fr[5] for fr in frows], 0)
                    bv = jnp.concatenate([fr[6] for fr in frows], 0)
                    cols = []
                    for i in range(3):
                        bits = jnp.concatenate(
                            [fr[7 + i] for fr in frows], 0)
                        cols.append(jax.lax.bitcast_convert_type(
                            bits & jnp.int32(-65536), jnp.float32))
                        cols.append(jax.lax.bitcast_convert_type(
                            bits << 16, jnp.float32))
                    u0c, v0c, u1c, v1c, u2c, v2c = cols
                    wb = 1.0 - bu - bv
                    aux3 = (wb * u0c + bu * u1c + bv * u2c,
                            wb * v0c + bu * v1c + bv * v2c,
                            btex)
                else:
                    aux3 = (jnp.concatenate([fr[5] for fr in frows], 0),
                            jnp.concatenate([fr[6] for fr in frows], 0),
                            btex)
            elif shaded and not defer_attrs:
                aux3 = (jnp.concatenate([fr[5] for fr in frows], 0),
                        jnp.concatenate([fr[6] for fr in frows], 0),
                        jnp.concatenate([fr[7] for fr in frows], 0))
            if n_sph or n_quads:
                # <=-tie merge: the pre-walk primitive hit wins unless a
                # triangle beat it STRICTLY (split-path later-pass order)
                selp = (hitm_p > 0.5) & (bt_p <= closest)
                fl = (jnp.where(selp, 1.0, fl[0]),
                      jnp.where(selp, bt_p, fl[1]),
                      jnp.where(selp, bm_p, fl[2]),
                      jnp.where(selp, pnx, fl[3]),
                      jnp.where(selp, pny, fl[4]),
                      jnp.where(selp, pnz, fl[5]),
                      jnp.where(selp, pfr, fl[6]))
                if shaded:
                    aux3 = tuple(jnp.where(selp, pa, a)
                                 for pa, a in zip(paux, aux3))
            if with_shadow:
                if n_sph or n_quads:
                    blkd_f = jnp.maximum(blkd_f,
                                         _prim_shadow(sox, soy, soz,
                                                      pot, tm=tm))
                return fl + (blkd_f, nv, nt, ni, sv, st)
            if shaded:
                fl = fl + aux3
            return fl + (nv, nt, ni)

        def cond(c):
            return c[0] > 0

        def body(c):
            sp, closest, bm, bnx, bny, bnz, blkd, nv, nt, ni = c
            ray_sets = [(ros, invs, closest)]
            if with_shadow:
                # blocked lanes collapse their clamp row -> their slab
                # tests can never pass again (automatic parking)
                sc = jnp.minimum(sc_pot, jnp.where(blkd > 0.5, tmin_f,
                                                   tmax_f))
                ray_sets.append((sros, s_invs, sc))
            (sp, ranges, npop, lbs,
             _rs, _rh) = _multi_pop_visit(sp, ray_sets, octant)

            def mt_update(fields, guard, st):
                cl, m, nx_, ny_, nz_, blk = st
                (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z, mat_f,
                 fnx, fny, fnz) = fields
                pvx = dy * e2z - dz * e2y
                pvy = dz * e2x - dx * e2z
                pvz = dx * e2y - dy * e2x
                det = e1x * pvx + e1y * pvy + e1z * pvz
                ok = jnp.abs(det) >= 1e-8
                inv_det = 1.0 / jnp.where(ok, det, 1.0)
                tvx = ox - v0x
                tvy = oy - v0y
                tvz = oz - v0z
                u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                ok = ok & (u >= 0.0) & (u <= 1.0)
                qvx = tvy * e1z - tvz * e1y
                qvy = tvz * e1x - tvx * e1z
                qvz = tvx * e1y - tvy * e1x
                v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
                ok = ok & (v >= 0.0) & (u + v <= 1.0)
                t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                ok = ok & (t >= tmin_f) & (t <= cl) & act & guard
                cl = jnp.where(ok, t, cl)
                m = jnp.where(ok, mat_f.astype(jnp.int32), m)
                nx_ = jnp.where(ok, fnx, nx_)
                ny_ = jnp.where(ok, fny, ny_)
                nz_ = jnp.where(ok, fnz, nz_)
                if with_shadow:
                    # occlusion along the uniform sun direction from the
                    # pending-shadow origins, on the SAME loaded fields
                    # (p vector and determinant are per-triangle scalars)
                    spvx = sdy * e2z - sdz * e2y
                    spvy = sdz * e2x - sdx * e2z
                    spvz = sdx * e2y - sdy * e2x
                    sdet = e1x * spvx + e1y * spvy + e1z * spvz
                    sok0 = jnp.abs(sdet) >= 1e-8
                    sinv = 1.0 / jnp.where(sok0, sdet, 1.0)
                    stx = sox - v0x
                    sty = soy - v0y
                    stz = soz - v0z
                    su = (stx * spvx + sty * spvy + stz * spvz) * sinv
                    sok = sok0 & (su >= 0.0) & (su <= 1.0)
                    sqx = sty * e1z - stz * e1y
                    sqy = stz * e1x - stx * e1z
                    sqz = stx * e1y - sty * e1x
                    sv = (sdx * sqx + sdy * sqy + sdz * sqz) * sinv
                    sok = sok & (sv >= 0.0) & (su + sv <= 1.0)
                    st_ = (e2x * sqx + e2y * sqy + e2z * sqz) * sinv
                    sok = (sok & (st_ >= tmin_f) & (st_ <= tmax_f) & pot
                           & guard)
                    blk = jnp.where(sok, 1.0, blk)
                return cl, m, nx_, ny_, nz_, blk

            def tri_test(row, guard, st):
                return mt_update(_load_many(tri_ref, row, range(13),
                                            packed), guard, st)

            def run_chains(a, r0, r1):
                # LEAF_CHAINS independent accumulator chains (strided
                # rows) so the per-tri load->test->select serial chains
                # interleave in the VLIW schedule.  Each chain prunes on
                # its OWN closest — weaker pruning, identical acceptance
                # set — and the merge keeps the strictly nearer hit
                # (exact up to t-ties between distinct triangles, as
                # everywhere).
                closest, bm, bnx, bny, bnz, blk = a
                G = LEAF_CHAINS

                if packed and G == 8:
                    # Phase-aligned chains: chain g tests tris = g mod 8,
                    # so its pk8 lane offset (16g + field) is STATIC and
                    # every field is a direct scalar load (dynamic
                    # sublane, static lane) — no mask-reduce extraction.
                    # The up-to-7 boundary extras per side are real
                    # triangles (harmless, the gap-leaf argument) or
                    # zero padding records (det == 0, rejected).
                    b0 = r0 // 8
                    nit = (r1 + 7) // 8 - b0
                    last_row = tri_ref.shape[0] - 1

                    def leaf_bodyG(k, sts):
                        row = jnp.minimum(b0 + k, last_row)
                        return tuple(
                            mt_update([tri_ref[row, 16 * g + c]
                                       for c in range(13)], True, sts[g])
                            for g in range(G))
                else:
                    nit = (r1 - r0 + G - 1) // G

                    def leaf_bodyG(k, sts):
                        i0_ = r0 + G * k
                        out = []
                        for g in range(G):
                            ig = i0_ + g
                            guard = True if g == 0 else ig < r1
                            out.append(tri_test(
                                jnp.minimum(ig, max_tri_row), guard,
                                sts[g]))
                        return tuple(out)

                init = ((closest, bm, bnx, bny, bnz, blk),) + tuple(
                    (closest, i0, f0, f0, f0, f0) for _ in range(G - 1))
                sts = lax.fori_loop(0, nit, leaf_bodyG, init)
                cl, m, nx_, ny_, nz_, blk = sts[0]
                for g in range(1, G):
                    clg, mg, nxg, nyg, nzg, blkg = sts[g]
                    sel = clg < cl
                    cl = jnp.where(sel, clg, cl)
                    m = jnp.where(sel, mg, m)
                    nx_ = jnp.where(sel, nxg, nx_)
                    ny_ = jnp.where(sel, nyg, ny_)
                    nz_ = jnp.where(sel, nzg, nz_)
                    blk = jnp.maximum(blk, blkg)
                return cl, m, nx_, ny_, nz_, blk

            def leaf_branch(a):
                # an un-entered range is empty (r0 == r1): zero-trip fori
                for r0, r1, _ in ranges:
                    a = run_chains(a, r0, r1)
                return a

            anylb = lbs[0]
            for lb in lbs[1:]:
                anylb = anylb | lb
            closest, bm, bnx, bny, bnz, blkd = lax.cond(
                anylb != 0, leaf_branch, lambda a: a,
                (closest, bm, bnx, bny, bnz, blkd))
            nv = nv + npop
            for (r0, r1, idl), lb in zip(ranges, lbs):
                nt = nt + jnp.where(lb != 0, r1 - r0, 0)
                ni = ni + jnp.where(lb != 0, idl, 0)
            return sp, closest, bm, bnx, bny, bnz, blkd, nv, nt, ni

        (_, closest, bm, bnx, bny, bnz, blkd, nv, nt, ni) = lax.while_loop(
            cond, body, (sp0, closest0, i0, f0, f0, f0, f0,
                         jnp.int32(0), jnp.int32(0), jnp.int32(0)))
        hitm = jnp.where(act & (closest < tmax_f), 1.0, 0.0)
        # face flip + front flag once per wave (raw normal tracked in-loop)
        front_b = (dx * bnx + dy * bny + dz * bnz) < 0.0
        sgn = jnp.where(front_b, 1.0, -1.0)
        out = (hitm, closest, bm, sgn * bnx, sgn * bny, sgn * bnz,
               jnp.where(front_b, 1.0, 0.0))
        if n_sph or n_quads:
            selp = (hitm_p > 0.5) & (bt_p <= closest)
            out = (jnp.where(selp, 1.0, out[0]),
                   jnp.where(selp, bt_p, out[1]),
                   jnp.where(selp, bm_p, out[2]),
                   jnp.where(selp, pnx, out[3]),
                   jnp.where(selp, pny, out[4]),
                   jnp.where(selp, pnz, out[5]),
                   jnp.where(selp, pfr, out[6]))
        if with_shadow:
            if n_sph or n_quads:
                blkd = jnp.maximum(blkd, _prim_shadow(sox, soy, soz,
                                                      pot, tm=tm))
            # chain fuse cannot split extension/shadow scan counts
            return out + (blkd, nv, nt, ni, jnp.int32(0), jnp.int32(0))
        return out + (nv, nt, ni)

    def _sun_blocked(sox, soy, soz, pot, tm=None):
        """Any-hit along the (uniform) sun direction for `pot` lanes,
        wide-stack form.  The Moller-Trumbore p-vector and determinant
        are per-triangle scalars (direction uniform).  The walk parks
        (sp -> 0) once every potential receiver is occluded."""
        inv_sx = 1.0 / sdx
        inv_sy = 1.0 / sdy
        inv_sz = 1.0 / sdz
        ones = jnp.ones(shape, jnp.float32)
        ros = (sox, soy, soz)
        invs = (inv_sx * ones, inv_sy * ones, inv_sz * ones)
        sc0 = jnp.where(pot, tmax_f, tmin_f)

        if ordered:
            # uniform direction: octant from scalar signs, zero reduces
            octant = ((sdx < 0.0).astype(jnp.int32)
                      + 2 * (sdy < 0.0).astype(jnp.int32)
                      + 4 * (sdz < 0.0).astype(jnp.int32))
        else:
            octant = None

        stack_ref[0] = jnp.int32(0)
        sp0 = jnp.where(jnp.any(pot), jnp.int32(1), jnp.int32(0))

        def cond(c):
            return c[0] > 0

        def body(c):
            sp, sc, blocked, nv, nt = c
            # the sun walk averages ~2 visits/wave-iteration: a full
            # POPS-wide pop pipeline burns (POPS-2) masked pops' box
            # vector work per iteration (sweep50k8 'sunwalk' = 15 ms of
            # a 150 ms ISS frame before this) — walk narrow instead
            sp, ranges, npop, lbs, _rs, _rh = _multi_pop_visit(
                sp, [(ros, invs, sc)], octant, npops=sun_pops)

            def mt_update(fields, guard, st):
                sc, blocked = st
                (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z) = fields
                pvx = sdy * e2z - sdz * e2y   # scalar
                pvy = sdz * e2x - sdx * e2z
                pvz = sdx * e2y - sdy * e2x
                det = e1x * pvx + e1y * pvy + e1z * pvz
                ok0 = jnp.abs(det) >= 1e-8
                inv_det = 1.0 / jnp.where(ok0, det, 1.0)
                tvx = sox - v0x
                tvy = soy - v0y
                tvz = soz - v0z
                u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                ok = ok0 & (u >= 0.0) & (u <= 1.0)
                qvx = tvy * e1z - tvz * e1y
                qvy = tvz * e1x - tvx * e1z
                qvz = tvx * e1y - tvy * e1x
                v = (sdx * qvx + sdy * qvy + sdz * qvz) * inv_det
                ok = ok & (v >= 0.0) & (u + v <= 1.0)
                t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                ok = ok & (t >= tmin_f) & (t <= sc) & guard
                sc = jnp.where(ok, tmin_f, sc)  # any-hit collapse
                blocked = jnp.where(ok, 1.0, blocked)
                return sc, blocked

            def tri_test(row, guard, st):
                return mt_update(_load_many(tri_ref, row, range(9),
                                            packed), guard, st)

            def run_chains(a, r0, r1):
                # strided multi-chain (see _closest_hit.run_chains),
                # phase-aligned static-lane loads in packed mode
                G = LEAF_CHAINS

                if packed and G == 8:
                    b0 = r0 // 8
                    nit = (r1 + 7) // 8 - b0
                    last_row = tri_ref.shape[0] - 1

                    def leaf_bodyG(k, sts):
                        row = jnp.minimum(b0 + k, last_row)
                        return tuple(
                            mt_update([tri_ref[row, 16 * g + c]
                                       for c in range(9)], True, sts[g])
                            for g in range(G))
                else:
                    nit = (r1 - r0 + G - 1) // G

                    def leaf_bodyG(k, sts):
                        i0_ = r0 + G * k
                        out = []
                        for g in range(G):
                            ig = i0_ + g
                            guard = True if g == 0 else ig < r1
                            out.append(tri_test(
                                jnp.minimum(ig, max_tri_row), guard,
                                sts[g]))
                        return tuple(out)

                sc, blocked = a
                init = ((sc, blocked),) + tuple(
                    (sc, f0) for _ in range(G - 1))
                sts = lax.fori_loop(0, nit, leaf_bodyG, init)
                scm, blk = sts[0]
                for g in range(1, G):
                    scm = jnp.minimum(scm, sts[g][0])
                    blk = jnp.maximum(blk, sts[g][1])
                return scm, blk

            if hbm:
                # HBM mode: occlusion-test DMA'd tile windows (same MT
                # columns as the defer-mode shadow_tile; boundary-extra
                # tiles are real scene triangles, and a real
                # intersection inside [t_min, sc] is a true occluder
                # whichever leaf it came from)
                max_tile_s = tile_ref.shape[0] - 1

                def shadow_tile_w(W, blocked, sc):
                    v0x, v0y, v0z = W[:, 0:1], W[:, 1:2], W[:, 2:3]
                    e1x, e1y, e1z = W[:, 3:4], W[:, 4:5], W[:, 5:6]
                    e2x, e2y, e2z = W[:, 6:7], W[:, 7:8], W[:, 8:9]
                    spvx = sdy * e2z - sdz * e2y      # (8,1) columns
                    spvy = sdz * e2x - sdx * e2z
                    spvz = sdx * e2y - sdy * e2x
                    sdet = e1x * spvx + e1y * spvy + e1z * spvz
                    sok0 = jnp.abs(sdet) >= 1e-8
                    sinv = 1.0 / jnp.where(sok0, sdet, 1.0)
                    hit_rows = []
                    for r in range(n_rows):
                        stx = sox[r:r + 1, :] - v0x
                        sty = soy[r:r + 1, :] - v0y
                        stz = soz[r:r + 1, :] - v0z
                        su = (stx * spvx + sty * spvy
                              + stz * spvz) * sinv
                        ok = sok0 & (su >= 0.0)
                        sqx = sty * e1z - stz * e1y
                        sqy = stz * e1x - stx * e1z
                        sqz = stx * e1y - sty * e1x
                        sv_ = (sdx * sqx + sdy * sqy + sdz * sqz) * sinv
                        ok = ok & (sv_ >= 0.0) & (su + sv_ <= 1.0)
                        st_ = (e2x * sqx + e2y * sqy + e2z * sqz) * sinv
                        ok = ok & (st_ >= tmin_f) & (st_ <= sc[r:r + 1, :])
                        hit_rows.append(jnp.max(jnp.where(ok, 1.0, 0.0),
                                                axis=0, keepdims=True))
                    return jnp.maximum(blocked,
                                       jnp.concatenate(hit_rows, axis=0))

                def leaf_branch(a):
                    sc, blocked = a
                    wins = _leaf_windows(ranges)
                    for p, ((r0, r1, _), (gs, cps)) in enumerate(
                            zip(ranges, wins)):
                        @pl.when(r1 > r0)
                        def _wait(cp=cps[0]):
                            cp.wait()

                        tile0 = r0 // 8
                        ntiles = (r1 + 7) // 8 - tile0
                        n_it = (ntiles + 1) // 2 if leaf_tail == "pad" \
                            else ntiles // 2

                        def tb(k, blocked, tile0=tile0, p=p, gs=gs):
                            t0_ = jnp.minimum(tile0 + 2 * k, max_tile_s)
                            t1_ = jnp.minimum(tile0 + 2 * k + 1,
                                              max_tile_s)
                            W0 = _tile_fetch(t0_, (p, gs))
                            W1 = _tile_fetch(t1_, (p, gs))
                            return shadow_tile_w(
                                W1, shadow_tile_w(W0, blocked, sc), sc)

                        blocked = lax.fori_loop(0, n_it, tb, blocked)
                        if leaf_tail != "pad":
                            # single-tile tail (leaf_tail "cond"/"single")
                            def tl(blocked, tile0=tile0, p=p, gs=gs,
                                   n_it=n_it):
                                t0_ = jnp.minimum(tile0 + 2 * n_it,
                                                  max_tile_s)
                                return shadow_tile_w(
                                    _tile_fetch(t0_, (p, gs)), blocked,
                                    sc)

                            blocked = lax.cond(ntiles != 2 * n_it, tl,
                                               lambda b: b, blocked)
                    # any-hit collapse so the park check sees occluded
                    # lanes (the chain engine collapses per accept)
                    sc = jnp.where(blocked > 0.5, tmin_f, sc)
                    return sc, blocked
            else:
                def leaf_branch(a):
                    for r0, r1, _ in ranges:
                        a = run_chains(a, r0, r1)
                    return a

            anylb = lbs[0]
            for lb in lbs[1:]:
                anylb = anylb | lb
            sc, blocked = lax.cond(anylb != 0, leaf_branch,
                                   lambda a: a, (sc, blocked))
            nv = nv + npop
            for (r0, r1, _), lb in zip(ranges, lbs):
                nt = nt + jnp.where(lb != 0, r1 - r0, 0)
            # park once every potential receiver is occluded
            open_lanes = jnp.any(sc > tmin_f)
            sp = jnp.where(open_lanes, sp, 0)
            return sp, sc, blocked, nv, nt

        _, _, blocked, nv, nt = lax.while_loop(
            cond, body, (sp0, sc0, f0, jnp.int32(0), jnp.int32(0)))
        if n_sph or n_quads:
            blocked = jnp.maximum(blocked, _prim_shadow(sox, soy, soz,
                                                        pot, tm=tm))
        return blocked > 0.5, nv, nt

    def _sphere_quad_pass(ox, oy, oz, dx, dy, dz, act,
                          hitm, bt, bm, bnx, bny, bnz, bfr,
                          aux=None, tm=None):
        """Sequential sphere then quad loops after the BVH result, the
        exact split-path semantics (ops/trace.py sphere_pass/quad_pass:
        `<=` tie acceptance so a later primitive wins, per-primitive
        face flip, scene_hit order src/gpu_render.cu:509-551).  `aux`
        is the (iu, iv, btex) triple on shaded walks (primitive hits
        reset the texture id).  With per-lane `tm`, moving centers
        evaluate at c0 + tm*(c2-c0) (inc/sphere.h:143-146).  SMEM
        layouts: sph_ref [cx cy cz r mat c2x c2y c2z] x n_sph; quad_ref
        [q(3) u(3) v(3) n(3) w(3) d area mat] x n_quads."""
        closest = bt
        a = dx * dx + dy * dy + dz * dz
        for i in range(n_sph):
            cx = sph_ref[8 * i]
            cy = sph_ref[8 * i + 1]
            cz = sph_ref[8 * i + 2]
            r = sph_ref[8 * i + 3]
            mid = sph_ref[8 * i + 4].astype(jnp.int32)
            if motion_on and tm is not None:
                cx = cx + tm * (sph_ref[8 * i + 5] - cx)
                cy = cy + tm * (sph_ref[8 * i + 6] - cy)
                cz = cz + tm * (sph_ref[8 * i + 7] - cz)
            ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
            half_b = ocx * dx + ocy * dy + ocz * dz
            cq = ocx * ocx + ocy * ocy + ocz * ocz - r * r
            disc = half_b * half_b - a * cq
            has = disc >= 0.0
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            root1 = (-half_b - sq) / a
            root2 = (-half_b + sq) / a
            r1ok = (root1 >= tmin_f) & (root1 <= closest)
            root = jnp.where(r1ok, root1, root2)
            ok = has & (root >= tmin_f) & (root <= closest) & act
            inv_r = 1.0 / jnp.where(r != 0, r, 1.0)
            nx = (ox + root * dx - cx) * inv_r
            ny = (oy + root * dy - cy) * inv_r
            nz = (oz + root * dz - cz) * inv_r
            front = (dx * nx + dy * ny + dz * nz) < 0.0
            sgn = jnp.where(front, 1.0, -1.0)
            hitm = jnp.where(ok, 1.0, hitm)
            bt = jnp.where(ok, root, bt)
            bm = jnp.where(ok, mid, bm)
            bnx = jnp.where(ok, sgn * nx, bnx)
            bny = jnp.where(ok, sgn * ny, bny)
            bnz = jnp.where(ok, sgn * nz, bnz)
            bfr = jnp.where(ok, jnp.where(front, 1.0, 0.0), bfr)
            if aux is not None:
                aux = (jnp.where(ok, 0.0, aux[0]),
                       jnp.where(ok, 0.0, aux[1]),
                       jnp.where(ok, -1.0, aux[2]))
            closest = jnp.where(ok, root, closest)
        for i in range(n_quads):
            b = 18 * i
            qnx, qny, qnz = (quad_ref[b + 9], quad_ref[b + 10],
                             quad_ref[b + 11])
            denom = dx * qnx + dy * qny + dz * qnz
            okq = jnp.abs(denom) >= 1e-8
            t = (quad_ref[b + 15]
                 - (ox * qnx + oy * qny + oz * qnz)) / jnp.where(
                     okq, denom, 1.0)
            okq = okq & (t >= tmin_f) & (t <= closest) & act
            px_ = ox + t * dx - quad_ref[b]
            py_ = oy + t * dy - quad_ref[b + 1]
            pz_ = oz + t * dz - quad_ref[b + 2]
            uex, uey, uez = quad_ref[b + 3], quad_ref[b + 4], quad_ref[b + 5]
            vex, vey, vez = quad_ref[b + 6], quad_ref[b + 7], quad_ref[b + 8]
            wx, wy, wz = quad_ref[b + 12], quad_ref[b + 13], quad_ref[b + 14]
            cx_ = py_ * vez - pz_ * vey
            cy_ = pz_ * vex - px_ * vez
            cz_ = px_ * vey - py_ * vex
            alpha = wx * cx_ + wy * cy_ + wz * cz_
            cx_ = uey * pz_ - uez * py_
            cy_ = uez * px_ - uex * pz_
            cz_ = uex * py_ - uey * px_
            beta = wx * cx_ + wy * cy_ + wz * cz_
            okq = okq & (alpha >= 0.0) & (alpha <= 1.0) \
                & (beta >= 0.0) & (beta <= 1.0)
            front = denom < 0.0
            sgn = jnp.where(front, 1.0, -1.0)
            mid = quad_ref[b + 17].astype(jnp.int32)
            hitm = jnp.where(okq, 1.0, hitm)
            bt = jnp.where(okq, t, bt)
            bm = jnp.where(okq, mid, bm)
            bnx = jnp.where(okq, sgn * qnx, bnx)
            bny = jnp.where(okq, sgn * qny, bny)
            bnz = jnp.where(okq, sgn * qnz, bnz)
            bfr = jnp.where(okq, jnp.where(front, 1.0, 0.0), bfr)
            if aux is not None:
                aux = (jnp.where(okq, 0.0, aux[0]),
                       jnp.where(okq, 0.0, aux[1]),
                       jnp.where(okq, -1.0, aux[2]))
            closest = jnp.where(okq, t, closest)
        if aux is not None:
            return hitm, bt, bm, bnx, bny, bnz, bfr, aux
        return hitm, bt, bm, bnx, bny, bnz, bfr

    def _prim_shadow(sox, soy, soz, pot, tm=None):
        """Sphere/quad any-hit along the uniform sun direction (the
        split path shadows against the whole scene via scene_hit,
        ops/shade.py:296-300).  Moving centers evaluate at the lane's
        shutter time `tm` (shadow rays share the sample's time)."""
        occ = jnp.zeros(shape, jnp.float32)
        a = sdx * sdx + sdy * sdy + sdz * sdz   # scalar
        for i in range(n_sph):
            cx = sph_ref[8 * i]
            cy = sph_ref[8 * i + 1]
            cz = sph_ref[8 * i + 2]
            r = sph_ref[8 * i + 3]
            if motion_on and tm is not None:
                cx = cx + tm * (sph_ref[8 * i + 5] - cx)
                cy = cy + tm * (sph_ref[8 * i + 6] - cy)
                cz = cz + tm * (sph_ref[8 * i + 7] - cz)
            ocx, ocy, ocz = sox - cx, soy - cy, soz - cz
            half_b = ocx * sdx + ocy * sdy + ocz * sdz
            cq = ocx * ocx + ocy * ocy + ocz * ocz - r * r
            disc = half_b * half_b - a * cq
            has = disc >= 0.0
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            root1 = (-half_b - sq) / a
            root2 = (-half_b + sq) / a
            r1ok = (root1 >= tmin_f) & (root1 <= tmax_f)
            root = jnp.where(r1ok, root1, root2)
            ok = has & (root >= tmin_f) & (root <= tmax_f) & pot
            occ = jnp.where(ok, 1.0, occ)
        for i in range(n_quads):
            b = 18 * i
            qnx, qny, qnz = (quad_ref[b + 9], quad_ref[b + 10],
                             quad_ref[b + 11])
            denom = sdx * qnx + sdy * qny + sdz * qnz   # scalar
            okq = jnp.abs(denom) >= 1e-8
            t = (quad_ref[b + 15]
                 - (sox * qnx + soy * qny + soz * qnz)) / jnp.where(
                     okq, denom, 1.0)
            okq = okq & (t >= tmin_f) & (t <= tmax_f) & pot
            px_ = sox + t * sdx - quad_ref[b]
            py_ = soy + t * sdy - quad_ref[b + 1]
            pz_ = soz + t * sdz - quad_ref[b + 2]
            uex, uey, uez = quad_ref[b + 3], quad_ref[b + 4], quad_ref[b + 5]
            vex, vey, vez = quad_ref[b + 6], quad_ref[b + 7], quad_ref[b + 8]
            wx, wy, wz = quad_ref[b + 12], quad_ref[b + 13], quad_ref[b + 14]
            cx_ = py_ * vez - pz_ * vey
            cy_ = pz_ * vex - px_ * vez
            cz_ = px_ * vey - py_ * vex
            alpha = wx * cx_ + wy * cy_ + wz * cz_
            cx_ = uey * pz_ - uez * py_
            cy_ = uez * px_ - uex * pz_
            cz_ = uex * py_ - uey * px_
            beta = wx * cx_ + wy * cy_ + wz * cz_
            okq = okq & (alpha >= 0.0) & (alpha <= 1.0) \
                & (beta >= 0.0) & (beta <= 1.0)
            occ = jnp.where(okq, 1.0, occ)
        return occ

    # MTL-heavy scenes (hundreds of material rows): one MXU one-hot
    # gather resolves ALL 16 material columns of a wave's per-lane ids
    # at once — (16, Np) @ (Np, 128) per ray row — instead of an
    # O(n_mats) serial select chain (or fori_loop) PER FIELD per wave
    # (ADVICE r3 / VERDICT r4 item 9; the same one-hot-matmul pattern
    # as the texture-pool gather).  Exact: each output column is a dot
    # with exactly one nonzero 1.0 term.  The trace-time cache keys on
    # the id of the per-lane id array, so the ~14 shading-site fetches
    # share one gather.
    _mat_plane_cache = {}

    def _mat_planes(bm):
        key = id(bm)
        if key not in _mat_plane_cache:
            Np = matT_ref.shape[1]
            bmi = bm.astype(jnp.int32)
            row_cols = []
            for r in range(bm.shape[0]):
                onehotT = (jax.lax.broadcasted_iota(
                    jnp.int32, (Np, TILE_W), 0)
                    == bmi[r:r + 1, :]).astype(jnp.float32)
                row_cols.append(jax.lax.dot_general(
                    matT_ref[...], onehotT, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST))  # (16, 128)
            _mat_plane_cache[key] = tuple(
                jnp.concatenate([rc[f:f + 1, :] for rc in row_cols],
                                axis=0)
                for f in range(16))
        return _mat_plane_cache[key]

    def _mat_field(bm, col):
        """Per-lane material scalar resolve.  Static unroll while the
        material table is small (the common case — the select chain
        folds into the surrounding vector code); past 32 rows the MXU
        one-hot gather takes over (all 16 columns per bm, cached)."""
        if n_mats <= 32:
            out = jnp.zeros(shape, jnp.float32)
            for m in range(n_mats):
                out = jnp.where(bm == m, mat_ref[m, col], out)
            return out
        return _mat_planes(bm)[col]

    # ---------------- the persistent wave loop -------------------------

    def wave_cond(c):
        alive = c[7] > 0.5
        scnt = c[9]
        more = jnp.any(alive) | jnp.any(valid & (scnt < spp))
        if fuse:
            # pending shadow rays / deferred bankings still to resolve
            more = more | jnp.any(c[16][0] > 0.5) | jnp.any(c[17] > 0.5)
        return more

    def wave_body(c):
        (acc_r, acc_g, acc_b, Lr, Lg, Lb, thr3, alive_f, state, scnt,
         depth, ro3, rd3, nrays, _waves, stat4) = c[:16]
        cvis, ctst, svis, stst, cidl = stat4
        thr_r, thr_g, thr_b = thr3
        rox, roy, roz = ro3
        rdx, rdy, rdz = rd3
        alive = alive_f > 0.5
        if fuse:
            (pend_f, pcr, pcg, pcb, pox, poy, poz), defer_f = c[16], c[17]
            defer = defer_f > 0.5
            pot = pend_f > 0.5
        # per-lane shutter time (carried last so the fuse indices hold)
        tm = c[-1] if motion_on else None

        # ---- regeneration: idle lanes start their next sample ----------
        need = valid & ~alive & (scnt < spp)
        if fuse:
            # a lane that died with a pending shadow banks next wave
            # (after resolution) and only then regenerates
            need = need & ~defer
        if regen_thresh < 1.0:
            # batch primary rays into coherent waves: hold idle lanes
            # until the live fraction drops below the threshold (a scalar
            # gate — the per-lane draw schedule is untouched, so streams
            # stay bit-identical; only wave timing changes)
            livef = jnp.sum(jnp.where(alive, 1.0, 0.0))
            totalf = jnp.maximum(jnp.sum(jnp.where(valid, 1.0, 0.0)), 1.0)
            need = need & (livef < jnp.float32(regen_thresh) * totalf)
        if "gluereg" in dup_set:         # perf triage: 2x regen math
            jxu2, st_a = _draw(state, need)
            jyu2, _ = _draw(st_a, need)
        jxu, state = _draw(state, need)
        jyu, state = _draw(state, need)
        if "gluereg" in dup_set:
            jxu = jnp.minimum(jxu, jxu2)
            jyu = jnp.minimum(jyu, jyu2)
        sf = scnt.astype(jnp.float32)
        jx = (sf + jxu) / spp_f
        jy = (sf + jyu) / spp_f
        u = (pxf + jx) * inv_w1
        v = (pyf + jy) * inv_h1
        crx = ll[0] + u * hz[0] + v * vt[0] - cam_ox
        cry = ll[1] + u * hz[1] + v * vt[1] - cam_oy
        crz = ll[2] + u * hz[2] + v * vt[2] - cam_oz
        if "gluereg" in dup_set:
            u2 = (pxf + (sf + jxu2) / spp_f) * inv_w1
            v2 = (pyf + (sf + jyu2) / spp_f) * inv_h1
            crx = jnp.minimum(crx, ll[0] + u2 * hz[0] + v2 * vt[0]
                              - cam_ox)
            cry = jnp.minimum(cry, ll[1] + u2 * hz[1] + v2 * vt[1]
                              - cam_oy)
            crz = jnp.minimum(crz, ll[2] + u2 * hz[2] + v2 * vt[2]
                              - cam_oz)
        if aperture_on:
            # thin-lens DOF (ops/camera.generate_rays_dof in-kernel,
            # inc/camera.h:35-61): lens offset = lens_radius * disk
            # sample on the camera (u, v) basis; draws ride the same
            # masked schedule as the split path (after the jitter pair)
            ldx, ldy, state = _rand_in_unit_disk(state, need)
            lrx = cam_ref[18] * ldx
            lry = cam_ref[18] * ldy
            offx = cam_ref[12] * lrx + cam_ref[15] * lry
            offy = cam_ref[13] * lrx + cam_ref[16] * lry
            offz = cam_ref[14] * lrx + cam_ref[17] * lry
            rox = jnp.where(need, cam_ox + offx, rox)
            roy = jnp.where(need, cam_oy + offy, roy)
            roz = jnp.where(need, cam_oz + offz, roz)
            rdx = jnp.where(need, crx - offx, rdx)
            rdy = jnp.where(need, cry - offy, rdy)
            rdz = jnp.where(need, crz - offz, rdz)
        else:
            rox = jnp.where(need, cam_ox, rox)
            roy = jnp.where(need, cam_oy, roy)
            roz = jnp.where(need, cam_oz, roz)
            rdx = jnp.where(need, crx, rdx)
            rdy = jnp.where(need, cry, rdy)
            rdz = jnp.where(need, crz, rdz)
        if motion_on:
            # camera shutter: ONE draw after jitter/aperture, held for
            # the whole path incl. shadow rays (render.py sample_body,
            # inc/sphere.h:143-146 center-as-ray semantics)
            ut, state = _draw(state, need)
            tm = jnp.where(need,
                           jnp.float32(time0)
                           + ut * jnp.float32(time1 - time0), tm)
        Lr = jnp.where(need, 0.0, Lr)
        Lg = jnp.where(need, 0.0, Lg)
        Lb = jnp.where(need, 0.0, Lb)
        thr_r = jnp.where(need, 1.0, thr_r)
        thr_g = jnp.where(need, 1.0, thr_g)
        thr_b = jnp.where(need, 1.0, thr_b)
        depth = jnp.where(need, 0, depth)
        scnt = scnt + need.astype(jnp.int32)
        alive = alive | need
        alive_in = alive

        # ---- 0. Russian roulette (src/gpu_render.cu:727-738) -----------
        rr_mask = alive & (depth >= rr_start)
        if "rr" in dup_set:              # perf triage: 2x the RR stage
            u_rr2, _ = _draw(state, rr_mask)
        u_rr, state = _draw(state, rr_mask)
        if "rr" in dup_set:
            u_rr = jnp.minimum(u_rr, u_rr2)
        p_rr = jnp.minimum(jnp.maximum(thr_r, jnp.maximum(thr_g, thr_b)),
                           jnp.float32(rr_max_p))
        killed = rr_mask & (u_rr > p_rr)
        alive = alive & ~killed
        scale = rr_mask & ~killed
        inv_p = 1.0 / jnp.where(p_rr > 0, p_rr, 1.0)
        thr_r = jnp.where(scale, thr_r * inv_p, thr_r)
        thr_g = jnp.where(scale, thr_g * inv_p, thr_g)
        thr_b = jnp.where(scale, thr_b * inv_p, thr_b)
        if "rr" in dup_set:
            p_rr2 = jnp.minimum(jnp.maximum(thr_r,
                                            jnp.maximum(thr_g, thr_b)),
                                jnp.float32(rr_max_p))
            inv_p2 = 1.0 / jnp.where(p_rr2 > 0, p_rr2, 1.0)
            thr_r = jnp.minimum(thr_r, thr_r * jnp.where(scale, 1.0,
                                                         inv_p2 * 0 + 1))
            thr_g = jnp.minimum(thr_g, thr_g + inv_p2 * 0)
            thr_b = jnp.minimum(thr_b, thr_b + inv_p2 * 0)

        # ---- 1. closest hit (+ deferred sun-shadow resolution) ---------
        nrays = nrays + jnp.sum(jnp.where(alive, 1, 0))
        if fuse:
            nrays = nrays + jnp.sum(jnp.where(pot, 1, 0))
            (hitm_f, bt, bm, nx, ny, nz, bfr, blkd_f, cv_, ct_,
             ci_, sv_, st_) = _closest_hit(rox, roy, roz, rdx, rdy, rdz,
                                           alive, pox, poy, poz, pot,
                                           tm=tm)
            svis = svis + sv_
            stst = stst + st_
            # resolve LAST wave's sun MIS (contribution precomputed at
            # shade time; the occlusion verdict is what was outstanding)
            unb = pot & ~(blkd_f > 0.5)
            Lr = jnp.where(unb, Lr + pcr, Lr)
            Lg = jnp.where(unb, Lg + pcg, Lg)
            Lb = jnp.where(unb, Lb + pcb, Lb)
            # bank lanes that died last wave holding a pending shadow —
            # their clamp01(L) had to wait for the sun term
            acc_r = jnp.where(defer, acc_r + jnp.clip(Lr, 0.0, 1.0), acc_r)
            acc_g = jnp.where(defer, acc_g + jnp.clip(Lg, 0.0, 1.0), acc_g)
            acc_b = jnp.where(defer, acc_b + jnp.clip(Lb, 0.0, 1.0), acc_b)
        elif shaded:
            (hitm_f, bt, bm, nx, ny, nz, bfr, biu, biv, btex, cv_, ct_,
             ci_) = _closest_hit(rox, roy, roz, rdx, rdy, rdz, alive,
                                 tm=tm)
        else:
            hitm_f, bt, bm, nx, ny, nz, bfr, cv_, ct_, ci_ = _closest_hit(
                rox, roy, roz, rdx, rdy, rdz, alive, tm=tm)
        cvis = cvis + cv_
        ctst = ctst + ct_
        cidl = cidl + ci_
        hitm = hitm_f > 0.5

        if n_med > 0:
            # ---- probabilistic constant-medium hits (inc/constant_
            # medium.h:20-53 semantics; exact mirror of ops/trace.py
            # media_pass incl. its one-draw-per-medium-per-wave masked
            # schedule, so LCG streams stay bit-identical to the split
            # path).  Runs AFTER every surface pass (tris + pre-walk
            # primitives) — e1 clips at the current closest, and later
            # media see earlier media's accepts (sequential fold).
            bmed = jnp.full(shape, -1, jnp.int32)
            a_rd = rdx * rdx + rdy * rdy + rdz * rdz
            rlen = jnp.sqrt(a_rd)
            for i in range(n_med):
                mb = 15 * i
                kind = med_ref[mb]
                mcx = med_ref[mb + 1]
                mcy = med_ref[mb + 2]
                mcz = med_ref[mb + 3]
                mr = med_ref[mb + 4]
                ocx, ocy, ocz = rox - mcx, roy - mcy, roz - mcz
                half_b = ocx * rdx + ocy * rdy + ocz * rdz
                cq = ocx * ocx + ocy * ocy + ocz * ocz - mr * mr
                disc = half_b * half_b - a_rd * cq
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                s_has = disc > 0.0
                s_t0 = (-half_b - sq) / a_rd
                s_t1 = (-half_b + sq) / a_rd
                bt0 = jnp.full(shape, -3e38)
                bt1 = jnp.full(shape, 3e38)
                for ax, (o_, d_) in enumerate(((rox, rdx), (roy, rdy),
                                               (roz, rdz))):
                    inv = 1.0 / d_
                    ta = (med_ref[mb + 5 + ax] - o_) * inv
                    tb = (med_ref[mb + 8 + ax] - o_) * inv
                    bt0 = jnp.maximum(bt0, jnp.minimum(ta, tb))
                    bt1 = jnp.minimum(bt1, jnp.maximum(ta, tb))
                b_has = bt1 > bt0
                is_sph = kind == 0.0
                has = jnp.where(is_sph, jnp.where(s_has, 1.0, 0.0),
                                jnp.where(b_has, 1.0, 0.0)) > 0.5
                mt0 = jnp.where(is_sph, s_t0, bt0)
                mt1 = jnp.where(is_sph, s_t1, bt1)
                e0 = jnp.maximum(mt0, tmin_f)
                e1 = jnp.minimum(mt1, bt)
                inside = has & (e0 < e1) & alive
                u_m, state = _draw(state, alive)
                dist_inside = (e1 - e0) * rlen
                neg_inv_d = med_ref[mb + 11]
                hit_dist = neg_inv_d * jnp.log(jnp.maximum(u_m, 1e-30))
                okm = inside & (hit_dist <= dist_inside)
                t_m = e0 + hit_dist / jnp.maximum(rlen, 1e-30)
                bt = jnp.where(okm, t_m, bt)
                hitm = hitm | okm
                bmed = jnp.where(okm, i, bmed)

        def _pool_fetch(pidx):
            return _pool_fetch_rows_ref(texT_ref, pidx, n_rows,
                                        tex_chunk)

        if env_id >= 0:
            # environment-map sky (extension; ops/textures.py sample_env
            # in-kernel): miss lanes pick up throughput * env(dir)
            # instead of dying black.  Runs under an any-miss scalar
            # branch; the equirect header is read at the STATIC env_id.
            missm = alive & ~hitm

            def env_branch(Ls):
                # atan2f/acosf: the shared polynomial forms (Mosaic has
                # no atan2/acos lowering; all paths use one formula)
                from dsrt_tpu.ops.textures import acosf, atan2f
                Lr_, Lg_, Lb_ = Ls
                inv = 1.0 / jnp.sqrt(jnp.maximum(
                    rdx * rdx + rdy * rdy + rdz * rdz, 1e-20))
                two_pi = 2.0 * math.pi
                u = (atan2f(rdz * inv, rdx * inv)
                     / jnp.float32(two_pi) + jnp.float32(0.5)
                     + jnp.float32(env_rot / two_pi))
                v = 1.0 - acosf(jnp.clip(rdy * inv, -1.0, 1.0)) \
                    / jnp.float32(math.pi)
                v = jnp.clip(v, 0.0, 1.0 - 1e-6)
                hs = 4 if tiled else 3
                wt = hdr_ref[hs * env_id]
                ht = hdr_ref[hs * env_id + 1]
                ot = hdr_ref[hs * env_id + 2]
                uu = u - jnp.floor(u)
                it = (uu * jnp.float32(wt - 1)).astype(jnp.int32)
                jt = ((1.0 - v) * jnp.float32(ht - 1)).astype(jnp.int32)
                if tiled:
                    # 32x32-tiled pool addressing (same texel values):
                    # tile-row-major tiles, row-major texels within
                    twt = hdr_ref[4 * env_id + 3]
                    pidx = (ot + (((jt >> 5) * twt + (it >> 5)) << 10)
                            + ((jt & 31) << 5) + (it & 31))
                else:
                    pidx = ot + jt * wt + it
                Rp = texT_ref.shape[1] // 3
                npl = Rp * TILE_W
                oke = (pidx >= 0) & (pidx < npl)
                tr, tg, tb = _pool_fetch(jnp.clip(pidx, 0, npl - 1))
                s = jnp.float32(env_scale)
                er = jnp.where(oke, tr, 1.0) * s
                eg = jnp.where(oke, tg, 1.0) * s
                eb = jnp.where(oke, tb, 1.0) * s
                return (jnp.where(missm, Lr_ + thr_r * er, Lr_),
                        jnp.where(missm, Lg_ + thr_g * eg, Lg_),
                        jnp.where(missm, Lb_ + thr_b * eb, Lb_))

            Lr, Lg, Lb = lax.cond(jnp.any(missm), env_branch,
                                  lambda a: a, (Lr, Lg, Lb))

        alive = alive & hitm            # miss -> black background, dies
        px_ = rox + bt * rdx
        py_ = roy + bt * rdy
        pz_ = roz + bt * rdz

        if n_med > 0:
            # ---- isotropic in-medium scatter (ops/shade.py medium
            # branch; draw schedule identical: one rejection-sampler
            # call masked to the scattering lanes) --------------------
            med_mask = alive & (bmed >= 0)
            mar = jnp.zeros(shape, jnp.float32)
            mag = jnp.zeros(shape, jnp.float32)
            mab = jnp.zeros(shape, jnp.float32)
            for i in range(n_med):
                sel = bmed == i
                mar = jnp.where(sel, med_ref[15 * i + 12], mar)
                mag = jnp.where(sel, med_ref[15 * i + 13], mag)
                mab = jnp.where(sel, med_ref[15 * i + 14], mab)
            (umx, umy, umz), state = _rand_in_unit_sphere(state, med_mask)
            dmx, dmy, dmz = _normalize3(umx, umy, umz)
            thr_r = jnp.where(med_mask, thr_r * mar, thr_r)
            thr_g = jnp.where(med_mask, thr_g * mag, thr_g)
            thr_b = jnp.where(med_mask, thr_b * mab, thr_b)
            rox = jnp.where(med_mask, px_, rox)
            roy = jnp.where(med_mask, py_, roy)
            roz = jnp.where(med_mask, pz_, roz)
            rdx = jnp.where(med_mask, dmx, rdx)
            rdy = jnp.where(med_mask, dmy, rdy)
            rdz = jnp.where(med_mask, dmz, rdz)

        mtype = _mat_field(bm, 0).astype(jnp.int32)
        surf = alive & (bmed < 0) if n_med > 0 else alive

        # ---- 2. emission -------------------------------------------------
        emis = surf & (mtype == DIFFUSE_LIGHT)
        Lr = jnp.where(emis, Lr + thr_r * _mat_field(bm, 4), Lr)
        Lg = jnp.where(emis, Lg + thr_g * _mat_field(bm, 5), Lg)
        Lb = jnp.where(emis, Lb + thr_b * _mat_field(bm, 6), Lb)
        alive = alive & ~emis
        surf = surf & ~emis

        # ---- 3. albedo ---------------------------------------------------
        alb_r = _mat_field(bm, 1)
        alb_g = _mat_field(bm, 2)
        alb_b = _mat_field(bm, 3)
        if textured:
            # albedo *= image texture at the interpolated UV — in-kernel
            # equivalent of ops/textures.sample_image (tex2D contract:
            # floor-frac wrap, V-flip nearest, white on OOB,
            # src/gpu_render.cu:232-259).  The per-lane pool fetch is a
            # one-hot matmul gather (benchmarks/proto_gather.py: exact
            # at precision=HIGHEST): lane index -> (128,128) one-hot x
            # poolT (128, 3*Rp) picks pool column j per lane, then an
            # iota-compare row select per channel.  Runs under a scalar
            # any-textured-hit branch so untextured waves pay nothing.
            texm = surf & (btex >= 0.0)

            def tex_branch(a):
                alb_r, alb_g, alb_b = a
                btex_i = btex.astype(jnp.int32)
                hs = 4 if tiled else 3
                wt = i0
                ht = i0
                ot = i0
                twt = i0
                for tt in range(n_texs):
                    sel = btex_i == tt
                    wt = jnp.where(sel, hdr_ref[hs * tt], wt)
                    ht = jnp.where(sel, hdr_ref[hs * tt + 1], ht)
                    ot = jnp.where(sel, hdr_ref[hs * tt + 2], ot)
                    if tiled:
                        twt = jnp.where(sel, hdr_ref[4 * tt + 3], twt)
                uu = biu - jnp.floor(biu)
                vv = biv - jnp.floor(biv)
                it = (uu * (wt - 1).astype(jnp.float32)).astype(jnp.int32)
                jt = ((1.0 - vv) * (ht - 1).astype(jnp.float32)
                      ).astype(jnp.int32)
                if tiled:
                    # 32x32-tiled pool addressing (build_pool_tiled)
                    pidx = (ot + (((jt >> 5) * twt + (it >> 5)) << 10)
                            + ((jt & 31) << 5) + (it & 31))
                else:
                    pidx = ot + jt * wt + it
                Rp = texT_ref.shape[1] // 3
                npl = Rp * TILE_W
                okt = (btex_i >= 0) & (btex_i < n_texs) \
                    & (pidx >= 0) & (pidx < npl)
                tr, tg, tb = _pool_fetch(jnp.clip(pidx, 0, npl - 1))
                use = texm & okt    # !okt -> white (albedo unchanged)
                return (jnp.where(use, alb_r * tr, alb_r),
                        jnp.where(use, alb_g * tg, alb_g),
                        jnp.where(use, alb_b * tb, alb_b))

            a1 = lax.cond(
                jnp.any(texm), tex_branch, lambda a: a,
                (alb_r, alb_g, alb_b))
            if "texg" in dup_set:       # perf triage: 2x the tex gather
                a2 = lax.cond(
                    jnp.any(texm), tex_branch, lambda a: a,
                    (alb_r, alb_g, alb_b))
                a1 = tuple(jnp.maximum(x, y) for x, y in zip(a1, a2))
            alb_r, alb_g, alb_b = a1

        if has_ptex:
            # procedural textures at the hit point (the sphere
            # megakernel's block verbatim; ops/textures.py
            # sample_procedural contract — checker 3D-sine, marble,
            # noise over the gather-free hash-gradient Perlin).
            # mat_pack cols: 9 ptex_kind, 10 ptex_scale, 11-13 color2
            kind_p = _mat_field(bm, 9).astype(jnp.int32)
            pscale = _mat_field(bm, 10)
            c2r = _mat_field(bm, 11)
            c2g = _mat_field(bm, 12)
            c2b = _mat_field(bm, 13)
            sines = (jnp.sin(pscale * px_) * jnp.sin(pscale * py_)
                     * jnp.sin(pscale * pz_))
            chk = sines < 0.0
            chk_r = jnp.where(chk, c2r, alb_r)
            chk_g = jnp.where(chk, c2g, alb_g)
            chk_b = jnp.where(chk, c2b, alb_b)
            need_noise = surf & ((kind_p == PTEX_NOISE)
                                 | (kind_p == PTEX_MARBLE))
            turb = lax.cond(jnp.any(need_noise),
                            lambda: _perlin_turb(px_, py_, pz_),
                            lambda: jnp.zeros(shape, jnp.float32))
            marble_v = 0.5 * (1.0 + jnp.sin(pscale * pz_ + 10.0 * turb))
            noise_v = jnp.clip(turb, 0.0, 1.0)
            is_chk = surf & (kind_p == PTEX_CHECKER)
            alb_r = jnp.where(is_chk, chk_r, alb_r)
            alb_g = jnp.where(is_chk, chk_g, alb_g)
            alb_b = jnp.where(is_chk, chk_b, alb_b)
            is_mar = surf & (kind_p == PTEX_MARBLE)
            alb_r = jnp.where(is_mar, marble_v, alb_r)
            alb_g = jnp.where(is_mar, marble_v, alb_g)
            alb_b = jnp.where(is_mar, marble_v, alb_b)
            is_noi = surf & (kind_p == PTEX_NOISE)
            alb_r = jnp.where(is_noi, noise_v, alb_r)
            alb_g = jnp.where(is_noi, noise_v, alb_g)
            alb_b = jnp.where(is_noi, noise_v, alb_b)

        # ---- 4. specular -------------------------------------------------
        # The whole metal/dielectric chain (incl. the rejection-sampler
        # while_loop: 3 draws/attempt + ~40 vector ops) runs under a
        # scalar any-specular-lane branch: hull-dominated ISS waves are
        # usually all-diffuse, and a skipped branch draws nothing (the
        # masked-lane draws it skips were all-false anyway), so streams
        # are identical either way.
        metal_m = surf & (mtype == METAL)
        diel_m = surf & (mtype == DIELECTRIC)

        def spec_branch(a):
            (thr_r, thr_g, thr_b, rox, roy, roz, rdx, rdy, rdz, state,
             alive_f2) = a
            alive = alive_f2 > 0.5
            uix, uiy, uiz = _normalize3(rdx, rdy, rdz)
            din = uix * nx + uiy * ny + uiz * nz
            rfx = uix - 2.0 * din * nx
            rfy = uiy - 2.0 * din * ny
            rfz = uiz - 2.0 * din * nz
            fuzz = jnp.clip(_mat_field(bm, 7), 0.0, 1.0)
            (fzx, fzy, fzz), state = _rand_in_unit_sphere(state, metal_m)
            mdx = rfx + fzx * fuzz
            mdy = rfy + fzy * fuzz
            mdz = rfz + fzz * fuzz
            metal_ok = (mdx * nx + mdy * ny + mdz * nz) > 0.0
            alive = alive & ~(metal_m & ~metal_ok)

            eta = _mat_field(bm, 8)
            eta = jnp.where((eta <= 0.0) | ~jnp.isfinite(eta), 1.5, eta)
            front = bfr > 0.5
            ratio = jnp.where(front, 1.0 / eta, eta)
            cos_t = jnp.minimum(-(uix * nx + uiy * ny + uiz * nz), 1.0)
            sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
            cannot = ratio * sin_t > 1.0
            r0 = (1.0 - ratio) / (1.0 + ratio)
            r0 = r0 * r0
            om = 1.0 - cos_t
            om2 = om * om
            refl_prob = r0 + (1.0 - r0) * (om2 * om2 * om)
            u_d, state = _draw(state, diel_m)
            use_refl = cannot | (refl_prob > u_d)
            # refract (inc/vec3.h:141-147)
            rpx = (uix + nx * cos_t) * ratio
            rpy = (uiy + ny * cos_t) * ratio
            rpz = (uiz + nz * cos_t) * ratio
            rpar = -jnp.sqrt(jnp.abs(1.0
                                     - (rpx * rpx + rpy * rpy + rpz * rpz)))
            rrx = rpx + nx * rpar
            rry = rpy + ny * rpar
            rrz = rpz + nz * rpar
            ddx = jnp.where(use_refl, rfx, rrx)
            ddy = jnp.where(use_refl, rfy, rry)
            ddz = jnp.where(use_refl, rfz, rrz)

            spec = metal_m | diel_m
            sdx_ = jnp.where(metal_m, mdx, ddx)
            sdy_ = jnp.where(metal_m, mdy, ddy)
            sdz_ = jnp.where(metal_m, mdz, ddz)
            sar = jnp.where(metal_m, alb_r, 1.0)
            sag = jnp.where(metal_m, alb_g, 1.0)
            sab = jnp.where(metal_m, alb_b, 1.0)
            mv = spec & alive
            thr_r = jnp.where(mv, thr_r * sar, thr_r)
            thr_g = jnp.where(mv, thr_g * sag, thr_g)
            thr_b = jnp.where(mv, thr_b * sab, thr_b)
            rox = jnp.where(mv, px_, rox)
            roy = jnp.where(mv, py_, roy)
            roz = jnp.where(mv, pz_, roz)
            rdx = jnp.where(mv, sdx_, rdx)
            rdy = jnp.where(mv, sdy_, rdy)
            rdz = jnp.where(mv, sdz_, rdz)
            return (thr_r, thr_g, thr_b, rox, roy, roz, rdx, rdy, rdz,
                    state, jnp.where(alive, 1.0, 0.0))

        spec_in = (thr_r, thr_g, thr_b, rox, roy, roz, rdx, rdy, rdz,
                   state, jnp.where(alive, 1.0, 0.0))
        any_spec = jnp.any(metal_m | diel_m)
        if "spec" in dup_set:            # perf triage: 2x the branch
            dup_out = lax.cond(any_spec, spec_branch, lambda a: a, spec_in)
        spec_out = lax.cond(any_spec, spec_branch, lambda a: a, spec_in)
        if "spec" in dup_set:            # identical inputs -> identity
            spec_out = tuple(
                jnp.minimum(a, b) if a.dtype == jnp.float32
                else a | b           # Mosaic has no maxui; or == identity
                for a, b in zip(spec_out, dup_out))
        (thr_r, thr_g, thr_b, rox, roy, roz, rdx, rdy, rdz, state,
         alive_f2) = spec_out
        alive = alive_f2 > 0.5

        # ---- 5. sun MIS at diffuse hits (src/gpu_render.cu:800-836) ----
        diff = surf & (mtype == LAMBERTIAN) & alive
        if sun_on and fuse:
            # compute the would-be contribution NOW; the occlusion test
            # rides the next wave's combined walk (deferred shadow)
            def sun_pre():
                cos_sun = jnp.maximum(0.0, nx * sdx + ny * sdy + nz * sdz)
                newpend = diff & (cos_sun > 0.0)
                pdf_b = cos_sun / jnp.float32(PI_F)
                w_sun = pdf_b / (0.5 + 0.5 * pdf_b)
                pcr = jnp.where(newpend, thr_r * alb_r * sun_r * w_sun,
                                0.0)
                pcg = jnp.where(newpend, thr_g * alb_g * sun_g * w_sun,
                                0.0)
                pcb = jnp.where(newpend, thr_b * alb_b * sun_b * w_sun,
                                0.0)
                pox = px_ + sh_bias * nx
                poy = py_ + sh_bias * ny
                poz = pz_ + sh_bias * nz
                return newpend, pcr, pcg, pcb, pox, poy, poz

            newpend, pcr, pcg, pcb, pox, poy, poz = sun_pre()
            if "sunpre" in dup_set:      # perf triage: 2x the precompute
                d2 = sun_pre()
                pcr = jnp.minimum(pcr, d2[1])
                pcg = jnp.minimum(pcg, d2[2])
                pcb = jnp.minimum(pcb, d2[3])
                pox = jnp.minimum(pox, d2[4])
                poy = jnp.minimum(poy, d2[5])
                poz = jnp.minimum(poz, d2[6])
        elif sun_on:
            cos_sun = jnp.maximum(0.0, nx * sdx + ny * sdy + nz * sdz)
            pot = diff & (cos_sun > 0.0)
            nrays = nrays + jnp.sum(jnp.where(pot, 1, 0))
            sox = px_ + sh_bias * nx
            soy = py_ + sh_bias * ny
            soz = pz_ + sh_bias * nz
            if "sunwalk" in dup_set:     # perf triage: 2x the sun walk
                blocked2, _, _ = _sun_blocked(sox, soy, soz, pot, tm=tm)

            # whole walk under a scalar gate: a wave with no potential
            # receiver (all-miss / all-specular / sun behind every
            # surface) pays nothing
            def sun_branch(_):
                b, sv_, st_ = _sun_blocked(sox, soy, soz, pot, tm=tm)
                return jnp.where(b, 1.0, 0.0), sv_, st_

            blocked_f, sv_, st_ = lax.cond(
                jnp.any(pot), sun_branch,
                lambda _: (f0, jnp.int32(0), jnp.int32(0)), 0)
            blocked = blocked_f > 0.5
            if "sunwalk" in dup_set:
                blocked = blocked & blocked2
            svis = svis + sv_
            stst = stst + st_
            if n_med > 0:
                # media along the shadow ray (split path: the any-hit
                # scene_hit runs media_pass with active=pot — one draw
                # per medium masked pot; an already-blocked lane's
                # verdict is absorbed by the OR, so e1 clips at t_max)
                a_s = sdx * sdx + sdy * sdy + sdz * sdz
                rlen_s = jnp.sqrt(a_s)
                for i in range(n_med):
                    mb = 15 * i
                    kind = med_ref[mb]
                    mcx = med_ref[mb + 1]
                    mcy = med_ref[mb + 2]
                    mcz = med_ref[mb + 3]
                    mr = med_ref[mb + 4]
                    ocx, ocy, ocz = sox - mcx, soy - mcy, soz - mcz
                    half_b = ocx * sdx + ocy * sdy + ocz * sdz
                    cq = ocx * ocx + ocy * ocy + ocz * ocz - mr * mr
                    disc = half_b * half_b - a_s * cq
                    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                    s_has = disc > 0.0
                    s_t0 = (-half_b - sq) / a_s
                    s_t1 = (-half_b + sq) / a_s
                    bt0 = jnp.full(shape, -3e38)
                    bt1 = jnp.full(shape, 3e38)
                    for ax, (o_, d_) in enumerate(((sox, sdx), (soy, sdy),
                                                   (soz, sdz))):
                        inv = 1.0 / d_
                        ta = (med_ref[mb + 5 + ax] - o_) * inv
                        tb = (med_ref[mb + 8 + ax] - o_) * inv
                        bt0 = jnp.maximum(bt0, jnp.minimum(ta, tb))
                        bt1 = jnp.minimum(bt1, jnp.maximum(ta, tb))
                    b_has = bt1 > bt0
                    is_sph = kind == 0.0
                    has = jnp.where(is_sph,
                                    jnp.where(s_has, 1.0, 0.0),
                                    jnp.where(b_has, 1.0, 0.0)) > 0.5
                    mt0 = jnp.where(is_sph, s_t0, bt0)
                    mt1 = jnp.where(is_sph, s_t1, bt1)
                    e0 = jnp.maximum(mt0, tmin_f)
                    e1 = jnp.minimum(mt1, tmax_f)
                    inside = has & (e0 < e1) & pot
                    u_m, state = _draw(state, pot)
                    dist_inside = (e1 - e0) * rlen_s
                    neg_inv_d = med_ref[mb + 11]
                    hit_dist = neg_inv_d * jnp.log(
                        jnp.maximum(u_m, 1e-30))
                    okm = inside & (hit_dist <= dist_inside)
                    blocked = blocked | okm
            unb = pot & ~blocked
            pdf_b = cos_sun / jnp.float32(PI_F)
            w_sun = pdf_b / (0.5 + 0.5 * pdf_b)
            Lr = jnp.where(unb, Lr + thr_r * alb_r * sun_r * w_sun, Lr)
            Lg = jnp.where(unb, Lg + thr_g * alb_g * sun_g * w_sun, Lg)
            Lb = jnp.where(unb, Lb + thr_b * alb_b * sun_b * w_sun, Lb)

        # ---- 6-9. next-direction sampling ------------------------------
        if n_lights == 0:
            # cosine BRDF only (src/gpu_render.cu:850-866; the ratio
            # scattering_pdf/pdf uses identical floats -> 1)
            if "gluecos" in dup_set:     # perf triage: 2x the sampler
                (bdx2, bdy2, bdz2), pdf_d2, _st2 = _cosine_hemisphere(
                    nx, ny, nz, state, diff)
            (bdx, bdy, bdz), pdf_b2, state = _cosine_hemisphere(
                nx, ny, nz, state, diff)
            if "gluecos" in dup_set:     # identical inputs -> identity
                bdx = jnp.minimum(bdx, bdx2)
                bdy = jnp.minimum(bdy, bdy2)
                bdz = jnp.minimum(bdz, bdz2)
                pdf_b2 = jnp.minimum(pdf_b2, pdf_d2)
            ok_b = pdf_b2 > 0.0
            alive = alive & ~(diff & ~ok_b)
            mv2 = diff & ok_b
            thr_r = jnp.where(mv2, thr_r * alb_r, thr_r)
            thr_g = jnp.where(mv2, thr_g * alb_g, thr_g)
            thr_b = jnp.where(mv2, thr_b * alb_b, thr_b)
            rox = jnp.where(mv2, px_, rox)
            roy = jnp.where(mv2, py_, roy)
            roz = jnp.where(mv2, pz_, roz)
            rdx = jnp.where(mv2, bdx, rdx)
            rdy = jnp.where(mv2, bdy, rdy)
            rdz = jnp.where(mv2, bdz, rdz)
        else:
            # 50/50 area-light vs BRDF mixture with the reference's
            # asymmetric pdfs (src/gpu_render.cu:869-927); sphere AND
            # quad lights both consume exactly two uniforms so the
            # per-pixel draw schedule is kind-independent
            # (ops/shade.py:307-375).  lit_ref layout per light:
            # [kind, c(3), r, q(3), u(3), v(3), n(3), area] (18).
            choose, state = _draw(state, diff)
            light_m = diff & (choose < 0.5)
            brdf_m = diff & ~(choose < 0.5)
            uk, state = _draw(state, light_m)
            k = jnp.minimum((uk * jnp.float32(n_lights)
                             ).astype(jnp.int32), n_lights - 1)
            flds = [jnp.zeros(shape, jnp.float32) for _ in range(18)]
            for i in range(n_lights):
                sel = k == i
                for f in range(18):
                    flds[f] = jnp.where(sel, lit_ref[18 * i + f],
                                        flds[f])
            (lknd, lcx, lcy, lcz, lrad, qx, qy, qz, qux, quy, quz,
             qvx_, qvy_, qvz_, qnx, qny, qnz, qarea) = flds
            u1, state = _draw(state, light_m)
            u2, state = _draw(state, light_m)
            # sphere sample (ops/shade.py sphere_light_from_uniforms)
            z = 2.0 * u1 - 1.0
            phi = 2.0 * jnp.float32(PI_F) * u2
            rl = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
            plx = lcx + rl * jnp.cos(phi) * lrad
            ply = lcy + rl * jnp.sin(phi) * lrad
            plz = lcz + z * lrad
            tlx = plx - px_
            tly = ply - py_
            tlz = plz - pz_
            dist2 = tlx * tlx + tly * tly + tlz * tlz
            dist = jnp.sqrt(dist2)
            oks = dist > 0.0
            invd = 1.0 / jnp.where(oks, dist, 1.0)
            wsx = jnp.where(oks, tlx * invd, 0.0)
            wsy = jnp.where(oks, tly * invd, 0.0)
            wsz = jnp.where(oks, tlz * invd, 1.0)
            nlx, nly, nlz = _normalize3(plx - lcx, ply - lcy, plz - lcz)
            cos_ls = jnp.maximum(0.0, -(nlx * wsx + nly * wsy
                                        + nlz * wsz))
            oks = oks & (cos_ls > 0.0)
            sarea = 4.0 * jnp.float32(PI_F) * lrad * lrad
            pdf_s = jnp.where(oks,
                              dist2 / jnp.where(oks, cos_ls * sarea,
                                                1.0), 0.0)
            # quad sample (ops/shade.py quad_light_from_uniforms)
            qlx = qx + u1 * qux + u2 * qvx_
            qly = qy + u1 * quy + u2 * qvy_
            qlz = qz + u1 * quz + u2 * qvz_
            tqx = qlx - px_
            tqy = qly - py_
            tqz = qlz - pz_
            qd2 = tqx * tqx + tqy * tqy + tqz * tqz
            qd = jnp.sqrt(qd2)
            okq = qd > 1e-3
            qinv = 1.0 / jnp.where(okq, qd, 1.0)
            wqx = jnp.where(okq, tqx * qinv, 0.0)
            wqy = jnp.where(okq, tqy * qinv, 0.0)
            wqz = jnp.where(okq, tqz * qinv, 1.0)
            cos_lq = jnp.abs(wqx * qnx + wqy * qny + wqz * qnz)
            okq = okq & (cos_lq > 1e-8) & (qarea > 0.0)
            pdf_q = jnp.where(okq,
                              qd2 / jnp.where(okq, cos_lq * qarea, 1.0),
                              0.0)
            is_q = lknd > 0.5
            wix = jnp.where(is_q, wqx, wsx)
            wiy = jnp.where(is_q, wqy, wsy)
            wiz = jnp.where(is_q, wqz, wsz)
            pdf_lc = jnp.where(is_q, pdf_q, pdf_s)
            cos_li = jnp.maximum(0.0, wix * nx + wiy * ny + wiz * nz)
            l_ok = (pdf_lc > 0.0) & (cos_li > 0.0)
            pdf_light = pdf_lc / jnp.float32(n_lights)
            pdf_val_l = 0.5 * pdf_light + 0.5 * (cos_li
                                                 / jnp.float32(PI_F))
            # BRDF branch (asymmetric 0.5 pdf, src/gpu_render.cu:917)
            (bdx, bdy, bdz), pdf_b2, state = _cosine_hemisphere(
                nx, ny, nz, state, brdf_m)
            b_ok = pdf_b2 > 0.0
            pdf_val_b = 0.5 * pdf_b2
            dsx = jnp.where(light_m, wix, bdx)
            dsy = jnp.where(light_m, wiy, bdy)
            dsz = jnp.where(light_m, wiz, bdz)
            pdf_val = jnp.where(light_m, pdf_val_l, pdf_val_b)
            okm = (light_m & l_ok) | (~light_m & b_ok)
            alive = alive & ~(diff & ~okm)
            mv2 = diff & okm
            cos_o = jnp.maximum(0.0, dsx * nx + dsy * ny + dsz * nz)
            weight = (cos_o / jnp.float32(PI_F)) / jnp.where(
                pdf_val > 0, pdf_val, 1.0)
            thr_r = jnp.where(mv2, thr_r * alb_r * weight, thr_r)
            thr_g = jnp.where(mv2, thr_g * alb_g * weight, thr_g)
            thr_b = jnp.where(mv2, thr_b * alb_b * weight, thr_b)
            rox = jnp.where(mv2, px_, rox)
            roy = jnp.where(mv2, py_, roy)
            roz = jnp.where(mv2, pz_, roz)
            rdx = jnp.where(mv2, dsx, rdx)
            rdy = jnp.where(mv2, dsy, rdy)
            rdz = jnp.where(mv2, dsz, rdz)

        # ---- termination bookkeeping ------------------------------------
        depth = depth + alive_in.astype(jnp.int32)
        alive = alive & (depth < max_depth)
        died = alive_in & ~alive
        if fuse:
            # a lane that died holding a fresh pending shadow defers its
            # banking one wave (clamp01 must see the sun term); all other
            # deaths bank now (their pendings were resolved above)
            defer_new = died & newpend
            bank = died & ~newpend
            pend_out = jnp.where(newpend, 1.0, 0.0)
        else:
            bank = died
        acc_r = jnp.where(bank, acc_r + jnp.clip(Lr, 0.0, 1.0), acc_r)
        acc_g = jnp.where(bank, acc_g + jnp.clip(Lg, 0.0, 1.0), acc_g)
        acc_b = jnp.where(bank, acc_b + jnp.clip(Lb, 0.0, 1.0), acc_b)

        out = (acc_r, acc_g, acc_b, Lr, Lg, Lb,
               (thr_r, thr_g, thr_b),
               jnp.where(alive, 1.0, 0.0), state, scnt, depth,
               (rox, roy, roz), (rdx, rdy, rdz), nrays, c[14] + 1,
               (cvis, ctst, svis, stst, cidl))
        if fuse:
            out = out + ((pend_out, pcr, pcg, pcb, pox, poy, poz),
                         jnp.where(defer_new, 1.0, 0.0))
        if motion_on:
            out = out + (tm,)
        return out

    init = (f0, f0, f0, f0, f0, f0, (f1, f1, f1), f0, state0, i0, i0,
            (f0, f0, f0), (f0, f0, f1), jnp.int32(0), jnp.int32(0),
            (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
             jnp.int32(0)))
    if fuse:
        init = init + ((f0, f0, f0, f0, f0, f0, f0), f0)
    if motion_on:
        init = init + (f0,)
    if unroll > 1:
        # exec_opts.wave_unroll: N wave bodies per while iteration —
        # the back-edge's carried-plane materialization is paid once
        # per N waves.  Bit-identical: trailing bodies on a terminated
        # state are masked no-ops (regen gate at scnt == spp, masked
        # draws, any_work-gated walks) — see the ExecOptions docstring.
        _body1 = wave_body

        def wave_body(c):  # noqa: F811 — deliberate unrolled rebind
            for _ in range(unroll):
                c = _body1(c)
            return c
    out = lax.while_loop(wave_cond, wave_body, init)
    acc_r_ref[...] = out[0]
    acc_g_ref[...] = out[1]
    acc_b_ref[...] = out[2]
    # Stats land in a bucketed (min(n_blocks, STATS_ROWS), 7) SMEM table
    # (block pid accumulates into row pid % rows): a full per-block SMEM
    # output overflows scoped memory at 1080p block_h=8 (16200 blocks),
    # and Pallas disallows sub-(8,128) blocked SMEM windows.  Buckets
    # stay far from i32 overflow (callers still sum in int64).
    # Telemetry per bucket: [rays, waves, chit visits, chit tri-tests,
    # sun visits, sun tri-tests, chit entered-leaf tris (the contiguous
    # scan minus overscan)] — exact, drives bench + perf triage.
    pid = pl.program_id(0)
    rows = nray_ref.shape[0]
    row = pid % rows
    first = pid < rows
    vals = (out[13], out[14], out[15][0], out[15][1], out[15][2],
            out[15][3], out[15][4])
    for c, v in enumerate(vals):
        nray_ref[row, c] = jnp.where(first, v, nray_ref[row, c] + v)


@partial(jax.jit, static_argnames=("n_mats",
                                   "max_depth", "width", "height", "seed",
                                   "rr_start", "rr_max_p", "t_min", "t_max",
                                   "sun_on", "packed", "k", "block_h",
                                   "ordered", "pops", "regen_thresh",
                                   "defer_shadow", "rowtrav", "row_pops",
                                   "stream", "stream_tiles", "smooth",
                                   "textured", "n_texs", "dup",
                                   "sun_pops", "chain_fuse", "n_sph",
                                   "n_quads", "n_lights", "n_med",
                                   "leaf_parts",
                                   "hbm", "gw", "leaf_tail", "env_id",
                                   "env_rot", "env_scale", "defer_aux",
                                   "has_ptex", "aperture_on",
                                   "motion_on", "time0", "time1",
                                   "uvrec", "uvcarry", "dual_union",
                                   "tex_chunk", "tiled", "fronts",
                                   "unroll"))
def _run_path(wide_tab, tri_tab, tile_tab, aux_tab, texT, mat_pack,
              matT, cam_vec, sun_vec, spp_vec, hdr_vec, sph_vec, quad_vec,
              lit_vec, med_vec, px, py, valid,
              n_mats: int,
              max_depth: int, width: int, height: int, seed: int,
              rr_start: int, rr_max_p: float, t_min: float, t_max: float,
              sun_on: bool, packed: bool, k: int, block_h: int,
              ordered: bool, pops: int = 3, regen_thresh: float = 1.0,
              defer_shadow: bool = True, rowtrav: bool = False,
              row_pops: int = 2, stream: bool = True,
              stream_tiles: int = 4, smooth: bool = False,
              textured: bool = False, n_texs: int = 0, dup: str = "",
              sun_pops: int = 2, chain_fuse: bool = False,
              n_sph: int = 0, n_quads: int = 0, n_lights: int = 0,
              n_med: int = 0,
              leaf_parts: int = 1, hbm: bool = False, gw: int = 2,
              leaf_tail: str = "pad", env_id: int = -1,
              env_rot: float = 0.0, env_scale: float = 1.0,
              defer_aux: bool = False, has_ptex: bool = False,
              aperture_on: bool = False, motion_on: bool = False,
              time0: float = 0.0, time1: float = 0.0,
              uvrec: bool = True, uvcarry: bool = False,
              dual_union: bool = False,
              tex_chunk: int = TEX_CHUNK_ROWS, tiled: bool = False,
              fronts: int = 1, unroll: int = 1):
    kern = partial(_path_kernel,
                   n_mats=n_mats, max_depth=max_depth, width=width,
                   height=height, seed=seed, rr_start=rr_start,
                   rr_max_p=rr_max_p, t_min=t_min, t_max=t_max,
                   sun_on=sun_on, packed=packed, ordered=ordered,
                   pops=pops, regen_thresh=regen_thresh,
                   defer_shadow=defer_shadow, rowtrav=rowtrav,
                   row_pops=row_pops, stream=stream,
                   stream_tiles=stream_tiles, smooth=smooth,
                   textured=textured, n_texs=n_texs, dup=dup,
                   sun_pops=sun_pops, chain_fuse=chain_fuse,
                   n_sph=n_sph, n_quads=n_quads, n_lights=n_lights,
                   n_med=n_med,
                   leaf_parts=leaf_parts, hbm=hbm, gw=gw,
                   leaf_tail=leaf_tail, env_id=env_id, env_rot=env_rot,
                   env_scale=env_scale, defer_aux=defer_aux,
                   has_ptex=has_ptex, aperture_on=aperture_on,
                   motion_on=motion_on, time0=time0, time1=time1,
                   uvrec=uvrec, uvcarry=uvcarry, dual_union=dual_union,
                   tex_chunk=tex_chunk, tiled=tiled, fronts=fronts,
                   unroll=unroll)
    ray_spec = pl.BlockSpec((block_h, TILE_W), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    # HBM mode: the triangle tables stay off-core (tri_tab is unused by
    # the tile engine; tile_tab is DMA'd per entered leaf window)
    tri_spec = pl.BlockSpec(memory_space=pl.ANY) if hbm else full
    aux_spec = tri_spec if hbm else full
    # aux windows only when the engine actually loads aux tiles —
    # in-record-UV (texrec) scenes don't
    hbm_aux = hbm and (smooth or (textured and not uvrec))
    nslots = max(pops, sun_pops)
    out_shape = (k * TILE_H, TILE_W)
    n_blocks = (k * TILE_H) // block_h
    flops_est = int(wide_tab.shape[0]) * 60 * out_shape[0] * TILE_W \
        // block_h * 64
    return pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[full, tri_spec, tri_spec, aux_spec, full, smem, full,
                  smem, smem, smem, smem, smem, smem, smem, smem]
        + [ray_spec] * 3,
        out_specs=(ray_spec, ray_spec, ray_spec,
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(
            jax.ShapeDtypeStruct(out_shape, jnp.float32),
            jax.ShapeDtypeStruct(out_shape, jnp.float32),
            jax.ShapeDtypeStruct(out_shape, jnp.float32),
            jax.ShapeDtypeStruct((min(n_blocks, STATS_ROWS), 7),
                                 jnp.int32),
        ),
        # rowtrav needs block_h per-row segments (>= STACK for block_h
        # >= 8, so the union-walk sun pass's [0, STACK) region still
        # fits); split-front needs one STACK segment per front
        scratch_shapes=[pltpu.SMEM(
            ((max(STACK, block_h * ROW_SSEG) if rowtrav
              else fronts * STACK)
             + (STACK if "push" in dup else 0),),
            jnp.int32),
            pltpu.SMEM((2 * RQCAP + 2,), jnp.int32),
            pltpu.VMEM(((nslots * 8 * gw) if hbm else 8, TILE_W),
                       jnp.float32),
            pltpu.SemaphoreType.DMA((nslots if hbm else 1,)),
            pltpu.VMEM(((nslots * 8 * gw) if hbm_aux else 8, TILE_W),
                       jnp.float32),
            pltpu.SemaphoreType.DMA((nslots if hbm_aux else 1,))],
        cost_estimate=pl.CostEstimate(flops=flops_est,
                                      bytes_accessed=out_shape[0] * 128 * 24,
                                      transcendentals=out_shape[0] * 128 * 4),
        # Mosaic's default scoped-VMEM limit is 16 MB; raise it to most
        # of the chip's 128 MB so the resident tables (VMEM mode, up to
        # _FUSED_RESIDENT_ROWS) or the wide-BVH node table alone (HBM
        # mode) can use it — the budgets in pallas_trace gate admission
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=119 * 1024 * 1024),
    )(wide_tab, tri_tab, tile_tab, aux_tab, texT, mat_pack, matT, cam_vec,
      sun_vec, spp_vec, hdr_vec, sph_vec, quad_vec, lit_vec, med_vec,
      px, py, valid)


def _resolve_leaf_parts(packed: bool, block_h: int) -> int:
    """Row groups for the leaf engine's masked scans (exec_opts.
    leaf_split): "auto" = halves on lane-packed (big) scenes only —
    the setting measured net-positive at ISS scale and net-negative on
    small scenes.  Clamped to divide the block's row count."""
    mode = _OPTS.leaf_split
    if mode == "off":
        parts = 1
    elif mode == "eighth":
        parts = 8
    elif mode == "quarter":
        parts = 4
    elif mode == "half" or (mode == "auto" and packed):
        parts = 2
    else:
        parts = 1
    while parts > 1 and block_h % parts:
        parts //= 2
    return parts


def trace_fused(scene, cfg, cam, px, py, valid, return_stats: bool = False,
                salt=0, spp=None):
    """Render `spp` samples for every (K, P) lane pixel in one kernel.

    Returns (accum V3 (K, P) — sum over samples of clamp01(L) — and the
    exact BUCKETED scene-intersection ray counts (block pid accumulates
    into row pid % STATS_ROWS), an i32 vector to be summed in int64
    host-side); with `return_stats` also the full bucketed (nrays,
    waves, chit_visits, chit_tritests, sun_visits, sun_tritests) table.
    """
    K, P = px.shape
    assert P == TILE_H * TILE_W, P
    block_h = _OPTS.block_h
    group = block_h // TILE_H
    Kp = ((K + group - 1) // group) * group
    pad = Kp - K

    def fold(a, fill=0):
        if pad:
            a = jnp.concatenate(
                [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)], axis=0)
        return a.reshape(Kp * TILE_H, TILE_W)

    textured = bool(scene.has_image_tex)
    smooth = bool(scene.has_smooth)
    shaded = textured or smooth
    env_on = int(scene.env_tex) >= 0
    n_texs = int(scene.n_textures) if (textured or env_on) else 0
    Rp = _tex_plane_rows_eff(scene)
    # in-record-UV candidate (resolvable before the hbm decision: the
    # defer_aux knob forces the aux-tile engine regardless of hbm)
    uvrec_ = (bool(_OPTS.uvrec) and textured and not smooth
              and not bool(_OPTS.defer_aux))
    extra = (int(scene.tri_tile.shape[0]) if (shaded and not uvrec_)
             else 0) + 3 * Rp
    packed = not fits_vmem_fused(scene, extra)
    # HBM-streamed leaf mode: tri tables stay in HBM, incompatible with
    # the knobs that read them straight from VMEM (stream / rowtrav /
    # chain_fuse / defer_shadow / row-group masking) — all forced off
    hbm = _hbm_mode(scene, extra)
    tri_tab = scene.tri_pk8 if packed else scene.tri_pack
    # shading tables: the aux tile table rides the leaf engine; the
    # texture pool is de-interleaved into per-channel planes laid out
    # for the kernel's one-hot matmul gather — poolT[j, ch*Rp + c] =
    # channel ch of texel c*128 + j (texel k of the interleaved pool is
    # pool[3k + ch], ops/textures.py:35)
    defer_aux = bool(_OPTS.defer_aux) and shaded and not hbm
    texrec = uvrec_ and not defer_aux
    if defer_aux:
        # deferred-attribute mode: the aux table rides as TRANSPOSED
        # per-field planes for the walk-end one-hot gather —
        # auxT[j, f*Ta + c] = tri_aux[c*128 + j, f] (tri rows are the
        # PACKED order, matching the engine's recorded tile*8+slot ids)
        t16 = scene.tri_aux
        Ta = (t16.shape[0] + TILE_W - 1) // TILE_W
        npad = Ta * TILE_W - t16.shape[0]
        if npad:
            t16 = jnp.concatenate(
                [t16, jnp.zeros((npad, 16), jnp.float32)], axis=0)
        aux_tab = (t16.reshape(Ta, TILE_W, 16).transpose(1, 2, 0)
                   .reshape(TILE_W, 16 * Ta))
    elif shaded and not texrec:
        aux_tab = scene.tri_aux_tile
    else:
        # unshaded or in-record-UV engine: no aux table shipped
        aux_tab = jnp.zeros((8, TILE_W), jnp.float32)
    tiled = bool(_OPTS.tex_tiled) and (textured or env_on)
    if textured or env_on:
        texels = (scene.tex_pool_tiled if tiled
                  else scene.tex_pool).reshape(-1, 3)
        npad = Rp * TILE_W - texels.shape[0]
        if npad:
            texels = jnp.concatenate(
                [texels, jnp.zeros((npad, 3), jnp.float32)], axis=0)
        texT = jnp.concatenate(
            [texels[:, ch].reshape(Rp, TILE_W).T for ch in range(3)],
            axis=1)
        if bool(scene.tex_bf16):
            # exact: pool values are bf16-representable (build-time
            # source quantization); the gather matmul runs bf16-native
            texT = texT.astype(jnp.bfloat16)
        if tiled:
            # 4-stride header: (w, h, tiled texel offset, tiles-across)
            hdr_vec = jnp.stack(
                [scene.tex_w.astype(jnp.int32),
                 scene.tex_h.astype(jnp.int32),
                 scene.tex_toff.astype(jnp.int32),
                 scene.tex_ttw.astype(jnp.int32)],
                axis=1).reshape(-1)
        else:
            hdr_vec = jnp.stack(
                [scene.tex_w.astype(jnp.int32),
                 scene.tex_h.astype(jnp.int32),
                 (scene.tex_off // 3).astype(jnp.int32)],
                axis=1).reshape(-1)
    else:
        texT = jnp.zeros((TILE_W, 3), jnp.float32)
        hdr_vec = jnp.zeros((3,), jnp.int32)

    # Ldir = normalize(-sun_dir): the verbatim negation quirk
    # (src/gpu_render.cu:802-806)
    sd = (-scene.sun_dir).astype(jnp.float32)
    # bit-identical to ops/linalg.normalize (reciprocal-multiply, not
    # divide): the parity renderer computes sdir in-trace with that
    # formula, and media shadow verdicts are ULP-sensitive to it
    l2 = jnp.sum(sd * sd)
    sd = sd * jnp.where(l2 > 0.0, 1.0 / jnp.sqrt(jnp.maximum(l2, 1e-38)),
                        0.0)
    sun_vec = jnp.concatenate([
        sd.astype(jnp.float32), scene.sun_radiance.astype(jnp.float32),
        jnp.array([cfg.shadow_bias, 0.0], jnp.float32)])
    cam_vec = jnp.concatenate([
        cam.origin, cam.lower_left, cam.horizontal, cam.vertical,
        cam.u, cam.v, cam.lens_radius[None]
    ]).astype(jnp.float32)

    # [spp, stream salt] — both runtime scalars (one compiled kernel
    # serves every sample count); salt 0 keeps the parity LCG streams
    spp_rt = cfg.resolved_spp() if spp is None else spp
    spp_vec = jnp.stack([jnp.asarray(spp_rt, jnp.int32),
                         jnp.asarray(salt, jnp.int32)])

    # mixed-scene SMEM tables (host-resolved indirections)
    n_sph = int(scene.n_spheres)
    n_quads = int(scene.n_quads)
    n_lights = int(scene.n_lights)
    if n_sph:
        # stride 8 per sphere: c0(3), radius, mat, c2(3) — c2 drives
        # in-kernel motion blur (inc/sphere.h:143-146 center lerp)
        sph_vec = jnp.concatenate([
            scene.sph_center[:n_sph],
            scene.sph_radius[:n_sph, None],
            scene.sph_mat[:n_sph, None].astype(jnp.float32),
            scene.sph_center2[:n_sph]],
            axis=1).reshape(-1)
    else:
        sph_vec = jnp.zeros((1,), jnp.float32)
    if n_quads:
        quad_vec = jnp.concatenate([
            scene.quad_q[:n_quads], scene.quad_u[:n_quads],
            scene.quad_v[:n_quads], scene.quad_n[:n_quads],
            scene.quad_w[:n_quads], scene.quad_d[:n_quads, None],
            scene.quad_area[:n_quads, None],
            scene.quad_mat[:n_quads, None].astype(jnp.float32)],
            axis=1).reshape(-1)
    else:
        quad_vec = jnp.zeros((1,), jnp.float32)
    if n_lights:
        recs = []
        for i in range(n_lights):
            li = scene.light_idx[i]
            kind = scene.light_kind[i].astype(jnp.float32)
            sj = jnp.clip(li, 0, scene.sph_center.shape[0] - 1)
            qj = jnp.clip(li, 0, scene.quad_q.shape[0] - 1)
            recs.append(jnp.concatenate([
                kind[None],
                scene.sph_center[sj], scene.sph_radius[sj][None],
                scene.quad_q[qj], scene.quad_u[qj], scene.quad_v[qj],
                scene.quad_n[qj], scene.quad_area[qj][None]]))
        lit_vec = jnp.concatenate(recs)
    else:
        lit_vec = jnp.zeros((1,), jnp.float32)

    # constant media (same 15-float records as the sphere megakernel:
    # [kind, center(3), r, box_min(3), box_max(3), neg_inv_d, albedo(3)])
    n_med = int(scene.n_media)
    if n_med:
        med_vec = jnp.concatenate([
            scene.med_kind[:n_med, None].astype(jnp.float32),
            scene.med_center[:n_med],
            scene.med_radius[:n_med, None],
            scene.med_min[:n_med],
            scene.med_max[:n_med],
            scene.med_neg_inv_density[:n_med, None],
            scene.med_albedo[:n_med],
        ], axis=1).reshape(-1)
    else:
        med_vec = jnp.zeros((1,), jnp.float32)

    # transposed material table for the MXU one-hot gather (only read
    # in-kernel when n_mats > 32 — the _mat_field unroll threshold)
    n_mats_real = int(scene.mat_pack.shape[0])
    if n_mats_real > 32:
        pad_m = -(-n_mats_real // 8) * 8 - n_mats_real
        matT = jnp.transpose(jnp.concatenate(
            [scene.mat_pack,
             jnp.zeros((pad_m, 16), jnp.float32)], axis=0)
            if pad_m else scene.mat_pack)
    else:
        matT = jnp.zeros((16, 8), jnp.float32)

    acc_r, acc_g, acc_b, stats = _run_path(
        scene.bvh_wide, tri_tab, scene.tri_tile, aux_tab, texT,
        scene.mat_pack, matT, cam_vec, sun_vec, spp_vec, hdr_vec,
        sph_vec, quad_vec, lit_vec, med_vec,
        fold(px.astype(jnp.int32)), fold(py.astype(jnp.int32)),
        fold(valid.astype(jnp.int32)),
        n_mats=scene.mat_pack.shape[0],
        max_depth=cfg.resolved_max_depth(), width=cam.width,
        height=cam.height, seed=scene.seed, rr_start=cfg.rr_start_depth,
        rr_max_p=float(cfg.rr_max_p), t_min=float(cfg.hit_eps),
        t_max=float(cfg.hit_tmax), sun_on=bool(scene.sun_enabled),
        packed=packed, k=Kp, block_h=block_h,
        ordered=bool(_OPTS.ordered), pops=int(_OPTS.pops),
        regen_thresh=float(_OPTS.regen_thresh),
        # the deferred-shadow chain walk has no shading-field tracking
        defer_shadow=(bool(_OPTS.defer_shadow) and not shaded
                      and not hbm and n_med == 0),
        rowtrav=bool(_OPTS.rowtrav) and not hbm,
        row_pops=int(_OPTS.row_pops),
        stream=(False if hbm else
                (packed if _OPTS.stream == "auto"
                 else _OPTS.stream in ("on", True))),
        stream_tiles=int(_OPTS.stream_tiles),
        smooth=smooth, textured=textured, n_texs=n_texs,
        # sun_pops auto (0): 3 on lane-packed (big) scenes — +1.6% on the
        # textured 47.7k flagship (ROADMAP r4 knob re-tune) — else the
        # small-scene optimum 2 (5.8k headline prefers p4s2).  Safe to
        # key on scene size now that the outer jits carry opts_key():
        # `packed` is a pure function of scene shapes, which are already
        # part of the jit cache key.
        dup=str(_OPTS.dup),
        sun_pops=(int(_OPTS.sun_pops) or (3 if packed else 2)),
        chain_fuse=bool(_OPTS.chain_fuse) and not hbm,
        n_sph=n_sph, n_quads=n_quads, n_lights=n_lights, n_med=n_med,
        leaf_parts=_resolve_leaf_parts(packed, block_h),
        hbm=hbm, gw=_hbm_gw(scene), leaf_tail=str(_OPTS.leaf_tail),
        env_id=int(scene.env_tex), env_rot=float(scene.env_rotation),
        env_scale=float(scene.env_scale), defer_aux=defer_aux,
        has_ptex=bool(scene.has_ptex),
        aperture_on=bool(cfg.aperture > 0),
        # the shutter draw fires whenever the shutter is OPEN, moving
        # spheres or not (render.py:96 draws on time1 > time0 alone);
        # the center lerp is an exact no-op when c2 == c0
        motion_on=bool(cfg.time1 > cfg.time0),
        time0=float(cfg.time0), time1=float(cfg.time1),
        uvrec=uvrec_, uvcarry=bool(_OPTS.uvcarry),
        dual_union=bool(_OPTS.dual_union),
        tex_chunk=int(_OPTS.tex_chunk), tiled=tiled,
        # split-front walk: VMEM-resident scenes only for now (the HBM
        # leaf-window engine would need per-front window slots);
        # rowtrav keeps precedence when explicitly set
        fronts=(2 if int(_OPTS.front_split) == 2 and not hbm
                and not _OPTS.rowtrav else 1),
        unroll=max(int(_OPTS.wave_unroll), 1))

    def unfold(a):
        return a.reshape(Kp, P)[:K]

    accum = V3(unfold(acc_r), unfold(acc_g), unfold(acc_b))
    # per-BLOCK ray counts (i32, < 2^31 each); callers sum in int64 on the
    # host — a device-side i32 sum overflows at 1080p @ 1000 spp (2.3e9)
    if return_stats:
        return accum, stats[:, 0], stats
    return accum, stats[:, 0]
