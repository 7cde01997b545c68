"""On-device texture evaluation.

`sample_image` matches the kernel's tex2D (src/gpu_render.cu:232-259):
wrap u,v to [0,1) by floor-frac, V-flip j = (1-v)(h-1), nearest-neighbor
fetch from the flat float pool, white on any out-of-bounds/invalid id.
(The OBJ loader already stored v as 1-v, inc/triangle_mesh.h:207, so the
two flips cancel — both are reproduced verbatim.)

`sample_procedural` evaluates the reference's CPU-only procedural textures
on-device: 3D-sine checker (inc/texture.h:60-68), marble-ish noise
(inc/texture.h:82-85) over classic Perlin (inc/perlin.h:39-78).
"""

from __future__ import annotations

import jax.numpy as jnp
import jax.lax as lax

from dsrt_tpu.ops.linalg import V3
from dsrt_tpu.models.materials import PTEX_CHECKER, PTEX_MARBLE, PTEX_NOISE


def sample_image(scene, tex_id, u, v) -> V3:
    """Nearest-neighbor sample from the texture pool over lanes.
    tex_id i32 lanes (-1 -> white)."""
    valid = (tex_id >= 0) & (tex_id < scene.n_textures)
    tid = jnp.clip(tex_id, 0, max(scene.n_textures - 1, 0))
    w = scene.tex_w[tid]
    h = scene.tex_h[tid]
    off = scene.tex_off[tid]
    uu = u - jnp.floor(u)
    vv = v - jnp.floor(v)
    i = (uu * (w - 1).astype(jnp.float32)).astype(jnp.int32)
    j = ((1.0 - vv) * (h - 1).astype(jnp.float32)).astype(jnp.int32)
    idx = off + (j * w + i) * 3
    pool_n = scene.tex_pool.shape[0]
    ok = valid & (idx >= 0) & (idx + 2 < pool_n)
    idx = jnp.clip(idx, 0, pool_n - 3)
    r = jnp.where(ok, scene.tex_pool[idx], 1.0)
    g = jnp.where(ok, scene.tex_pool[idx + 1], 1.0)
    b = jnp.where(ok, scene.tex_pool[idx + 2], 1.0)
    return V3(r, g, b)


# Polynomial arctan (odd minimax on [0,1], |err| < 3e-7): Mosaic has no
# atan2/acos lowering, so the equirect mapping uses ONE implementation
# built from mul/add/select/sqrt for all three paths — the XLA split
# renderer, the fused Pallas kernel, and the NumPy oracle — keeping
# their texel picks consistent.
_ATAN_C = (0.99997726, -0.33262347, 0.19354346,
           -0.11643287, 0.05265332, -0.01172120)
_np_pi = 3.14159265358979323846


def atan2f(y, x):
    """atan2 via odd-polynomial atan with quadrant fixup (f32-safe in
    XLA, Pallas/Mosaic and NumPy alike)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    mn = jnp.minimum(ax, ay)
    t = mn / jnp.maximum(mx, jnp.float32(1e-30))
    s = t * t
    c = _ATAN_C
    p = c[0] + s * (c[1] + s * (c[2] + s * (c[3] + s * (c[4] + s * c[5]))))
    p = t * p
    r = jnp.where(ay > ax, jnp.float32(0.5 * _np_pi) - p, p)
    r = jnp.where(x < 0, jnp.float32(_np_pi) - r, r)
    return jnp.where(y < 0, -r, r)


def acosf(x):
    """acos(x) = atan2(sqrt(1-x^2), x)."""
    return atan2f(jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0)), x)


def sample_env(scene, d: V3) -> V3:
    """Equirectangular environment-map radiance for direction lanes `d`
    (need not be unit length).

    Productizes the reference's dead SKY_ENV_MAP enum value and its
    never-read env_rotation knob (inc/gpu_scene.h:90-94, 108): the env
    map is a texture-pool entry (HDR files stay linear; LDR entries get
    the pool's sRGB->linear), u = atan2(z,x)/2pi + 0.5 + rot, v maps +y
    to the top row, scaled by scene.env_scale."""
    inv_len = 1.0 / jnp.sqrt(jnp.maximum(
        d.x * d.x + d.y * d.y + d.z * d.z, 1e-20))
    u = (atan2f(d.z * inv_len, d.x * inv_len) / (2.0 * _np_pi)
         + 0.5 + scene.env_rotation / (2.0 * _np_pi))
    v = 1.0 - acosf(jnp.clip(d.y * inv_len, -1.0, 1.0)) / _np_pi
    # sample_image wraps u and flips v exactly like the kernel's tex2D;
    # clamp v a hair inside [0,1) so the wrap never flips the poles
    v = jnp.clip(v, 0.0, 1.0 - 1e-6)
    rgb = sample_image(scene, jnp.full(u.shape, scene.env_tex, jnp.int32),
                       u, v)
    s = jnp.float32(scene.env_scale)
    return V3(rgb.x * s, rgb.y * s, rgb.z * s)


def _hash3(i, j, k):
    """Integer lattice hash (xorshift-multiply mix): the TPU-native
    replacement for the book's ranvec[perm_x^perm_y^perm_z] table walk
    (inc/perlin.h:39-66).  Pure vector arithmetic — a single (N,) gather
    from a 256-entry table costs ~150 ms per 1.4M lanes under XLA's TPU
    lowering (measured), which made table-Perlin ~1000x slower than this."""
    h = (i.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
         ^ j.astype(jnp.uint32) * jnp.uint32(0x85EBCA77)
         ^ k.astype(jnp.uint32) * jnp.uint32(0xC2B2AE3D))
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0x27D4EB2F)
    h = h ^ (h >> 16)
    return h


def _grad_dot(h, x, y, z):
    """Ken Perlin's improved-noise gradient set: 12 edge directions
    selected by 4 hash bits, evaluated with selects (no table)."""
    hh = (h & jnp.uint32(15)).astype(jnp.int32)
    u = jnp.where(hh < 8, x, y)
    v = jnp.where(hh < 4, y, jnp.where((hh == 12) | (hh == 14), x, z))
    return (jnp.where((hh & 1) == 0, u, -u)
            + jnp.where((hh & 2) == 0, v, -v))


def perlin_noise(scene, p: V3):
    """Gradient Perlin with Hermite-smoothed trilinear interpolation
    (the structure of inc/perlin.h:96-119) over hash-derived lattice
    gradients.  `scene` is accepted for API symmetry (the hash replaces
    the scene's permutation tables on device; the tables remain in the
    schema for the host-side reference implementation)."""
    del scene
    u = p.x - jnp.floor(p.x)
    v = p.y - jnp.floor(p.y)
    w = p.z - jnp.floor(p.z)
    i = jnp.floor(p.x).astype(jnp.int32)
    j = jnp.floor(p.y).astype(jnp.int32)
    k = jnp.floor(p.z).astype(jnp.int32)

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
    # improved-noise gradients have |dot| <= 2; scale into the classic
    # unit-gradient range so marble/noise mappings keep their look
    return accum * 0.5


def perlin_turb(scene, p: V3, depth: int = 7):
    """7-octave |fbm| (inc/perlin.h:68-78)."""
    accum = jnp.zeros_like(p.x)
    weight = 1.0
    q = p
    for _ in range(depth):
        accum = accum + weight * perlin_noise(scene, q)
        weight *= 0.5
        q = V3(q.x * 2.0, q.y * 2.0, q.z * 2.0)
    return jnp.abs(accum)


def sample_procedural(scene, mat_id, base: V3, p: V3, mask=None) -> V3:
    """Apply the material's procedural texture (if any) at world point p.
    Returns the effective albedo given the solid `base` color.  `mask`
    limits the (expensive) Perlin branch to waves where a lane that
    actually shades a noise/marble material exists."""
    kind = scene.mat_ptex_kind[mat_id]
    scale = scene.mat_ptex_scale[mat_id]
    if not scene.has_ptex:
        return base

    # checker: sin(s x) sin(s y) sin(s z) < 0 -> odd color
    sines = (jnp.sin(scale * p.x) * jnp.sin(scale * p.y)
             * jnp.sin(scale * p.z))
    c2 = scene.mat_ptex_color2[mat_id]
    checker = V3(jnp.where(sines < 0, c2[..., 0], base.x),
                 jnp.where(sines < 0, c2[..., 1], base.y),
                 jnp.where(sines < 0, c2[..., 2], base.z))

    need_noise = (kind == PTEX_NOISE) | (kind == PTEX_MARBLE)
    if mask is not None:
        need_noise = need_noise & mask
    need_noise = jnp.any(need_noise)
    turb = lax.cond(need_noise,
                    lambda: perlin_turb(scene, p),
                    lambda: jnp.zeros_like(p.x))
    # marble (reference noise_texture): 0.5 (1 + sin(s z + 10 turb))
    marble_v = 0.5 * (1.0 + jnp.sin(scale * p.z + 10.0 * turb))
    # plain noise: 0.5 (1 + raw turb) scaled — kept simple as turb itself
    noise_v = jnp.clip(turb, 0.0, 1.0)

    out = base
    out = V3(jnp.where(kind == PTEX_CHECKER, checker.x, out.x),
             jnp.where(kind == PTEX_CHECKER, checker.y, out.y),
             jnp.where(kind == PTEX_CHECKER, checker.z, out.z))
    out = V3(jnp.where(kind == PTEX_MARBLE, marble_v, out.x),
             jnp.where(kind == PTEX_MARBLE, marble_v, out.y),
             jnp.where(kind == PTEX_MARBLE, marble_v, out.z))
    out = V3(jnp.where(kind == PTEX_NOISE, noise_v, out.x),
             jnp.where(kind == PTEX_NOISE, noise_v, out.y),
             jnp.where(kind == PTEX_NOISE, noise_v, out.z))
    return out
