"""Structure-of-arrays 3-vector math.

The reference's `vec3`/`float3` helpers (inc/vec3.h:14-151,
src/gpu_render.cu:11-72) operate on scalar structs.  On TPU the efficient
layout is SoA: a vector *field* is three arrays of identical shape (one per
component), so every op is a full-width VPU elementwise op and the trailing
array dimension stays lane-aligned (x128) instead of being wasted on a
3-wide axis.

`V3` is a NamedTuple of three jnp arrays; all free functions below are
shape-polymorphic and jit/vmap friendly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class V3(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    def __add__(self, o):
        return V3(self.x + o.x, self.y + o.y, self.z + o.z)

    def __sub__(self, o):
        return V3(self.x - o.x, self.y - o.y, self.z - o.z)

    def __mul__(self, o):
        if isinstance(o, V3):  # component-wise (reference f3_mul)
            return V3(self.x * o.x, self.y * o.y, self.z * o.z)
        return V3(self.x * o, self.y * o, self.z * o)

    def __rmul__(self, s):
        return V3(self.x * s, self.y * s, self.z * s)

    def __neg__(self):
        return V3(-self.x, -self.y, -self.z)


def v3(x, y, z) -> V3:
    return V3(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
              jnp.asarray(z, jnp.float32))


def splat(c, shape=()) -> V3:
    """Broadcast a python/np 3-tuple to a V3 of `shape`-shaped arrays."""
    return V3(jnp.full(shape, c[0], jnp.float32),
              jnp.full(shape, c[1], jnp.float32),
              jnp.full(shape, c[2], jnp.float32))


def from_array(a) -> V3:
    """(...,3) array -> V3 of (...) components."""
    a = jnp.asarray(a)
    return V3(a[..., 0], a[..., 1], a[..., 2])


def to_array(v: V3) -> jnp.ndarray:
    return jnp.stack([v.x, v.y, v.z], axis=-1)


def dot(a: V3, b: V3):
    return a.x * b.x + a.y * b.y + a.z * b.z


def cross(a: V3, b: V3) -> V3:
    return V3(a.y * b.z - a.z * b.y,
              a.z * b.x - a.x * b.z,
              a.x * b.y - a.y * b.x)


def length2(a: V3):
    return dot(a, a)


def length(a: V3):
    return jnp.sqrt(length2(a))


def normalize(a: V3) -> V3:
    """Zero-vector -> zero, matching reference f3_norm (gpu_render.cu:40-46)."""
    l2 = length2(a)
    inv = jnp.where(l2 > 0.0, 1.0 / jnp.sqrt(jnp.maximum(l2, 1e-38)), 0.0)
    return a * inv


def where(mask, a: V3, b: V3) -> V3:
    return V3(jnp.where(mask, a.x, b.x),
              jnp.where(mask, a.y, b.y),
              jnp.where(mask, a.z, b.z))


def select_gather(arr_xyz, idx) -> V3:
    """Gather rows of an (N,3) array as a V3 of idx-shaped components."""
    return V3(arr_xyz[idx, 0], arr_xyz[idx, 1], arr_xyz[idx, 2])


def maxc(a: V3):
    return jnp.maximum(a.x, jnp.maximum(a.y, a.z))


def clamp01(a: V3) -> V3:
    return V3(jnp.clip(a.x, 0.0, 1.0), jnp.clip(a.y, 0.0, 1.0),
              jnp.clip(a.z, 0.0, 1.0))


def lerp(a: V3, b: V3, t) -> V3:
    return a * (1.0 - t) + b * t


def reflect(v: V3, n: V3) -> V3:
    """r = v - 2 (v.n) n  (reference inc/vec3.h:136-139)."""
    return v - n * (2.0 * dot(v, n))


def refract(uv: V3, n: V3, etai_over_etat) -> V3:
    """Snell refraction; caller must pass unit uv.

    Matches reference inc/vec3.h:141-147 / src/gpu_render.cu:199-206:
    r_perp = eta (uv + cos_theta n); r_par = -sqrt(|1-|r_perp|^2|) n.
    """
    cos_theta = jnp.minimum(dot(-uv, n), 1.0)
    r_perp = (uv + n * cos_theta) * etai_over_etat
    r_par = n * (-jnp.sqrt(jnp.abs(1.0 - length2(r_perp))))
    return r_perp + r_par


def schlick(cosine, ref_idx):
    """Schlick fresnel approximation (reference src/gpu_render.cu:208-212)."""
    r0 = (1.0 - ref_idx) / (1.0 + ref_idx)
    r0 = r0 * r0
    return r0 + (1.0 - r0) * jnp.power(1.0 - cosine, 5.0)
