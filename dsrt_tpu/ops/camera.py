"""Pinhole/thin-lens camera.

Host-side `make_camera` mirrors camera::initialize (inc/camera.h:91-116)
in float32; `generate_rays` is the batched raygen matching the kernel's
make_camera_ray_jittered (src/gpu_render.cu:941-968): u = (px+jx)/(W-1),
v = (py+jy)/(H-1), dir = lower_left + u*horizontal + v*vertical - origin,
no depth of field (the kernel ignores lens_radius; aperture is kept for the
API-parity thin-lens path used when aperture > 0).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from dsrt_tpu.ops.linalg import V3


@partial(jax.tree_util.register_dataclass,
         data_fields=["origin", "lower_left", "horizontal", "vertical",
                      "u", "v", "w", "lens_radius"],
         meta_fields=["width", "height"])
@dataclasses.dataclass(frozen=True)
class Camera:
    origin: jnp.ndarray       # f32[3]
    lower_left: jnp.ndarray   # f32[3]
    horizontal: jnp.ndarray   # f32[3]
    vertical: jnp.ndarray     # f32[3]
    u: jnp.ndarray
    v: jnp.ndarray
    w: jnp.ndarray
    lens_radius: jnp.ndarray  # f32[]
    width: int
    height: int


def make_camera(lookfrom, lookat, vup=(0.0, 1.0, 0.0), vfov: float = 40.0,
                width: int = 800, height: int = 450,
                aperture: float = 0.0, focus_dist: float | None = None) -> Camera:
    lookfrom = np.asarray(lookfrom, np.float32)
    lookat = np.asarray(lookat, np.float32)
    vup = np.asarray(vup, np.float32)
    if focus_dist is None:
        focus_dist = float(np.linalg.norm(lookfrom - lookat))

    aspect = np.float32(width) / np.float32(height)
    theta = np.float32(math.radians(vfov))
    h = np.float32(np.tan(theta / 2.0, dtype=np.float32))
    viewport_h = np.float32(2.0) * h
    viewport_w = aspect * viewport_h

    def unit(x):
        return (x / np.linalg.norm(x)).astype(np.float32)

    w = unit(lookfrom - lookat)
    u = unit(np.cross(vup, w))
    v = np.cross(w, u).astype(np.float32)

    origin = lookfrom
    horizontal = (np.float32(focus_dist) * viewport_w * u).astype(np.float32)
    vertical = (np.float32(focus_dist) * viewport_h * v).astype(np.float32)
    lower_left = (origin - horizontal * np.float32(0.5)
                  - vertical * np.float32(0.5)
                  - np.float32(focus_dist) * w).astype(np.float32)

    return Camera(origin=jnp.asarray(origin), lower_left=jnp.asarray(lower_left),
                  horizontal=jnp.asarray(horizontal), vertical=jnp.asarray(vertical),
                  u=jnp.asarray(u), v=jnp.asarray(v), w=jnp.asarray(w),
                  lens_radius=jnp.float32(aperture * 0.5),
                  width=int(width), height=int(height))


def point_camera_at(cam_pos, target=(0.0, 0.0, 0.0), **kw) -> Camera:
    """point_camera_at of src/main.cpp:178-187: look at target with
    vup=(0,1,0) and focus_dist = |lookfrom - lookat|."""
    return make_camera(cam_pos, target, vup=(0.0, 1.0, 0.0), **kw)


def random_in_unit_disk(state, mask=None, max_tries: int = 64):
    """Rejection-sample the unit disk (2 draws/attempt), the
    random_in_unit_disk_device of inc/rtweekend.h used by the thin-lens
    raygen (inc/camera.h:50)."""
    import jax.lax as lax
    from dsrt_tpu.ops import rng as rngmod

    if mask is None:
        mask = jnp.ones(state.shape, bool)

    def attempt(state, need):
        x, state = rngmod.draw(state, need)
        y, state = rngmod.draw(state, need)
        return x * 2.0 - 1.0, y * 2.0 - 1.0, state

    x0, y0, state = attempt(state, mask)

    def cond(c):
        i, _, _, _, need = c
        return jnp.logical_and(i < max_tries, jnp.any(need))

    def body(c):
        i, x, y, state, need = c
        cx, cy, state = attempt(state, need)
        accept = cx * cx + cy * cy < 1.0
        x = jnp.where(need, cx, x)
        y = jnp.where(need, cy, y)
        need = need & ~accept
        return i + 1, x, y, state, need

    need0 = mask & (x0 * x0 + y0 * y0 >= 1.0)
    _, x, y, state, _ = lax.while_loop(
        cond, body, (jnp.int32(0), x0, y0, state, need0))
    return x, y, state


def generate_rays_dof(cam: Camera, px, py, jx, jy, state, mask
                      ) -> Tuple[V3, V3, jnp.ndarray]:
    """Thin-lens jittered raygen (generate_camera_ray_device,
    inc/camera.h:35-61): lens offset = lens_radius * disk sample projected
    on the camera (u, v) basis.  The reference kernel never uses this path
    (aperture is 0 in the pipeline, src/main.cpp:260); it exists for API
    parity and is active when RenderConfig.aperture > 0."""
    origin0, rd0 = generate_rays(cam, px, py, jx, jy)
    dx, dy, state = random_in_unit_disk(state, mask)
    rdx = cam.lens_radius * dx
    rdy = cam.lens_radius * dy
    off = V3(cam.u[0] * rdx + cam.v[0] * rdy,
             cam.u[1] * rdx + cam.v[1] * rdy,
             cam.u[2] * rdx + cam.v[2] * rdy)
    origin = origin0 + off
    rd = rd0 - off  # pixel_pos - origin - offset
    return origin, rd, state


def camera_rays(cam: Camera, px, py, jx, jy, state, mask,
                aperture_on: bool):
    """Dispatch pinhole vs thin-lens raygen on the static aperture flag;
    returns (origin, dir, state) — state advances only on the DOF path."""
    if aperture_on:
        return generate_rays_dof(cam, px, py, jx, jy, state, mask)
    ro, rd = generate_rays(cam, px, py, jx, jy)
    return ro, rd, state


def generate_rays(cam: Camera, px, py, jx, jy) -> Tuple[V3, V3]:
    """Batched jittered raygen.  px/py/jx/jy are same-shaped arrays;
    returns (origin, direction) V3 fields of that shape."""
    u = (px.astype(jnp.float32) + jx) / jnp.float32(cam.width - 1)
    v = (py.astype(jnp.float32) + jy) / jnp.float32(cam.height - 1)
    o = cam.origin
    ll, hz, vt = cam.lower_left, cam.horizontal, cam.vertical
    dx = ll[0] + u * hz[0] + v * vt[0] - o[0]
    dy = ll[1] + u * hz[1] + v * vt[1] - o[1]
    dz = ll[2] + u * hz[2] + v * vt[2] - o[2]
    shape = u.shape
    origin = V3(jnp.broadcast_to(o[0], shape), jnp.broadcast_to(o[1], shape),
                jnp.broadcast_to(o[2], shape))
    return origin, V3(dx, dy, dz)
