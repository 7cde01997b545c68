"""Numeric sanitization helpers (SURVEY.md §5: "JAX purity makes race
detection moot; add checkify/debug-NaN for numeric sanitizing").

The reference's only defensive device code is texture bounds checks and
BVH null guards; here the functional equivalents are jit-compatible value
checks plus opt-in global NaN trapping.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Enable XLA NaN trapping for the scope (jax_debug_nans)."""
    prev = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def checked_render(render_fn, *args, **kwargs):
    """Run a render function under checkify NaN/div checks; raises on the
    first NaN-producing op instead of silently propagating."""
    from jax.experimental import checkify

    fn = checkify.checkify(lambda: render_fn(*args, **kwargs),
                           errors=checkify.float_checks)
    err, out = fn()
    err.throw()
    return out


def image_stats(img) -> dict:
    """Quick sanity stats for a rendered frame (u8 or float)."""
    a = jnp.asarray(img)
    fa = a.astype(jnp.float32)
    return {
        "min": float(fa.min()),
        "max": float(fa.max()),
        "mean": float(fa.mean()),
        "nonzero_frac": float((fa != 0).mean()),
        "nan_count": int(jnp.isnan(fa).sum()),
        "inf_count": int(jnp.isinf(fa).sum()),
    }


def assert_finite(tree, name: str = "value") -> None:
    """Host-side finiteness assertion over a pytree of arrays."""
    for i, leaf in enumerate(jax.tree_util.tree_leaves(tree)):
        arr = jnp.asarray(leaf)
        if jnp.issubdtype(arr.dtype, jnp.floating):
            bad = int(jnp.sum(~jnp.isfinite(arr)))
            if bad:
                raise FloatingPointError(
                    f"{name}: leaf {i} has {bad} non-finite values")
