"""Runtime execution options (TPU knobs promoted out of env vars).

SURVEY.md §5 calls for promoting scattered knobs to a real config; round-1
kept three in env vars (DSRT_BLOCK_H / DSRT_FUSED_SUN / DSRT_DISABLE_PALLAS).
They now live here as one mutable process-wide options object, settable from
driver/bench CLI flags and from tests.  These are *execution strategy* knobs
(which kernel, what block size) — they never change rendered pixels, so they
are deliberately separate from the frozen `RenderConfig` that is hashed into
jit cache keys.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class ExecOptions:
    # Pallas traversal kernel: "auto" = on TPU when the scene fits VMEM,
    # "off" = always the pure-XLA packet traversal, "on" = force (testing).
    pallas: str = "auto"
    # Fuse the sun-shadow any-hit pass into the traversal kernel.  Saves a
    # launch per wave but shadows every hit lane instead of the sparse
    # potential-receiver set — measured net-negative on the ISS scene;
    # kept for scenes where most hits are diffuse receivers.
    fused_sun: bool = False
    # Rays per Pallas grid step = block_h x 128 lanes.  Bigger blocks
    # amortize the per-grid-step pipeline overhead at the cost of a larger
    # traversal union per block AND more vector work per wide-BVH visit
    # (the 8-child box test scales with rows); 8 measured best on v5e
    # with the dual-pop wide traversal (67.7 vs 66.9 at 16, 47.9 at 32).
    block_h: int = 8
    # Front-to-back (ordered) pushes in the wide-BVH stack traversal:
    # per-octant precomputed child permutations (bvh_build.collapse_wide)
    # make pops run near-first, so an early hit prunes far siblings.
    # Ordering only changes visit order, never the result (up to exact
    # t-ties).  Measured on v5e: NET-NEGATIVE on both benchmark scenes
    # (ISS 5.8k: 69.9 vs 72.7; ISS 47.7k: 27.0 vs 28.4 Mrays/s) — the
    # permutation walk + per-wave octant reduces cost more than the
    # early-out saves, same verdict as the binary kernel's thread-table
    # experiment.  Kept as an opt-in for hit-dominated close-up scenes.
    ordered: bool = False
    # Sort rays by direction octant before the split-pipeline traversal
    # kernel.  Off by default: XLA's gather/scatter lowering makes the
    # global reorder cost (~25 ms/wave at 1.6M lanes) exceed the
    # coherence win on every scene measured; kept for experimentation.
    sort_rays: bool = False


OPTS = ExecOptions()


def use_pallas(scene) -> bool:
    """Whether the Pallas traversal kernel runs for this scene."""
    from dsrt_tpu.ops import pallas_trace

    if OPTS.pallas == "off":
        return False
    if getattr(scene, "has_smooth", False):
        # the Pallas kernels shade with the stored flat normal; smooth
        # (vn) scenes need the interpolating XLA traversal
        return False
    if OPTS.pallas == "on":
        return True
    return (scene.n_tris > 0
            and pallas_trace.fits_vmem_packed(scene)
            and pallas_trace.backend_is_tpu())
