"""Runtime execution options (TPU knobs promoted out of env vars).

SURVEY.md §5 calls for promoting scattered knobs to a real config; round-1
kept three in env vars (DSRT_BLOCK_H / DSRT_FUSED_SUN / DSRT_DISABLE_PALLAS).
They now live here as one mutable process-wide options object, settable from
driver/bench CLI flags and from tests.

Two caveats the earlier "never change rendered pixels" framing missed:

- Most knobs are pure execution strategy (which kernel, block size, pop
  width) and are bit-identical at any setting, but `fused_dispatch_rays`
  DOES change pixels: salted spp chunks are Monte-Carlo-equivalent to the
  single dispatch, not bit-equal (tests/test_dispatch_budget.py).

- These knobs shape the TRACED kernel, so they must participate in jit
  cache keys.  Every jitted render entry point (render.py,
  parallel/render.py, bench.py, benchmarks/sweep.py) threads
  ``opts_key()`` through a static ``_opts`` argument: mutating OPTS
  between calls retraces instead of silently reusing the previous knobs'
  compiled kernel (the round-2/round-4 sweep-cache gotcha, now fixed at
  the root rather than by per-caller cache clearing).
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
    # Defer each wave's sun-shadow any-hit into the NEXT wave's closest-
    # hit traversal (fused megakernel): one combined walk per wave whose
    # node front is the UNION of the extension and pending-shadow sets
    # and whose leaf loads feed both tests.  Bit-identical results
    # (tested), but measured NET-NEGATIVE on v5e at 47.7k tris: 19.7 vs
    # 27.6 Mrays/s (benchmarks/sweep50k.py).  The exact telemetry shows
    # why: the separate sun pass is only ~9% of node visits (svis 21k vs
    # cvis 228k — the uniform-direction walk parks early), so there is
    # little front to share, while the combined walk pays ~2x box-test
    # vector work per visit, a shadow MT test per leaf triangle, and 8
    # extra loop carries.  Kept as an opt-in A/B knob.
    defer_shadow: bool = False
    # Traversal visits per fused-kernel loop iteration (ILP width).  The
    # loop is latency-bound; overlapped pops retire more box tests per
    # serial chain.  r3 sweeps (benchmarks/sweep50k3/6/7.py, 47.7k tris):
    # 2 -> 31.6, 4 -> 34.9, 6 -> 35.9, 8 -> 31.1 Mrays/s at the 8x128
    # layout; at 32x32 p6 41.8 vs p4 41.2 vs p8 37.0.  8 loses to
    # stack starvation (masked pops still pay the visit's vector+load
    # work).  RE-TUNED after SBVH + half-split + wml16 (sweep50k19/20):
    # the optimum moved to 4 — 47.7k tris p4 beats p6 in every paired
    # rep (135.1 vs 153.0, 131.7 vs 140.3 ms), and the 5.8k headline
    # scene gains 10-15% (89.6 -> 98.5, 87.0 -> 100.6 Mrays/s):
    # cheaper leaf rows mean shallower stacks, so masked 5th/6th pops
    # waste more than they overlap.
    pops: int = 4
    # Per-ROW traversal in the fused megakernel: each of the block_h ray
    # rows walks the wide BVH with its own cursor + SMEM stack and only
    # box/leaf-tests its OWN 128 lanes.  Hypothesis was that the block-
    # union walk's (tile x row) leaf product dominates; measured on v5e
    # at 47.7k tris it is NET-NEGATIVE by 2.5x (13.9 vs 34.2 Mrays/s,
    # benchmarks/sweep50k5.py): the per-row fronts overlap so heavily
    # that their SUM is 3x the union's visits (cvis 607k vs 201k), and
    # the 8x scalar push/pop bookkeeping per iteration serializes on the
    # scalar core.  Rays within a pixel block are simply too coherent
    # for per-row walks to pay.  Kept as an opt-in A/B knob.
    rowtrav: bool = False
    # Split-front traversal (fused megakernel): the block's 8 ray rows
    # walk the wide BVH as TWO half-block fronts (rows 0-3 / 4-7), each
    # with its own SMEM stack segment and pop pipeline in the SAME loop
    # iteration — the middle ground between the union walk (1 front,
    # minimal visits) and rowtrav (8 fronts, 3x visits).  Each front
    # box-tests only ITS 4 rows and leaf-scans only ITS entered ranges
    # with its rows' MT updates (subsumes leaf_split within a front).
    # Identical accept set per lane (a front enters every node any of
    # its rows hit — a superset of each lane's own walk; bit-identical,
    # tests/test_front_split.py).  MEASURED NET-NEGATIVE on v5e at the
    # textured 47.7k flagship (800x450@32spp, min-of-3): 243.9 -> 259.0
    # ms at pops 4 (and worse at 2/3/6: 320/288/278) — per-front visits
    # are +33% as predicted (cvis 160k -> 213k) but the two visit
    # chains do NOT overlap: per-iteration latency grows ~60% instead,
    # the rowtrav failure mode at half the front count (the loop body's
    # ~40 carried vregs + doubled scalar bookkeeping exceed what the
    # VLIW window absorbs).  The ROADMAP's 'split-front walk' road to
    # large-scene scaling is hereby banked as closed.  1 = off (union
    # walk), 2 = two half-block fronts (VMEM-resident scenes only; HBM
    # leaf streaming keeps the union walk).
    front_split: int = 1
    # Traversal visits per row per loop iteration in rowtrav mode (the
    # per-row analogue of `pops`; serial-latency vs wasted-pop tradeoff).
    # rp1 measured better than rp2 (17.1 vs 13.9) but both lose badly.
    row_pops: int = 1
    # Streamed walk (fused megakernel): fold leaf-tile testing into the
    # SAME straight-line iteration body as the node visits — entered
    # leaf ranges are enqueued to a small SMEM range queue and drained
    # at `stream_tiles` tile tests per iteration alongside the next
    # `pops` node visits, so the tile load+roll chains overlap the node
    # load chains instead of serializing after them in a lax.cond
    # branch.  Identical accept set (every enqueued range is fully
    # drained before the walk can end; pruning clamps only ever lag =
    # superset walks).  Takes precedence over `rowtrav`.  Measured on
    # v5e (benchmarks/sweep50k5.py): +4%% at 47.7k tris (35.7 vs 34.2
    # Mrays/s, tiles=6) under the r3-era knobs (pops 4, 8x128 layout),
    # but NET-NEGATIVE under the current defaults (pops 6, 32x32:
    # 32.9 streamed vs 41.8 union, sweep50k7.py — higher pops already
    # fill the iteration with overlapped chains, and the queue's
    # backpressure stalls them).  Off by default; kept as an A/B knob.
    stream: str = "off"             # "auto" | "on" | "off"
    # Leaf tile tests per streamed-walk iteration (sweep: 2 -> 25.2,
    # 4 -> 33.3, 6 -> 35.7, 8 -> 34.6 Mrays/s at 47.7k tris).
    stream_tiles: int = 6
    # Fused-kernel sample regeneration gate: idle lanes start their next
    # sample only when the block's live fraction drops below this.  1.0 =
    # regenerate immediately (max occupancy, mixes primary rays into
    # bounce waves); lower values batch primary rays into coherent waves
    # at the cost of idle lanes.  Measured on v5e (sweep50k/sweep50k3):
    # 0.25 is +11%% at 47.7k tris (cvis 228k -> 200k) and +7%% at 5.8k;
    # 0.125/0.0625 plateau below it.  Bit-identical at any value.
    regen_thresh: float = 0.25
    # Sort rays by direction octant before the split-pipeline traversal
    # kernel.  Off by default: XLA's gather/scatter lowering makes the
    # global reorder cost (~25 ms/wave at 1.6M lanes) exceed the
    # coherence win on every scene measured; kept for experimentation.
    sort_rays: bool = False
    # Pixel tile per 1024-lane packet ("THxTW", TH*TW == 1024).  The
    # traversal front of a fused-kernel block is the UNION over its
    # pixels' rays, so squarer tiles (smaller perimeter) walk tighter
    # fronts than the legacy 8x128 strip.  Bit-identical at any shape
    # (per-pixel LCG streams depend only on pixel coords); changes only
    # which pixels share a block.  Measured on v5e at 47.7k tris
    # (benchmarks/sweep50k7.py, union walk pops 6): 8x128 -> 36.1,
    # 32x32 -> 41.8 (+16%%: cvis -20%%, ctst -11%%, and waves -14%% —
    # uniform-depth tiles finish blocks sooner), 16x64 -> 41.4,
    # 64x16 -> 38.9 Mrays/s.
    layout: str = "32x32"
    # Pop width for the fused kernel's SEPARATE sun-shadow walk.  That
    # walk averages ~2 visits per wave-iteration (the uniform-direction
    # any-hit parks early), so the main walk's wide pop pipeline mostly
    # burns masked pops' box vector work there: sweep50k8 'sunwalk'
    # attribution was 15 ms of a 150 ms ISS frame at sun_pops == pops
    # == 6.  Narrow is bit-identical (pop grouping never changes
    # verdicts).  0 = auto, resolved per scene at trace time (pallas_
    # path.trace_fused): 3 on lane-packed (big) scenes — the r4 sweep
    # measured +1.6% on the textured 47.7k flagship — else 2 (the 5.8k
    # headline's optimum).  Explicit values override both.
    sun_pops: int = 0
    # With defer_shadow, run the combined extension+shadow walk through
    # the old CHAIN leaf engine instead of the tile engine (A/B only —
    # the chain fallback is what made r2's defer_shadow measurement
    # net-negative).
    chain_fuse: bool = False
    # Row-group leaf masking: the union walk's visit computes SEPARATE
    # box verdicts for the block's row halves ("half", 2 groups) or
    # quarters ("quarter", 4 groups), and the tile leaf engine scans
    # each group's entered leaf ranges with only that group's MT row
    # updates.  ~93%% of entered ranges are single-half at ISS scale
    # (half-scan count 1.355M vs 1.264M full scans), so halves nearly
    # halve the leaf row work; the price is extra reduces on the serial
    # visit chain (~3/pop for halves after eliding the union/set-0
    # range reduces, ~7/pop for quarters).  Measured (800x450@16spp,
    # min-of-3): halves 47.7k tris 153.8 -> 146.3 ms (+5%%), 5.8k tris
    # 94.0 -> 96.5 ms (-2.6%%) — hence "auto" = halves on lane-packed
    # (big) scenes only.  Bit-identical: per-group verdicts are exact
    # for their rows and closest-hit accepts are idempotent.
    leaf_split: str = "auto"    # "auto" | "off" | "half" | "quarter"
    # HBM-resident triangle tables for the fused megakernel: when the
    # tri tile/pk8 tables no longer fit the VMEM budget (~90k tris),
    # keep only the wide-BVH node table resident and DMA each visit's
    # entered leaf window (a few (8,128) tile groups — wide nodes own
    # CONTIGUOUS tri blocks, Scene.wide_max_span bounds the span) from
    # HBM into a per-pop VMEM scratch slot, overlapping the POPS copies
    # with the visit chains.  Lifts the fused-path scene ceiling to
    # wide-BVH-in-VMEM (~1M tris).  "auto" = only when VMEM mode does
    # not fit; "on" forces it (testing); "off" falls back to the split
    # pipeline for oversized scenes.
    hbm_tris: str = "auto"      # "auto" | "on" | "off"
    # Leaf-engine tail handling.  The tile loop retires 2 tiles per
    # iteration (independent load+roll chains); "pad" rounds every
    # range UP to pairs, so odd-tile ranges scan one fully-wasted
    # duplicate tile — at ISS scale most entered leaf ranges are 1-2
    # tiles, so ~1/3 of all tile MT work is pad re-tests.  "cond" runs
    # floor(n/2) pair iterations plus a lax.cond single-tile tail;
    # "single" drops the unroll (1 tile/iteration, no pads).  All
    # three are bit-identical (a duplicate tile re-tests identical
    # triangles; accepts are idempotent).
    leaf_tail: str = "cond"     # "pad" | "cond" | "single"
    # Perf-triage duplication knobs (comma list, e.g. "box,gluecos"):
    # each named kernel segment is computed TWICE with the duplicate
    # folded in via an identity (min/max/or of two equal values), so
    # images stay bit-identical while the frame-time delta measures that
    # segment's true marginal cost (benchmarks/sweep50k8.py).  Never set
    # in production.  Segments: box (8-row child box test), load (wide
    # node load), visitred (verdict reduces), push (stack pushes), leaf
    # (tile MT engine), merge (per-iteration closest merge), gluecos
    # (cosine-hemisphere sampler), gluereg (regen draws + camera ray),
    # tourn (walk-end tournament), texg (per-wave texture gather
    # branch), nolc (skip the leaf cond dispatch — a removal, not a
    # duplication).
    dup: str = ""
    # Deferred-attribute shaded leaf engine (fused kernel, VMEM mode):
    # candidates carry (tri-row id, bary u, v) instead of interpolated
    # UV/normal, resolved by ONE per-wave one-hot aux gather at walk
    # end.  Measured NET-NEGATIVE 2.4x at 47.7k tris (sweep50k15 —
    # the 16-field gather matmul is ~25x the texture-pool gather's
    # width); bit-identical (tested).  Opt-in A/B knob.
    defer_aux: bool = False
    # In-record UV engine for FLAT TEXTURED scenes (fused kernel): the
    # tile engine reads per-vertex UVs as bf16 pairs packed in the MT
    # record's 3 spare lanes (models/scene.py tri_pack lanes 13-15) and
    # resolves the texture id from the winning material row (mat_pack
    # col 14) — no aux tile loads, no per-accept texture-id candidate
    # plane.  Smooth (vn) scenes keep the aux-tile engine (normals
    # don't fit the record).  Off = A/B against the aux-tile engine
    # (bit-identical; UVs are source-quantized to bf16 either way).
    uvrec: bool = True
    # Carried-UV variant of the in-record engine: accepts select the
    # RAW packed-uv lanes (int32 bit patterns) plus barycentric (u, v)
    # into the candidate state, and the UV interpolation runs ONCE per
    # wave at walk end on the tournament winners — replacing 12
    # interpolation vector ops per accepted tile-row with 3 integer
    # selects.  Bit-identical (the same formula over the same bits,
    # evaluated on the winning accept's exact inputs).  Only engages
    # when the in-record engine does (texrec scenes).  MEASURED FLAT
    # at 47.7k tris / tex256 (45.38 off vs 45.46 on, min-of-3): the
    # removed interpolation is latency-absorbed vector work, and the
    # 3 extra carried candidate planes cost about what the interp
    # saved.  Off = the per-accept-interpolating r3 codegen (simpler,
    # longer-tested); kept as a bit-identical A/B knob.
    uvcarry: bool = False
    # Texture-pool gather chunk rows (pallas_path._pool_fetch_rows_ref
    # granularity): pools wider than one chunk gather per chunk under
    # a scalar any-lane-in-chunk branch, so per-wave gather work
    # scales with the chunks a wave's texel indices TOUCH, not the
    # pool size.  The whole-pool gather was measured to scale with
    # POOL SIZE at identical traversal telemetry (47.7k tris, wml 20:
    # tex=64 51.6, tex=256 48.3, tex=512 30.1 Mrays/s) — the
    # full-table load+matmul per wave was the real textured-scene
    # tax, not the per-accept interpolation.  0 = whole-pool (the r3
    # codegen, bit-identical A/B).
    tex_chunk: int = 512
    # Tiled texture-pool layout for the in-kernel gather: the pool is
    # re-laid into 32x32-texel tiles at scene build
    # (textures.build_pool_tiled), so a wave's spatially-coherent UV
    # footprint lands in few gather chunks instead of ~footprint_height
    # scattered rows (row-major puts v-adjacent texels a full image
    # width apart).  Same texel values, different addresses: renders
    # are bit-identical either way (A/B knob).  MEASURED FLAT on the
    # stand-in (r5: one texture shared across many UV islands — a
    # wave's footprint unions to most of the map, chunk-skip never
    # engages); kept for real per-surface-map_Kd OBJs whose footprints
    # are tight.  The big-texture win came from bf16 pools instead
    # (Scene.tex_bf16: tex1024 15.9 -> 33.4 Mrays/s).
    tex_tiled: bool = True
    # Half-leaf mode (leaf_split=2): scan DUAL-entered ranges (both
    # halves entered leaves of the same node, ~7% of entered ranges)
    # once over the union range at full rows instead of twice at half
    # rows — same MT row work, half the tile load+roll chains for
    # those ranges.  Bit-identical (superset scans only add misses;
    # tested).  MEASURED FLAT at 47.7k tris (sweep50k18: 49.2 vs 49.3
    # Mrays/s, repeats inside the ±5% noise band) — the saved tile
    # load+roll chains are latency-absorbed, consistent with the
    # findings bank ("vector work is nearly free; only serial spine
    # and true throughput work move the needle").  Off = the simpler
    # r2-verified codegen; kept as an A/B knob.
    dual_union: bool = False
    # Wave-body unroll for the fused tri megakernel's persistent loop:
    # apply the wave body N times per while_loop iteration, so the
    # loop's back-edge (where Mosaic materializes the ~30 carried
    # (8,128) planes) is paid once per N waves instead of every wave —
    # attacking the measured per-wave FIXED cost (benchmarks/
    # micro_wave.py: ~6.6 us/wave at block_h=8, over a third of the
    # textured flagship's 16.7 us/wave).  Bit-identical: the loop exits
    # at the first multiple-of-N wave where no work remains, and a
    # trailing body on a fully-terminated state is a masked no-op (no
    # regen fires at scnt == spp, every draw is masked off, and the
    # walk's any_work gate skips the root push so zero visits run).
    # Telemetry: the waves counter counts body applications, so up to
    # N-1 no-op waves per block appear in the count.
    wave_unroll: int = 1
    # Per-dispatch primary-ray budget for the fused megakernels.  A
    # frame whose width*height*spp exceeds this is rendered as several
    # salted spp chunks through the runtime-spp kernel (one compile,
    # the adaptive path's scheme) instead of one monolithic dispatch.
    # A single 1080p@1000spp dispatch runs 1.5-2.5e9 scene rays; at the
    # close-in end of the rendezvous trajectory (~12-28 Mrays/s full
    # occupancy) that is a 90-100 s kernel, which the TPU runtime's
    # hang detection kills (reproduced: frame 93 of the 99-pose
    # 1080p@1000spp run dies in one dispatch at ~2.6e9 rays; frame 92
    # at 2.49e9/87 s survived).  256M primary rays keeps the worst
    # measured occupancy under ~30 s per dispatch.  Frames at or below
    # the budget take the old single-dispatch path, bit-identical to
    # r3; 0 disables chunking.
    fused_dispatch_rays: int = 256 * 1024 * 1024

    def key(self) -> tuple:
        """Hashable snapshot of every knob — passed as the static
        ``_opts`` argument of the jitted render entry points so the jit
        cache retraces when any knob changes (module docstring)."""
        return dataclasses.astuple(self)


OPTS = ExecOptions()


def opts_key() -> tuple:
    """The CURRENT process-wide options snapshot (see ExecOptions.key)."""
    return OPTS.key()


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
