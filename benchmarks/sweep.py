"""Consolidated fused-kernel sweep harness (supersedes sweep50k*.py).

One parameterized driver for every knob experiment on the fused
megakernel: pick a scene, override any ExecOptions / scene-build /
render-config knob, and sweep cartesian grids — with the measurement
hygiene the one-off scripts converged on (salted perturbed inputs per
rep so the axon result cache can never serve a frame, min-of-N, exact
in-kernel ray counts, node-visit/tri-test telemetry).

Examples:
    # wml x pops grid on the textured 50k-tri flagship scene
    python benchmarks/sweep.py --scene iss50k --tex 256 \
        --sweep wml=8,12,16,24 --sweep pops=3,4,6

    # A/B one ExecOptions knob
    python benchmarks/sweep.py --scene iss50k --sweep leaf_tail=pad,cond

    # segment cost attribution (exec_opts.dup duplication knobs)
    python benchmarks/sweep.py --scene iss50k --tex 256 \
        --sweep dup=,leaf,gluecos,tourn,texg

    # findings index for the retired one-off scripts
    python benchmarks/sweep.py --index

Sweepable keys:
  ExecOptions fields (runtime, no scene rebuild): pops, regen_thresh,
      leaf_tail, leaf_split, layout, block_h, sun_pops, dup, uvrec,
      defer_aux, dual_union, stream, stream_tiles, hbm_tris, ...
  Scene-build keys (scene rebuilt per value): wml (wide_max_leaf),
      detail, tex (panel-texture size, 0 = untextured), bvh (method).
  Render-config keys: spp, depth (max_depth), width, height.

Telemetry columns: cvis/ctst = closest-hit walk node visits / triangle
tests, svis/stst = sun-shadow walk, waves = persistent-loop iterations
summed over blocks (all exact in-kernel counters, pallas_path.py
stats).
"""

from __future__ import annotations

import argparse
import dataclasses
import itertools
import os
import struct
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

from dsrt_tpu.config import RenderConfig
from dsrt_tpu.exec_opts import OPTS
from dsrt_tpu.ops.camera import point_camera_at

# Findings index: where each retired one-off sweep's results were banked
# (ROADMAP.md section headings; the scripts themselves are deleted —
# their knobs and measurement pattern live on here).
FINDINGS = """\
sweep50k      defer_shadow A/B                -> ROADMAP 'Round-3 measured findings'
sweep50k2     regen_thresh / block layouts    -> ROADMAP 'Round-3 measured findings'
sweep50k3/6/7 pops + layout grids             -> exec_opts.pops / .layout docstrings
sweep50k4     sort_rays / ordered pushes      -> exec_opts docstrings
sweep50k5     rowtrav + streamed walk         -> exec_opts.rowtrav / .stream
sweep50k8     dup segment attribution         -> ROADMAP 'Round-3 cost attribution'
sweep50k9/10  streamed-walk re-tunes          -> ROADMAP negative-results bank
sweep50k11    quarter-row leaf masking        -> ROADMAP 'Half-block leaf masking'
sweep50k12/13 half-leaf reduce elision        -> ROADMAP 'Half-block leaf masking'
sweep50k14    SBVH vs SAH real-kernel         -> ROADMAP 'Round-3 late additions'
sweep50k15    textured-scene tax decompose    -> ROADMAP 'Round-3 late additions'
sweep50k16    wide_max_leaf re-tune           -> ROADMAP 'wide_max_leaf re-tuned'
sweep50k17/18 dual-union leaf scan            -> exec_opts.dual_union
sweep50k19/20 pops re-tune under SBVH+half    -> exec_opts.pops
sweep50k21    wml x regen at pops4            -> ROADMAP negative-results bank
"""

BASE = (struct.unpack("<I", os.urandom(4))[0] % 100000) * 1e-5


@partial(jax.jit, static_argnames=("cfg", "_opts"))
def _run(scene, cfg, cam, px, py, valid, _opts=None):
    from dsrt_tpu.ops.pallas_path import trace_fused
    return trace_fused(scene, cfg, cam, px, py, valid, return_stats=True)


def measure(scene, cfg, px, py, valid, reps=3):
    """(best_dt, stats int64[7]) with cache-hit hygiene: every rep
    renders a salted-unique input (camera + table epsilon) and the first
    (compile) run is discarded."""
    global BASE
    best = None
    good = 0
    tries = 0
    while good < reps and tries < reps * 4 + 2:
        BASE += 3.1e-3
        cam = point_camera_at((40.0 + BASE, 60.0, 190.0), (0.0, 0.0, 0.0),
                              vfov=cfg.vfov, width=cfg.width,
                              height=cfg.height)
        eps = jnp.float32(BASE * 1e-12)
        sc = dataclasses.replace(scene, tri_pack=scene.tri_pack + eps,
                                 tri_pk8=scene.tri_pk8 + eps)
        t0 = time.perf_counter()
        from dsrt_tpu.exec_opts import opts_key
        _, _, stats = _run(sc, cfg, cam, px, py, valid, _opts=opts_key())
        stats_h = np.asarray(jax.device_get(stats), np.int64)
        dt = time.perf_counter() - t0
        tries += 1
        if tries == 1:
            continue                       # compile rep
        if dt < 0.01:
            continue                       # axon result-cache hit
        good += 1
        if best is None or dt < best[0]:
            best = (dt, stats_h.sum(axis=0))
    if best is None:
        raise RuntimeError("all timed reps were axon cache hits")
    return best


def _panel_texture(path: str, size: int) -> None:
    from dsrt_tpu.utils.image_io import write_png
    y, x = np.mgrid[0:size, 0:size]
    img = np.stack([40 + 30 * ((x // 4 + y // 4) % 2),
                    np.full_like(x, 35), np.full_like(x, 120)], -1)
    write_png(path, img.astype(np.uint8))


def build_scene(args, detail, wml, tex, bvh, salpha=None):
    from dsrt_tpu.models.mesh_gen import iss_standin_scene, iss_mixed_scene
    kw = dict(detail=detail)
    if wml:
        kw["wide_max_leaf"] = wml
    if bvh:
        kw["bvh_method"] = bvh
    if salpha is not None:
        kw["sbvh_alpha"] = salpha
    if tex:
        with tempfile.TemporaryDirectory() as td:
            tp = os.path.join(td, "panel.png")
            _panel_texture(tp, tex)
            kw["tex_path"] = tp
            return (iss_mixed_scene(**kw) if args.scene == "mixed"
                    else iss_standin_scene(**kw))
    return (iss_mixed_scene(**kw) if args.scene == "mixed"
            else iss_standin_scene(**kw))


SCENE_KEYS = {"wml", "detail", "tex", "bvh", "salpha"}
CFG_KEYS = {"spp", "depth", "width", "height"}
DETAIL_BY_SCENE = {"iss": 4, "iss50k": 12, "iss130k": 20, "mixed": 12}


def _parse_val(s: str):
    if s in ("True", "true"):
        return True
    if s in ("False", "false"):
        return False
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        return s


def main() -> int:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--scene", default="iss50k",
                    choices=sorted(DETAIL_BY_SCENE))
    ap.add_argument("--tex", type=int, default=0,
                    help="panel-texture size (0 = untextured)")
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=450)
    ap.add_argument("--opt", action="append", default=[],
                    metavar="KEY=VAL", help="fixed override (any "
                    "sweepable key), e.g. --opt leaf_tail=pad")
    ap.add_argument("--sweep", action="append", default=[],
                    metavar="KEY=V1,V2,...",
                    help="sweep axis (cartesian over multiple --sweep)")
    ap.add_argument("--index", action="store_true",
                    help="print the retired-sweep findings index")
    args = ap.parse_args()
    if args.index:
        print(FINDINGS, end="")
        return 0

    fixed = {}
    for kv in args.opt:
        k, v = kv.split("=", 1)
        fixed[k] = _parse_val(v)
    axes = []
    for kv in args.sweep:
        k, vs = kv.split("=", 1)
        axes.append((k, [_parse_val(v) for v in vs.split(",")]))

    from dsrt_tpu.render import lane_layout
    base_cfg = dict(width=args.width, height=args.height, spp=args.spp,
                    max_depth=50)
    defaults = {f.name: getattr(OPTS, f.name)
                for f in dataclasses.fields(OPTS)}

    combos = (itertools.product(*[vs for _, vs in axes])
              if axes else [()])
    scene_cache = {}
    print(f"# scene={args.scene} tex={args.tex} spp={args.spp} "
          f"{args.width}x{args.height} reps={args.reps} "
          f"fixed={fixed or '-'}", flush=True)
    for combo in combos:
        over = dict(fixed)
        over.update({axes[i][0]: combo[i] for i in range(len(combo))})
        # reset OPTS, apply exec-opts overrides
        for k, v in defaults.items():
            setattr(OPTS, k, v)
        for k, v in over.items():
            if k in SCENE_KEYS or k in CFG_KEYS:
                continue
            if not hasattr(OPTS, k):
                raise SystemExit(f"unknown knob: {k}")
            setattr(OPTS, k, v)
        cfgkw = dict(base_cfg)
        if "spp" in over:
            cfgkw["spp"] = over["spp"]
        if "depth" in over:
            cfgkw["max_depth"] = over["depth"]
        if "width" in over:
            cfgkw["width"] = over["width"]
        if "height" in over:
            cfgkw["height"] = over["height"]
        cfg = RenderConfig(**cfgkw)
        skey = (over.get("detail", DETAIL_BY_SCENE[args.scene]),
                over.get("wml", 0), over.get("tex", args.tex),
                over.get("bvh", ""), over.get("salpha", None))
        if skey not in scene_cache:
            scene_cache[skey] = build_scene(args, *skey)
        scene = scene_cache[skey]
        # OPTS now participates in the jit cache key (the static _opts
        # snapshot threaded through _run), so OPTS-only combos retrace
        # on their own; this belt-and-suspenders clear also evicts the
        # previous combo's executable from device memory between rows.
        _run.clear_cache()
        px, py, valid, _ = lane_layout(cfg.width, cfg.height)
        px, py, valid = (jnp.asarray(px), jnp.asarray(py),
                         jnp.asarray(valid))
        dt, s = measure(scene, cfg, px, py, valid, reps=args.reps)
        rays, waves, cvis, ctst, svis, stst, cleaf = (int(x) for x in s)
        label = " ".join(f"{k}={v}" for k, v in over.items()) or "baseline"
        print(f"{label:40s} {dt*1e3:8.1f} ms  {rays/dt/1e6:7.2f} Mrays/s"
              f"  waves={waves} cvis={cvis} ctst={ctst} svis={svis}"
              f" stst={stst} cleaf={cleaf}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
