"""Frame-loop driver and CLI — the reference's src/main.cpp redesigned.

Pipeline per frame (reference call stack A, SURVEY.md §3):
pose -> f64 world->model transform -> camera aim -> render -> PNG.

Fixes over the reference, per SURVEY.md §3B/§5:
- the scene is compiled ONCE (the reference re-flattens, re-builds the BVH
  and re-uploads everything per frame, src/main.cpp:404-410); only the
  per-frame sun direction (a data field) changes, so one jitted render
  executable serves the whole sequence;
- PNG written in-process (no ImageMagick shell-out, main.cpp:28-36);
- the output directory is NOT wiped by default (main.cpp:41-50 wipes,
  defeating resume); `--wipe` restores the reference behavior and
  `--start_frame`/`--resume` support restarts;
- every hardcoded constant is a CLI flag (main.cpp:238-267 constants).

Usage:
    python -m dsrt_tpu.driver --input_txt poses.txt --output_dir out \
        [--obj mesh.obj | --standin_detail 2] [--width 800 --height 450]
        [--spp 1000] [--upscale]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

from dsrt_tpu.config import RenderConfig
from dsrt_tpu.models.materials import Material
from dsrt_tpu.models.scene import SceneBuilder
from dsrt_tpu.ops.camera import point_camera_at
from dsrt_tpu.render import render_frame, render_frame_wavefront
from dsrt_tpu.utils.image_io import write_png, write_ppm
from dsrt_tpu.utils.pose import default_pose, read_pose_file
from dsrt_tpu.utils.timing import StageTimer, estimate_rays, mrays_per_sec
from dsrt_tpu.utils.transform import pose_to_frame


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="dsrt_tpu.driver",
        description="Deep-space ray tracer frame-loop driver (TPU)")
    p.add_argument("--input_txt", default="", help="pose file (orbit sim output)")
    p.add_argument("--output_dir", default="render_output")
    p.add_argument("--upscale", action="store_true",
                   help="run the Real-ESRGAN upsampler on the output dir")
    # promoted render config (reference compile-time constants)
    p.add_argument("--width", type=int, default=800)
    p.add_argument("--height", type=int, default=450)
    p.add_argument("--spp", type=int, default=1000)
    p.add_argument("--max_depth", type=int, default=50)
    p.add_argument("--vfov", type=float, default=40.0)
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--gamma", type=float, default=2.0)
    p.add_argument("--sun_radiance", type=float, nargs=3,
                   default=[1e5, 9.5e4, 9e4])
    # scene source
    p.add_argument("--obj", default="", help="OBJ mesh path (model frame)")
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--smooth", action="store_true",
                   help="honor OBJ vn normals (smooth shading; the "
                        "reference parses and discards vn, "
                        "triangle_mesh.h:227-234 — default stays flat)")
    p.add_argument("--standin_tex", default="",
                   help="image texture for the stand-in mesh's panel/"
                        "radiator quads (the real NASA OBJ carries "
                        "map_Kd textures, inc/triangle_mesh.h:244-251; "
                        "this makes the no-asset stand-in match that "
                        "workload)")
    p.add_argument("--standin_detail", type=int, default=2,
                   help="procedural ISS stand-in detail when no --obj")
    p.add_argument("--bvh", choices=["median", "sah", "sbvh"],
                   default="sbvh",
                   help="BVH builder: median = reference parity, sah = "
                        "binned SAH, sbvh = spatial splits (default; "
                        "never measured worse, leaf scans -13%% at ISS "
                        "scale — sweep50k14)")
    p.add_argument("--env_map", default="",
                   help="equirect environment-map image for the sky "
                        "(.hdr stays linear radiance); extension over "
                        "the reference's black background")
    p.add_argument("--env_rotation", type=float, default=0.0,
                   help="env map rotation about +y [deg] (the reference's"
                        " unread env_rotation knob, gpu_scene.h:108)")
    p.add_argument("--env_scale", type=float, default=1.0,
                   help="env radiance multiplier")
    p.add_argument("--mode",
                   choices=["auto", "fused", "parity", "wavefront", "queue"],
                   default="auto",
                   help="auto: fused megakernel when the scene supports it, "
                        "else wavefront. fused: one persistent Pallas "
                        "kernel/frame, bit-identical LCG streams (fastest). "
                        "parity: sequential per-pixel sample loop. "
                        "wavefront: per-lane regeneration. queue: global "
                        "work-queue (auto-bands huge frames).")
    p.add_argument("--spp_batch", type=int, default=8,
                   help="concurrent sample slots per pixel (wavefront mode)")
    p.add_argument("--adaptive", type=float, default=0.0,
                   help="variance-guided adaptive sampling tolerance "
                        "(>0 enables; --spp becomes the per-pixel CAP; "
                        "split-buffer convergence, fused scenes only)")
    p.add_argument("--adaptive_chunk", type=int, default=0,
                   help="samples per adaptive chunk (0 = spp/8)")
    p.add_argument("--no_pipeline", action="store_true",
                   help="disable the frame pipeline (render of frame n+1 "
                        "overlapped with PNG encode of frame n; the "
                        "reference's loop is fully serial, main.cpp:310-431)")
    p.add_argument("--debug_shade", action="store_true",
                   help="flat-shade debug render (ray_color_debug, "
                        "src/gpu_render.cu:663-710): albedo x texture, "
                        "lights white, sky on miss — a visual smoke test")
    p.add_argument("--sky", choices=["solid", "gradient"], default="solid",
                   help="debug-shade sky type (SkyType, inc/gpu_scene.h:90)")
    # TPU execution knobs (exec_opts; SURVEY §5 config promotion)
    p.add_argument("--block_h", type=int, default=None,
                   help="rays per Pallas grid step = block_h x 128 lanes "
                        "(default: the bench-measured ExecOptions default)")
    p.add_argument("--pallas", choices=["auto", "on", "off"], default="auto",
                   help="Pallas kernel gating (off = pure-XLA traversal)")
    p.add_argument("--dispatch_rays", type=int, default=None,
                   help="per-dispatch primary-ray budget for the fused "
                        "megakernels; frames above it render as salted "
                        "spp chunks so one kernel never runs long enough "
                        "to trip the TPU runtime's hang detection "
                        "(default: the measured ExecOptions value; "
                        "0 = never chunk)")
    p.add_argument("--sun_pops", type=int, default=None,
                   help="stack pops per fused sun-shadow wave (3 measured "
                        "~+1.6%% on big textured scenes; default 2 is "
                        "best for small scenes)")
    p.add_argument("--pops", type=int, default=None,
                   help="stack pops per fused traversal wave "
                        "(default: the bench-measured ExecOptions value)")
    p.add_argument("--shard", action="store_true",
                   help="shard the render across all visible devices "
                        "(Mesh('sp','dp') + psum; dp-only sharding is "
                        "bit-identical to single-chip)")
    p.add_argument("--shard_sp", type=int, default=1,
                   help="sample-parallel axis size (must divide devices & spp)")
    # frame control
    p.add_argument("--start_frame", type=int, default=0)
    p.add_argument("--hosts", type=int, default=1,
                   help="multi-host frame distribution: total host count "
                        "(frames are independent, so hosts round-robin "
                        "over DCN with no collectives — SURVEY.md §2.6)")
    p.add_argument("--host_id", type=int, default=0,
                   help="this host's index in [0, --hosts)")
    p.add_argument("--resume", action="store_true",
                   help="skip frames whose PNG already exists")
    p.add_argument("--wipe", action="store_true",
                   help="empty the output dir first (reference behavior)")
    p.add_argument("--save_ppm", action="store_true",
                   help="also write binary PPM P6 like the reference")
    p.add_argument("--timings_tsv", default="",
                   help="write per-stage timings TSV here")
    p.add_argument("--profile", default="",
                   help="capture a jax.profiler trace of the first rendered "
                        "frame into this directory (view with TensorBoard/"
                        "xprof) — the TPU-native replacement for the "
                        "reference's chrono prints (SURVEY.md §5)")
    return p


def build_scene(args, timer: StageTimer):
    with timer.stage("mesh_load"):
        if args.obj:
            from dsrt_tpu.models.obj import load_obj
            fallback = Material.lambertian((0.73, 0.73, 0.73))
            mesh = load_obj(args.obj, fallback, args.scale,
                            smooth=args.smooth)
        else:
            from dsrt_tpu.models.mesh_gen import iss_standin_mesh
            mesh = iss_standin_mesh(args.standin_detail,
                                    tex_path=args.standin_tex)
    with timer.stage("scene_compile"):
        b = SceneBuilder(sun_enabled=True, sun_dir=(0.0, 1.0, 0.0),
                         sun_radiance=tuple(args.sun_radiance),
                         seed=args.seed, bvh_method=args.bvh)
        b.add_mesh(mesh)
        if args.env_map:
            b.set_environment(args.env_map,
                              rotation_deg=args.env_rotation,
                              scale=args.env_scale)
        scene = b.build()
    print(f"Scene: {scene.n_tris} triangles, {scene.n_nodes} BVH nodes, "
          f"{scene.n_spheres} spheres, {len(np.asarray(scene.mat_type))} materials")
    return scene


def _finish_frame(pending, timer: StageTimer, args) -> None:
    """Materialize + encode an in-flight pipelined frame."""
    import jax

    idx, png, dev_img, dev_counts, t0 = pending
    img = np.asarray(jax.device_get(dev_img))
    dt = time.perf_counter() - t0  # dispatch -> materialized
    timer.log("render", dt)
    nrays = int(np.asarray(jax.device_get(dev_counts), np.int64).sum())
    print(f"  [frame {idx}] render+wait: {dt*1e3:.0f} ms  "
          f"({mrays_per_sec(nrays, dt):.1f} Mrays/s, {nrays} rays exact)")
    with timer.stage("encode"):
        write_png(png, img)
        if args.save_ppm:
            write_ppm(png[:-4] + ".ppm", img)
    print(f"Saved {png}")


def run(args) -> int:
    from dsrt_tpu.exec_opts import OPTS
    if args.block_h is not None:
        OPTS.block_h = args.block_h
    OPTS.pallas = args.pallas
    if args.dispatch_rays is not None:
        OPTS.fused_dispatch_rays = args.dispatch_rays
    if args.sun_pops is not None:
        OPTS.sun_pops = args.sun_pops
    if args.pops is not None:
        OPTS.pops = args.pops

    timer = StageTimer()
    os.makedirs(args.output_dir, exist_ok=True)
    if args.wipe:
        for f in os.listdir(args.output_dir):
            fp = os.path.join(args.output_dir, f)
            if os.path.isfile(fp):
                os.unlink(fp)

    print(f"Using input_txt : {args.input_txt or '(none)'}")
    print(f"Using output_dir: {args.output_dir}")

    scene = build_scene(args, timer)
    print(timer.summary())

    poses = []
    if args.input_txt:
        try:
            poses = read_pose_file(args.input_txt)
        except OSError:
            poses = []
    if not poses:
        print("No valid pose file found; using single default pose.")
        poses = [default_pose()]
    else:
        print(f"Loaded {len(poses)} poses.")

    cfg = RenderConfig(width=args.width, height=args.height, spp=args.spp,
                       max_depth=args.max_depth, vfov=args.vfov,
                       gamma=args.gamma, seed=args.seed, sky_type=args.sky)

    total_start = time.perf_counter()
    rendered = 0
    pending = None  # in-flight frame when the pipeline is active
    for i, pose in enumerate(poses):
        if i < args.start_frame:
            continue
        if args.hosts > 1 and i % args.hosts != args.host_id:
            continue  # another host renders this frame
        png = os.path.join(args.output_dir, f"frame_{i:04d}.png")
        if args.resume and os.path.exists(png):
            continue

        frame = pose_to_frame(pose)
        if frame is None:
            print(f"[{i}] camera inside/too close to model; skipping frame.")
            continue

        print(f"\n=== Frame {i} ===")
        print(f"  sep(cam, model) = {frame.separation_m:.3f} m")
        print(f"  sun_dir_model   = ({frame.sun_dir_model[0]:.6f}, "
              f"{frame.sun_dir_model[1]:.6f}, {frame.sun_dir_model[2]:.6f})")

        cam = point_camera_at(frame.cam_in_model, (0.0, 0.0, 0.0),
                              vfov=args.vfov, width=args.width,
                              height=args.height)
        frame_scene = dataclasses.replace(
            scene, sun_dir=np.asarray(frame.sun_dir_model, np.float32))

        profiling = bool(args.profile) and rendered == 0
        if profiling:
            import jax
            jax.profiler.start_trace(args.profile)
        t0 = time.perf_counter()
        nrays = None  # exact in-loop count when the mode provides one
        pending_new = None  # (device_img, device_counts) when pipelining
        if args.debug_shade:
            from dsrt_tpu.render import render_frame_debug
            img = render_frame_debug(frame_scene, cam, cfg)
        elif args.shard:
            import jax as _jax
            from dsrt_tpu.render import fused_kind
            from dsrt_tpu.parallel.mesh import make_mesh
            from dsrt_tpu.parallel.render import (render_frame_sharded,
                                                  render_frame_fused_sharded)
            mesh = make_mesh(len(_jax.devices()), sp=args.shard_sp)
            if args.shard_sp == 1 and fused_kind(frame_scene, cfg):
                # dp-only: every chip runs the fused megakernel on its
                # pixel shard (bit-identical to single-chip)
                img, nrays = render_frame_fused_sharded(
                    frame_scene, cam, cfg, mesh, with_count=True)
            else:
                img = render_frame_sharded(frame_scene, cam, cfg, mesh)
        elif args.adaptive > 0:
            from dsrt_tpu.render import render_frame_adaptive
            img, astats = render_frame_adaptive(
                frame_scene, cam, cfg, tol=args.adaptive,
                chunk_spp=args.adaptive_chunk or None, with_count=True)
            nrays = astats["rays"]
            print(f"  [frame {i}] adaptive: mean spp "
                  f"{astats['mean_spp']:.1f}/{cfg.spp} over "
                  f"{astats['rounds']} rounds")
        else:
            mode = args.mode
            if mode in ("auto", "fused"):
                from dsrt_tpu.render import fused_kind
                if fused_kind(frame_scene, cfg) is not None:
                    mode = "fused"
                elif mode == "fused":
                    print("  fused mode unsupported for this scene; "
                          "falling back to wavefront")
                    mode = "wavefront"
                else:
                    mode = "wavefront"
            if mode in ("fused", "wavefront") and not args.no_pipeline:
                # frame pipeline: dispatch is async — encode of the
                # PREVIOUS frame below overlaps this render on device
                from dsrt_tpu.render import render_frame_async
                pending_new = render_frame_async(
                    frame_scene, cam, cfg, mode=mode,
                    spp_batch=args.spp_batch)
            elif mode == "fused":
                from dsrt_tpu.render import render_frame_fused
                img, nrays = render_frame_fused(frame_scene, cam, cfg,
                                                with_count=True)
            elif mode == "queue":
                from dsrt_tpu.render import render_frame_queue
                img = render_frame_queue(frame_scene, cam, cfg)
            elif mode == "wavefront":
                batch = args.spp_batch
                while args.spp % batch != 0:
                    batch //= 2
                img, nrays = render_frame_wavefront(
                    frame_scene, cam, cfg, spp_batch=max(batch, 1),
                    with_count=True)
            else:
                img = render_frame(frame_scene, cam, cfg)

        if pending_new is not None:
            # finish the previous frame's host work while this one renders
            if pending is not None:
                _finish_frame(pending, timer, args)
                rendered += 1
            pending = (i, png, pending_new[0], pending_new[1], t0)
            if profiling:
                import jax
                np.asarray(jax.device_get(pending_new[0]))
                jax.profiler.stop_trace()
                print(f"  profiler trace written to {args.profile}")
            continue

        dt = time.perf_counter() - t0
        if profiling:
            import jax
            jax.profiler.stop_trace()
            print(f"  profiler trace written to {args.profile}")
        timer.log("render", dt)
        if nrays is not None:
            print(f"  render: {dt*1e3:.0f} ms  "
                  f"({mrays_per_sec(nrays, dt):.1f} Mrays/s, "
                  f"{nrays} rays exact)")
        else:
            est = estimate_rays(args.width, args.height, args.spp)
            print(f"  render: {dt*1e3:.0f} ms  "
                  f"(~{mrays_per_sec(est, dt):.1f} Mrays/s est.)")

        with timer.stage("encode"):
            write_png(png, img)
            if args.save_ppm:
                write_ppm(png[:-4] + ".ppm", img)
        print(f"Saved {png}")
        rendered += 1

    if pending is not None:
        _finish_frame(pending, timer, args)
        rendered += 1

    total = time.perf_counter() - total_start
    print(f"\nTotal runtime: {total:.1f} s ({rendered} frames)")
    if args.timings_tsv:
        timer.write_tsv(args.timings_tsv)

    if args.upscale:
        try:
            from scripts.upsample import process_folder  # optional deps
            process_folder(args.output_dir, args.output_dir + "_upscaled",
                           scale=4)
        except Exception as e:
            print(f"Upscaling unavailable: {e}", file=sys.stderr)
    else:
        print("Upscaling disabled (use --upscale to enable).")
    return 0


def main(argv=None) -> int:
    return run(build_parser().parse_args(argv))


if __name__ == "__main__":
    sys.exit(main())
