#!/usr/bin/env python
"""Encode rendered frames into an mp4.

Equivalent of the reference's scripts/frames_to_video.py (:27-83): frames
natural-sorted, resized to the first frame's size, alpha dropped, mp4v
fourcc.  cv2 is optional; without it a pure-ffmpeg fallback is attempted.

Usage: python scripts/frames_to_video.py --in frames_dir --out video.mp4
       [--fps 30] [--pattern "frame_*.png"]
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import subprocess
import sys


def natural_key(s: str):
    return [int(t) if t.isdigit() else t.lower()
            for t in re.split(r"(\d+)", os.path.basename(s))]


def collect_frames(in_dir: str, pattern: str):
    frames = sorted(glob.glob(os.path.join(in_dir, pattern)), key=natural_key)
    if not frames:
        raise SystemExit(f"no frames matching {pattern} in {in_dir}")
    return frames


def encode_cv2(frames, out_path: str, fps: float) -> None:
    import cv2
    first = cv2.imread(frames[0], cv2.IMREAD_COLOR)
    h, w = first.shape[:2]
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    vw = cv2.VideoWriter(out_path, fourcc, fps, (w, h))
    try:
        for f in frames:
            img = cv2.imread(f, cv2.IMREAD_UNCHANGED)
            if img is None:
                continue
            if img.ndim == 3 and img.shape[2] == 4:  # drop alpha
                img = img[:, :, :3]
            if img.shape[:2] != (h, w):              # resize to first
                img = cv2.resize(img, (w, h))
            vw.write(img)
    finally:
        vw.release()


def encode_ffmpeg(frames, out_path: str, fps: float) -> None:
    list_file = out_path + ".frames.txt"
    with open(list_file, "w") as fh:
        for f in frames:
            fh.write(f"file '{os.path.abspath(f)}'\nduration {1.0/fps}\n")
    try:
        subprocess.run(["ffmpeg", "-y", "-f", "concat", "-safe", "0", "-i",
                        list_file, "-pix_fmt", "yuv420p", out_path],
                       check=True)
    finally:
        os.unlink(list_file)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--in", dest="in_dir", required=True)
    p.add_argument("--out", default="render.mp4")
    p.add_argument("--fps", type=float, default=30.0)
    p.add_argument("--pattern", default="frame_*.png")
    args = p.parse_args(argv)

    frames = collect_frames(args.in_dir, args.pattern)
    try:
        encode_cv2(frames, args.out, args.fps)
    except ImportError:
        try:
            encode_ffmpeg(frames, args.out, args.fps)
        except (OSError, subprocess.CalledProcessError) as e:
            print(f"neither cv2 nor ffmpeg available: {e}", file=sys.stderr)
            return 1
    print(f"[+] wrote {args.out} ({len(frames)} frames @ {args.fps} fps)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
