"""Pose file round-trip, world->model transform, and Kepler math
(SURVEY.md §4 implications (c) and (e))."""

import math

import numpy as np
import pytest

from dsrt_tpu.orbit import kepler
from dsrt_tpu.orbit.trajectory import (OrbitElements, export_txt,
                                       generate_polar_rendezvous_trajectory)
from dsrt_tpu.utils.pose import (default_pose, parse_pose_lines,
                                 read_pose_file, write_pose_file)
from dsrt_tpu.utils.transform import pose_to_frame, rotate_yaw_deg


def test_pose_roundtrip(tmp_path):
    cams = np.array([[1e11, -2e10, 3.5], [4, 5, 6]])
    mdls = np.array([[1e11, -2e10, 0.0], [1, 2, 3]])
    p = str(tmp_path / "poses.txt")
    n = write_pose_file(p, cams, mdls, yaw=90.0)
    assert n == 2
    poses = read_pose_file(p)
    assert len(poses) == 2
    np.testing.assert_allclose(poses[0].cam_pos_world, cams[0])
    np.testing.assert_allclose(poses[1].model_pos_world, mdls[1])
    assert poses[0].euler_deg[0] == 90.0


def test_pose_parser_skips_malformed():
    lines = ["# header", "", "1 2 3 4 5 6 7 8 9",
             "bad line", "1 2 3 4 5", "9 8 7 6 5 4 3 2 1"]
    poses = parse_pose_lines(lines)
    assert len(poses) == 2


def test_yaw_rotation_convention():
    # positive yaw rotates +Z toward +X (main.cpp:103)
    v = rotate_yaw_deg(np.array([0.0, 0.0, 1.0]), 90.0)
    np.testing.assert_allclose(v, [1, 0, 0], atol=1e-12)
    v = rotate_yaw_deg(np.array([1.0, 2.0, 0.0]), 90.0)
    np.testing.assert_allclose(v, [0, 2, -1], atol=1e-12)


def test_pose_to_frame_sun_and_camera():
    pose = default_pose()  # cam (0,50,200), model (0,-100,0), yaw 0
    f = pose_to_frame(pose)
    np.testing.assert_allclose(f.cam_in_model, [0, 150, 200])
    np.testing.assert_allclose(f.sun_dir_model, [0, 1, 0])  # light straight up
    assert abs(f.separation_m - math.sqrt(150 ** 2 + 200 ** 2)) < 1e-6


def test_pose_to_frame_yaw_applied():
    pose = default_pose()
    pose.euler_deg[0] = 90.0
    f = pose_to_frame(pose)
    # cam_rel (0,150,200) rotated by -90 about Y: z->-x ... (x',y,z') with
    # c=0, s=-1: x' = -z, z' = x
    np.testing.assert_allclose(f.cam_in_model, [-200, 150, 0], atol=1e-4)


def test_pose_to_frame_skips_close():
    pose = default_pose()
    pose.cam_pos_world = pose.model_pos_world + np.array([0.1, 0, 0])
    assert pose_to_frame(pose) is None


def test_kepler_residual():
    for e in (0.0, 0.1, 0.5, 0.9):
        M = np.linspace(-3, 3, 17)
        E = kepler.solve_kepler_E(M, e)
        np.testing.assert_allclose(E - e * np.sin(E), M, atol=1e-9)


def test_true_anomaly_roundtrip():
    e = 0.3
    E = np.linspace(-2.5, 2.5, 11)
    f = kepler.true_anomaly_from_E(E, e)
    # invert: tan(E/2) = sqrt((1-e)/(1+e)) tan(f/2)
    E_back = 2 * np.arctan(np.sqrt((1 - e) / (1 + e)) * np.tan(f / 2))
    np.testing.assert_allclose(E_back, E, atol=1e-10)


def test_coe_to_rv_energy_and_momentum():
    a, e = 2287.4, 0.1967
    i, Om, om = np.deg2rad(90), 0.0, np.deg2rad(90)
    for f in np.linspace(0, 2 * np.pi, 7):
        r, v = kepler.coe_to_rv(a, e, i, Om, om, f)
        energy = 0.5 * v @ v - kepler.MU_MOON / np.linalg.norm(r)
        np.testing.assert_allclose(energy, -kepler.MU_MOON / (2 * a),
                                   rtol=1e-10)
        h = np.cross(r, v)
        np.testing.assert_allclose(
            np.linalg.norm(h),
            np.sqrt(kepler.MU_MOON * a * (1 - e ** 2)), rtol=1e-10)


def test_jax_kepler_matches_numpy():
    e = 0.1967
    M = np.linspace(-3, 3, 25)
    En = kepler.solve_kepler_E(M, e)
    Ej = np.asarray(kepler.solve_kepler_E_jax(M, e))
    # JAX path may run f32 (x64 off): tolerate single-precision roundoff
    np.testing.assert_allclose(Ej, En, atol=2e-6)
    fn = kepler.true_anomaly_from_E(En, e)
    rn = np.stack([kepler.coe_to_rv(2287.4, e, 1.5, 0.2, 0.3, fk)[0]
                   for fk in fn])
    rj = np.asarray(kepler.coe_to_rv_jax(2287.4, e, 1.5, 0.2, 0.3, fn)[0])
    np.testing.assert_allclose(rj, rn, rtol=1e-4)


def test_trajectory_and_export(tmp_path):
    el = OrbitElements()  # 100/1000 km polar
    t, r_tgt, r_chs = generate_polar_rendezvous_trajectory(
        el, t_start=-1.0, t_end=0.0, dt=0.01)
    assert len(t) == 101
    # target frozen at periapsis over the orbit pole region
    assert np.allclose(r_tgt, r_tgt[0])
    np.testing.assert_allclose(np.linalg.norm(r_tgt[0]), el.rp, rtol=1e-12)
    # ~1.787 km/s closing speed -> 99 poses before the 25 m stop
    p = str(tmp_path / "r.txt")
    n = export_txt(t, r_tgt, r_chs, p, verbose=False)
    assert n == 99
    poses = read_pose_file(p)
    assert len(poses) == 99
    sep0 = np.linalg.norm(poses[0].cam_pos_world - poses[0].model_pos_world)
    sep_last = np.linalg.norm(poses[-1].cam_pos_world
                              - poses[-1].model_pos_world)
    assert 1700 < sep0 < 1900 and 25 <= sep_last < 60
