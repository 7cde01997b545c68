"""Beyond-reference trajectory families: CR3BP L2 halo (NRHO) and the
non-coplanar plane-offset flyby (dsrt_tpu/orbit/cr3bp.py, trajectory.py).

The reference simulator is Kepler-only; these families extend it.  The
CR3BP checks are analytic: the Jacobi constant is the problem's exact
integral (propagation accuracy), and a differentially-corrected halo
must close on itself after one period.
"""

import os

import numpy as np
import pytest

from dsrt_tpu.orbit import cr3bp
from dsrt_tpu.orbit.trajectory import (OrbitElements,
                                       generate_nrho_trajectory,
                                       generate_offset_rendezvous_trajectory,
                                       generate_pose_file)
from dsrt_tpu.utils.pose import read_pose_file


@pytest.fixture(scope="module")
def halo():
    return cr3bp.l2_southern_halo()


def test_jacobi_constant_conserved(halo):
    # NRHO perilune passages are stiff: fixed-step RK4 needs fine steps
    # there (4k steps/period drifts ~4e-7; 20k steps ~8e-10 — 4th-order
    # convergence intact)
    states = cr3bp.propagate(halo.state0, halo.period, 20000)
    C = np.array([cr3bp.jacobi_constant(s) for s in states[::1000]])
    assert np.max(np.abs(C - C[0])) < 1e-8


def test_halo_is_periodic(halo):
    end = cr3bp.rk4(cr3bp.eom, halo.state0, 0.0, halo.period, 8000)
    assert np.linalg.norm(end - halo.state0) < 1e-4


def test_halo_is_nrho_class(halo):
    """z0 = -0.18 corrects to a Gateway-class NRHO: perilune a few
    thousand km, apolune ~70,000 km, period ~6-7 days."""
    sts = halo.sample(2000)
    km = cr3bp.rotating_to_moon_centered_km(
        sts, np.linspace(0, halo.period, 2000, endpoint=False),
        inertial=False)
    r = np.linalg.norm(km, axis=1)
    assert 1500.0 < r.min() < 6000.0
    assert 55000.0 < r.max() < 85000.0
    days = halo.period * cr3bp.TSTAR_S / 86400.0
    assert 5.5 < days < 7.5


def test_halo_crossing_is_perpendicular(halo):
    # y0 = vx0 = vz0 = 0 by construction (symmetric section)
    s = halo.state0
    assert s[1] == 0.0 and s[3] == 0.0 and s[5] == 0.0


def test_nrho_trajectory_closes_on_target():
    t, r_tgt, r_chs = generate_nrho_trajectory(time_s=1200.0, dt=30.0,
                                               lead_s=300.0)
    sep_m = np.linalg.norm(r_chs - r_tgt, axis=1) * 1000.0
    assert sep_m[0] > sep_m[-1]
    assert sep_m[-1] < 100.0
    # monotone closure (geometric glideslope)
    assert np.all(np.diff(sep_m) < 1e-6)


def test_offset_family_closest_approach_scales_with_dincl():
    el = OrbitElements()
    _, r_t1, r_c1 = generate_offset_rendezvous_trajectory(
        el, dincl_deg=1.0, t_start=-300.0, dt=5.0)
    _, r_t2, r_c2 = generate_offset_rendezvous_trajectory(
        el, dincl_deg=2.0, t_start=-300.0, dt=5.0)
    d1 = np.linalg.norm(r_c1 - r_t1, axis=1).min()
    d2 = np.linalg.norm(r_c2 - r_t2, axis=1).min()
    # closest approach ~ rp * d_incl (radians)
    rp = el.rp
    assert d1 == pytest.approx(rp * np.deg2rad(1.0), rel=0.2)
    assert d2 == pytest.approx(rp * np.deg2rad(2.0), rel=0.2)


@pytest.mark.parametrize("family", ["plane_offset", "nrho"])
def test_pose_file_roundtrip(tmp_path, family):
    path = os.path.join(tmp_path, f"{family}.txt")
    n = generate_pose_file(path, time_s=300.0, dt=30.0, family=family)
    assert n > 0
    poses = read_pose_file(path)
    assert len(poses) == n
    # Sun-centered magnitudes (~1 AU components, like the shipped file)
    cam = np.asarray(poses[0].cam_pos_world)
    assert 1e10 < np.linalg.norm(cam) < 5e11
