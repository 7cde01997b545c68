"""Lunar polar rendezvous trajectory generation + pose export.

Contract from orbit_sim/lunar_polar_orbit_sim.py:
- target frozen at periapsis (f = 0); chaser propagated along the same
  orbit from t_start = -time to 0 in steps of dt (:144-174);
- defaults: peri_alt 100 km, apo_alt 1000 km, i = 90 deg, RAAN = 0,
  argp = 90 deg (periapsis over the south pole) (:295-326);
- Moon-centered -> Sun-centered by adding the single epoch-fixed Moon
  position (:425-431);
- TXT export: km -> m, yaw fixed at 90 deg, pitch/roll 0, stop when
  separation < 25 m (:179-233).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from dsrt_tpu.orbit import kepler
from dsrt_tpu.orbit.ephemeris import DEFAULT_EPOCH_UTC, get_moon_pos_from_sun
from dsrt_tpu.utils.pose import format_pose_line

SEPARATION_STOP_M = 25.0


@dataclasses.dataclass
class OrbitElements:
    peri_alt_km: float = 100.0
    apo_alt_km: float = 1000.0
    incl_deg: float = 90.0
    raan_deg: float = 0.0
    argp_deg: float = 90.0

    @property
    def rp(self) -> float:
        return kepler.R_MOON + self.peri_alt_km

    @property
    def ra(self) -> float:
        return kepler.R_MOON + self.apo_alt_km

    @property
    def a(self) -> float:
        return 0.5 * (self.rp + self.ra)

    @property
    def e(self) -> float:
        return 1.0 - self.rp / self.a


def generate_polar_rendezvous_trajectory(
        elements: OrbitElements, t_start: float = -600.0, t_end: float = 0.0,
        dt: float = 1.0, use_jax: bool = False
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (t[N], r_target[N,3], r_chaser[N,3]) Moon-centered km."""
    a, e = elements.a, elements.e
    i = np.deg2rad(elements.incl_deg)
    Om = np.deg2rad(elements.raan_deg)
    om = np.deg2rad(elements.argp_deg)
    n = np.sqrt(kepler.MU_MOON / a ** 3)

    N = int(round((t_end - t_start) / dt)) + 1
    t_arr = t_start + dt * np.arange(N)

    r_peri, _ = kepler.coe_to_rv(a, e, i, Om, om, 0.0)
    r_target = np.repeat(r_peri[None, :], N, axis=0)

    M = n * t_arr
    if use_jax:
        E = np.asarray(kepler.solve_kepler_E_jax(M, e))
        f = kepler.true_anomaly_from_E(E, e)
        r_chaser = np.asarray(kepler.coe_to_rv_jax(a, e, i, Om, om, f)[0])
    else:
        E = kepler.solve_kepler_E(M, e)
        f = kepler.true_anomaly_from_E(E, e)
        r_chaser = np.stack(
            [kepler.coe_to_rv(a, e, i, Om, om, fk)[0] for fk in f])

    return t_arr, r_target, r_chaser


def export_txt(t_arr: np.ndarray, r_target_km: np.ndarray,
               r_chaser_km: np.ndarray, filename: str,
               yaw_deg: float = 90.0, verbose: bool = True) -> int:
    """Write the pose file; chaser = camera, target = model; returns the
    number of poses written (stops at 25 m separation)."""
    n = 0
    with open(filename, "w") as fh:
        fh.write("# cam_x  cam_y  cam_z     model_x model_y model_z     "
                 "yaw  pitch  roll\n")
        for k, (cam_km, mdl_km) in enumerate(zip(r_chaser_km, r_target_km)):
            dist_m = float(np.linalg.norm(cam_km - mdl_km)) * 1000.0
            if dist_m < SEPARATION_STOP_M:
                if verbose:
                    print(f"[+] Stopping TXT export at index {k}, "
                          f"t = {t_arr[k]:.1f} s: separation {dist_m:.3f} m "
                          f"< {SEPARATION_STOP_M:.1f} m")
                break
            fh.write(format_pose_line(cam_km * 1000.0, mdl_km * 1000.0,
                                      yaw_deg))
            n += 1
    if verbose:
        print(f"[+] Wrote {filename} (positions in meters, stopping at "
              f"{SEPARATION_STOP_M} m)")
    return n


def generate_pose_file(filename: str, time_s: float = 600.0, dt: float = 1.0,
                       elements: Optional[OrbitElements] = None,
                       epoch_utc: str = DEFAULT_EPOCH_UTC,
                       kernel_dir: Optional[str] = None,
                       sun_centered: bool = True,
                       use_jax: bool = False) -> int:
    """End-to-end: trajectory -> (optional) Sun-centered shift -> pose txt."""
    elements = elements or OrbitElements()
    t, r_tgt, r_chs = generate_polar_rendezvous_trajectory(
        elements, t_start=-time_s, t_end=0.0, dt=dt, use_jax=use_jax)
    if sun_centered:
        r_moon_sun = get_moon_pos_from_sun(epoch_utc, kernel_dir)
        r_tgt = r_tgt + r_moon_sun
        r_chs = r_chs + r_moon_sun
    return export_txt(t, r_tgt, r_chs, filename)
