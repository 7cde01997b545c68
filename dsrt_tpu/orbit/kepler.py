"""Keplerian two-body propagation (NumPy f64 + vmapped JAX variant).

Behavior contract from orbit_sim/lunar_polar_orbit_sim.py:
- constants mu_Moon = 4902.800066 km^3/s^2, R_Moon = 1737.4 km (:30-32);
- Kepler solver: Newton iteration on M = E - e sin E, tol 1e-10, <= 50
  iterations, initial guess E = M (:59-75);
- E -> true anomaly via cos f = (cos E - e)/(1 - e cos E),
  sin f = sqrt(1-e^2) sin E / (1 - e cos E) (:77-87);
- classical elements -> r,v through the perifocal rotation
  Q = R3(Omega) R1(i) R3(omega) (:89-139).

The JAX variant (`solve_kepler_E_jax`, `coe_to_rv_jax`) vmaps the solve over
time arrays on-device — the north-star "pose generation shares the jitted
frame loop" item (BASELINE.json).
"""

from __future__ import annotations

import numpy as np

MU_MOON = 4902.800066   # [km^3/s^2]
R_MOON = 1737.4         # [km]
R_SUN = 696_340.0       # [km]


def solve_kepler_E(M, e, tol=1e-10, max_iter=50):
    """Newton-solve M = E - e sin E (elliptic); M scalar or array [rad]."""
    M = np.asarray(M, dtype=np.float64)
    E = M.copy()
    for _ in range(max_iter):
        f = E - e * np.sin(E) - M
        fp = 1.0 - e * np.cos(E)
        dE = -f / fp
        E = E + dE
        if np.all(np.abs(dE) < tol):
            break
    return E


def true_anomaly_from_E(E, e):
    cosE = np.cos(E)
    sinE = np.sin(E)
    denom = 1.0 - e * cosE
    cosf = (cosE - e) / denom
    sinf = (np.sqrt(1.0 - e ** 2) * sinE) / denom
    return np.arctan2(sinf, cosf)


def perifocal_to_inertial(i, Omega, omega):
    cO, sO = np.cos(Omega), np.sin(Omega)
    co, so = np.cos(omega), np.sin(omega)
    ci, si = np.cos(i), np.sin(i)
    R3_O = np.array([[cO, -sO, 0.0], [sO, cO, 0.0], [0.0, 0.0, 1.0]])
    R1_i = np.array([[1.0, 0.0, 0.0], [0.0, ci, si], [0.0, -si, ci]])
    R3_o = np.array([[co, -so, 0.0], [so, co, 0.0], [0.0, 0.0, 1.0]])
    return R3_O @ R1_i @ R3_o


def coe_to_rv(a, e, i, Omega, omega, f, mu=MU_MOON):
    """Classical elements -> (r, v) in the inertial frame [km, km/s]."""
    r_mag = a * (1.0 - e ** 2) / (1.0 + e * np.cos(f))
    r_pf = np.array([r_mag * np.cos(f), r_mag * np.sin(f), 0.0])
    h = np.sqrt(mu * a * (1.0 - e ** 2))
    v_pf = (mu / h) * np.array([-np.sin(f), e + np.cos(f), 0.0])
    Q = perifocal_to_inertial(i, Omega, omega)
    return Q @ r_pf, Q @ v_pf


# --------------------------------------------------------------------------
# JAX vmapped variant (device-capable, f32-safe formulation)
# --------------------------------------------------------------------------

def solve_kepler_E_jax(M, e, iters: int = 50):
    """Fixed-iteration Newton solve, vmappable over M arrays.

    Uses a static iteration count (tol-checked early exit would force a
    data-dependent loop; 50 Newton steps is far past convergence)."""
    import jax.numpy as jnp
    import jax.lax as lax

    M = jnp.asarray(M)
    e = jnp.asarray(e, M.dtype)

    def body(_, E):
        f = E - e * jnp.sin(E) - M
        fp = 1.0 - e * jnp.cos(E)
        return E - f / fp

    return lax.fori_loop(0, iters, body, M)


def coe_to_rv_jax(a, e, i, Omega, omega, f, mu=MU_MOON):
    import jax.numpy as jnp

    f = jnp.asarray(f)
    r_mag = a * (1.0 - e ** 2) / (1.0 + e * jnp.cos(f))
    r_pf = (r_mag * jnp.cos(f), r_mag * jnp.sin(f))
    h = np.sqrt(mu * a * (1.0 - e ** 2))
    v_pf = ((mu / h) * (-jnp.sin(f)), (mu / h) * (e + jnp.cos(f)))
    # apply Q elementwise (z_pf = 0); a (N,3)@(3,3) matmul would hit the
    # MXU at bf16 default precision on TPU — f32 VPU math instead
    Q = perifocal_to_inertial(i, Omega, omega)

    def rot(px, py):
        return jnp.stack([Q[0, 0] * px + Q[0, 1] * py,
                          Q[1, 0] * px + Q[1, 1] * py,
                          Q[2, 0] * px + Q[2, 1] * py], axis=-1)

    return rot(*r_pf), rot(*v_pf)
