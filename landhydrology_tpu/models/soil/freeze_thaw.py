"""Freeze-thaw phase change — the north-star extension beyond the reference.

The reference carries theta_i as a prognostic variable but hard-codes its
tendency to zero (``/root/reference/src/SoilModel/right_hand_side.jl:182``,
``:359``); its energy accounting ``rho_e_int = rho_c_s (T - T_0) -
theta_i rho_i LH_f0`` is already structured for phase change (SURVEY.md §2
"physics scope note").  This module supplies the missing source terms
(driver ``BASELINE.json`` config 3: "freeze-thaw column ... Stefan-like
front propagation").

Scheme — relaxation toward the freezing-point-depression equilibrium
(Niu & Yang 2006 form):

- For T < T_0 the matric potential in equilibrium with ice is
  ``psi_f(T) = LH_f0 (T - T_0) / (g T)`` (Clapeyron); the maximum
  unfrozen liquid is ``theta_l_max = theta_r + (nu - theta_r) *
  S(psi_f)`` with S the inverse van Genuchten retention curve.
- Excess liquid freezes, ice melts above T_0, both at rate 1/tau:

    freeze = max(theta_l - theta_l_max, 0) / tau          (liquid volume)
    melt   = theta_i * [T > T_0] / tau                    (ice volume)

    d theta_i/dt     += (rho_l/rho_i) freeze - melt
    d vartheta_l/dt  += -freeze + (rho_i/rho_l) melt

- ``rho_e_int`` needs **no** source: its definition already books
  ``-theta_i rho_i LH_f0``, so freezing at fixed rho_e_int raises the
  diagnosed temperature (latent-heat release) and melting lowers it —
  energy is conserved identically.

Mass of water (``vartheta_l + (rho_i/rho_l) theta_i``) is conserved
identically by construction.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp

from landhydrology_tpu.constants import EarthParameterSet
from landhydrology_tpu.models.soil import water as sw

Array = Any


@dataclasses.dataclass(frozen=True)
class FreezeThaw:
    """Phase-change config: relaxation timescale ``tau`` (s).

    ``tau`` should resolve a few time steps (tau >= ~3 dt) — the stiff
    limit tau -> 0 recovers instantaneous equilibrium partitioning but
    demands implicit treatment.
    """

    tau: Array = 3600.0


def equilibrium_unfrozen_liquid(
    hm: sw.vanGenuchten, T: Array, nu: Array, param_set: EarthParameterSet
) -> Array:
    """Maximum unfrozen liquid fraction theta_l_max(T) from freezing-point
    depression; +inf above T_0 (no constraint)."""
    T_0 = param_set.T_0
    T_safe = jnp.maximum(T, 200.0)  # keep Clapeyron ratio finite
    psi_f = param_set.LH_f0 * (jnp.minimum(T_safe, T_0) - T_0) / (
        param_set.grav * T_safe
    )
    S_max = sw.inverse_matric_potential(hm, psi_f)
    theta_l_max = hm.theta_r + (nu - hm.theta_r) * S_max
    return jnp.where(T >= T_0, jnp.inf, theta_l_max)


def phase_change_sources(
    ft: FreezeThaw,
    hm: sw.vanGenuchten,
    theta_l: Array,
    theta_i: Array,
    T: Array,
    nu: Array,
    rho_c_s: Array,
    param_set: EarthParameterSet,
) -> tuple:
    """(d vartheta_l/dt, d theta_i/dt) phase-change source pair.

    Both directions are **energy-limited** (Stefan condition): the amount
    frozen (melted) per relaxation time cannot release (absorb) more latent
    heat than would bring the cell to T_0, so the diagnosed temperature
    relaxes to the freezing point instead of chattering across it.
    """
    rho_l = param_set.rho_cloud_liq
    rho_i = param_set.rho_cloud_ice
    L = param_set.LH_f0
    T_0 = param_set.T_0

    theta_l_max = equilibrium_unfrozen_liquid(hm, T, nu, param_set)
    excess = jnp.where(
        jnp.isinf(theta_l_max), 0.0, jnp.maximum(theta_l - theta_l_max, 0.0)
    )
    # energy headroom to T_0, expressed as an ice-volume equivalent
    deficit_ice = jnp.maximum(rho_c_s * (T_0 - T), 0.0) / (rho_i * L)
    surplus_ice = jnp.maximum(rho_c_s * (T - T_0), 0.0) / (rho_i * L)

    freeze_ice = jnp.minimum((rho_l / rho_i) * excess, deficit_ice) / ft.tau
    melt_ice = jnp.minimum(theta_i, surplus_ice) / ft.tau

    d_theta_i = freeze_ice - melt_ice
    d_vartheta_l = (rho_i / rho_l) * (melt_ice - freeze_ice)
    return d_vartheta_l, d_theta_i
