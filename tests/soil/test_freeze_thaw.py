"""Freeze-thaw phase-change tests (TPU-build extension; the reference's
theta_i tendency is hard-coded zero — right_hand_side.jl:359).

Oracles: exact water-mass and energy conservation of the source pair,
latent-heat release (freezing warms at fixed rho_e_int), equilibrium
partition at the freezing-point-depression curve, and a Stefan-like
freezing front propagating downward from a cold Dirichlet top."""

import jax.numpy as jnp
import numpy as np
import pytest

from landhydrology_tpu import (
    Column,
    Dirichlet,
    Simulation,
    SoilColumnBC,
    SoilComponentBC,
    SoilEnergyModel,
    SoilHydrologyModel,
    SoilModel,
    SoilParams,
    VerticalFlux,
    initialize_states,
)
from landhydrology_tpu.constants import default_earth_param_set as ps
from landhydrology_tpu.models.soil import vanGenuchten
from landhydrology_tpu.models.soil.freeze_thaw import (
    FreezeThaw,
    equilibrium_unfrozen_liquid,
    phase_change_sources,
)
from landhydrology_tpu.models.soil.heat import (
    temperature_from_rho_e_int,
    volumetric_heat_capacity,
    volumetric_internal_energy,
)
from landhydrology_tpu.timestepping import SSPRK33

HM = vanGenuchten(n=2.0, alpha=2.6, Ksat=1e-6, theta_r=0.05)
NU = 0.4


def test_source_conserves_water_mass():
    ft = FreezeThaw(tau=100.0)
    theta_l = jnp.asarray([0.3, 0.2, 0.35])
    theta_i = jnp.asarray([0.0, 0.1, 0.02])
    T = jnp.asarray([260.0, 275.0, 272.0])
    rho_c_s = jnp.asarray([2.5e6, 2.5e6, 2.5e6])
    dl, di = phase_change_sources(ft, HM, theta_l, theta_i, T, NU, rho_c_s, ps)
    # d/dt [vartheta_l + (rho_i/rho_l) theta_i] == 0 exactly
    mass_rate = dl + (ps.rho_cloud_ice / ps.rho_cloud_liq) * di
    np.testing.assert_allclose(np.asarray(mass_rate), 0.0, atol=1e-18)
    # cold cell freezes, warm icy cell melts
    assert float(di[0]) > 0.0
    assert float(di[1]) < 0.0


def test_equilibrium_curve_monotone():
    T = jnp.linspace(250.0, 274.0, 50)
    tl = equilibrium_unfrozen_liquid(HM, T, NU, ps)
    finite = np.asarray(tl[:-1])
    assert np.all(np.diff(finite) >= -1e-12)  # colder -> less unfrozen water
    assert np.isinf(float(tl[-1]))  # above T_0: unconstrained


def _freeze_model(bc_top_T=None, tau=400.0):
    if bc_top_T is None:
        top = SoilComponentBC(hydrology=VerticalFlux(0.0), energy=VerticalFlux(0.0))
    else:
        top = SoilComponentBC(
            hydrology=VerticalFlux(0.0), energy=Dirichlet(lambda t: bc_top_T)
        )
    return SoilModel(
        domain=Column(zlim=(-1.0, 0.0), nelements=20),
        energy_model=SoilEnergyModel(),
        hydrology_model=SoilHydrologyModel(hydraulic_model=HM),
        boundary_conditions=SoilColumnBC(
            top=top,
            bottom=SoilComponentBC(
                hydrology=VerticalFlux(0.0), energy=VerticalFlux(0.0)
            ),
        ),
        soil_param_set=SoilParams(nu=NU, S_s=1e-3, rho_c_ds=1.2e6),
        freeze_thaw=FreezeThaw(tau=tau),
    )


def _ic_at(T0):
    def ic(z, m):
        theta = jnp.full_like(z, 0.3)
        theta_i = jnp.zeros_like(z)
        T = jnp.full_like(z, T0)
        rho_c_s = volumetric_heat_capacity(theta, theta_i, 1.2e6, ps)
        return {
            "vartheta_l": theta,
            "theta_i": theta_i,
            "rho_e_int": volumetric_internal_energy(theta_i, rho_c_s, T, ps),
        }

    return ic


def test_supercooled_column_freezes_and_warms():
    """Closed supercooled column: ice forms, diagnosed T rises toward the
    depression curve (latent-heat release), water mass and rho_e_int total
    conserved."""
    model = _freeze_model(None, tau=400.0)
    Y, Ya = initialize_states(model, _ic_at(271.0), 0.0)
    sim = Simulation(
        model, SSPRK33(), Y_init=Y, Ya_init=Ya, dt=10.0, tspan=(0.0, 40000.0)
    )
    sim.run()
    vf = np.asarray(sim.Y["soil"]["vartheta_l"])
    tif = np.asarray(sim.Y["soil"]["theta_i"])
    ref = np.asarray(sim.Y["soil"]["rho_e_int"])

    assert np.all(tif > 1e-4)  # ice formed everywhere
    # water mass conserved
    m0 = 0.3 * 20
    mf = float(np.sum(vf + ps.rho_cloud_ice / ps.rho_cloud_liq * tif))
    assert abs(mf - m0) / m0 < 1e-10
    # energy conserved (zero-flux BCs, sources carry no energy)
    e0 = float(np.sum(np.asarray(Y["soil"]["rho_e_int"])))
    assert abs(float(np.sum(ref)) - e0) / abs(e0) < 1e-10
    # latent heat release: diagnosed T above the supercooled IC
    rho_c_s = volumetric_heat_capacity(vf, tif, 1.2e6, ps)
    Tf = np.asarray(temperature_from_rho_e_int(ref, tif, rho_c_s, ps))
    assert np.all(Tf > 271.0)
    # energy-limited freezing relaxes T to T_0 from below, never across
    assert np.all(Tf < ps.T_0 + 1e-6)
    assert np.all(Tf > ps.T_0 - 0.05)
    # ice amount consistent with the energy balance: the latent heat of the
    # frozen fraction equals the sensible warming from the supercooled IC
    warming = np.asarray(
        volumetric_heat_capacity(vf, tif, 1.2e6, ps)
    ) * (Tf - 271.0)
    latent = tif * ps.rho_cloud_ice * ps.LH_f0
    np.testing.assert_allclose(latent, warming, rtol=0.05)


@pytest.mark.slow
def test_stefan_like_front():
    """Cold Dirichlet top on an initially warm wet column: the freezing
    front (max depth with ice) advances monotonically downward."""
    model = _freeze_model(bc_top_T=263.0, tau=400.0)
    Y, Ya = initialize_states(model, _ic_at(274.0), 0.0)
    sim = Simulation(
        model, SSPRK33(), Y_init=Y, Ya_init=Ya, dt=5.0,
        tspan=(0.0, 200000.0), saveat=40000.0,
    )
    sol = sim.run()
    depths = []
    z = np.asarray(Ya["zc"]).ravel()
    for k in range(1, len(sol)):
        ti = np.asarray(sol.state(k)["soil"]["theta_i"])
        frozen = ti > 1e-4
        depths.append(z[frozen].min() if frozen.any() else 0.0)
    # front depth decreases (goes deeper) over time and ends well below top
    assert all(b <= a + 1e-9 for a, b in zip(depths[:-1], depths[1:]))
    assert depths[-1] < -0.1
    ti_final = np.asarray(sol.state(-1)["soil"]["theta_i"])
    assert np.all(np.isfinite(ti_final))
