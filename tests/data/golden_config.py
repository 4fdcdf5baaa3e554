"""The frozen model/state configuration behind the golden trajectories.

Shared by the generator (make_golden.py) and the regression test so the
two can never drift apart.  Deliberately exercises: coupled water+energy,
free drainage + Dirichlet BCs, heterogeneous per-column parameters, a
near-saturation column, and freeze-thaw-free physics (the reference-parity
subset)."""

import numpy as np

N_STEPS = 64
NZ = 24
NCOL = 8
DT = 10.0


def build_model_and_state(dtype):
    import jax.numpy as jnp

    from landhydrology_tpu import (
        Column,
        Dirichlet,
        FreeDrainage,
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
    from landhydrology_tpu.models.soil.heat import (
        k_solid,
        ksat_frozen,
        ksat_unfrozen,
        volumetric_heat_capacity,
        volumetric_internal_energy,
    )

    rng = np.random.default_rng(42)
    nu = jnp.asarray(rng.uniform(0.42, 0.5, NCOL), dtype=dtype)
    hm = vanGenuchten(
        n=jnp.asarray(rng.uniform(1.6, 2.8, NCOL), dtype=dtype),
        alpha=jnp.asarray(rng.uniform(2.0, 3.5, NCOL), dtype=dtype),
        Ksat=jnp.asarray(rng.uniform(5e-7, 5e-6, NCOL), dtype=dtype),
        theta_r=jnp.asarray(rng.uniform(0.0, 0.04, NCOL), dtype=dtype),
    )
    ks = k_solid(0.0, 0.6, 7.7, 2.5, 0.25)
    msp = SoilParams(
        nu=nu,
        S_s=1e-3,
        nu_ss_quartz=0.6,
        rho_c_ds=1.1e6,
        kappa_solid=ks,
        kappa_sat_unfrozen=ksat_unfrozen(ks, 0.45, 0.57),
        kappa_sat_frozen=ksat_frozen(ks, 0.45, 2.29),
    )
    model = SoilModel(
        domain=Column(zlim=(-1.2, 0.0), nelements=NZ, batch_shape=(NCOL,)),
        energy_model=SoilEnergyModel(),
        hydrology_model=SoilHydrologyModel(hydraulic_model=hm),
        boundary_conditions=SoilColumnBC(
            top=SoilComponentBC(
                hydrology=Dirichlet(lambda t: 0.31),
                energy=Dirichlet(lambda t: 290.0 + 0.0 * t),
            ),
            bottom=SoilComponentBC(
                hydrology=FreeDrainage(), energy=VerticalFlux(0.0)
            ),
        ),
        soil_param_set=msp,
        dtype=dtype,
    )

    def ic(z, m):
        shape = (NZ, NCOL)
        prof = jnp.asarray(
            0.12 + 0.25 * np.exp(np.asarray(z).reshape(NZ, 1) / 0.4)
            + 0.02 * rng.random((NZ, NCOL)),
            dtype=dtype,
        )
        theta = jnp.minimum(prof, 0.9 * nu)
        theta_i = jnp.zeros(shape, dtype=dtype)
        T = jnp.asarray(
            285.0 + 4.0 * np.asarray(z).reshape(NZ, 1) + np.zeros((NZ, NCOL)),
            dtype=dtype,
        )
        rcs = volumetric_heat_capacity(theta, theta_i, 1.1e6, ps)
        return {
            "vartheta_l": theta,
            "theta_i": theta_i,
            "rho_e_int": volumetric_internal_energy(theta_i, rcs, T, ps),
        }

    Y, Ya = initialize_states(model, ic, 0.0)
    return model, Y, Ya, DT
