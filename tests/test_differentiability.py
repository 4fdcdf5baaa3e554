"""Differentiable-simulation tests: gradients flow through whole
integration loops (parameter calibration / adjoint sensitivity — the
payoff of the NaN-safe masked closures, SURVEY.md §7 hard part 2)."""

import jax
import jax.numpy as jnp
import numpy as np

from landhydrology_tpu import (
    Column,
    Dirichlet,
    FreeDrainage,
    PrescribedTemperatureModel,
    SoilColumnBC,
    SoilComponentBC,
    SoilHydrologyModel,
    SoilModel,
    SoilParams,
    initialize_states,
)
from landhydrology_tpu.domains import make_function_space
from landhydrology_tpu.models.soil import vanGenuchten
from landhydrology_tpu.models.soil.rhs import make_rhs
from landhydrology_tpu.timestepping import SSPRK33

NZ, NSTEP, DT = 40, 200, 0.5


def _final_moisture(ksat):
    hm = vanGenuchten(n=3.0, alpha=2.7, Ksat=ksat, theta_r=0.05)
    model = SoilModel(
        domain=Column(zlim=(-1.0, 0.0), nelements=NZ),
        energy_model=PrescribedTemperatureModel(),
        hydrology_model=SoilHydrologyModel(hydraulic_model=hm),
        boundary_conditions=SoilColumnBC(
            top=SoilComponentBC(hydrology=Dirichlet(lambda t: 0.25)),
            bottom=SoilComponentBC(hydrology=FreeDrainage()),
        ),
        soil_param_set=SoilParams(nu=0.3, S_s=1e-3),
    )
    Y, Ya = initialize_states(
        model,
        lambda z, m: {
            "vartheta_l": jnp.full_like(z, 0.1),
            "theta_i": jnp.zeros_like(z),
        },
        0.0,
    )
    grid = make_function_space(model.domain, jnp.float64)
    rhs = make_rhs(model, grid)
    stepper = SSPRK33()

    def body(carry, _):
        Y, t = carry
        return (stepper.step(rhs, Y, Ya, t, jnp.asarray(DT)), t + DT), None

    (Yf, _), _ = jax.lax.scan(body, (Y, jnp.asarray(0.0)), None, length=NSTEP)
    # depth-integrated moisture: sensitive to how fast the front moves
    return jnp.sum(Yf["soil"]["vartheta_l"]) / NZ


def test_grad_through_simulation_matches_finite_difference():
    ksat0 = 1e-5
    f = jax.jit(_final_moisture)
    g = jax.jit(jax.grad(_final_moisture))

    grad_ad = float(g(ksat0))
    assert np.isfinite(grad_ad)
    assert grad_ad > 0  # more conductive soil wets faster

    eps = 1e-8
    fd = (float(f(ksat0 + eps)) - float(f(ksat0 - eps))) / (2 * eps)
    np.testing.assert_allclose(grad_ad, fd, rtol=2e-4)


def test_grad_wrt_initial_state():
    """Adjoint wrt the full initial state (data assimilation shape)."""

    def loss(theta0_scalar):
        hm = vanGenuchten(n=2.0, alpha=2.6, Ksat=1e-5, theta_r=0.0)
        model = SoilModel(
            domain=Column(zlim=(-1.0, 0.0), nelements=NZ),
            energy_model=PrescribedTemperatureModel(),
            hydrology_model=SoilHydrologyModel(hydraulic_model=hm),
            boundary_conditions=SoilColumnBC(
                top=SoilComponentBC(hydrology=Dirichlet(lambda t: 0.25)),
                bottom=SoilComponentBC(hydrology=FreeDrainage()),
            ),
            soil_param_set=SoilParams(nu=0.3, S_s=1e-3),
        )
        Y, Ya = initialize_states(
            model,
            lambda z, m: {
                "vartheta_l": jnp.full_like(z, theta0_scalar),
                "theta_i": jnp.zeros_like(z),
            },
            0.0,
        )
        grid = make_function_space(model.domain, jnp.float64)
        rhs = make_rhs(model, grid)
        stepper = SSPRK33()

        def body(carry, _):
            Y, t = carry
            return (stepper.step(rhs, Y, Ya, t, jnp.asarray(DT)), t + DT), None

        (Yf, _), _ = jax.lax.scan(body, (Y, jnp.asarray(0.0)), None, length=50)
        return jnp.mean((Yf["soil"]["vartheta_l"] - 0.2) ** 2)

    g = float(jax.grad(loss)(0.12))
    assert np.isfinite(g)
    assert g < 0  # wetter IC moves the profile toward the 0.2 target


def test_gradient_through_fused_kernel_matches_xla_and_fd():
    """make_fused_column_run(differentiable=True): jax.grad works through
    the Pallas kernel (recompute-based custom_vjp whose backward re-traces
    the XLA-equivalent scan) and matches BOTH the XLA-path gradient and
    central finite differences (VERDICT r4 item 8)."""
    from landhydrology_tpu import (
        Column,
        FreeDrainage,
        PrescribedTemperatureModel,
        SoilColumnBC,
        SoilComponentBC,
        SoilHydrologyModel,
        SoilModel,
        SoilParams,
        VerticalFlux,
        initialize_states,
    )
    from landhydrology_tpu.domains import make_function_space
    from landhydrology_tpu.models.soil import vanGenuchten
    from landhydrology_tpu.models.soil.rhs import make_rhs
    from landhydrology_tpu.ops.pallas import make_fused_column_run
    from landhydrology_tpu.timestepping import SSPRK33

    NZ, NCOL, DT, N = 8, 16, 20.0, 6
    model = SoilModel(
        domain=Column(zlim=(-1.0, 0.0), nelements=NZ, batch_shape=(NCOL,)),
        energy_model=PrescribedTemperatureModel(),
        hydrology_model=SoilHydrologyModel(
            hydraulic_model=vanGenuchten(
                n=2.0, alpha=2.6, Ksat=1e-6, theta_r=0.05
            )
        ),
        boundary_conditions=SoilColumnBC(
            top=SoilComponentBC(hydrology=VerticalFlux(-1e-7)),
            bottom=SoilComponentBC(hydrology=FreeDrainage()),
        ),
        soil_param_set=SoilParams(nu=0.4, S_s=1e-3),
    )
    Y0, Ya = initialize_states(
        model,
        lambda z, m: {
            "vartheta_l": 0.2 + 0.03 * jnp.sin(3.0 * z) + 0 * z,
            "theta_i": jnp.zeros_like(z),
        },
        0.0,
    )
    run = make_fused_column_run(
        model, SSPRK33(), dt=DT, steps_per_call=N, tile_cols=NCOL,
        interpret=True, differentiable=True,
    )

    def loss_fused(v0):
        Y = {"soil": dict(Y0["soil"], vartheta_l=v0)}
        Yf = run(Y, 0.0)
        return jnp.mean((Yf["soil"]["vartheta_l"] - 0.25) ** 2)

    grid = make_function_space(model.domain, jnp.float64)
    rhs = make_rhs(model, grid)
    stepper = SSPRK33()

    def loss_xla(v0):
        Y = {"soil": dict(Y0["soil"], vartheta_l=v0)}
        t = jnp.asarray(0.0)
        for _ in range(N):
            Y = stepper.step(rhs, Y, Ya, t, jnp.asarray(DT))
            t = t + DT
        return jnp.mean((Y["soil"]["vartheta_l"] - 0.25) ** 2)

    v0 = Y0["soil"]["vartheta_l"]
    # primals agree (the fused forward is the kernel)
    np.testing.assert_allclose(
        float(loss_fused(v0)), float(loss_xla(v0)), rtol=1e-12
    )
    g_fused = jax.grad(loss_fused)(v0)
    g_xla = jax.grad(loss_xla)(v0)
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_xla), rtol=1e-10, atol=1e-16
    )
    # central finite differences on a few random directions
    rng = np.random.default_rng(0)
    for _ in range(3):
        d = jnp.asarray(rng.standard_normal(v0.shape))
        d = d / jnp.linalg.norm(d)
        eps = 1e-6
        fd = (loss_fused(v0 + eps * d) - loss_fused(v0 - eps * d)) / (2 * eps)
        ad = jnp.vdot(g_fused, d)
        np.testing.assert_allclose(float(ad), float(fd), rtol=5e-5, atol=1e-12)


def test_differentiable_fused_rejects_unsupported():
    import dataclasses

    import pytest as _pytest

    from landhydrology_tpu.models.land import LandModel, SurfaceWaterModel
    from landhydrology_tpu.ops.pallas import make_fused_column_run
    from landhydrology_tpu.timestepping import SSPRK33
    from landhydrology_tpu import (
        Column,
        FreeDrainage,
        PrescribedTemperatureModel,
        SoilColumnBC,
        SoilComponentBC,
        SoilHydrologyModel,
        SoilModel,
        SoilParams,
        VerticalFlux,
    )
    from landhydrology_tpu.models.soil import vanGenuchten

    soil = SoilModel(
        domain=Column(zlim=(-1.0, 0.0), nelements=8, batch_shape=(16,)),
        energy_model=PrescribedTemperatureModel(),
        hydrology_model=SoilHydrologyModel(
            hydraulic_model=vanGenuchten(n=2.0, alpha=2.6, Ksat=1e-6,
                                         theta_r=0.05)
        ),
        boundary_conditions=SoilColumnBC(
            top=SoilComponentBC(hydrology=VerticalFlux(0.0)),
            bottom=SoilComponentBC(hydrology=FreeDrainage()),
        ),
        soil_param_set=SoilParams(nu=0.4, S_s=1e-3),
    )
    land = LandModel(soil=soil, surface=SurfaceWaterModel(
        precipitation=lambda t: 1e-6))
    with _pytest.raises(NotImplementedError, match="differentiable"):
        make_fused_column_run(
            land, SSPRK33(), dt=1.0, interpret=True, differentiable=True
        )


def test_fused_kernel_dt_gradient_not_silently_zero():
    """The differentiable fused run must propagate REAL cotangents for
    dt_run (a None cotangent silently reads as zero): d loss / d dt
    matches finite differences."""
    from landhydrology_tpu import (
        Column,
        FreeDrainage,
        PrescribedTemperatureModel,
        SoilColumnBC,
        SoilComponentBC,
        SoilHydrologyModel,
        SoilModel,
        SoilParams,
        VerticalFlux,
        initialize_states,
    )
    from landhydrology_tpu.models.soil import vanGenuchten
    from landhydrology_tpu.ops.pallas import make_fused_column_run
    from landhydrology_tpu.timestepping import SSPRK33

    NZ, NCOL = 8, 16
    model = SoilModel(
        domain=Column(zlim=(-1.0, 0.0), nelements=NZ, batch_shape=(NCOL,)),
        energy_model=PrescribedTemperatureModel(),
        hydrology_model=SoilHydrologyModel(
            hydraulic_model=vanGenuchten(
                n=2.0, alpha=2.6, Ksat=1e-6, theta_r=0.05
            )
        ),
        boundary_conditions=SoilColumnBC(
            top=SoilComponentBC(hydrology=VerticalFlux(-1e-7)),
            bottom=SoilComponentBC(hydrology=FreeDrainage()),
        ),
        soil_param_set=SoilParams(nu=0.4, S_s=1e-3),
    )
    Y, Ya = initialize_states(
        model,
        lambda z, m: {
            "vartheta_l": 0.2 + 0.03 * jnp.sin(3.0 * z) + 0 * z,
            "theta_i": jnp.zeros_like(z),
        },
        0.0,
    )
    run = make_fused_column_run(
        model, SSPRK33(), dt=20.0, steps_per_call=4, tile_cols=NCOL,
        interpret=True, differentiable=True,
    )

    def loss(dt):
        return jnp.mean(run(Y, 0.0, dt_run=dt)["soil"]["vartheta_l"] ** 2)

    g = float(jax.grad(loss)(jnp.float64(20.0)))
    eps = 1e-3
    fd = (float(loss(jnp.float64(20.0 + eps)))
          - float(loss(jnp.float64(20.0 - eps)))) / (2 * eps)
    assert g != 0.0
    np.testing.assert_allclose(g, fd, rtol=1e-5)
