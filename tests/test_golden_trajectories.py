"""Cross-implementation allclose regressions against the committed golden
f64 trajectory (tests/data/golden_coupled_f64.npz) — the practical analogue
of BASELINE.md's "vartheta_l / rho_e_int allclose after N steps" criterion.

Every execution path must reproduce the frozen numerics:
- the jit XLA scan path in f64 (exact),
- the fused Pallas kernel (exact — same traced physics),
- the f32 path (loose tolerance — dtype is a config axis).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.data.golden_config import DT, N_STEPS, build_model_and_state

from landhydrology_tpu.domains import make_function_space
from landhydrology_tpu.models.soil.rhs import make_rhs
from landhydrology_tpu.ops.pallas import make_fused_column_run
from landhydrology_tpu.timestepping import SSPRK33

GOLDEN = os.path.join(os.path.dirname(__file__), "data", "golden_coupled_f64.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


def _run_scan(dtype):
    model, Y, Ya, dt = build_model_and_state(dtype)
    grid = make_function_space(model.domain, dtype)
    rhs = make_rhs(model, grid)
    stepper = SSPRK33()

    @jax.jit
    def run(Y, t0):
        def body(carry, _):
            Y, t = carry
            return (stepper.step(rhs, Y, Ya, t, jnp.asarray(dt, dtype=dtype)),
                    t + dt), None

        (Yf, _), _ = jax.lax.scan(body, (Y, t0), None, length=N_STEPS)
        return Yf

    return run(Y, jnp.asarray(0.0, dtype=dtype))


def test_xla_f64_matches_golden(golden):
    Yf = _run_scan(jnp.float64)
    for k in ("vartheta_l", "theta_i", "rho_e_int"):
        np.testing.assert_allclose(
            np.asarray(Yf["soil"][k]), golden[k], rtol=1e-13, atol=1e-18,
            err_msg=k,
        )


def test_pallas_matches_golden(golden):
    model, Y, Ya, dt = build_model_and_state(jnp.float64)
    run = make_fused_column_run(
        model, SSPRK33(), dt=dt, steps_per_call=N_STEPS, tile_cols=8,
        interpret=True,
    )
    Yf = run(Y, 0.0)
    for k in ("vartheta_l", "theta_i", "rho_e_int"):
        np.testing.assert_allclose(
            np.asarray(Yf["soil"][k]), golden[k], rtol=1e-12, atol=1e-16,
            err_msg=k,
        )


def test_f32_matches_golden_loosely(golden):
    Yf = _run_scan(jnp.float32)
    np.testing.assert_allclose(
        np.asarray(Yf["soil"]["vartheta_l"]), golden["vartheta_l"],
        rtol=0, atol=2e-4,
    )
    # energy is large in magnitude; compare via diagnosed relative error
    rel = np.abs(
        np.asarray(Yf["soil"]["rho_e_int"], dtype=np.float64)
        - golden["rho_e_int"]
    ) / (np.abs(golden["rho_e_int"]) + 1e3)
    assert np.max(rel) < 5e-4
