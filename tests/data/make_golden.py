"""Generate the golden regression trajectories (run once; output committed).

These freeze the validated f64 numerics (the path proven against the
analytic oracles in tests/soil/) so any future change that silently alters
the math — operator reordering, clamp changes, kernel rewrites — fails the
allclose regression in test_golden_trajectories.py (the practical analogue
of BASELINE.md's "allclose vs reference after N steps" criterion).

Usage: python tests/data/make_golden.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from tests.data.golden_config import N_STEPS, build_model_and_state

from landhydrology_tpu.models.soil.rhs import make_rhs
from landhydrology_tpu.domains import make_function_space
from landhydrology_tpu.timestepping import SSPRK33


def main():
    model, Y, Ya, dt = build_model_and_state(jnp.float64)
    grid = make_function_space(model.domain, jnp.float64)
    rhs = make_rhs(model, grid)
    stepper = SSPRK33()
    t = jnp.asarray(0.0)
    for _ in range(N_STEPS):
        Y = stepper.step(rhs, Y, Ya, t, jnp.asarray(dt))
        t = t + dt
    out = os.path.join(os.path.dirname(__file__), "golden_coupled_f64.npz")
    np.savez(
        out,
        vartheta_l=np.asarray(Y["soil"]["vartheta_l"]),
        theta_i=np.asarray(Y["soil"]["theta_i"]),
        rho_e_int=np.asarray(Y["soil"]["rho_e_int"]),
        t=float(t),
    )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
