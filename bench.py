"""Benchmark: coupled soil-column grid-points/s per chip.

The north-star metric (driver ``BASELINE.json``): grid-points processed per
second on the flagship fully coupled water+energy column model.  One grid
point = one (level, column) cell advanced one time step (SSPRK33 = 3 RHS
sweeps per step).

Two measured paths:
- **xla**: the straightforward jit ``lax.scan`` over SSPRK33 steps (the
  faithful reference-style implementation; the reference itself is a serial
  single-column Julia loop with no published numbers — SURVEY.md §6).
- **pallas**: the fused multi-step VMEM-resident column kernel
  (``ops/pallas/column_kernel.py``).

``vs_baseline`` reports pallas throughput relative to the xla path measured
in the same run on the same chip.

Usage:  python bench.py            # full benchmark on the attached TPU
        python bench.py --smoke    # tiny CPU smoke (CI-sized)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build(nz, ncol, dtype, no_ice=False):
    import jax.numpy as jnp

    from landhydrology_tpu import (
        Column,
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

    nu = 0.5
    ks = k_solid(0.0, 0.92, 7.7, 2.5, 0.25)
    msp = SoilParams(
        nu=nu,
        S_s=1e-3,
        nu_ss_quartz=0.92,
        rho_c_ds=(1 - nu) * 1.926e6,
        kappa_solid=ks,
        kappa_sat_unfrozen=ksat_unfrozen(ks, nu, 0.57),
        kappa_sat_frozen=ksat_frozen(ks, nu, 2.29),
    )
    model = SoilModel(
        domain=Column(zlim=(-2.0, 0.0), nelements=nz, batch_shape=(ncol,)),
        energy_model=SoilEnergyModel(),
        hydrology_model=SoilHydrologyModel(
            hydraulic_model=vanGenuchten(
                n=2.0, alpha=2.6, Ksat=0.0443 / 3600 / 100, theta_r=0.0
            )
        ),
        boundary_conditions=SoilColumnBC(
            top=SoilComponentBC(hydrology=VerticalFlux(0.0), energy=VerticalFlux(0.0)),
            bottom=SoilComponentBC(
                hydrology=FreeDrainage(), energy=VerticalFlux(0.0)
            ),
        ),
        soil_param_set=msp,
        dtype=dtype,
        assume_no_ice=no_ice,
    )

    def ic(z, m):
        shape = (nz, ncol)
        # laterally varying moisture/temperature so the sweep sees realistic
        # branch diversity (near-saturation + unsaturated columns)
        col = jnp.arange(ncol, dtype=dtype)[None, :] / ncol
        theta = 0.25 + 0.2 * col + 0.0 * z
        theta_i = jnp.zeros(shape, dtype=dtype)
        T = 284.0 + 6.0 * col + 2.0 * z
        rho_c_s = volumetric_heat_capacity(theta, theta_i, msp.rho_c_ds, ps)
        return {
            "vartheta_l": jnp.broadcast_to(theta, shape).astype(dtype),
            "theta_i": theta_i,
            "rho_e_int": volumetric_internal_energy(theta_i, rho_c_s, T, ps).astype(
                dtype
            ),
        }

    Y, Ya = initialize_states(model, ic, 0.0)
    return model, Y, Ya


def time_fn(fn, *args, reps=3):
    import jax

    out = fn(*args)  # compile + warm
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--smoke", action="store_true", help="tiny CPU run")
    p.add_argument("--nz", type=int, default=64)
    p.add_argument("--ncol", type=int, default=65536)
    p.add_argument("--steps", type=int, default=96)
    p.add_argument("--steps-per-call", type=int, default=48)
    p.add_argument("--tile-cols", type=int, default=512)
    p.add_argument("--dt", type=float, default=1.0)
    p.add_argument(
        "--no-ice",
        action="store_true",
        help="exact assume_no_ice specialization (theta_i == 0 workloads)",
    )
    args = p.parse_args()

    import jax

    # persistent compilation cache: repeated bench invocations on the same
    # machine skip the minutes-long TPU compiles
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        args.nz, args.ncol, args.steps = 16, 1024, 32
        args.steps_per_call, args.tile_cols = 8, 256

    import jax.numpy as jnp

    from landhydrology_tpu.domains import make_function_space
    from landhydrology_tpu.models.soil.rhs import make_rhs
    from landhydrology_tpu.ops.pallas import make_fused_column_run
    from landhydrology_tpu.timestepping import SSPRK33

    dtype = jnp.float32
    model, Y, Ya = build(args.nz, args.ncol, dtype, no_ice=args.no_ice)
    grid = make_function_space(model.domain, dtype)
    stepper = SSPRK33()
    rhs = make_rhs(model, grid)
    dt = jnp.asarray(args.dt, dtype=dtype)
    n_steps = args.steps
    points = args.nz * args.ncol * n_steps

    # --- xla scan path ---
    @jax.jit
    def run_xla(Y, t0):
        def body(carry, _):
            Y, t = carry
            return (stepper.step(rhs, Y, Ya, t, dt), t + dt), None

        (Yf, tf), _ = jax.lax.scan(body, (Y, t0), None, length=n_steps)
        return Yf

    t_xla, Yx = time_fn(run_xla, Y, jnp.asarray(0.0, dtype=dtype))

    # --- pallas fused path ---
    interpret = jax.default_backend() != "tpu"
    fused = make_fused_column_run(
        model,
        stepper,
        dt=args.dt,
        steps_per_call=args.steps_per_call,
        tile_cols=args.tile_cols,
        interpret=interpret,
    )
    n_calls = n_steps // args.steps_per_call

    @jax.jit
    def run_pallas(Y, t0):
        def body(carry, _):
            Y, t = carry
            return (fused(Y, t), t + args.steps_per_call * args.dt), None

        (Yf, tf), _ = jax.lax.scan(body, (Y, t0), None, length=n_calls)
        return Yf

    t_pal, Yp = time_fn(run_pallas, Y, jnp.asarray(0.0, dtype=dtype))

    # --- sharded fused path (the multi-chip hot loop, here on a 1-device
    # mesh: measures shard_map overhead over the plain fused kernel) ---
    from landhydrology_tpu.parallel import (
        make_column_mesh,
        make_fused_sharded_run,
        shard_state,
    )

    mesh1 = make_column_mesh(
        shape=(1,), axis_names=("columns",), devices=jax.devices()[:1]
    )
    run_sharded = make_fused_sharded_run(
        model,
        mesh1,
        stepper,
        dt=args.dt,
        steps_per_call=args.steps_per_call,
        n_calls=n_calls,
        tile_cols=args.tile_cols,
        interpret=interpret,
    )
    t_sh, sh_out = time_fn(
        run_sharded,
        shard_state(Y, mesh1),
        shard_state(Ya, mesh1),
        jnp.asarray(0.0, dtype=dtype),
    )
    Ysh = sh_out[0]

    # cross-check the paths agree (f32 tolerance over n_steps)
    import numpy as np

    v_x = np.asarray(Yx["soil"]["vartheta_l"])
    v_p = np.asarray(Yp["soil"]["vartheta_l"])
    v_s = np.asarray(Ysh["soil"]["vartheta_l"])
    max_dev = float(np.max(np.abs(v_x - v_p)))
    max_dev_sh = float(np.max(np.abs(v_p - v_s)))
    ok = bool(
        np.isfinite(v_p).all() and max_dev < 1e-4 and max_dev_sh < 1e-6
    )

    gps_xla = points / t_xla
    gps_pal = points / t_pal
    gps_sh = points / t_sh
    value = max(gps_pal, gps_xla, gps_sh)
    result = {
        "metric": "coupled soil-column grid-points/s per chip",
        "value": value,
        "unit": "grid-points/s",
        "vs_baseline": gps_pal / gps_xla,
        "detail": {
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
            "nz": args.nz,
            "ncol": args.ncol,
            "steps": n_steps,
            "steps_per_call": args.steps_per_call,
            "xla_grid_points_per_s": gps_xla,
            "pallas_grid_points_per_s": gps_pal,
            "sharded_fused_grid_points_per_s": gps_sh,
            "sharded_vs_plain_fused": gps_sh / gps_pal,
            "paths_agree": ok,
            "max_dev": max_dev,
            "max_dev_sharded": max_dev_sh,
            "note": "vs_baseline = fused-pallas vs jit-scan XLA on the same "
            "chip (reference publishes no perf numbers, SURVEY.md §6)",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
