"""Benchmark: coupled soil-column grid-points/s per chip.

The north-star metric (driver ``BASELINE.json``): grid points processed per
second on the flagship fully coupled water+energy column model.  One grid
point = one (level, column) cell advanced one time step (SSPRK33 = 3 RHS
sweeps per step).

Three measured paths:
- **xla**: the straightforward jit ``lax.scan`` over SSPRK33 steps (the
  faithful reference-style implementation; the reference itself is a serial
  single-column Julia loop with no published numbers — SURVEY.md §6).
- **pallas**: the fused multi-step VMEM-resident column kernel
  (``ops/pallas/column_kernel.py``).
- **sharded**: the fused kernel inside shard_map on a 1-device mesh (the
  multi-chip hot loop; measures shard_map overhead).

``vs_baseline`` reports fused-pallas throughput relative to the xla path
measured in the same run on the same chip.

**Timing protocol** (see CLAUDE.md): the TPU tunnel's
``block_until_ready`` is unreliable (can return without a device sync) and
adds ~25 ms fixed cost when it does wait, so every rate is measured by
**two-point differencing of jitted scalar-checksum runs** — time a run of
``n`` and of ``4n`` steps, each forced by a ``float()`` readback of a
checksum over ALL state components (a partial checksum lets XLA dead-code
eliminate whole equations), and report ``rate = 3n·work / (t_hi - t_lo)``.

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


def build_land(nz, ncol, dtype, surface_update="stage",
               coefficient_update="stage"):
    """The flagship composition: the bench soil column + MOST atmosphere +
    rain pulse + pond store (rain + ponding + evaporation + energy), for the
    fused-LandModel bench row (VERDICT r2 item 3).

    ``surface_update="step"`` freezes the blended MOST multisection solve
    per step instead of per RK stage (LandModel.surface_update);
    ``coefficient_update="step"`` additionally lags the soil's nonlinear
    coefficient sweep (SoilModel.coefficient_update, models/soil/lagged.py)
    — the two step-level splittings compose (the production configuration)."""
    import dataclasses

    import jax.numpy as jnp

    from landhydrology_tpu import (
        PrescribedAtmosForcing,
        SoilColumnBC,
        SoilComponentBC,
        VerticalFlux,
    )
    from landhydrology_tpu.models.land import (
        LandModel,
        PulsePrecipitation,
        SurfaceWaterModel,
        initialize_states as land_init,
    )

    model, Y, Ya = build(nz, ncol, dtype)
    soil = dataclasses.replace(
        model,
        assume_no_ice=False,
        coefficient_update=coefficient_update,
        boundary_conditions=SoilColumnBC(
            top=PrescribedAtmosForcing(
                u_atm=2.0, theta_atm=297.0, z_atm=2.0, theta_scale=297.0,
                rho_a_sfc=1.2, q_atm=0.005,
            ),
            bottom=SoilComponentBC(
                hydrology=VerticalFlux(0.0), energy=VerticalFlux(0.0)
            ),
        ),
    )
    land = LandModel(
        soil=soil,
        surface=SurfaceWaterModel(
            precipitation=PulsePrecipitation(rate=8e-6, t_start=0.0,
                                             t_stop=1e9),
            tau_pond=300.0,
        ),
        surface_update=surface_update,
    )
    Yl = dict(Y)
    Yl["surface"] = {"h_s": jnp.full((ncol,), 1e-4, dtype=dtype)}
    return land, Yl, Ya


def build_stiff(nz, ncol, dtype):
    """The reference's stiffest regime: sand infiltration with a Dirichlet
    top (``richards_equation.jl:98-190``, explicit dt=0.25 s at dz=1 cm) —
    the matched-accuracy arena where the implicit steppers earn wall-clock
    over explicit CFL stepping.  Richards-only (PrescribedTemperature), the
    same column count as the main bench rows."""
    import jax.numpy as jnp

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
    from landhydrology_tpu.models.soil import vanGenuchten

    model = SoilModel(
        domain=Column(zlim=(-1.5, 0.0), nelements=nz, batch_shape=(ncol,)),
        energy_model=PrescribedTemperatureModel(),
        hydrology_model=SoilHydrologyModel(
            hydraulic_model=vanGenuchten(
                n=3.96, alpha=2.7, Ksat=34.0 / 3600.0 / 100.0, theta_r=0.075
            )
        ),
        boundary_conditions=SoilColumnBC(
            top=SoilComponentBC(hydrology=Dirichlet(lambda t: 0.267)),
            bottom=SoilComponentBC(hydrology=FreeDrainage()),
        ),
        soil_param_set=SoilParams(nu=0.287, S_s=1e-3),
        dtype=dtype,
    )

    def ic(z, m):
        shape = (nz, ncol)
        col = jnp.arange(ncol, dtype=dtype)[None, :] / ncol
        theta = 0.10 + 0.02 * col + 0.0 * z
        return {
            "vartheta_l": jnp.broadcast_to(theta, shape).astype(dtype),
            "theta_i": jnp.zeros(shape, dtype=dtype),
        }

    Y, Ya = initialize_states(model, ic, 0.0)
    return model, Y, Ya


def checksum(Y: dict):
    """Scalar checksum over ALL state components — the forced readback that
    defeats both the tunnel's unreliable block_until_ready and XLA's
    dead-code elimination of unobserved equations."""
    total = 0.0
    for comp in Y.values():
        for v in comp.values():
            total = total + v.sum()
    return total


def time_checksum(fn, *args, reps=3):
    """Best-of-reps wall time of a jitted scalar-returning fn, forced by
    float() readback (4-byte device->host transfer)."""
    out = float(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, out


def two_point_rate(make_fn, n_lo, n_hi, work_per_n, *args, reps=3):
    """rate = (n_hi - n_lo) * work_per_n / (t(n_hi) - t(n_lo)): cancels the
    tunnel's fixed per-dispatch sync overhead."""
    t_lo, _ = time_checksum(make_fn(n_lo), *args, reps=reps)
    t_hi, _ = time_checksum(make_fn(n_hi), *args, reps=reps)
    dt = max(t_hi - t_lo, 1e-9)
    return (n_hi - n_lo) * work_per_n / dt, t_lo, t_hi


def time_fn(fn, *args, reps=3):
    """Legacy block_until_ready timing (kept for CPU paths where it is
    reliable; do not use for TPU rates — see the module docstring)."""
    import jax

    out = fn(*args)
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
    p.add_argument("--steps-per-call", type=int, default=32)
    p.add_argument(
        "--tile-cols", type=int, default=None,
        help="fused-kernel column-tile width; default picks by nz "
             "(512 for nz <= 32 — shallow columns need wide tiles to "
             "amortize per-tile overhead, the round-4 global-scale row's "
             "missing factor (measured sweep in benchmarks/RESULTS.md) — "
             "128 otherwise)",
    )
    p.add_argument("--land-tile-cols", type=int, default=512,
                   help="the MOST multisection stacks 8 probe rows, and the "
                        "surface solve amortizes best at wider tiles than "
                        "the pure vertical sweep")
    p.add_argument("--dt", type=float, default=1.0)
    p.add_argument(
        "--no-ice",
        action="store_true",
        help="exact assume_no_ice specialization (theta_i == 0 workloads)",
    )
    p.add_argument(
        "--land-surface-update", type=str, default="stage",
        choices=("stage", "step"),
        help="LandModel.surface_update for the land path: 'stage' = MOST "
             "solves in every RK stage (reference semantics), 'step' = "
             "frozen per step (first-order surface split, ~3x fewer MOST "
             "solves)",
    )
    p.add_argument(
        "--land-lagged", action="store_true",
        help="compose the land path with soil coefficient_update='step' "
             "(lagged nonlinear coefficients, models/soil/lagged.py) — the "
             "production configuration when paired with "
             "--land-surface-update step",
    )
    p.add_argument(
        "--implicit-solver", type=str, default="pcr",
        choices=("thomas", "pcr"),
        help="tridiagonal backend for the implicit rows: 'thomas' (serial "
             "sweep, latency-bound in-kernel) or 'pcr' (parallel cyclic "
             "reduction, latency-parallel over nz)",
    )
    p.add_argument(
        "--implicit-dt-factor", type=float, default=40.0,
        help="implicit (TR-BDF2) step size as a multiple of the measured "
             "explicit CFL limit on the stiff infiltration config",
    )
    p.add_argument(
        "--paths", type=str,
        default="xla,pallas,sharded,land,lagged,implicit",
        help="comma-separated subset of "
             "{xla,pallas,sharded,land,lagged,implicit} to "
             "measure (xla and pallas are always on; trimming the rest "
             "keeps very large --ncol runs inside a sane wall-clock). "
             "'lagged' = the fused kernel with coefficient_update='step' "
             "(nonlinear coefficients evaluated once per step instead of "
             "per RK stage; first-order splitting, models/soil/lagged.py)",
    )
    args = p.parse_args()
    paths = set(args.paths.split(","))

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
        # the smoke's nz=16 grid takes a front cell per step at 40x CFL
        # (dt ~ dz^2): cap the implicit factor at the accuracy-validated
        # value for that resolution (the hardware rows at nz=64 run 40x,
        # rmse 5e-4 — the factor is resolution-dependent by nature)
        args.implicit_dt_factor = min(args.implicit_dt_factor, 20.0)
    if args.tile_cols is None:
        args.tile_cols = 512 if args.nz <= 32 else 128

    from functools import partial

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
    points = args.nz * args.ncol

    # --- xla scan path ---
    # NOTE: Ya (which carries the (nz, ncol) coordinate field) is passed as
    # an explicit argument, never closure-captured: a captured device array
    # is baked into the serialized program, and at reanalysis scale
    # (8.4M columns -> ~0.5 GB of zc) that overflows the remote-compile
    # request of the tunneled TPU backend (HTTP 413).
    @partial(jax.jit, static_argnums=3)
    def run_xla(Y, Ya, t0, n_steps):
        def body(carry, _):
            Y, t = carry
            return (stepper.step(rhs, Y, Ya, t, dt), t + dt), None

        (Yf, tf), _ = jax.lax.scan(body, (Y, t0), None, length=n_steps)
        return Yf

    @partial(jax.jit, static_argnums=3)
    def run_xla_sum(Y, Ya, t0, n_steps):
        return checksum(run_xla(Y, Ya, t0, n_steps))

    t0a = jnp.asarray(0.0, dtype=dtype)
    gps_xla, t_xla_lo, t_xla_hi = two_point_rate(
        lambda n: (lambda: run_xla_sum(Y, Ya, t0a, n)),
        args.steps, 4 * args.steps, points,
    )
    Yx = run_xla(Y, Ya, t0a, args.steps)  # state for the agreement check

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
    n_calls = args.steps // args.steps_per_call

    @partial(jax.jit, static_argnums=2)
    def run_pallas(Y, t0, n_calls):
        def body(carry, _):
            Y, t = carry
            return (fused(Y, t), t + args.steps_per_call * args.dt), None

        (Yf, tf), _ = jax.lax.scan(body, (Y, t0), None, length=n_calls)
        return Yf

    @partial(jax.jit, static_argnums=2)
    def run_pallas_sum(Y, t0, n_calls):
        return checksum(run_pallas(Y, t0, n_calls))

    gps_pal, t_pal_lo, t_pal_hi = two_point_rate(
        lambda n: (lambda: run_pallas_sum(Y, t0a, n)),
        n_calls, 4 * n_calls, points * args.steps_per_call,
    )
    Yp = run_pallas(Y, t0a, n_calls)

    # --- sharded fused path (the multi-chip hot loop, here on a 1-device
    # mesh: measures shard_map overhead over the plain fused kernel) ---
    gps_sh = t_sh_lo = t_sh_hi = None
    Ysh = Yp
    if "sharded" in paths:
        from landhydrology_tpu.parallel import (
            make_column_mesh,
            make_fused_sharded_run,
            shard_state,
        )

        mesh1 = make_column_mesh(
            shape=(1,), axis_names=("columns",), devices=jax.devices()[:1]
        )
        Ys_in = shard_state(Y, mesh1)
        Yas_in = shard_state(Ya, mesh1)

        def make_sharded(n):
            run = make_fused_sharded_run(
                model,
                mesh1,
                stepper,
                dt=args.dt,
                steps_per_call=args.steps_per_call,
                n_calls=n,
                tile_cols=args.tile_cols,
                interpret=interpret,
            )

            @jax.jit
            def run_sum(Ys, Yas, t0):
                Yf, _ = run(Ys, Yas, t0)
                return checksum(Yf)

            return lambda: run_sum(Ys_in, Yas_in, t0a)

        gps_sh, t_sh_lo, t_sh_hi = two_point_rate(
            make_sharded, n_calls, 4 * n_calls, points * args.steps_per_call,
        )
        run_sh_state = make_fused_sharded_run(
            model, mesh1, stepper, dt=args.dt,
            steps_per_call=args.steps_per_call, n_calls=n_calls,
            tile_cols=args.tile_cols, interpret=interpret,
        )
        Ysh, _ = run_sh_state(Ys_in, Yas_in, t0a)

    # --- lagged-coefficient fused path (coefficient_update="step") ---
    gps_lag = t_lag_lo = t_lag_hi = None
    max_dev_lag = None
    if "lagged" in paths:
        import dataclasses as _dc

        model_lag = _dc.replace(model, coefficient_update="step")
        fused_lag = make_fused_column_run(
            model_lag,
            stepper,
            dt=args.dt,
            steps_per_call=args.steps_per_call,
            tile_cols=args.tile_cols,
            interpret=interpret,
        )

        @partial(jax.jit, static_argnums=2)
        def run_lag(Y, t0, n_calls):
            def body(carry, _):
                Y, t = carry
                return (
                    fused_lag(Y, t), t + args.steps_per_call * args.dt
                ), None

            (Yf, _), _ = jax.lax.scan(body, (Y, t0), None, length=n_calls)
            return Yf

        @partial(jax.jit, static_argnums=2)
        def run_lag_sum(Y, t0, n_calls):
            return checksum(run_lag(Y, t0, n_calls))

        gps_lag, t_lag_lo, t_lag_hi = two_point_rate(
            lambda n: (lambda: run_lag_sum(Y, t0a, n)),
            n_calls, 4 * n_calls, points * args.steps_per_call,
        )
        # sanity: the lagged trajectory is a first-order-split neighbor of
        # the stage trajectory, not a different solution (loose bound; the
        # measured-order test pins the convergence rate)
        Ylag = run_lag(Y, t0a, n_calls)
        v_l = __import__("numpy").asarray(Ylag["soil"]["vartheta_l"])
        v_pp = __import__("numpy").asarray(Yp["soil"]["vartheta_l"])
        max_dev_lag = float(abs(v_l - v_pp).max())

    # --- fused LandModel path (rain + pond + MOST + energy) ---
    gps_land = t_land_lo = t_land_hi = None
    if "land" in paths:
        land, Yl, Yal = build_land(
            args.nz, args.ncol, dtype,
            surface_update=args.land_surface_update,
            coefficient_update="step" if args.land_lagged else "stage",
        )
        fused_land = make_fused_column_run(
            land,
            stepper,
            dt=args.dt,
            steps_per_call=args.steps_per_call,
            tile_cols=min(args.land_tile_cols, args.ncol),
            interpret=interpret,
        )

        @partial(jax.jit, static_argnums=2)
        def run_land_sum(Y, t0, n_calls):
            def body(carry, _):
                Y, t = carry
                return (
                    fused_land(Y, t),
                    t + args.steps_per_call * args.dt,
                ), None

            (Yf, _), _ = jax.lax.scan(body, (Y, t0), None, length=n_calls)
            return checksum(Yf)

        gps_land, t_land_lo, t_land_hi = two_point_rate(
            lambda n: (lambda: run_land_sum(Yl, t0a, n)),
            n_calls, 4 * n_calls, points * args.steps_per_call,
        )

    # --- implicit (TR-BDF2) path on the stiff infiltration config: the
    # wall-clock-at-matched-accuracy comparison the explicit rows cannot
    # make (VERDICT r4 item 1).  Rates are grid-point-steps/s as everywhere
    # else; the headline is simulated-seconds per wall-second, where the
    # implicit step's 20x dt beats its ~2x-per-step cost. ---
    imp = None
    if "implicit" in paths:
        from landhydrology_tpu.diagnostics import explicit_dt_limit
        from landhydrology_tpu.imex import TRBDF2Soil

        model_st, Y_st, Ya_st = build_stiff(args.nz, args.ncol, dtype)
        grid_st = make_function_space(model_st.domain, dtype)
        rhs_st = make_rhs(model_st, grid_st)
        # CFL limit at the sharpest state the run can visit: a discrete
        # wetting front puts the dry IC (0.1) and the Dirichlet value
        # (0.267) on ADJACENT cells, and that face's K x dpsi/dtheta
        # coupling — not any smooth profile — binds the explicit step
        # (empirically the alternating-extremes profile matches the
        # observed stability boundary within ~2x; safety 0.5 covers it)
        v_wet = Y_st["soil"]["vartheta_l"]
        nz_st = v_wet.shape[0]
        front = jnp.where(
            (jnp.arange(nz_st) % 2)[:, None] == 0, 0.1, 0.267
        ).astype(dtype)
        Y_wet = {
            "soil": dict(
                Y_st["soil"],
                vartheta_l=jnp.broadcast_to(front, v_wet.shape),
            )
        }
        dt_exp = 0.5 * float(explicit_dt_limit(model_st, Y_wet))
        # integer factor keeps the matched-accuracy horizons EXACTLY equal
        # (the explicit accuracy run takes factor_i steps per implicit
        # step); a fractional --implicit-dt-factor would silently compare
        # different horizons
        factor_i = int(round(args.implicit_dt_factor))
        dt_imp = factor_i * dt_exp
        stepper_im = TRBDF2Soil(
            model=model_st, grid=grid_st, iters=2,
            tridiag=args.implicit_solver,
        )
        spc_im = 8

        # fused explicit rate on the stiff config
        fused_ex = make_fused_column_run(
            model_st, stepper, dt=dt_exp,
            steps_per_call=args.steps_per_call, tile_cols=args.tile_cols,
            interpret=interpret,
        )

        @partial(jax.jit, static_argnums=2)
        def run_ex_sum(Y, t0, n_calls):
            def body(carry, _):
                Yc, t = carry
                return (fused_ex(Yc, t), t + args.steps_per_call * dt_exp), None

            (Yf, _), _ = jax.lax.scan(body, (Y, t0), None, length=n_calls)
            return checksum(Yf)

        gps_ex_st, _, _ = two_point_rate(
            lambda n: (lambda: run_ex_sum(Y_st, t0a, n)),
            n_calls, 4 * n_calls, points * args.steps_per_call,
        )

        # fused implicit rate
        fused_im = make_fused_column_run(
            model_st, stepper_im, dt=dt_imp, steps_per_call=spc_im,
            tile_cols=args.tile_cols, interpret=interpret,
        )

        @partial(jax.jit, static_argnums=2)
        def run_im_sum(Y, t0, n_calls):
            def body(carry, _):
                Yc, t = carry
                return (fused_im(Yc, t), t + spc_im * dt_imp), None

            (Yf, _), _ = jax.lax.scan(body, (Y, t0), None, length=n_calls)
            return checksum(Yf)

        gps_im, _, _ = two_point_rate(
            lambda n: (lambda: run_im_sum(Y_st, t0a, n)),
            4, 16, points * spc_im,
        )

        # XLA implicit rate (what the kernel buys for implicit
        # stepping).  The XLA row always uses ITS best backend (the
        # unrolled Thomas sweep — PCR's shift concatenations are slower
        # under plain XLA-CPU/TPU fusion), so implicit_fused_vs_xla is an
        # honest best-vs-best comparison.
        stepper_im_xla = TRBDF2Soil(
            model=model_st, grid=grid_st, iters=2, tridiag="thomas"
        )

        @partial(jax.jit, static_argnums=3)
        def run_im_xla_sum(Y, Ya, t0, n_steps):
            dt_a = jnp.asarray(dt_imp, dtype=dtype)

            def body(carry, _):
                Yc, t = carry
                return (stepper_im_xla.step(rhs_st, Yc, Ya, t, dt_a), t + dt_a), None

            (Yf, _), _ = jax.lax.scan(body, (Y, t0), None, length=n_steps)
            return checksum(Yf)

        gps_im_xla, _, _ = two_point_rate(
            lambda n: (lambda: run_im_xla_sum(Y_st, Ya_st, t0a, n)),
            32, 128, points,
        )

        # matched-horizon accuracy: spc_im implicit steps vs exactly
        # spc_im * dt_factor explicit steps (one explicit fused call per
        # implicit step keeps the horizons identical for any factor)
        @jax.jit
        def acc_im(Y, t0):
            return fused_im(Y, t0)  # one call = spc_im steps

        fused_ex_acc = make_fused_column_run(
            model_st, stepper, dt=dt_exp, steps_per_call=factor_i,
            tile_cols=args.tile_cols, interpret=interpret,
        )

        @jax.jit
        def acc_ex(Y, t0):
            def body(carry, _):
                Yc, t = carry
                return (fused_ex_acc(Yc, t), t + factor_i * dt_exp), None

            (Yf, _), _ = jax.lax.scan(
                body, (Y, t0), None, length=spc_im
            )
            return Yf

        import numpy as _np

        v_im_acc = _np.asarray(acc_im(Y_st, t0a)["soil"]["vartheta_l"])
        v_ex_acc = _np.asarray(acc_ex(Y_st, t0a)["soil"]["vartheta_l"])
        dev_imp = float(_np.max(_np.abs(v_im_acc - v_ex_acc)))
        # the max-norm is front-localized (sub-cell front-position shift);
        # the profile norm is the reference's own acceptance metric for
        # this exact config (l2 < 0.1, richards_equation.jl:189) — gate at
        # 10x tighter
        rmse_imp = float(_np.sqrt(_np.mean((v_im_acc - v_ex_acc) ** 2)))

        imp = {
            "config": "stiff sand infiltration (Dirichlet top, "
            "richards_equation.jl:98-190)",
            "dt_explicit_cfl_s": dt_exp,
            "dt_implicit_s": dt_imp,
            "implicit_stepper": (
                f"TRBDF2Soil(iters=2, tridiag={args.implicit_solver!r})"
            ),
            "explicit_fused_grid_points_per_s": gps_ex_st,
            "implicit_fused_grid_points_per_s": gps_im,
            "implicit_xla_grid_points_per_s": gps_im_xla,
            "implicit_fused_vs_xla": gps_im / gps_im_xla,
            # simulated-seconds per wall-second, implicit over explicit at
            # the same accuracy tolerance (dev reported below)
            "effective_speedup_matched_accuracy": (gps_im * dt_imp)
            / (gps_ex_st * dt_exp),
            "implicit_dt_factor": factor_i,
            "max_dev_implicit_vs_explicit": dev_imp,
            "rmse_implicit_vs_explicit": rmse_imp,
            "implicit_finite": bool(_np.isfinite(v_im_acc).all()),
        }

    # cross-check the paths agree (f32 tolerance over n_steps)
    import numpy as np

    v_x = np.asarray(Yx["soil"]["vartheta_l"])
    v_p = np.asarray(Yp["soil"]["vartheta_l"])
    max_dev = float(np.max(np.abs(v_x - v_p)))
    # the sharded-vs-fused agreement check only exists when the sharded
    # path actually ran; otherwise report None rather than a vacuous 0.0
    if "sharded" in paths:
        v_s = np.asarray(Ysh["soil"]["vartheta_l"])
        max_dev_sh = float(np.max(np.abs(v_p - v_s)))
    else:
        max_dev_sh = None
    ok = bool(
        np.isfinite(v_p).all()
        and max_dev < 1e-4
        and (max_dev_sh is None or max_dev_sh < 1e-6)
    )

    if max_dev_lag is not None:
        import math as _math

        ok = ok and _math.isfinite(max_dev_lag) and max_dev_lag < 1e-2
    if imp is not None:
        ok = (
            ok
            and imp["implicit_finite"]
            and imp["rmse_implicit_vs_explicit"] < 1e-2
        )

    value = max(
        x for x in (gps_pal, gps_xla, gps_sh, gps_lag) if x is not None
    )
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
            "steps": args.steps,
            "steps_per_call": args.steps_per_call,
            "xla_grid_points_per_s": gps_xla,
            "pallas_grid_points_per_s": gps_pal,
            "sharded_fused_grid_points_per_s": gps_sh,
            "sharded_vs_plain_fused": (
                gps_sh / gps_pal if gps_sh is not None else None
            ),
            "lagged_grid_points_per_s": gps_lag,
            "lagged_vs_stage_fused": (
                gps_lag / gps_pal if gps_lag is not None else None
            ),
            "max_dev_lagged": max_dev_lag,
            "land_fused_grid_points_per_s": gps_land,
            "land_vs_plain_fused": (
                gps_land / gps_pal if gps_land is not None else None
            ),
            "land_surface_update": args.land_surface_update,
            "land_coefficient_update": (
                "step" if args.land_lagged else "stage"
            ),
            "implicit": imp,
            "paths_agree": ok,
            "max_dev": max_dev,
            "max_dev_sharded": max_dev_sh,
            "timing": {
                "protocol": "two-point scalar-checksum differencing "
                "(tunnel-sync-safe; see bench.py docstring)",
                "xla_t_lo_hi_s": [t_xla_lo, t_xla_hi],
                "pallas_t_lo_hi_s": [t_pal_lo, t_pal_hi],
                "sharded_t_lo_hi_s": [t_sh_lo, t_sh_hi],
            },
            "note": "vs_baseline = fused-pallas vs jit-scan XLA on the same "
            "chip (reference publishes no perf numbers, SURVEY.md §6); "
            "value = best measured path (the lagged row is the "
            "coefficient_update='step' mode — first-order splitting, "
            "accuracy model in models/soil/lagged.py)",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
