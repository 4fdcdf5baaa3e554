"""Heterogeneous-parameter fused-kernel throughput (the RESULTS.md row).

Same coupled column model as bench.py, but every van Genuchten parameter
and the porosity are per-column arrays streamed into the kernel as tiled
inputs — the regional/reanalysis configuration where each column is a
different soil.  Timed with the two-point scalar-checksum protocol.

Usage:  python benchmarks/bench_hetero.py [--nz 64 --ncol 65536
            --steps-per-call 32 --tile-cols 128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nz", type=int, default=64)
    p.add_argument("--ncol", type=int, default=65536)
    p.add_argument("--steps", type=int, default=96)
    p.add_argument("--steps-per-call", type=int, default=32)
    p.add_argument("--tile-cols", type=int, default=128)
    p.add_argument("--smoke", action="store_true")
    args = p.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        args.nz, args.ncol, args.steps = 16, 1024, 16
        args.steps_per_call, args.tile_cols = 8, 256

    import dataclasses
    from functools import partial

    import jax.numpy as jnp
    import numpy as np

    from bench import build, checksum, two_point_rate
    from landhydrology_tpu.models.soil import vanGenuchten
    from landhydrology_tpu.ops.pallas import make_fused_column_run
    from landhydrology_tpu.timestepping import SSPRK33

    dtype = jnp.float32
    model, Y, Ya = build(args.nz, args.ncol, dtype)
    rng = np.random.default_rng(7)
    ncol = args.ncol
    nu = jnp.asarray(rng.uniform(0.35, 0.5, ncol), dtype=dtype)
    model = dataclasses.replace(
        model,
        hydrology_model=dataclasses.replace(
            model.hydrology_model,
            hydraulic_model=vanGenuchten(
                n=jnp.asarray(rng.uniform(1.5, 3.0, ncol), dtype=dtype),
                alpha=jnp.asarray(rng.uniform(1.5, 4.0, ncol), dtype=dtype),
                Ksat=jnp.asarray(10 ** rng.uniform(-6.5, -5.0, ncol), dtype=dtype),
                theta_r=jnp.asarray(rng.uniform(0.0, 0.06, ncol), dtype=dtype),
            ),
        ),
        soil_param_set=dataclasses.replace(model.soil_param_set, nu=nu),
    )
    # keep the IC inside every column's porosity
    Y = {"soil": dict(Y["soil"], vartheta_l=0.5 * jnp.broadcast_to(
        nu, (args.nz, ncol)
    ))}

    interpret = jax.default_backend() != "tpu"
    fused = make_fused_column_run(
        model, SSPRK33(), dt=1.0, steps_per_call=args.steps_per_call,
        tile_cols=args.tile_cols, interpret=interpret,
    )
    n_calls = args.steps // args.steps_per_call
    points = args.nz * args.ncol
    t0a = jnp.asarray(0.0, dtype=dtype)

    @partial(jax.jit, static_argnums=2)
    def run_sum(Y, t0, n):
        def body(carry, _):
            Y, t = carry
            return (fused(Y, t), t + args.steps_per_call * 1.0), None

        (Yf, _), _ = jax.lax.scan(body, (Y, t0), None, length=n)
        return checksum(Yf)

    gps, t_lo, t_hi = two_point_rate(
        lambda n: (lambda: run_sum(Y, t0a, n)),
        n_calls, 4 * n_calls, points * args.steps_per_call,
    )
    print(json.dumps({
        "metric": "heterogeneous-params fused grid-points/s",
        "value": gps,
        "detail": {"nz": args.nz, "ncol": ncol,
                   "steps_per_call": args.steps_per_call,
                   "tile_cols": args.tile_cols,
                   "streamed_param_leaves": 5,
                   "t_lo_hi_s": [t_lo, t_hi],
                   "backend": jax.default_backend()},
    }))


if __name__ == "__main__":
    main()
