"""LandModel XLA-scan baseline (context for the fused-LandModel bench row).

Same flagship composition as ``bench.py``'s land path — rain pulse + pond
store + MOST evaporation + coupled water/energy soil — run through the
plain jit ``lax.scan`` engine instead of the fused Pallas kernel, so the
``land_fused_grid_points_per_s`` row in RESULTS.md has an on-chip XLA
denominator.  Timed with the two-point scalar-checksum protocol.

Usage:  python benchmarks/bench_land_xla.py [--nz 64 --ncol 65536]
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
    p.add_argument("--dt", type=float, default=1.0)
    p.add_argument("--surface-update", type=str, default="stage",
                   choices=("stage", "step"))
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

    from functools import partial

    import jax.numpy as jnp

    from bench import build_land, checksum, two_point_rate
    from landhydrology_tpu.timestepping import SSPRK33

    from landhydrology_tpu.models.land import wrap_stepper_for_land

    dtype = jnp.float32
    land, Y, Ya = build_land(
        args.nz, args.ncol, dtype, surface_update=args.surface_update
    )
    rhs = land.make_rhs()
    stepper = wrap_stepper_for_land(SSPRK33(), land)
    dt = jnp.asarray(args.dt, dtype=dtype)
    points = args.nz * args.ncol

    @partial(jax.jit, static_argnums=3)
    def run_sum(Y, Ya, t0, n_steps):
        def body(carry, _):
            Y, t = carry
            return (stepper.step(rhs, Y, Ya, t, dt), t + dt), None

        (Yf, _), _ = jax.lax.scan(body, (Y, t0), None, length=n_steps)
        return checksum(Yf)

    t0a = jnp.asarray(0.0, dtype=dtype)
    gps, t_lo, t_hi = two_point_rate(
        lambda n: (lambda: run_sum(Y, Ya, t0a, n)),
        args.steps, 4 * args.steps, points,
    )
    print(json.dumps({
        "metric": "LandModel (rain+pond+MOST+energy) XLA-scan grid-points/s",
        "value": gps,
        "detail": {
            "nz": args.nz, "ncol": args.ncol, "steps": args.steps,
            "surface_update": args.surface_update,
            "t_lo_hi_s": [t_lo, t_hi],
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
