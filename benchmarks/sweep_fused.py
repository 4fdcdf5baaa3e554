"""Tile-shape / steps-per-call / nz sweep of the fused column kernel
(VERDICT r1 item 3: the round-1 defaults were chosen from a coarse sweep).

Prints one JSON line per configuration; run on the TPU.

Usage:
    python benchmarks/sweep_fused.py                          # default grid
    python benchmarks/sweep_fused.py --nz 64 --ncol 65536 \
        --tiles 256,512,1024,2048 --spcs 24,48,96
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nz", type=int, default=64)
    p.add_argument("--ncol", type=int, default=65536)
    p.add_argument("--steps", type=int, default=96)
    p.add_argument("--tiles", type=str, default="128,256,512,1024,2048")
    p.add_argument("--spcs", type=str, default="16,32,48,96")
    p.add_argument("--no-ice", action="store_true")
    p.add_argument("--lagged", action="store_true",
                   help="sweep the coefficient_update='step' kernel "
                        "(models/soil/lagged.py) instead of stage "
                        "semantics")
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
        args.tiles, args.spcs = "256,512", "8,16"

    import jax.numpy as jnp

    from bench import build, checksum, two_point_rate
    from landhydrology_tpu.ops.pallas import make_fused_column_run
    from landhydrology_tpu.timestepping import SSPRK33

    dtype = jnp.float32
    model, Y, Ya = build(args.nz, args.ncol, dtype, no_ice=args.no_ice)
    if args.lagged:
        import dataclasses

        model = dataclasses.replace(model, coefficient_update="step")
    interpret = jax.default_backend() != "tpu"
    best = None

    from functools import partial

    for spc in (int(s) for s in args.spcs.split(",")):
        steps = max(args.steps, spc)
        steps -= steps % spc
        n_calls = steps // spc
        for tile in (int(t) for t in args.tiles.split(",")):
            if args.ncol % tile:
                continue
            try:
                fused = make_fused_column_run(
                    model, SSPRK33(), dt=1.0, steps_per_call=spc,
                    tile_cols=tile, interpret=interpret,
                )

                @partial(jax.jit, static_argnums=2)
                def run_sum(Y, t0, n, fused=fused, spc=spc):
                    def body(carry, _):
                        Y, t = carry
                        return (fused(Y, t), t + spc * 1.0), None

                    (Yf, _), _ = jax.lax.scan(
                        body, (Y, t0), None, length=n
                    )
                    return checksum(Yf)

                t0a = jnp.asarray(0.0, dtype)
                pts, _, _ = two_point_rate(
                    lambda n: (lambda: run_sum(Y, t0a, n)),
                    n_calls, 4 * n_calls,
                    args.nz * args.ncol * spc,
                )
                row = {
                    "nz": args.nz, "ncol": args.ncol, "steps_per_call": spc,
                    "tile_cols": tile, "grid_points_per_s": pts,
                    "no_ice": args.no_ice, "lagged": args.lagged,
                }
                if best is None or pts > best["grid_points_per_s"]:
                    best = row
                print(json.dumps(row), flush=True)
            except Exception as e:  # OOM / lowering limits: record and move on
                print(
                    json.dumps(
                        {"steps_per_call": spc, "tile_cols": tile,
                         "error": str(e)[:200]}
                    ),
                    flush=True,
                )
    print(json.dumps({"best": best}), flush=True)


if __name__ == "__main__":
    main()
