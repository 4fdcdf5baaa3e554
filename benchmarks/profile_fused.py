"""Measured roofline for the fused column kernel (VERDICT r1 item 3).

Produces *measured* utilization numbers, not inference:

1. counts the per-point op mix of one RHS stage from the traced jaxpr
   (element-ops: each equation weighted by its output element count);
2. microbenchmarks the chip's sustained rates for the relevant units —
   transcendental chain (exp), cheap-VPU chain (fma), and HBM stream
   (copy) — at the bench shape;
3. times the fused kernel and reports achieved transcendental/s, flop/s
   and HBM bytes/s as fractions of the measured (not peak-sheet) rates.

Optionally captures a jax.profiler trace (``--trace DIR``) for xprof.

Usage:
    python benchmarks/profile_fused.py                # TPU, bench shape
    python benchmarks/profile_fused.py --smoke        # CPU sanity
    python benchmarks/profile_fused.py --trace benchmarks/traces/fused
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

#: primitives that execute on the transcendental/special-function path
TRANSCENDENTAL = {"exp", "log", "pow", "tanh", "log1p", "expm1", "logistic"}
#: cheap elementwise VPU ops (one issue slot each)
CHEAP = {
    "add", "sub", "mul", "max", "min", "select_n", "abs", "neg",
    "sign", "floor", "integer_pow", "and", "or", "not", "xor", "ne", "eq",
    "lt", "le", "gt", "ge", "convert_element_type",
}
#: multi-pass VPU ops (measured ~6x a mul on v5e when the divisor/operand
#: is an array; scalar-divisor divisions are strength-reduced by XLA to a
#: reciprocal multiply and classified cheap below)
SLOW_VPU = {"div", "sqrt", "rsqrt"}


def count_element_ops(jaxpr, while_trip_hint: float = 1.0) -> dict:
    """Element-op counts by class, recursing into sub-jaxprs (scan bodies
    are multiplied by trip count when static; while bodies by
    ``while_trip_hint`` — see the --land flag)."""
    from jax._src.core import ClosedJaxpr
    import numpy as np

    totals = {
        "transcendental": 0.0, "cheap": 0.0, "slow_vpu": 0.0, "other": 0.0,
        "by_prim": {},
        "_while_trip_hint": float(while_trip_hint),
        # every while body is weighted by the SINGLE trip hint; when a
        # profiled rhs contains more than one while (e.g. MOST multisection
        # + the freeze-thaw relaxation fori_loop) the second one is mis-
        # weighted — count them so the caller can see the assumption break
        # (ADVICE r4)
        "n_while": 0,
    }

    def size_of(eqn):
        return float(
            sum(np.prod(v.aval.shape, dtype=float) for v in eqn.outvars)
        )

    def _is_slow(eqn):
        """A div is a full multi-pass divide unless its DIVISOR is scalar
        (x / c strength-reduces to a reciprocal multiply; c / x does NOT —
        the earlier all-operands-array rule misclassified scalar-numerator
        divides as cheap).  sqrt/rsqrt of an array are always multi-pass."""
        name = eqn.primitive.name
        if name in ("sqrt", "rsqrt"):
            return True
        divisor = eqn.invars[-1]
        return (
            hasattr(divisor, "aval")
            and np.prod(divisor.aval.shape, dtype=float) > 1
        )

    def visit(jxp, mult):
        for eqn in jxp.eqns:
            name = eqn.primitive.name
            inner = [
                v for k, v in eqn.params.items()
                if isinstance(v, ClosedJaxpr)
            ]
            if name == "scan":
                visit(eqn.params["jaxpr"].jaxpr, mult * eqn.params["length"])
                continue
            if name == "while":
                # fori_loop lowers to while, whose trip count is not in
                # the jaxpr; weight the body by the caller-provided hint
                # (the MOST multisection round count when profiling a
                # MOST-bearing model — recorded in the output JSON).
                # the cond jaxpr is O(1) bookkeeping; only the body scales
                totals["n_while"] += 1
                visit(eqn.params["body_jaxpr"].jaxpr,
                      mult * totals.get("_while_trip_hint", 1.0))
                continue
            if inner:
                for cj in inner:
                    visit(cj.jaxpr, mult)
                continue
            n = size_of(eqn) * mult
            totals["by_prim"][name] = totals["by_prim"].get(name, 0.0) + n
            if name in TRANSCENDENTAL:
                totals["transcendental"] += n
            elif name in SLOW_VPU and _is_slow(eqn):
                totals["slow_vpu"] += n
            elif name in CHEAP or name in SLOW_VPU:
                totals["cheap"] += n
            else:
                totals["other"] += n

    visit(jaxpr.jaxpr, 1.0)
    if totals["n_while"] > 1:
        import sys as _sys

        print(
            f"WARNING: {totals['n_while']} while loops in the profiled "
            f"jaxpr; every body is weighted by the single "
            f"while_trip_hint={while_trip_hint} — per-loop trip counts "
            "differ (e.g. MOST rounds vs freeze-thaw iterations), so the "
            "class totals are approximate",
            file=_sys.stderr,
        )
    return totals


def time_checksum(fn, *args, reps=3):
    """Best-of-reps wall time of a jitted scalar-returning fn, forced by a
    float() readback.  block_until_ready is NOT reliable on the TPU tunnel
    (see CLAUDE.md / bench.py): only a host readback of a value proves the
    device executed."""
    out = float(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, out


def two_point_rate(make_fn, n_lo, n_hi, work_per_n, reps=3):
    """rate = added work / added time between an n_lo- and an n_hi-iteration
    run — cancels the tunnel's fixed per-dispatch sync overhead (~25 ms)."""
    t_lo, _ = time_checksum(make_fn(n_lo), reps=reps)
    t_hi, _ = time_checksum(make_fn(n_hi), reps=reps)
    return (n_hi - n_lo) * work_per_n / max(t_hi - t_lo, 1e-9), t_lo, t_hi


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nz", type=int, default=64)
    p.add_argument("--ncol", type=int, default=65536)
    p.add_argument("--steps", type=int, default=480)
    p.add_argument("--steps-per-call", type=int, default=48)
    p.add_argument("--tile-cols", type=int, default=512)
    p.add_argument("--no-ice", action="store_true")
    p.add_argument("--land", action="store_true",
                   help="profile the flagship LandModel composition "
                        "(rain + pond + blended MOST + energy) at stage "
                        "semantics instead of the plain coupled soil "
                        "column; the MOST multisection fori_loop lowers "
                        "to a while_loop whose trip count is not in the "
                        "jaxpr, so its body is weighted by the f32 round "
                        "count (recorded in the output)")
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--trace", type=str, default=None,
                   help="capture a jax.profiler trace of the fused run")
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

    import jax.numpy as jnp
    import numpy as np

    from bench import build, build_land
    from landhydrology_tpu.domains import make_function_space
    from landhydrology_tpu.models.soil.rhs import make_rhs
    from landhydrology_tpu.ops.pallas import make_fused_column_run
    from landhydrology_tpu.timestepping import SSPRK33

    dtype = jnp.float32
    nz, ncol = args.nz, args.ncol
    while_trip = 1.0
    if args.land:
        from landhydrology_tpu.models.land import make_rhs as make_land_rhs
        from landhydrology_tpu.models.soil.surface_fluxes import (
            _N_ROUNDS_F32,
        )

        model, Y, Ya = build_land(nz, ncol, dtype)
        grid = make_function_space(model.soil.domain, dtype)
        rhs = make_land_rhs(model, grid)
        # the MOST multisection fori_loop lowers to a while_loop; weight
        # its body by the f32 round count (the only while in this rhs)
        while_trip = float(_N_ROUNDS_F32)
    else:
        model, Y, Ya = build(nz, ncol, dtype, no_ice=args.no_ice)
        grid = make_function_space(model.domain, dtype)
        rhs = make_rhs(model, grid)
    points = nz * ncol

    # --- 1. op mix of one RHS stage (element-weighted jaxpr counts) ---
    jaxpr = jax.make_jaxpr(lambda Y, Ya, t: rhs(Y, Ya, t))(
        Y, Ya, jnp.asarray(0.0, dtype)
    )
    ops = count_element_ops(jaxpr, while_trip_hint=while_trip)
    per_pt = {
        k: ops[k] / points
        for k in ("transcendental", "cheap", "slow_vpu", "other")
    }
    top_prims = dict(
        sorted(ops["by_prim"].items(), key=lambda kv: -kv[1])[:12]
    )

    # --- 2. microbenchmarked unit rates at the bench shape (two-point) ---
    from functools import partial

    x0 = jnp.asarray(
        np.random.default_rng(0).uniform(0.1, 0.9, (nz, ncol)), dtype
    )
    base = 64 if args.smoke else 1024

    # bodies run INNER dependent-op chains so the scan-carry HBM traffic
    # amortizes away and the measured rate is the true unit ceiling
    INNER = 16

    @partial(jax.jit, static_argnums=1)
    def exp_chain(x, n):
        def body(x, _):
            for _ in range(INNER):
                x = jnp.exp(x * 1e-6) * 0.5
            return x, None

        x, _ = jax.lax.scan(body, x, None, length=n)
        return x.sum()

    exp_rate, _, _ = two_point_rate(
        lambda n: (lambda: exp_chain(x0, n)), base, 4 * base, INNER * points
    )

    @partial(jax.jit, static_argnums=1)
    def fma_chain(x, n):
        def body(x, c):
            for _ in range(INNER):
                x = x * c + 1e-12
            return x, None

        cs = 1.0 + jnp.arange(n, dtype=dtype) * 1e-12
        x, _ = jax.lax.scan(body, x, cs)
        return x.sum()

    fma_rate, _, _ = two_point_rate(
        lambda n: (lambda: fma_chain(x0, n)), 4 * base, 16 * base,
        INNER * points,
    )

    # multi-stream issue ceiling: 4 INDEPENDENT fma chains interleaved —
    # the single-stream chain above is latency-bound (the fused kernel was
    # measured ABOVE it, proving the VPU dual-issues); this saturating
    # variant is the defensible denominator for an achieved-slot fraction
    # (VERDICT r3 item 6)
    NSTREAM = 4

    @partial(jax.jit, static_argnums=1)
    def fma_multi(x, n):
        def body(xs, c):
            for _ in range(INNER):
                xs = tuple(x * c + 1e-12 for x in xs)
            return xs, None

        cs = 1.0 + jnp.arange(n, dtype=dtype) * 1e-12
        xs, _ = jax.lax.scan(
            body, tuple(x + 0.01 * k for k in range(NSTREAM)), cs
        )
        return sum(x.sum() for x in xs)

    fma_multi_rate, _, _ = two_point_rate(
        lambda n: (lambda: fma_multi(x0, n)), base, 4 * base,
        NSTREAM * INNER * points,
    )

    @partial(jax.jit, static_argnums=1)
    def exp_multi(x, n):
        def body(xs, _):
            for _ in range(INNER):
                xs = tuple(jnp.exp(x * 1e-6) * 0.5 for x in xs)
            return xs, None

        xs, _ = jax.lax.scan(
            body, tuple(x + 0.01 * k for k in range(NSTREAM)), None, length=n
        )
        return sum(x.sum() for x in xs)

    exp_multi_rate, _, _ = two_point_rate(
        lambda n: (lambda: exp_multi(x0, n)), base // 2, 2 * base,
        NSTREAM * INNER * points,
    )

    @partial(jax.jit, static_argnums=1)
    def recip_chain(x, n):
        def body(x, c):
            for _ in range(INNER):
                x = 1.0 / (x + c)
            return x, None

        cs = 1.02 + jnp.arange(n, dtype=dtype) * 1e-9
        x, _ = jax.lax.scan(body, x, cs)
        return x.sum()

    recip_rate, _, _ = two_point_rate(
        lambda n: (lambda: recip_chain(x0, n)), base, 4 * base,
        INNER * points,
    )

    big = jnp.zeros((256 * 1024 * 1024 // 4,), dtype)  # 256 MB stream
    hbm_base = 4 if args.smoke else 16

    @partial(jax.jit, static_argnums=1)
    def stream(x, n):
        def body(x, c):
            return x * c, None  # varying multiplier: not foldable to x*c^n

        cs = 1.0 + jnp.arange(n, dtype=dtype) * 1e-12
        x, _ = jax.lax.scan(body, x, cs)
        return x.sum()

    hbm_rate, _, _ = two_point_rate(
        lambda n: (lambda: stream(big, n)),
        hbm_base, 4 * hbm_base, 2.0 * big.size * 4,
    )

    # --- 3. the fused kernel, timed ---
    interpret = jax.default_backend() != "tpu"
    fused = make_fused_column_run(
        model, SSPRK33(), dt=1.0, steps_per_call=args.steps_per_call,
        tile_cols=args.tile_cols, interpret=interpret,
    )
    n_calls = args.steps // args.steps_per_call

    @jax.jit
    def run(Y, t0):
        def body(carry, _):
            Y, t = carry
            return (fused(Y, t), t + args.steps_per_call * 1.0), None

        (Yf, _), _ = jax.lax.scan(body, (Y, t0), None, length=n_calls)
        return Yf

    @jax.jit
    def run_sum(Y, t0):
        Yf = run(Y, t0)
        total = 0.0
        for comp in Yf.values():
            for v in comp.values():
                total = total + v.sum()
        return total

    if args.trace:
        os.makedirs(args.trace, exist_ok=True)
        _ = float(run_sum(Y, jnp.asarray(0.0, dtype)))  # compile first
        with jax.profiler.trace(args.trace):
            _ = float(run_sum(Y, jnp.asarray(0.0, dtype)))

    # two-point over n_calls: rebuild the scan at n and 4n
    from functools import partial as _partial

    @_partial(jax.jit, static_argnums=2)
    def run_n_sum(Y, t0, n):
        def body(carry, _):
            Y, t = carry
            return (fused(Y, t), t + args.steps_per_call * 1.0), None

        (Yf, _), _ = jax.lax.scan(body, (Y, t0), None, length=n)
        total = 0.0
        for comp in Yf.values():
            for v in comp.values():
                total = total + v.sum()
        return total

    t0a = jnp.asarray(0.0, dtype)
    pts_per_s, t_k_lo, t_k_hi = two_point_rate(
        lambda n: (lambda: run_n_sum(Y, t0a, n)),
        n_calls, 4 * n_calls, points * args.steps_per_call,
    )
    stages = 3  # SSPRK33

    achieved_trans = per_pt["transcendental"] * stages * pts_per_s
    achieved_cheap = per_pt["cheap"] * stages * pts_per_s
    achieved_slow = per_pt["slow_vpu"] * stages * pts_per_s
    # HBM per step: 3 state arrays in + out, amortized over steps_per_call
    hbm_per_step = 2 * 3 * points * 4 / args.steps_per_call
    achieved_hbm = hbm_per_step * pts_per_s / points

    combined = (
        achieved_trans / exp_rate
        + achieved_cheap / fma_rate
        + achieved_slow / recip_rate
    )
    result = {
        "shape": {"nz": nz, "ncol": ncol, "steps_per_call": args.steps_per_call,
                  "tile_cols": args.tile_cols, "no_ice": args.no_ice,
                  "land": args.land,
                  "while_trip_hint": while_trip},
        "grid_points_per_s": pts_per_s,
        "timing": {"protocol": "two-point scalar-checksum differencing",
                   "kernel_t_lo_hi_s": [t_k_lo, t_k_hi]},
        "op_mix_per_point_per_stage": per_pt,
        "top_primitives_per_point": {
            k: v / points for k, v in top_prims.items()
        },
        "microbench": {
            "exp_per_s": exp_rate,
            "fma_per_s": fma_rate,
            "fma_multi_stream_per_s": fma_multi_rate,
            "exp_multi_stream_per_s": exp_multi_rate,
            "recip_per_s": recip_rate,
            "hbm_bytes_per_s": hbm_rate,
        },
        "achieved": {
            "transcendental_per_s": achieved_trans,
            "cheap_ops_per_s": achieved_cheap,
            "slow_vpu_ops_per_s": achieved_slow,
            "hbm_bytes_per_s": achieved_hbm,
        },
        "utilization_vs_microbench": {
            "transcendental": achieved_trans / exp_rate,
            "cheap_vpu": achieved_cheap / fma_rate,
            "slow_vpu": achieved_slow / recip_rate,
            "hbm": achieved_hbm / hbm_rate,
            # issue-slot model vs SINGLE-stream rates: >1 proves the VPU
            # multi-issues, but is not a ceiling fraction
            "combined_issue": combined,
            # the defensible occupancy: the same model against the
            # SATURATING multi-stream rates (1.0 = measured multi-issue
            # speed of light for this op mix)
            "achieved_slot_fraction": (
                achieved_trans / exp_multi_rate
                + achieved_cheap / fma_multi_rate
                + achieved_slow / recip_rate
            ),
        },
        "backend": jax.default_backend(),
    }
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
