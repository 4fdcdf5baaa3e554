"""Batched tridiagonal (Thomas) solve along the vertical axis.

The reference integrates explicitly only (SSPRK33 everywhere,
``test/runtests.jl:5-10``); the TPU build adds an implicit vertical solver as
the backbone of IMEX stepping for the stiff Richards/heat diffusion
(SURVEY.md §7 hard part 3).  Columns are independent, so the solve is a
sequential sweep over axis 0 vectorized over all batch dims.

The sweep is **statically unrolled** over the (compile-time) vertical extent
rather than expressed as a ``lax.scan``: the unrolled form is pure static
row slicing + arithmetic, which (a) lowers through Mosaic, so the implicit
steppers run *inside* the fused Pallas column kernel, and (b) lets XLA
software-pipeline the recurrence instead of materializing scan carries.
``nz`` is at most a few hundred everywhere in the model zoo, so the unrolled
graph stays small.  Each row costs one reciprocal + two multiplies on the
serial dependency chain (vs. two divides for the textbook form) — the divide
latency dominates the chain, so the reciprocal form halves it.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

Array = Any


def thomas_solve(dl: Array, d: Array, du: Array, b: Array) -> Array:
    """Solve tridiagonal systems ``A x = b`` batched over trailing dims.

    ``dl`` (sub-diagonal, entry i multiplies x[i-1]; dl[0] ignored),
    ``d`` (diagonal), ``du`` (super-diagonal, entry i multiplies x[i+1];
    du[n-1] ignored), ``b``: all shape ``(n, *batch)``.

    Standard Thomas forward elimination + back substitution; no pivoting
    (diffusion systems here are strictly diagonally dominant).  The ignored
    corner entries ``dl[0]``/``du[n-1]`` are never read (no masking needed),
    and no negative indices / dynamic slices appear, so the solve is safe
    inside Pallas kernel bodies (see CLAUDE.md Mosaic notes).
    """
    n = d.shape[0]
    if n == 1:
        return (b[0] / d[0])[None]

    inv = 1.0 / d[0]
    cp = [du[0] * inv]
    dp = [b[0] * inv]
    for i in range(1, n):
        inv = 1.0 / (d[i] - dl[i] * cp[i - 1])
        cp.append(du[i] * inv)
        dp.append((b[i] - dl[i] * dp[i - 1]) * inv)

    x = [dp[n - 1]]
    for i in range(n - 2, -1, -1):
        x.append(dp[i] - cp[i] * x[-1])
    x.reverse()
    return jnp.stack(x, axis=0)
