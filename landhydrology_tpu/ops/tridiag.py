"""Batched tridiagonal (Thomas) solve along the vertical axis.

The reference integrates explicitly only (SSPRK33 everywhere,
``test/runtests.jl:5-10``); the TPU build adds an implicit vertical solver as
the backbone of IMEX stepping for the stiff Richards/heat diffusion
(SURVEY.md §7 hard part 3).  Columns are independent, so the solve is a
sequential sweep over axis 0 vectorized over all batch dims — expressed as a
``lax.scan`` so XLA keeps the whole batch resident and fuses the recurrences.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

Array = Any


def thomas_solve(dl: Array, d: Array, du: Array, b: Array) -> Array:
    """Solve tridiagonal systems ``A x = b`` batched over trailing dims.

    ``dl`` (sub-diagonal, entry i multiplies x[i-1]; dl[0] ignored),
    ``d`` (diagonal), ``du`` (super-diagonal, entry i multiplies x[i+1];
    du[-1] ignored), ``b``: all shape ``(n, *batch)``.

    Standard Thomas forward elimination + back substitution; no pivoting
    (diffusion systems here are strictly diagonally dominant).
    """
    n = d.shape[0]

    def fwd(carry, inp):
        cp_prev, dp_prev = carry
        dl_i, d_i, du_i, b_i = inp
        denom = d_i - dl_i * cp_prev
        cp = du_i / denom
        dp = (b_i - dl_i * dp_prev) / denom
        return (cp, dp), (cp, dp)

    zeros = jnp.zeros_like(d[0])
    # first row: cp0 = du0/d0, dp0 = b0/d0 (dl[0] multiplied by 0 carry)
    (_, _), (cp, dp) = jax.lax.scan(
        fwd, (zeros, zeros), (dl.at[0].set(0.0), d, du.at[-1].set(0.0), b)
    )

    def bwd(x_next, inp):
        cp_i, dp_i = inp
        x_i = dp_i - cp_i * x_next
        return x_i, x_i

    _, xs_rev = jax.lax.scan(bwd, zeros, (cp, dp), reverse=True)
    return xs_rev
