"""Explicit halo exchange for the lateral surface coupling.

The new-architecture piece the reference has no prior art for
(SURVEY.md §5, §7 hard part 5): neighbor access for the cross-column
surface-coupling stencil on a mesh-sharded column grid, written as
``lax.ppermute`` ring exchanges inside ``shard_map``.

The 5-point Laplacian is separable, so only edge rows/columns are
exchanged (no corners).  The permutes are issued before the local interior
arithmetic so XLA's latency-hiding scheduler overlaps the ICI transfers
with the (much larger) vertical-sweep compute of the surrounding step.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

Array = Any


def _ring_perms(n: int):
    fwd = [(i, (i + 1) % n) for i in range(n)]  # receive from the left
    bwd = [(i, (i - 1) % n) for i in range(n)]  # receive from the right
    return fwd, bwd


def _exchange_axis(f_local: Array, axis_name: str, n_shards: int, axis: int):
    """Return (halo_lo, halo_hi): the neighboring shards' edge slabs along
    ``axis`` (periodic ring).  Single-shard axes wrap locally."""
    lo_slice = [slice(None)] * f_local.ndim
    hi_slice = [slice(None)] * f_local.ndim
    lo_slice[axis] = slice(0, 1)
    hi_slice[axis] = slice(f_local.shape[axis] - 1, f_local.shape[axis])
    first = f_local[tuple(lo_slice)]
    last = f_local[tuple(hi_slice)]
    if n_shards == 1:
        return last, first  # periodic wrap within the single shard
    fwd, bwd = _ring_perms(n_shards)
    # halo_lo = previous shard's last slab; halo_hi = next shard's first slab
    halo_lo = lax.ppermute(last, axis_name, fwd)
    halo_hi = lax.ppermute(first, axis_name, bwd)
    return halo_lo, halo_hi


def _local_laplacian(f_local: Array, dx, mesh_shape: dict, axis_names) -> Array:
    """Per-shard periodic 5-point Laplacian with halo exchange on the two
    leading axes."""
    ax_x, ax_y = axis_names
    lo_x, hi_x = _exchange_axis(f_local, ax_x, mesh_shape[ax_x], 0)
    lo_y, hi_y = _exchange_axis(f_local, ax_y, mesh_shape[ax_y], 1)
    # interior arithmetic proceeds while the permutes are in flight
    padded_x = jnp.concatenate([lo_x, f_local, hi_x], axis=0)
    padded_y = jnp.concatenate([lo_y, f_local, hi_y], axis=1)
    d2x = padded_x[:-2] + padded_x[2:] - 2.0 * f_local
    d2y = padded_y[:, :-2] + padded_y[:, 2:] - 2.0 * f_local
    return (d2x + d2y) / (dx * dx)


def halo_exchanged_laplacian(f: Array, dx, mesh: Mesh) -> Array:
    """Periodic 5-point Laplacian of a ``(nx, ny)`` field sharded over the
    first two mesh axes, via explicit ring halo exchange.

    Numerically identical to the ``jnp.roll`` formulation in
    ``models/soil/rhs.lateral_surface_tendency`` (tested equal), but with
    the communication expressed as neighbor ``ppermute`` so only edge slabs
    travel over ICI instead of whole-array collective-permutes.
    """
    ax = mesh.axis_names[:2]
    fn = shard_map(
        partial(
            _local_laplacian,
            dx=dx,
            mesh_shape=dict(mesh.shape),
            axis_names=ax,
        ),
        mesh=mesh,
        in_specs=P(*ax),
        out_specs=P(*ax),
    )
    return fn(f)
