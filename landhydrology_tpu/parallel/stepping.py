"""Sharded stepping — the multi-chip execution paths.

Two complementary paths over a :class:`jax.sharding.Mesh`:

- **pjit path** (default, fully general): the single-program step function
  is jitted with sharding constraints on the state; XLA partitions the
  embarrassingly parallel column physics with zero communication and lowers
  the lateral ``jnp.roll`` coupling to collective permutes.  Supports every
  feature (heterogeneous params, BatchedBC, MOST).
- **shard_map path** (halo-overlap optimized): the whole RK step runs as
  one per-shard program; the lateral term uses the explicit edge-slab halo
  exchange of ``halo.py``, issued so it overlaps the vertical sweeps
  (SURVEY.md §7 hard part 5).  Requires scalar (column-homogeneous) soil
  parameters and BC configs, since the model config is closed over and
  replicated per shard.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from landhydrology_tpu.domains import make_function_space
from landhydrology_tpu.models.soil import water as sw
from landhydrology_tpu.models.soil.rhs import make_rhs
from landhydrology_tpu.parallel.halo import _local_laplacian
from landhydrology_tpu.parallel.mesh import shard_state
from landhydrology_tpu.timestepping import AbstractTimestepper, SSPRK33

Array = Any


def _state_specs(tree, mesh: Mesh, batch_shape):
    """PartitionSpec pytree for a state: leaves shaped (nz, *batch) get
    their batch axes sharded; broadcast-ready singleton axes replicate."""
    ax = mesh.axis_names

    def spec(x):
        if getattr(x, "ndim", 0) < 1 + len(batch_shape):
            return P()
        parts = []
        for size, name in zip(x.shape[1:], ax):
            parts.append(name if size > 1 and size % mesh.shape[name] == 0 else None)
        return P(None, *parts)

    return jax.tree_util.tree_map(spec, tree)


def make_sharded_step(
    model,
    mesh: Mesh,
    stepper: AbstractTimestepper = SSPRK33(),
    dt: float = 1.0,
    mode: str = "pjit",
):
    """Build a jitted, mesh-sharded ``step(Y, Ya, t) -> (Y', t')``.

    ``mode='pjit'``: sharding-constraint path (general).
    ``mode='shard_map'``: per-shard program with explicit halo exchange for
    the lateral coupling (scalar param configs only).
    """
    grid = make_function_space(model.domain, model.float_dtype)
    dtype = model.float_dtype
    dt_a = jnp.asarray(dt, dtype=dtype)
    name = model.name

    if mode == "pjit":
        rhs = make_rhs(model, grid)

        @jax.jit
        def step(Y, Ya, t):
            Y2 = stepper.step(rhs, Y, Ya, t, dt_a)
            return Y2, t + dt_a

        return step

    if mode != "shard_map":
        raise ValueError(f"unknown mode {mode!r}")

    # --- shard_map path ---
    # the model config is closed over and therefore replicated per shard:
    # per-column arrays (heterogeneous params, BatchedBC) would keep their
    # GLOBAL length inside the per-shard program and misbroadcast — reject
    # them here and point at the general path
    leaves = jax.tree_util.tree_flatten(
        (
            model.soil_param_set,
            getattr(model.hydrology_model, "hydraulic_model", None),
            model.boundary_conditions,
        )
    )[0]
    if any(
        hasattr(l, "ndim") and not callable(l) and l.ndim >= 1 for l in leaves
    ):
        raise ValueError(
            "mode='shard_map' supports column-homogeneous (scalar) model "
            "configs only; per-column parameter/BC arrays need mode='pjit'"
        )
    lc = model.lateral_coupling
    model_local = dataclasses.replace(model, lateral_coupling=None)
    # per-shard grid: same vertical axis, local batch handled by broadcasting
    rhs_local = make_rhs(model_local, grid)
    sp = model.soil_param_set
    hm = model.hydrology_model.hydraulic_model if lc is not None else None
    mesh_shape = dict(mesh.shape)
    ax = mesh.axis_names[:2]

    def rhs(Y, Ya, t):
        dY = rhs_local(Y, Ya, t)
        if lc is not None:
            vartheta_top = Y[name]["vartheta_l"][-1]
            theta_i_top = Y[name]["theta_i"][-1]
            nu_eff = sp.nu - theta_i_top
            psi_top = sw.pressure_head(hm, vartheta_top, nu_eff, sp.S_s)
            zc_top = jnp.reshape(grid.zc[-1], ())  # scalar top-center z
            h_top = psi_top + zc_top
            lap = _local_laplacian(h_top, lc.dx, mesh_shape, ax)
            d = dY[name]["vartheta_l"].at[-1].add(lc.conductance / grid.dz * lap)
            dY = {**dY, name: {**dY[name], "vartheta_l": d}}
        return dY

    def _step_local(Y, Ya, t):
        Y2 = stepper.step(rhs, Y, Ya, t, dt_a)
        return Y2, t + dt_a

    def specs_for(tree):
        return _state_specs(tree, mesh, model.domain.batch_shape)

    def step(Y, Ya, t):
        fn = shard_map(
            _step_local,
            mesh=mesh,
            in_specs=(specs_for(Y), specs_for(Ya), P()),
            out_specs=(specs_for(Y), P()),
        )
        return fn(Y, Ya, t)

    return jax.jit(step)


def make_sharded_run(model, mesh: Mesh, stepper=SSPRK33(), dt=1.0, n_steps=100,
                     mode: str = "pjit"):
    """A jitted n-step ``lax.scan`` over the sharded step (the multi-chip
    hot loop used by the benchmarks and the weak-scaling harness)."""
    step = make_sharded_step(model, mesh, stepper, dt, mode=mode)

    @jax.jit
    def run(Y, Ya, t0):
        def body(carry, _):
            Y, t = carry
            return step(Y, Ya, t), None

        (Yf, tf), _ = jax.lax.scan(body, (Y, t0), None, length=n_steps)
        return Yf, tf

    return run
