"""Fused multi-step column-sweep kernel.

The TPU-native replacement for the reference's per-stage field sweeps
(``right_hand_side.jl:269-369`` evaluated 3x per SSPRK33 step): one Pallas
kernel keeps a tile of columns **resident in VMEM for many consecutive time
steps**, so HBM traffic per step drops from
``O(state + temporaries)`` to ``O(state / steps_per_call)``.

Design (SURVEY.md §7 stage 8):

- Layout ``(nz, ncol)``: vertical axis on sublanes (the 2-point stencils are
  sublane shifts), columns on lanes; the grid tiles the column axis.
- The kernel body **reuses the exact jnp physics** — it calls the same
  ``make_rhs(model)`` tendency function and stepper as the XLA path on the
  VMEM-resident block, so there is one source of truth for the numerics and
  the kernel supports every BC/closure combination that traces — including
  the MOST fixed point (hardware-validated and equivalence-tested).
- ``input_output_aliases`` make the update in-place in HBM.

The per-column state is tiny (3 nz floats), which makes the naive path
bandwidth-bound on batch traffic; multi-stepping in VMEM converts it to a
compute-bound sweep (the speed-of-light argument in SURVEY.md §7).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from landhydrology_tpu.domains import make_function_space
from landhydrology_tpu.models.soil.rhs import make_rhs
from landhydrology_tpu.timestepping import SSPRK33, AbstractTimestepper

Array = Any


def make_fused_column_run(
    model,
    stepper: AbstractTimestepper = SSPRK33(),
    dt: float = 1.0,
    steps_per_call: int = 16,
    tile_cols: int = 512,
    interpret: bool = False,
):
    """Build ``run(Y, t0) -> Y'`` advancing ``steps_per_call`` steps with the
    state resident in VMEM.

    Requirements: at least one dynamic component (any of the four
    energy x hydrology combos with dynamics), ``(nz, ncol)`` state with
    ``ncol`` a multiple of ``tile_cols``.  Prescribed-field profiles and
    MOST atmospheric forcing are recomputed inside the kernel from (z, t).
    Soil/hydraulics parameters may be scalars (baked as literals) or
    per-column ``(ncol,)`` arrays (streamed as tiled kernel inputs —
    heterogeneous-soil batches run at full kernel speed).  Chain calls
    (e.g. under ``lax.scan``) for longer horizons; time advances
    ``steps_per_call * dt`` per call.
    """
    import numpy as np

    from landhydrology_tpu.models.soil.freeze_thaw import (
        wrap_stepper_with_projection,
    )

    # EquilibriumFreezeThaw does its physics in a post-step projection, not
    # in the rhs — wrap here so direct kernel users (and the sharded fused
    # path, which builds per-shard kernels) never silently drop it
    if getattr(model, "freeze_thaw", None) is not None:
        stepper = wrap_stepper_with_projection(stepper, model)

    if model.lateral_coupling is not None:
        raise ValueError(
            "the fused column kernel tiles the column axis, so cross-column "
            "lateral coupling cannot run inside it — use the XLA path "
            "(make_rhs / make_sharded_step), which lowers the lateral "
            "stencil to collective permutes"
        )
    if len(model.domain.batch_shape) != 1:
        raise ValueError(
            "the fused column kernel expects a 1-D column batch (nz, ncol); "
            f"got batch_shape={model.domain.batch_shape} — flatten the "
            "column grid before calling"
        )

    # Host-side numpy grid: the kernel bakes dz/zc as compile-time literals
    # (Pallas kernels cannot capture device constants, and this factory may
    # itself run inside a jit/shard_map trace — make_fused_sharded_run —
    # where even jnp.asarray(2.0) is a tracer).
    grid_obj = make_function_space(model.domain, model.float_dtype, as_numpy=True)
    nz = grid_obj.nz
    dtype = model.float_dtype
    # Variable-depth grids (VariableDepthColumn) carry a per-column dz and a
    # full (nz, ncol) zc; both are streamed as tiled kernel inputs like the
    # heterogeneous soil parameters.  Uniform grids bake dz/zc as literals.
    variable_dz = np.ndim(grid_obj.dz) > 0
    if variable_dz:
        # dz placeholder is replaced per tile inside the kernel; the rhs
        # never reads grid.zc/zf (centers come from Ya['zc']), so zero stubs
        # keep the literal grid free of per-column constants.
        grid_lit = dataclasses.replace(
            grid_obj,
            dz=0.0,
            zc=np.zeros((nz,) + (1,) * len(grid_obj.batch_shape)),
            zf=np.zeros((nz + 1,) + (1,) * len(grid_obj.batch_shape)),
        )
    else:
        grid_lit = grid_obj
    name = model.name
    dt_c = float(dt)

    # Heterogeneous per-column parameters: every array-valued leaf of the
    # soil/hydraulics parameter pytrees becomes an extra kernel input,
    # tiled along the column axis; scalar leaves are baked as literals.
    hydrology = model.hydrology_model
    param_trees = (
        model.soil_param_set,
        hydrology.hydraulic_model,
        hydrology.viscosity_factor,
        hydrology.impedance_factor,
        model.boundary_conditions,  # BatchedBC kinds/values etc. are leaves
    )
    flat_params, params_treedef = jax.tree_util.tree_flatten(param_trees)

    def _is_array(leaf):
        return hasattr(leaf, "ndim") and not callable(leaf)

    # 0-d device arrays would be captured constants (unsupported): bake them
    flat_params = [
        leaf.item() if _is_array(leaf) and leaf.ndim == 0 else leaf
        for leaf in flat_params
    ]
    array_idx = [
        i for i, leaf in enumerate(flat_params) if _is_array(leaf) and leaf.ndim >= 1
    ]
    # int leaves (BatchedBC kinds) keep their dtype; floats take the model's
    array_params = [
        (
            jnp.asarray(flat_params[i]).reshape(1, -1)
            if jnp.issubdtype(jnp.asarray(flat_params[i]).dtype, jnp.integer)
            else jnp.asarray(flat_params[i], dtype=dtype).reshape(1, -1)
        )
        for i in array_idx
    ]
    n_params = len(array_params)

    def _model_for_tile(tile_leaves):
        leaves = list(flat_params)
        for pos, val in zip(array_idx, tile_leaves):
            leaves[pos] = val  # (tile,) block slice, broadcasts everywhere
        sp, hm, visc, imp, bcs = jax.tree_util.tree_unflatten(
            params_treedef, leaves
        )
        return dataclasses.replace(
            model,
            soil_param_set=sp,
            hydrology_model=dataclasses.replace(
                hydrology,
                hydraulic_model=hm,
                viscosity_factor=visc,
                impedance_factor=imp,
            ),
            boundary_conditions=bcs,
        )

    from landhydrology_tpu.models.soil.initial_conditions import prognostic_vars

    state_vars = prognostic_vars(model)
    n_state = len(state_vars)
    if n_state == 0:
        raise ValueError("fused kernel needs at least one dynamic component")

    n_extra = 1 if variable_dz else 0  # streamed per-column dz

    def kernel(t0_ref, zc_ref, *refs):
        param_refs = refs[:n_params]
        extra_refs = refs[n_params : n_params + n_extra]
        state_refs = refs[n_params + n_extra : n_params + n_extra + n_state]
        out_refs = refs[n_params + n_extra + n_state :]
        # (1, tile) blocks -> (tile,): broadcasts against both (nz, tile)
        # center fields and (tile,) boundary-face slices
        model_tile = _model_for_tile([r[:][0] for r in param_refs])
        grid_k = (
            dataclasses.replace(grid_lit, dz=extra_refs[0][:][0])
            if variable_dz
            else grid_lit
        )
        rhs = make_rhs(model_tile, grid_k)

        # steppers that close over the model/grid (PhaseEquilibriumStepper's
        # projection, the imex tridiagonal solvers) must see the tile-local
        # parameter slices and the literal kernel grid
        def _rebind(st):
            if hasattr(st, "inner"):
                st = dataclasses.replace(st, inner=_rebind(st.inner))
            if hasattr(st, "model"):
                st = dataclasses.replace(st, model=model_tile)
            if hasattr(st, "grid"):
                st = dataclasses.replace(st, grid=grid_k)
            return st

        stepper_k = _rebind(stepper)
        Y = {name: {k: r[:] for k, r in zip(state_vars, state_refs)}}
        # prescribed aux fields are recomputed from their (z, t) profiles by
        # the rhs's update_aux, entirely inside the kernel
        Ya = {"zc": zc_ref[:], name: {}}
        t0 = t0_ref[0]

        def body(i, Y):
            t = t0 + i.astype(dtype) * dt_c
            return stepper_k.step(rhs, Y, Ya, t, jnp.asarray(dt_c, dtype=dtype))

        Yf = jax.lax.fori_loop(0, steps_per_call, body, Y)
        for k, r in zip(state_vars, out_refs):
            r[:] = Yf[name][k]

    def run(Y: dict, t0) -> dict:
        states = [Y[name][k] for k in state_vars]
        ncol = states[0].shape[1]
        if ncol % tile_cols:
            raise ValueError(f"ncol={ncol} not a multiple of tile_cols={tile_cols}")
        n_tiles = ncol // tile_cols
        t0 = jnp.reshape(jnp.asarray(t0, dtype=dtype), (1,))

        col_spec = pl.BlockSpec(
            (nz, tile_cols), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        param_spec = pl.BlockSpec(
            (1, tile_cols), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        if variable_dz:
            # per-column coordinates/spacing travel with the column tiles
            zc = jnp.broadcast_to(
                jnp.asarray(grid_obj.zc, dtype=dtype), (nz, ncol)
            )
            zc_spec = col_spec
            extra_inputs = [
                jnp.broadcast_to(
                    jnp.asarray(grid_obj.dz, dtype=dtype).reshape(1, -1),
                    (1, ncol),
                )
            ]
            extra_specs = [param_spec]
        else:
            zc = jnp.broadcast_to(grid_obj.zc.reshape(nz, 1), (nz, 1)).astype(dtype)
            zc_spec = pl.BlockSpec(
                (nz, 1), lambda i: (0, 0), memory_space=pltpu.VMEM
            )
            extra_inputs = []
            extra_specs = []
        for p in array_params:
            if p.shape[1] != ncol:
                raise ValueError(
                    f"per-column parameter of length {p.shape[1]} does not "
                    f"match ncol={ncol}"
                )
        n_in = 2 + n_params + n_extra  # t0, zc, params, dz precede the state
        out = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # t0
                zc_spec,
                *([param_spec] * n_params),
                *extra_specs,
                *([col_spec] * n_state),
            ],
            out_specs=tuple([col_spec] * n_state),
            out_shape=tuple(
                jax.ShapeDtypeStruct((nz, ncol), dtype) for _ in range(n_state)
            ),
            input_output_aliases={n_in + j: j for j in range(n_state)},
            interpret=interpret,
        )(t0, zc, *array_params, *extra_inputs, *states)
        if n_state == 1:
            out = (out,) if not isinstance(out, (tuple, list)) else out
        return {name: {k: o for k, o in zip(state_vars, out)}}

    return run
