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
    streamed_geometry=None,
    forcing_fields=(),
    forcing_time_grid=None,
    differentiable: bool = False,
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

    ``streamed_geometry``: optional ``(dz, zc)`` pair of *traced* arrays
    shaped ``(ncol,)`` / ``(nz, ncol)`` carrying per-column grids that are
    not known at factory time — the path that lets ``make_fused_sharded_run``
    stream ``VariableDepthColumn`` geometry into per-shard kernels (inside
    ``shard_map`` the host-side domain only knows the GLOBAL geometry, so
    the shard-local slices must arrive as data).  The model's ``domain`` is
    then only consulted for ``nelements`` and the flat batch rank.

    ``forcing_fields``: names of per-step forcing fields (the
    :mod:`~landhydrology_tpu.runtime.forcing_driver` routing — atmospheric
    ``PrescribedAtmosForcing`` fields and/or ``"precipitation"``) streamed
    THROUGH the kernel: ``run(Y, t0, forcing)`` then takes a dict of
    ``(steps_per_call,)`` (one value per step) or ``(steps_per_call,
    ncol)`` (per-column) arrays, row ``i`` applied during in-kernel step
    ``i`` (piecewise-constant, exactly the XLA forced-scan semantics).
    Scalar rows ride in SMEM indexed by the step counter; per-column rows
    are tiled ``(steps_per_call, tile_cols)`` VMEM blocks — so time-varying
    file forcing (reanalysis runs) keeps the fused-kernel rate instead of
    falling back to the per-step XLA scan.

    ``forcing_time_grid``: optional ``(t_start, dt_forcing, n_rows)``
    switching the forcing rows from step-indexed to **time-indexed**: rows
    then have leading dim ``n_rows`` (the whole table, not one row per
    in-kernel step) and each in-kernel step reads row
    ``clip(floor((t - t_start)/dt_forcing), 0, n_rows-1)`` — forcing as a
    piecewise-constant function of *time*.  This is what lets the adaptive
    (traced-dt) driver compose with streamed forcing: one compiled kernel
    serves every trial step size, and a step landing anywhere in the table
    picks up the right row (``t_start``/``dt_forcing`` ride in SMEM, so
    successive windows reuse the compiled kernel).

    ``differentiable=True`` returns a run with a recompute-based
    ``jax.custom_vjp``: the primal forward is the kernel, the backward
    re-traces the SAME stepper/rhs as an XLA scan and differentiates it
    (segment-level rematerialization; gradients == the XLA engine's,
    AD == finite-difference tested).  Plain soil column only.
    """
    import numpy as np

    from landhydrology_tpu.models.soil.freeze_thaw import (
        wrap_stepper_with_projection,
    )

    # LandModel composition (soil + pond store): the pond height h_s is one
    # more streamed/aliased state leaf and the rhs becomes the composed land
    # tendency — the rain + pond + MOST + energy flagship runs at fused-soil
    # speed instead of falling back to the XLA path (VERDICT r2 item 3).
    is_land = hasattr(model, "soil") and hasattr(model, "surface")
    soil = model.soil if is_land else model
    surface = model.surface if is_land else None

    # LandModel(surface_update="step") is realized in-kernel with the
    # tile-local land model and literal grid (see the kernel body); a
    # caller-applied FrozenExchangeStepper closes over the GLOBAL land
    # model, so strip it here and rebuild inside
    if is_land:
        from landhydrology_tpu.models.land import FrozenExchangeStepper

        def _strip_frozen(st):
            # recursive: a FrozenExchangeStepper nested under another
            # wrapper (e.g. a projection stepper applied in the opposite
            # order) would otherwise survive into _rebind still pointing at
            # the GLOBAL land model inside the tile-local kernel
            if isinstance(st, FrozenExchangeStepper):
                return _strip_frozen(st.inner)
            if hasattr(st, "inner"):
                return dataclasses.replace(st, inner=_strip_frozen(st.inner))
            return st

        stepper = _strip_frozen(stepper)

    # EquilibriumFreezeThaw does its physics in a post-step projection, not
    # in the rhs — wrap here so direct kernel users (and the sharded fused
    # path, which builds per-shard kernels) never silently drop it
    if getattr(soil, "freeze_thaw", None) is not None:
        stepper = wrap_stepper_with_projection(stepper, soil)

    # SoilModel(coefficient_update="step"): apply the lagged-coefficient
    # policy for direct kernel users (idempotent if the caller wrapped);
    # the wrapper's model/grid are retargeted to the tile-local slices by
    # _rebind inside the kernel body.  LandModel composition is handled by
    # the in-kernel FrozenExchangeStepper below.
    if not is_land:
        from landhydrology_tpu.models.soil.lagged import wrap_stepper_for_soil

        stepper = wrap_stepper_for_soil(stepper, soil)

    if soil.lateral_coupling is not None:
        raise ValueError(
            "the fused column kernel tiles the column axis, so cross-column "
            "lateral coupling cannot run inside it — use the XLA path "
            "(make_rhs / make_sharded_step) or make_fused_sharded_run, "
            "which Lie-splits the lateral stencil at segment boundaries"
        )
    if is_land and surface.runoff is not None:
        raise ValueError(
            "pond runoff routing is a cross-column stencil and cannot run "
            "inside the column-tiled kernel — use make_fused_sharded_run "
            "(diffusive routing Lie-split at segment boundaries) or the "
            "XLA path"
        )
    forcing_fields = tuple(forcing_fields)
    if forcing_fields:
        from landhydrology_tpu.runtime.forcing_driver import _split_routing

        atmos_forced, precip_forced = _split_routing(model, forcing_fields)
    else:
        atmos_forced, precip_forced = [], False
    time_indexed = forcing_time_grid is not None
    if time_indexed:
        if not forcing_fields:
            raise ValueError(
                "forcing_time_grid requires forcing_fields to stream"
            )
        tg_start, tg_dt, tg_rows = forcing_time_grid
        tg_rows = int(tg_rows)
        if tg_rows < 1 or float(tg_dt) <= 0.0:
            raise ValueError(
                f"forcing_time_grid needs n_rows >= 1 and dt_forcing > 0; "
                f"got {forcing_time_grid}"
            )
    n_frows = tg_rows if time_indexed else steps_per_call
    if (
        is_land
        and not precip_forced
        and np.ndim(surface.precipitation(0.0)) > 0
    ):
        raise ValueError(
            "the fused kernel advances time internally, so per-column "
            "precipitation arrays cannot be tiled consistently — use a "
            "scalar-returning precipitation(t) here, stream the rain rows "
            "via forcing_fields=('precipitation', ...), or use the XLA "
            "path for callable per-column rain"
        )
    if len(soil.domain.batch_shape) != 1:
        raise ValueError(
            "the fused column kernel expects a 1-D column batch (nz, ncol); "
            f"got batch_shape={soil.domain.batch_shape} — flatten the "
            "column grid before calling"
        )

    # Host-side numpy grid: the kernel bakes dz/zc as compile-time literals
    # (Pallas kernels cannot capture device constants, and this factory may
    # itself run inside a jit/shard_map trace — make_fused_sharded_run —
    # where even jnp.asarray(2.0) is a tracer).
    dtype = soil.float_dtype
    if streamed_geometry is not None:
        # per-column geometry arrives as traced data: no host grid exists
        from landhydrology_tpu.domains import ColumnGrid

        nz = int(soil.domain.nelements)
        grid_obj = None
        variable_dz = True
        grid_lit = ColumnGrid(
            zc=np.zeros((nz, 1)),
            zf=np.zeros((nz + 1, 1)),
            dz=0.0,
            nz=nz,
            batch_shape=(1,),
        )
    else:
        grid_obj = make_function_space(
            soil.domain, soil.float_dtype, as_numpy=True
        )
        nz = grid_obj.nz
        # Variable-depth grids (VariableDepthColumn) carry a per-column dz
        # and a full (nz, ncol) zc; both are streamed as tiled kernel inputs
        # like the heterogeneous soil parameters.  Uniform grids bake dz/zc
        # as literals.
        variable_dz = np.ndim(grid_obj.dz) > 0
        if variable_dz:
            # dz placeholder is replaced per tile inside the kernel; the rhs
            # never reads grid.zc/zf (centers come from Ya['zc']), so zero
            # stubs keep the literal grid free of per-column constants.
            grid_lit = dataclasses.replace(
                grid_obj,
                dz=0.0,
                zc=np.zeros((nz,) + (1,) * len(grid_obj.batch_shape)),
                zf=np.zeros((nz + 1,) + (1,) * len(grid_obj.batch_shape)),
            )
        else:
            grid_lit = grid_obj
    name = soil.name
    surf_name = surface.name if is_land else None
    dt_c = float(dt)

    # Heterogeneous per-column parameters: every array-valued leaf of the
    # soil/hydraulics parameter pytrees becomes an extra kernel input,
    # tiled along the column axis; scalar leaves are baked as literals.
    # LandModel adds the surface store's numeric fields (tau_pond,
    # h_evap_smoothing) — scalars bake, per-column arrays stream.
    hydrology = soil.hydrology_model
    param_trees = (
        soil.soil_param_set,
        getattr(hydrology, "hydraulic_model", None),
        getattr(hydrology, "viscosity_factor", None),
        getattr(hydrology, "impedance_factor", None),
        soil.boundary_conditions,  # BatchedBC kinds/values etc. are leaves
        (
            {
                "tau_pond": surface.tau_pond,
                "h_evap_smoothing": surface.h_evap_smoothing,
            }
            if is_land
            else None
        ),
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
        """(model, soil) pair rebuilt from the tile-local parameter slices;
        for a plain SoilModel the two coincide."""
        leaves = list(flat_params)
        for pos, val in zip(array_idx, tile_leaves):
            leaves[pos] = val  # (tile,) block slice, broadcasts everywhere
        sp, hm, visc, imp, bcs, surf_extra = jax.tree_util.tree_unflatten(
            params_treedef, leaves
        )
        soil_tile = dataclasses.replace(
            soil, soil_param_set=sp, boundary_conditions=bcs
        )
        if hm is not None:
            soil_tile = dataclasses.replace(
                soil_tile,
                hydrology_model=dataclasses.replace(
                    hydrology,
                    hydraulic_model=hm,
                    viscosity_factor=visc,
                    impedance_factor=imp,
                ),
            )
        if is_land:
            surf_tile = dataclasses.replace(surface, **surf_extra)
            return (
                dataclasses.replace(model, soil=soil_tile, surface=surf_tile),
                soil_tile,
            )
        return soil_tile, soil_tile

    from landhydrology_tpu.models.soil.initial_conditions import prognostic_vars

    state_vars = prognostic_vars(soil)
    n_state = len(state_vars)
    if n_state == 0:
        raise ValueError("fused kernel needs at least one dynamic component")
    n_surf = 1 if is_land else 0  # the pond height h_s, one (1, tile) leaf

    n_extra = 1 if variable_dz else 0  # streamed per-column dz

    def _make_kernel(scal_names, col_names):
        """Kernel body for a given forcing layout: ``scal_names`` arrive as
        (steps_per_call,) SMEM rows, ``col_names`` as (steps_per_call,
        tile) VMEM blocks; both are indexed by the in-kernel step counter."""
        n_fscal = len(scal_names)
        n_fcol = len(col_names)

        def kernel(t0_ref, zc_ref, *refs):
            param_refs = refs[:n_params]
            k0 = n_params
            extra_refs = refs[k0 : k0 + n_extra]
            k0 += n_extra
            fscal_refs = refs[k0 : k0 + n_fscal]
            k0 += n_fscal
            fcol_refs = refs[k0 : k0 + n_fcol]
            k0 += n_fcol
            state_refs = refs[k0 : k0 + n_state]
            surf_refs = refs[k0 + n_state : k0 + n_state + n_surf]
            out_refs = refs[k0 + n_state + n_surf :]
            # (1, tile) blocks -> (tile,): broadcasts against both (nz, tile)
            # center fields and (tile,) boundary-face slices
            model_tile, soil_tile = _model_for_tile(
                [r[:][0] for r in param_refs]
            )
            grid_k = (
                dataclasses.replace(grid_lit, dz=extra_refs[0][:][0])
                if variable_dz
                else grid_lit
            )

            # steppers that close over the model/grid (PhaseEquilibrium-
            # Stepper's projection, the imex tridiagonal solvers, the
            # lagged-coefficient wrapper) must see the tile-local parameter
            # slices and the literal kernel grid (they are soil-state
            # steppers, so the soil tile is the right rebind target)
            def _rebind(st, soil_x):
                if hasattr(st, "inner"):
                    st = dataclasses.replace(
                        st, inner=_rebind(st.inner, soil_x)
                    )
                if hasattr(st, "model"):
                    st = dataclasses.replace(st, model=soil_x)
                if hasattr(st, "grid"):
                    st = dataclasses.replace(st, grid=grid_k)
                return st

            def make_step(model_t, soil_t):
                """(rhs, stepper) for a tile-local model — rebuilt per step
                when forcing rows substitute into the BCs."""
                if is_land:
                    from landhydrology_tpu.models.land import (
                        make_rhs as make_land_rhs,
                    )

                    rhs = make_land_rhs(model_t, grid_k)
                else:
                    rhs = make_rhs(model_t, grid_k)
                st = _rebind(stepper, soil_t)
                if is_land and (
                    model.surface_update == "step"
                    or getattr(soil, "coefficient_update", "stage") == "step"
                ):
                    from landhydrology_tpu.models.land import (
                        FrozenExchangeStepper,
                    )

                    # tile-local step policies: the frozen exchange and/or
                    # lagged coefficients are evaluated once per step on the
                    # tile's own land model/grid, inside the kernel
                    st = FrozenExchangeStepper(
                        inner=st, land=model_t, grid=grid_k
                    )
                return rhs, st

            forced = bool(n_fscal or n_fcol)
            if not forced:
                rhs_k, stepper_k = make_step(model_tile, soil_tile)

            Y = {name: {k: r[:] for k, r in zip(state_vars, state_refs)}}
            if is_land:
                Y[surf_name] = {"h_s": surf_refs[0][:][0]}  # (tile,)
            # prescribed aux fields are recomputed from their (z, t)
            # profiles by the rhs's update_aux, entirely inside the kernel
            Ya = {"zc": zc_ref[:], name: {}}
            t0 = t0_ref[0]
            dt_k = t0_ref[1]  # traced step size (adaptive-fused path)

            def body(i, Y):
                t = t0 + i.astype(dtype) * dt_k
                if forced:
                    # this step's forcing row: scalars from SMEM, per-column
                    # rows via a dynamic sublane slice of the VMEM block.
                    # Step-indexed rows use the in-kernel step counter;
                    # time-indexed rows map the (traced) step time onto the
                    # forcing grid (the adaptive-forced path)
                    if time_indexed:
                        tg0 = t0_ref[2]
                        inv_dtF = t0_ref[3]  # 1/dt_forcing (SMEM scalar)
                        j = jnp.clip(
                            ((t - tg0) * inv_dtF).astype(jnp.int32),
                            0,
                            n_frows - 1,
                        )
                    else:
                        j = i
                    rows = {k: r[j] for k, r in zip(scal_names, fscal_refs)}
                    for k, r in zip(col_names, fcol_refs):
                        rows[k] = r[pl.dslice(j, 1), :][0]
                    soil_i = soil_tile
                    if atmos_forced:
                        bc_t = soil_tile.boundary_conditions
                        top_i = dataclasses.replace(
                            bc_t.top,
                            **{k: rows[k] for k in atmos_forced if k in rows},
                        )
                        from landhydrology_tpu.models.soil.boundary import (
                            SoilColumnBC as _ColBC,
                        )

                        soil_i = dataclasses.replace(
                            soil_tile,
                            boundary_conditions=_ColBC(
                                top=top_i, bottom=bc_t.bottom
                            ),
                        )
                    model_i = soil_i
                    if is_land:
                        surf_i = model_tile.surface
                        if precip_forced:
                            P_row = rows["precipitation"]
                            surf_i = dataclasses.replace(
                                surf_i, precipitation=lambda t_: P_row
                            )
                        model_i = dataclasses.replace(
                            model_tile, soil=soil_i, surface=surf_i
                        )
                    rhs_i, stepper_i = make_step(model_i, soil_i)
                else:
                    rhs_i, stepper_i = rhs_k, stepper_k
                return stepper_i.step(rhs_i, Y, Ya, t, dt_k)

            Yf = jax.lax.fori_loop(0, steps_per_call, body, Y)
            for k, r in zip(state_vars, out_refs):
                r[:] = Yf[name][k]
            if is_land:
                out_refs[n_state][:] = Yf[surf_name]["h_s"].reshape(1, -1)

        return kernel

    def _run(Y: dict, t0, forcing=None, dt_run=None) -> dict:
        """Advance ``steps_per_call`` steps from ``t0``.  ``dt_run``
        overrides the factory ``dt`` with a possibly TRACED step size (the
        adaptive-fused driver's control variable); both ride in the same
        SMEM scalar slot, so the override costs nothing."""
        states = [Y[name][k] for k in state_vars]
        ncol = states[0].shape[1]
        if ncol % tile_cols:
            raise ValueError(f"ncol={ncol} not a multiple of tile_cols={tile_cols}")
        n_tiles = ncol // tile_cols
        dt_in = dt_c if dt_run is None else dt_run
        t0_leaves = [
            jnp.asarray(t0, dtype=dtype),
            jnp.asarray(dt_in, dtype=dtype),
        ]
        if time_indexed:
            # forcing-grid origin + reciprocal spacing ride in SMEM next to
            # (t0, dt): the in-kernel row lookup is one fma + int cast
            t0_leaves += [
                jnp.asarray(tg_start, dtype=dtype),
                jnp.asarray(1.0 / tg_dt, dtype=dtype),
            ]
        t0 = jnp.stack(t0_leaves)

        # route the forcing rows: per-step scalars -> SMEM, per-column
        # fields -> column-tiled VMEM blocks (layout keys the kernel build)
        if forcing_fields and forcing is None:
            raise ValueError(
                f"this fused run streams forcing fields {forcing_fields}; "
                "pass run(Y, t0, forcing=...) with (steps_per_call,) or "
                "(steps_per_call, ncol) rows"
            )
        if forcing is not None and not forcing_fields:
            raise ValueError(
                "forcing passed but the kernel was built without "
                "forcing_fields"
            )
        scal_names, col_names = [], []
        fscal_inputs, fcol_inputs = [], []
        if forcing is not None:
            if set(forcing) != set(forcing_fields):
                raise KeyError(
                    f"forcing keys {sorted(forcing)} != declared "
                    f"forcing_fields {sorted(forcing_fields)}"
                )
            for k in forcing_fields:
                v = jnp.asarray(forcing[k], dtype=dtype)
                if v.shape == (n_frows,):
                    scal_names.append(k)
                    fscal_inputs.append(v)
                elif v.shape == (n_frows, ncol):
                    col_names.append(k)
                    fcol_inputs.append(v)
                else:
                    raise ValueError(
                        f"forcing field {k!r} has shape {v.shape}; expected "
                        f"({n_frows},) or ({n_frows}, {ncol})"
                    )
        if time_indexed and fcol_inputs:
            # the WHOLE table rides per tile: guard against silently
            # blowing VMEM (state + temporaries need most of ~16 MB) with
            # an actionable message instead of an opaque Mosaic allocation
            # failure
            table_mb = (
                len(fcol_inputs) * n_frows * tile_cols * 4 / (1024 * 1024)
            )
            if table_mb > 4.0:
                raise ValueError(
                    f"time-indexed per-column forcing keeps the full table "
                    f"in VMEM per tile: {len(fcol_inputs)} field(s) x "
                    f"{n_frows} rows x tile_cols={tile_cols} = "
                    f"{table_mb:.1f} MB > 4 MB budget — chunk the horizon "
                    "into shorter tables (re-invoke per window with "
                    "forcing_t0 advanced), reduce tile_cols, or use "
                    "scalar rows"
                )
        kernel = _make_kernel(tuple(scal_names), tuple(col_names))
        fscal_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM) for _ in fscal_inputs
        ]
        fcol_specs = [
            pl.BlockSpec(
                (n_frows, tile_cols),
                lambda i: (0, i),
                memory_space=pltpu.VMEM,
            )
            for _ in fcol_inputs
        ]

        col_spec = pl.BlockSpec(
            (nz, tile_cols), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        param_spec = pl.BlockSpec(
            (1, tile_cols), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        if variable_dz:
            # per-column coordinates/spacing travel with the column tiles
            if streamed_geometry is not None:
                dz_in, zc_in = streamed_geometry
                zc = jnp.asarray(zc_in, dtype=dtype).reshape(nz, ncol)
                dz_row = jnp.asarray(dz_in, dtype=dtype).reshape(1, ncol)
            else:
                zc = jnp.broadcast_to(
                    jnp.asarray(grid_obj.zc, dtype=dtype), (nz, ncol)
                )
                dz_row = jnp.broadcast_to(
                    jnp.asarray(grid_obj.dz, dtype=dtype).reshape(1, -1),
                    (1, ncol),
                )
            zc_spec = col_spec
            extra_inputs = [dz_row]
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
        surf_inputs = []
        if is_land:
            h_s = jnp.asarray(Y[surf_name]["h_s"], dtype=dtype)
            if h_s.shape != (ncol,):
                raise ValueError(
                    f"pond state h_s of shape {h_s.shape} does not match the "
                    f"flat column batch ({ncol},)"
                )
            surf_inputs = [h_s.reshape(1, ncol)]
        # t0, zc, params, dz, forcing rows precede the state
        n_in = 2 + n_params + n_extra + len(fscal_inputs) + len(fcol_inputs)
        out = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # t0
                zc_spec,
                *([param_spec] * n_params),
                *extra_specs,
                *fscal_specs,
                *fcol_specs,
                *([col_spec] * n_state),
                *([param_spec] * n_surf),
            ],
            out_specs=tuple([col_spec] * n_state + [param_spec] * n_surf),
            out_shape=tuple(
                [jax.ShapeDtypeStruct((nz, ncol), dtype) for _ in range(n_state)]
                + [jax.ShapeDtypeStruct((1, ncol), dtype) for _ in range(n_surf)]
            ),
            input_output_aliases={
                n_in + j: j for j in range(n_state + n_surf)
            },
            interpret=interpret,
        )(
            t0, zc, *array_params, *extra_inputs, *fscal_inputs,
            *fcol_inputs, *states, *surf_inputs,
        )
        if n_state + n_surf == 1:
            out = (out,) if not isinstance(out, (tuple, list)) else out
        result = {name: {k: o for k, o in zip(state_vars, out)}}
        if is_land:
            result[surf_name] = {"h_s": out[n_state][0]}
        return result

    if not differentiable:
        return _run

    # ---- differentiable variant (VERDICT r4 item 8) ----
    # pallas_call has no VJP; wrap the kernel in a recompute-based
    # custom_vjp whose backward re-traces the SAME stepper/rhs as an XLA
    # scan and differentiates that.  The primal forward keeps the kernel
    # rate (loss evaluations, ensembles, line searches run fused); a
    # gradient costs one XLA forward + backward — and because the kernel
    # is equivalence-tested against the XLA path to f32 ulp, the custom
    # gradient is the (numerically validated) gradient of the primal.
    if is_land or forcing_fields or streamed_geometry is not None:
        raise NotImplementedError(
            "differentiable=True currently covers the plain soil column "
            "kernel (no LandModel composition, streamed forcing, or "
            "streamed geometry) — differentiate those via the XLA engine"
        )

    def _xla_equiv(Y, t0, dt_run):
        rhs_h = make_rhs(model, grid_obj)
        st_h = stepper  # the factory-wrapped stepper (projection/lagged)
        Ya_h = {"zc": jnp.asarray(grid_obj.zc, dtype=dtype), name: {}}

        def body(carry, _):
            Yc, t = carry
            return (st_h.step(rhs_h, Yc, Ya_h, t, dt_run), t + dt_run), None

        (Yf, _), _ = jax.lax.scan(
            body,
            (Y, jnp.asarray(t0, dtype=dtype)),
            None,
            length=steps_per_call,
        )
        return Yf

    @jax.custom_vjp
    def run_ad(Y, t0, dt_run):
        return _run(Y, t0, dt_run=dt_run)

    def _fwd(Y, t0, dt_run):
        # residuals = the inputs only (O(state) memory): the backward
        # recomputes the trajectory, a segment-level remat
        return _run(Y, t0, dt_run=dt_run), (Y, t0, dt_run)

    def _bwd(res, ct):
        # full vjp over (Y, t0, dt_run): a None cotangent would silently
        # read as a ZERO gradient for t0/dt_run, but the state genuinely
        # depends on both (stage times; step size) — calibration of dt or
        # start-time sensitivities must get the true gradient
        Y, t0, dt_run = res
        _, vjp = jax.vjp(_xla_equiv, Y, t0, dt_run)
        return vjp(ct)

    run_ad.defvjp(_fwd, _bwd)

    def run(Y, t0, forcing=None, dt_run=None):
        if forcing is not None:
            raise ValueError("differentiable fused run takes no forcing")
        dt_in = jnp.asarray(dt_c if dt_run is None else dt_run, dtype=dtype)
        return run_ad(Y, jnp.asarray(t0, dtype=dtype), dt_in)

    return run
