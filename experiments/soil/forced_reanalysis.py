"""Reanalysis-style forced run: the forcing pipeline consumed end-to-end.

The reference's only experiment hard-codes constant MOST forcing in a
closure (``experiments/SoilModel/surface_fluxes.jl:61-87``).  This driver is
the scale story the forcing subsystem was built for (VERDICT r2 item 2):

1. synthesize a diurnal "reanalysis slice" — per-column wind, air
   temperature, humidity, and a rain-band — and write it once with
   ``write_forcing`` (t-major binary, mmap-able);
2. stream it through the native ``ForcingReader`` (background prefetch
   thread) into a jitted forced scan via ``run_forced``: the device
   integrates window k while the host stages window k+1;
3. report throughput, prefetch hits, and water/energy diagnostics.

Smoke:  python experiments/soil/forced_reanalysis.py --platform cpu \
            --ncol 256 --nz 12 --days 0.05 --window 16
Scale:  python experiments/soil/forced_reanalysis.py --ncol 131072 --days 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ncol", type=int, default=131072)
    p.add_argument("--nz", type=int, default=24)
    p.add_argument("--days", type=float, default=2.0)
    p.add_argument("--dt", type=float, default=120.0)
    p.add_argument("--window", type=int, default=240,
                   help="forcing window (steps) per device dispatch")
    p.add_argument("--engine", type=str, default="fused",
                   choices=("xla", "fused"),
                   help="'fused' streams the forcing rows THROUGH the "
                        "VMEM-resident Pallas kernel (scalar rows in SMEM, "
                        "per-column rain as tiled blocks); 'xla' is the "
                        "per-step jit scan")
    p.add_argument("--steps-per-call", type=int, default=24,
                   help="fused-engine kernel segment length (must divide "
                        "the window)")
    p.add_argument("--tile-cols", type=int, default=512)
    p.add_argument("--workdir", type=str, default="/tmp/lh_forced")
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--keep-forcing", action="store_true",
                   help="reuse an existing forcing file in workdir")
    p.add_argument("--no-overlap", action="store_true",
                   help="serialize the stream pipeline (stage -> compute "
                        "-> drain per window) — the measurement baseline "
                        "for the overlap delta, not a production mode")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # share the CLI's cache policy (honors LANDHYDROLOGY_COMPCACHE and its
    # location) instead of duplicating it here (ADVICE r4)
    from landhydrology_tpu.cli import _enable_compilation_cache

    _enable_compilation_cache()

    import jax.numpy as jnp
    import numpy as np

    from landhydrology_tpu import (
        Column,
        PrescribedAtmosForcing,
        SoilColumnBC,
        SoilComponentBC,
        SoilEnergyModel,
        SoilHydrologyModel,
        SoilModel,
        SoilParams,
        VerticalFlux,
    )
    from landhydrology_tpu.constants import default_earth_param_set as ps
    from landhydrology_tpu.diagnostics import energy_total, water_mass
    from landhydrology_tpu.models.land import (
        LandModel,
        SurfaceWaterModel,
        initialize_states,
    )
    from landhydrology_tpu.models.soil import vanGenuchten
    from landhydrology_tpu.models.soil.heat import (
        volumetric_heat_capacity,
        volumetric_internal_energy,
    )
    from landhydrology_tpu.runtime import ForcingReader, run_forced, write_forcing
    from landhydrology_tpu.timestepping import SSPRK33

    os.makedirs(args.workdir, exist_ok=True)
    dtype = jnp.float32
    nz, ncol = args.nz, args.ncol
    n_steps = int(round(args.days * 86400.0 / args.dt))

    # --- 1. synthesize + write the forcing file (once) ---
    path = os.path.join(args.workdir, f"forcing_{n_steps}x{ncol}.bin")
    if not (args.keep_forcing and os.path.exists(path)):
        t_write0 = time.perf_counter()
        rng = np.random.default_rng(0)
        t = (np.arange(n_steps) * args.dt).astype(np.float64)
        phase = rng.uniform(0.0, 2 * np.pi, ncol).astype(np.float32)
        day = (2 * np.pi * t[:, None] / 86400.0).astype(np.float32) + phase
        # a rain band sweeping across the column index over the run
        band = (np.arange(ncol, dtype=np.float32) / ncol)[None, :]
        front = (t[:, None] / (args.days * 86400.0)).astype(np.float32)
        rain = np.where(
            np.abs(band - front) < 0.05, np.float32(6e-6), np.float32(0.0)
        )
        fields = {
            "u_atm": 2.0 + 1.5 * np.sin(day),
            "theta_atm": 294.0 + 8.0 * np.sin(day - 0.5),
            "q_atm": 0.004 + 0.002 * np.cos(day),
            "precipitation": rain,
        }
        write_forcing(path, t, {k: v.astype(np.float32) for k, v in fields.items()})
        gb = os.path.getsize(path) / 1e9
        print(f"wrote forcing file: {n_steps} steps x {ncol} cols x "
              f"{len(fields)} fields = {gb:.2f} GB "
              f"in {time.perf_counter() - t_write0:.1f}s")

    # --- 2. the flagship land model (rain + pond + MOST + energy) ---
    soil = SoilModel(
        domain=Column(zlim=(-2.0, 0.0), nelements=nz, batch_shape=(ncol,)),
        energy_model=SoilEnergyModel(),
        hydrology_model=SoilHydrologyModel(
            hydraulic_model=vanGenuchten(n=2.0, alpha=2.6, Ksat=3e-7,
                                         theta_r=0.05)
        ),
        boundary_conditions=SoilColumnBC(
            top=PrescribedAtmosForcing(
                u_atm=2.0, theta_atm=294.0, z_atm=2.0, theta_scale=294.0,
                rho_a_sfc=1.2, q_atm=0.004,
            ),
            bottom=SoilComponentBC(
                hydrology=VerticalFlux(0.0), energy=VerticalFlux(0.0)
            ),
        ),
        soil_param_set=SoilParams(nu=0.4, S_s=1e-3, rho_c_ds=1.3e6),
        dtype=dtype,
    )
    land = LandModel(soil=soil, surface=SurfaceWaterModel(tau_pond=600.0))

    def ic(z, m):
        shape = (nz, ncol)
        th = jnp.full(shape, 0.18, dtype=dtype)
        ti = jnp.zeros(shape, dtype=dtype)
        rcs = volumetric_heat_capacity(th, ti, 1.3e6, ps)
        return {
            "vartheta_l": th,
            "theta_i": ti,
            "rho_e_int": volumetric_internal_energy(
                ti, rcs, jnp.full(shape, 290.0, dtype=dtype), ps
            ),
        }

    Y, Ya = initialize_states(land, ic, 0.0, h_s0=0.0)
    dz = 2.0 / nz

    # --- 3. stream the file into the forced scan ---
    windows = []

    def on_window(i0, Yc, t):
        windows.append(i0)

    t0 = time.perf_counter()
    with ForcingReader(path) as reader:
        Yf, tf = run_forced(
            land, Y, Ya, reader, SSPRK33(), dt=args.dt,
            window=args.window, on_window=on_window,
            engine=args.engine,
            steps_per_call=args.steps_per_call,
            tile_cols=args.tile_cols,
            overlap=not args.no_overlap,
        )
        # force completion before reading the clock (async dispatch)
        h_mean = float(jnp.mean(Yf["surface"]["h_s"]))
        wall = time.perf_counter() - t0
        hits = reader.prefetch_hits
        native = reader.is_native

    pts = nz * ncol * n_steps
    m0 = float(water_mass(Y, dz)) + float(jnp.sum(Y["surface"]["h_s"]))
    mf = float(water_mass(Yf, dz)) + float(jnp.sum(Yf["surface"]["h_s"]))
    print(json.dumps({
        "metric": f"forced-reanalysis grid-points/s ({args.engine} forced engine, incl. IO)",
        "value": pts / wall,
        "unit": "grid-points/s",
        "detail": {
            "ncol": ncol, "nz": nz, "steps": n_steps, "window": args.window,
            "engine": args.engine,
            "windows_dispatched": len(windows),
            "overlap": not args.no_overlap,
            "native_reader": native, "prefetch_hits": int(hits),
            "wall_s": wall,
            "pond_mean_m": h_mean,
            "water_gain_m": (mf - m0) / ncol,
            "energy_total": float(energy_total(Yf, dz)),
        },
    }))


if __name__ == "__main__":
    main()
