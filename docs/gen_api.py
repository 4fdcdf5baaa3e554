"""Regenerate docs/api.md from package docstrings.

Usage: python docs/gen_api.py
"""

import inspect
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    import landhydrology_tpu.adaptive as adaptive
    import landhydrology_tpu.checkpoint as ckpt
    import landhydrology_tpu.cli as cli
    import landhydrology_tpu.config as config
    import landhydrology_tpu.constants as con
    import landhydrology_tpu.diagnostics as diag
    import landhydrology_tpu.domains as dom
    import landhydrology_tpu.imex as imex
    import landhydrology_tpu.models.land as land
    import landhydrology_tpu.models.soil as soil
    import landhydrology_tpu.models.soil.freeze_thaw as ft
    import landhydrology_tpu.models.soil.heat as heat
    import landhydrology_tpu.models.soil.surface_fluxes as sf
    import landhydrology_tpu.models.soil.water as water
    import landhydrology_tpu.ops.pallas.column_kernel as ck
    import landhydrology_tpu.ops.stencil as st
    import landhydrology_tpu.ops.tridiag as td
    import landhydrology_tpu.parallel.halo as ph
    import landhydrology_tpu.parallel.mesh as pm
    import landhydrology_tpu.parallel.stepping as pst
    import landhydrology_tpu.runtime.io as rio
    import landhydrology_tpu.simulations as sims
    import landhydrology_tpu.timestepping as ts

    sections = [
        ("landhydrology_tpu.constants", con),
        ("landhydrology_tpu.domains", dom),
        ("models.soil (water)", water),
        ("models.soil (heat)", heat),
        ("models.soil (model/BCs)", soil),
        ("models.land", land),
        ("models.soil.surface_fluxes", sf),
        ("models.soil.freeze_thaw", ft),
        ("ops.stencil", st),
        ("ops.tridiag", td),
        ("ops.pallas.column_kernel", ck),
        ("timestepping", ts),
        ("adaptive", adaptive),
        ("imex", imex),
        ("simulations", sims),
        ("parallel.mesh", pm),
        ("parallel.halo", ph),
        ("parallel.stepping", pst),
        ("checkpoint", ckpt),
        ("diagnostics", diag),
        ("runtime.io", rio),
        ("config", config),
        ("cli", cli),
    ]
    lines = [
        "# API reference",
        "",
        "Auto-generated from docstring first lines (`python docs/gen_api.py`).",
        "",
    ]
    for title, mod in sections:
        lines.append(f"## {title}\n")
        for name in sorted(dir(mod)):
            if name.startswith("_"):
                continue
            obj = getattr(mod, name)
            if inspect.ismodule(obj):
                continue
            if getattr(obj, "__module__", "").startswith("landhydrology_tpu") and (
                inspect.isclass(obj) or inspect.isfunction(obj)
            ):
                if obj.__module__ != mod.__name__:
                    continue
                doc = (inspect.getdoc(obj) or "").split("\n")[0]
                kind = "class" if inspect.isclass(obj) else "def"
                lines.append(f"- **`{kind} {name}`** — {doc}")
        lines.append("")
    out = os.path.join(os.path.dirname(__file__), "api.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
