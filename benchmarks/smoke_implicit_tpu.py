"""One-off TPU smoke: fused TR-BDF2 kernel must compile through Mosaic and
agree with the XLA implicit path on hardware.  Usage:
    python benchmarks/smoke_implicit_tpu.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from bench import build
from landhydrology_tpu.domains import make_function_space
from landhydrology_tpu.imex import TRBDF2Soil
from landhydrology_tpu.models.soil.rhs import make_rhs
from landhydrology_tpu.ops.pallas import make_fused_column_run

NZ, NCOL, SPC = 64, 1024, 4

model, Y, Ya = build(NZ, NCOL, jnp.float32)
grid = make_function_space(model.domain, jnp.float32)
stepper = TRBDF2Soil(model=model, grid=grid, iters=2)
dt = 60.0

print("backend:", jax.default_backend(), jax.devices()[0])

t0 = time.time()
fused = make_fused_column_run(
    model, stepper, dt=dt, steps_per_call=SPC, tile_cols=256,
    interpret=jax.default_backend() != "tpu",
)
Yp = fused(Y, 0.0)
jax.block_until_ready(Yp["soil"]["vartheta_l"])
print(f"fused TR-BDF2 compiled+ran in {time.time()-t0:.1f}s")

rhs = make_rhs(model, grid)


@jax.jit
def ref(Y):
    t = jnp.float32(0.0)
    for _ in range(SPC):
        Y = stepper.step(rhs, Y, Ya, t, jnp.float32(dt))
        t = t + dt
    return Y


Yr = ref(Y)
for k in Y["soil"]:
    a, b = np.asarray(Yp["soil"][k]), np.asarray(Yr["soil"][k])
    dev = float(np.max(np.abs(a - b)))
    scale = float(np.max(np.abs(b))) or 1.0
    print(f"  {k}: max|fused-xla| = {dev:.3e} (rel {dev/scale:.3e})")
    assert np.isfinite(a).all()
    assert dev / scale < 1e-5, k
print("OK: fused implicit == XLA implicit on", jax.default_backend())
