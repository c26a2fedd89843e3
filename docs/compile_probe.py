"""Probe Mosaic compile time of the v2 fused stage at a given size.

Usage: python -m docs.compile_probe N B0 B1 [fe|rk3]
Prints compile seconds (no execution beyond one warm step).
"""
import sys
import time

import jax
import jax.numpy as jnp

import lsm_tpu as lsm
from lsm_tpu.models import shapes
from lsm_tpu.integrators.fused import FusedStepper

N = int(sys.argv[1]) if len(sys.argv) > 1 else 128
B0 = int(sys.argv[2]) if len(sys.argv) > 2 else 8
B1 = int(sys.argv[3]) if len(sys.argv) > 3 else 128
table = sys.argv[4] if len(sys.argv) > 4 else "fe"

grid = lsm.Grid((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), (N, N, N))
phi = lsm.sample(shapes.zalesak_sphere(), grid, lsm.Periodic(), dtype=jnp.float32)
velf = lambda xs, t: (0.5 - xs[1] + 0.0 * (xs[0] + xs[2]),
                      xs[0] - 0.5 + 0.0 * (xs[1] + xs[2]),
                      0.0 * (xs[0] + xs[1] + xs[2]))
integ = {"fe": lsm.ForwardEuler(), "rk3": lsm.RK3()}[table]
stepper = FusedStepper((lsm.AdvectionTerm(velf),), phi, integ, tiles=(B0, B1))
P0 = stepper.pack(phi.values)
P0.block_until_ready()
dt = jnp.float32(0.25 * grid.min_spacing)

t0 = time.perf_counter()
lowered = jax.jit(
    lambda P: stepper._step_impl(P, jnp.float32(0.0), dt), donate_argnums=(0,)
).lower(P0)
t1 = time.perf_counter()
print(f"lowered in {t1-t0:.1f}s", flush=True)
compiled = lowered.compile()
t2 = time.perf_counter()
print(f"compiled in {t2-t1:.1f}s  (N={N} tiles=({B0},{B1}) {table})", flush=True)
out = compiled(P0 + 0.0)
out.block_until_ready()
print("ran ok", flush=True)
