"""Profile the 3D WENO5 advection step on the real TPU chip.

Chained, donated steps (output feeds the next input) so the axon tunnel cannot
dedup/cache identical executions — same methodology as bench.py.
Usage: PYTHONPATH=/root/.axon_site:/root/repo python docs/profile_weno.py [N]
"""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

import lsm_tpu as lsm
from lsm_tpu.models import shapes
from lsm_tpu.ops.weno_pallas import weno_hamiltonian_pallas, _weno_hamiltonian_jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 512
STEPS = 5
dtype = jnp.float32
grid = lsm.Grid((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), (N, N, N))
phi = lsm.sample(shapes.zalesak_sphere(), grid, lsm.Periodic(), dtype=dtype)
vel = lsm.sample(
    lambda X, Y, Z: (0.5 - Y + 0.0 * (X + Z), X - 0.5 + 0.0 * (Y + Z), 0.0 * (X + Y + Z)),
    grid, vector=True, dtype=dtype,
)
spacing = tuple(float(h) for h in grid.spacing)
shape = tuple(phi.shape)
dt = dtype(0.25 * grid.min_spacing)
cells = N ** 3


from docs.axon_timing import slope_time

def chain_time(step, label):
    jstep = partial(jax.jit, donate_argnums=(0,))(step)
    el = slope_time(jstep, lambda: phi.values + 0.0, args=(vel.values,))
    print(f"{label:34s} {el*1e3:8.2f} ms/step   {cells/el/1e9:7.2f} G cells/s", flush=True)
    return el


def make_step(ham):
    def step(phi_values, vel_values):
        f = phi.with_values(phi_values)
        p = f.pad(3)
        u = tuple(vel_values[d] for d in range(3))
        return phi_values - dt * ham(p, u)
    return step


import os
if os.environ.get("PROF_JNP"):
    chain_time(make_step(lambda p, u: _weno_hamiltonian_jnp(p, u, spacing, shape)), "jnp (pair, shared diffs)")

TILES = eval(os.environ.get("PROF_TILES", "[None]"))
for tiles in TILES:
    label = f"pallas tiles={tiles}"
    try:
        chain_time(
            make_step(lambda p, u, t=tiles: weno_hamiltonian_pallas(p, u, spacing, shape, tiles=t)),
            label,
        )
    except Exception as e:
        msg = str(e).split("\n")[0][:110]
        print(f"{label:34s} FAILED: {msg}")
