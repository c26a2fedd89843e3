"""Round-3 probe pt3: decompose the fused step's 40 ms at 512^3.

DMA probe says the engine streams 640+ GB/s even for the strided slab shape;
compute probe says the 3-axis Hamiltonian needs ~9 ms/step. The full step
measures ~40 ms. Time the pieces: the pallas stage alone, refresh_ghosts
alone, the composed step, and tile-size variants of the stage.
"""
from functools import partial

import jax
import jax.numpy as jnp

from docs.axon_timing import slope_time
import lsm_tpu as lsm
from lsm_tpu.models import shapes
from lsm_tpu.ops import weno_v2 as v2

N = 512
grid = lsm.Grid((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), (N, N, N))
phi = lsm.sample(shapes.zalesak_sphere(), grid, lsm.Periodic(), dtype=jnp.float32)
shape = tuple(grid.shape)
bcs = phi.bcs
dt = jnp.float32(0.25 * grid.min_spacing)


def velf(xs, t):
    x, y, z = xs
    zero = 0.0 * (x + y + z)
    return (0.5 - y + zero, x - 0.5 + zero, zero)


specs = ((v2.TermSpec("advection", "analytic", velf, 0), ()),)
P0 = v2.pack_padded(phi.values, bcs)
cells = float(N) ** 3


def report(label, el):
    print(f"{label:44s} {el*1e3:8.3f} ms  {cells/el/1e9:7.2f} G cells/s",
          flush=True)


def time_stage(label, tiles):
    @partial(jax.jit, donate_argnums=(0,), static_argnums=())
    def stage_only(P):
        return v2.fused_stage(P, specs, (0.0, 1.0, dt), jnp.float32(0.0),
                              None, bcs, grid.spacing, shape, grid.lo,
                              tiles=tiles)

    try:
        el = slope_time(stage_only, lambda: P0 + 0.0)
    except Exception as e:
        print(f"{label:44s} FAILED: {type(e).__name__}", flush=True)
        return
    report(label, el)


@partial(jax.jit, donate_argnums=(0,))
def refresh_only(P):
    return v2.refresh_ghosts(P, bcs, shape)


@partial(jax.jit, donate_argnums=(0,))
def full_step(P):
    out = v2.fused_stage(P, specs, (0.0, 1.0, dt), jnp.float32(0.0), None,
                         bcs, grid.spacing, shape, grid.lo, tiles=(16, 128))
    return v2.refresh_ghosts(out, bcs, shape)


report("refresh_ghosts alone", slope_time(refresh_only, lambda: P0 + 0.0))
time_stage("stage only, tiles (16,128) [today]", (16, 128))
time_stage("stage only, tiles (8,128)", (8, 128))
time_stage("stage only, tiles (8,256)", (8, 256))
time_stage("stage only, tiles (16,256)", (16, 256))
time_stage("stage only, tiles (32,128)", (32, 128))
time_stage("stage only, tiles (8,512)", (8, 512))
report("stage + refresh (full step)", slope_time(full_step, lambda: P0 + 0.0))
