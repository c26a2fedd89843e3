"""Round-2c: decompose the v2 stage — kernel alone vs ghost refresh vs full.

Usage: python -m docs.profile_r2c
"""
import jax
import jax.numpy as jnp

import lsm_tpu as lsm
from lsm_tpu.core import bc as _bc
from lsm_tpu.models import shapes
from lsm_tpu.ops import weno_v2 as v2
from docs.axon_timing import slope_time

N = 512
cells = N ** 3
dtype = jnp.float32
shape = (N, N, N)

grid = lsm.Grid((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), shape)
phi = lsm.sample(shapes.zalesak_sphere(), grid, lsm.Periodic(), dtype=dtype)
bcs = phi.bcs
velf = lambda xs, t: (0.5 - xs[1] + 0.0 * (xs[0] + xs[2]),
                      xs[0] - 0.5 + 0.0 * (xs[1] + xs[2]),
                      0.0 * (xs[0] + xs[1] + xs[2]))
spec = v2.TermSpec("advection", "analytic", velf, 0)
dt = jnp.float32(1e-3)
P0 = v2.pack_padded(phi.values, bcs)
P0.block_until_ready()


def report(label, el):
    print(f"{label:48s} {el*1e3:8.2f} ms   {cells/el/1e9:7.2f} G cells/s",
          flush=True)


def stage_only(tiles):
    def f(P):
        return v2.fused_stage(
            P, ((spec, ()),), (0.0, 1.0, dt), 0.0, None, bcs, grid.spacing,
            shape, grid.lo, tiles=tiles)
    return f


def refresh_only(P):
    return v2.refresh_ghosts(P, bcs, shape)


def full(tiles):
    def f(P):
        out = v2.fused_stage(
            P, ((spec, ()),), (0.0, 1.0, dt), 0.0, None, bcs, grid.spacing,
            shape, grid.lo, tiles=tiles)
        return v2.refresh_ghosts(out, bcs, shape)
    return f


for tiles in ((16, 128), (16, 256), (8, 256)):
    try:
        el = slope_time(jax.jit(stage_only(tiles), donate_argnums=(0,)),
                        lambda: P0 + 0.0)
        report(f"stage only tiles={tiles}", el)
    except Exception as e:
        print(f"stage only {tiles} FAILED: {str(e).splitlines()[0][:90]}",
              flush=True)

el = slope_time(jax.jit(refresh_only, donate_argnums=(0,)), lambda: P0 + 0.0)
report("refresh_ghosts only", el)

for tiles in ((16, 256),):
    el = slope_time(jax.jit(full(tiles), donate_argnums=(0,)), lambda: P0 + 0.0)
    report(f"stage+refresh tiles={tiles}", el)
