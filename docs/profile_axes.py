"""Isolate per-axis WENO cost inside the Pallas kernel at 512^3."""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

import lsm_tpu as lsm
from lsm_tpu.models import shapes
from lsm_tpu.ops import stencils as st

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = int(sys.argv[1]) if len(sys.argv) > 1 else 512
STEPS = 5
dtype = jnp.float32
grid = lsm.Grid((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), (N, N, N))
phi = lsm.sample(shapes.zalesak_sphere(), grid, lsm.Periodic(), dtype=dtype)
vel = lsm.sample(
    lambda X, Y, Z: (0.5 - Y + 0.0 * (X + Z), X - 0.5 + 0.0 * (Y + Z), 0.0 * (X + Y + Z)),
    grid, vector=True, dtype=dtype,
)
h = tuple(float(x) for x in grid.spacing)
shape = tuple(phi.shape)
dt = dtype(0.25 * grid.min_spacing)
cells = N ** 3
_G = 3
_LANE = 128

B0, B1, B2 = 16, 32, 512
G0, G1, G2 = N // B0, N // B1, N // B2


def make_pallas(axes, weno=True):
    def kernel(p_hbm, u0, u1, u2, out_ref, slab, sem):
        i, j, k = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        pid = (i * G1 + j) * G2 + k

        def dma(slot, i2, j2, k2):
            return pltpu.make_async_copy(
                p_hbm.at[pl.ds(i2 * B0, B0 + 2 * _G), pl.ds(j2 * B1, B1 + 2 * _G + 2), pl.ds(k2 * B2, B2 + _LANE)],
                slab.at[slot], sem.at[slot])

        slot = jax.lax.rem(pid, 2)
        nxt = pid + 1
        k2 = jax.lax.rem(nxt, G2)
        j2 = jax.lax.rem(nxt // G2, G1)
        i2 = nxt // (G1 * G2)

        @pl.when(pid == 0)
        def _():
            dma(0, i, j, k).start()

        @pl.when(nxt < G0 * G1 * G2)
        def _():
            dma(1 - slot, i2, j2, k2).start()

        dma(slot, i, j, k).wait()

        def view(o0, o1, o2):
            return slab[slot, _G + o0:_G + o0 + B0, _G + o1:_G + o1 + B1, _G + o2:_G + o2 + B2]

        urefs = (u0, u1, u2)
        out = jnp.zeros((B0, B1, B2), dtype=out_ref.dtype)
        for axis in axes:
            off = lambda m: tuple(m if d == axis else 0 for d in range(3))
            nodes = [view(*off(m)) for m in range(-3, 4)]
            dm = [(nodes[m + 1] - nodes[m]) * (1.0 / h[axis]) for m in range(6)]
            if weno:
                out = out + st.weno5_upwind(dm, urefs[axis][:])
            else:
                acc = out
                for d in dm:
                    acc = acc + d
                out = acc
        out_ref[:] = out

    params = pltpu.CompilerParams(dimension_semantics=("arbitrary",) * 3, vmem_limit_bytes=100 * 1024 * 1024)
    block = lambda: pl.BlockSpec((B0, B1, B2), lambda i, j, k: (i, j, k), memory_space=pltpu.VMEM)

    def ham(p, u):
        pp = jnp.pad(p, [(0, 0), (0, 2), (0, _LANE - 2 * _G)])
        return pl.pallas_call(
            kernel, grid=(G0, G1, G2),
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [block()] * 3,
            out_specs=block(),
            scratch_shapes=[pltpu.VMEM((2, B0 + 2 * _G, B1 + 2 * _G + 2, B2 + _LANE), dtype), pltpu.SemaphoreType.DMA((2,))],
            compiler_params=params,
        )(pp, *u)
    return ham


from docs.axon_timing import slope_time

def chain_time(ham, label):
    def step(phi_values, vel_values):
        f = phi.with_values(phi_values)
        p = f.pad(3)
        u = tuple(vel_values[d] for d in range(3))
        return phi_values - dt * ham(p, u)
    jstep = partial(jax.jit, donate_argnums=(0,))(step)
    el = slope_time(jstep, lambda: phi.values + 0.0, args=(vel.values,))
    print(f"{label:28s} {el*1e3:8.2f} ms/step   {cells/el/1e9:7.2f} G cells/s", flush=True)


chain_time(make_pallas((), weno=False), "slab only (no compute)")
chain_time(make_pallas((0,), weno=False), "diffs axis0 only")
chain_time(make_pallas((2,), weno=False), "diffs axis2 (lane) only")
chain_time(make_pallas((0,)), "weno axis0")
chain_time(make_pallas((1,)), "weno axis1")
chain_time(make_pallas((2,)), "weno axis2 (lane)")
