"""Decompose the pallas memory-path floor at 512^3."""
import sys
from functools import partial

import jax
import jax.numpy as jnp

import lsm_tpu as lsm
from lsm_tpu.models import shapes
from docs.axon_timing import slope_time

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 512
dtype = jnp.float32
grid = lsm.Grid((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), (N, N, N))
phi = lsm.sample(shapes.zalesak_sphere(), grid, lsm.Periodic(), dtype=dtype)
vel = lsm.sample(
    lambda X, Y, Z: (0.5 - Y + 0.0 * (X + Z), X - 0.5 + 0.0 * (Y + Z), 0.0 * (X + Y + Z)),
    grid, vector=True, dtype=dtype,
)
shape = tuple(phi.shape)
dt = dtype(0.25 * grid.min_spacing)
cells = N ** 3
_G = 3
_LANE = 128

B0, B1, B2 = 16, 32, 512
G0, G1, G2 = N // B0, N // B1, N // B2


def report(label, el):
    print(f"{label:44s} {el*1e3:8.2f} ms   {cells/el/1e9:7.2f} G cells/s", flush=True)


block = lambda: pl.BlockSpec((B0, B1, B2), lambda i, j, k: (i, j, k), memory_space=pltpu.VMEM)


def run_chain(fn, label):
    jstep = partial(jax.jit, donate_argnums=(0,))(fn)
    el = slope_time(jstep, lambda: phi.values + 0.0, args=(vel.values,))
    report(label, el)


# (a/b) u/out streaming only, no phi at all
def make_stream_only(semantics):
    def kernel(u0, u1, u2, out_ref):
        out_ref[:] = u0[:] + u1[:] + u2[:]

    params = pltpu.CompilerParams(dimension_semantics=(semantics,) * 3)

    def step(phi_values, vel_values):
        u = tuple(vel_values[d] for d in range(3))
        h = pl.pallas_call(
            kernel, grid=(G0, G1, G2),
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            in_specs=[block()] * 3, out_specs=block(),
            compiler_params=params,
        )(*u)
        return phi_values - dt * h
    return step


# (c) slab DMA only: no u inputs
def make_slab_only(nslabs):
    def kernel(p_hbm, out_ref, slab, sem):
        i, j, k = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        pid = (i * G1 + j) * G2 + k

        def dma(slot, i2, j2, k2):
            return pltpu.make_async_copy(
                p_hbm.at[pl.ds(i2 * B0, B0 + 2 * _G), pl.ds(j2 * B1, B1 + 2 * _G + 2), pl.ds(k2 * B2, B2 + _LANE)],
                slab.at[slot], sem.at[slot])

        if nslabs == 2:
            slot = jax.lax.rem(pid, 2)
            nxt = pid + 1
            kk = jax.lax.rem(nxt, G2)
            jj = jax.lax.rem(nxt // G2, G1)
            ii = nxt // (G1 * G2)

            @pl.when(pid == 0)
            def _():
                dma(0, i, j, k).start()

            @pl.when(nxt < G0 * G1 * G2)
            def _():
                dma(1 - slot, ii, jj, kk).start()

            dma(slot, i, j, k).wait()
            out_ref[:] = slab[slot, _G:_G + B0, _G:_G + B1, _G:_G + B2]
        else:
            d = dma(0, i, j, k)
            d.start(); d.wait()
            out_ref[:] = slab[0, _G:_G + B0, _G:_G + B1, _G:_G + B2]

    params = pltpu.CompilerParams(dimension_semantics=("arbitrary",) * 3, vmem_limit_bytes=100 * 1024 * 1024)

    def step(phi_values, vel_values):
        p = phi.with_values(phi_values).pad(3)
        pp = jnp.pad(p, [(0, 0), (0, 2), (0, _LANE - 2 * _G)])
        h = pl.pallas_call(
            kernel, grid=(G0, G1, G2),
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)], out_specs=block(),
            scratch_shapes=[pltpu.VMEM((2, B0 + 2 * _G, B1 + 2 * _G + 2, B2 + _LANE), dtype), pltpu.SemaphoreType.DMA((2,))],
            compiler_params=params,
        )(pp)
        return phi_values - dt * h
    return step


# (d) pad + junk-pad + update, no pallas at all
def make_pad_only():
    def step(phi_values, vel_values):
        p = phi.with_values(phi_values).pad(3)
        pp = jnp.pad(p, [(0, 0), (0, 2), (0, _LANE - 2 * _G)])
        h = pp[_G:_G + N, _G:_G + N, _G:_G + N]
        return phi_values - dt * h
    return step


run_chain(make_stream_only("parallel"), "(a) u+out streams, parallel")
run_chain(make_stream_only("arbitrary"), "(b) u+out streams, arbitrary")
run_chain(make_slab_only(2), "(c) slab DMA double-buffered + out")
run_chain(make_slab_only(1), "(c1) slab DMA single + out")
run_chain(make_pad_only(), "(d) pad+junkpad+update only (pure XLA)")
