"""Round-2 microbenchmarks: establish the real perf ceilings on this chip.

Measured questions:
  (1) Pallas BlockSpec copy bandwidth by block shape (is the pipeline able to
      saturate HBM like XLA elementwise does: 683-812 GB/s measured)?
  (2) VPU arithmetic throughput (fma chain on a VMEM-resident tile).
  (3) Contiguous slab-DMA floor: (B0+6, B1+8, 512) halo slabs from a padded
      (518, 520, 512) array — large contiguous runs, unlike round 1's
      (22, 40, 640) slabs.
  (4) Full 3-axis WENO arithmetic on streamed tiles (halo via in-tile rolls --
      wrong values at tile edges, right op count): the compute ceiling.
  (5) What the pure-XLA (jnp) WENO path achieves at 512^3.
"""
import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from docs.axon_timing import slope_time
from lsm_tpu.ops import stencils as st

N = 512
dtype = jnp.float32
shape = (N, N, N)
cells = N**3
nbytes = 4 * cells
_G = 3

key = jax.random.PRNGKey(0)
x = jax.random.normal(key, shape, dtype)
u0 = jnp.ones(shape, dtype) * 0.3
u1 = jnp.ones(shape, dtype) * -0.2
u2 = jnp.ones(shape, dtype) * 0.1
h = (1.0 / (N - 1),) * 3


def report(label, el, traffic_bytes=None, flops=None):
    msg = f"{label:52s} {el*1e3:8.2f} ms   {cells/el/1e9:7.2f} G cells/s"
    if traffic_bytes:
        msg += f"   {traffic_bytes/el/1e9:6.0f} GB/s"
    if flops:
        msg += f"   {flops/el/1e12:6.2f} Top/s"
    print(msg, flush=True)


def run(fn, label, traffic=None, flops=None, args=()):
    jstep = partial(jax.jit, donate_argnums=(0,))(fn)
    el = slope_time(jstep, lambda: x + 0.0, args=args)
    report(label, el, traffic, flops)
    return el


# ---- (1) pure copy through pallas blockspec pipeline ------------------------
def make_copy(B0, B1, B2, semantics="parallel"):
    blk = lambda: pl.BlockSpec((B0, B1, B2), lambda i, j, k: (i, j, k), memory_space=pltpu.VMEM)

    def kernel(i_ref, o_ref):
        o_ref[:] = i_ref[:] + 1.0

    params = pltpu.CompilerParams(dimension_semantics=(semantics,) * 3, vmem_limit_bytes=100*1024*1024)

    def step(v):
        return pl.pallas_call(
            kernel, grid=(N // B0, N // B1, N // B2),
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            in_specs=[blk()], out_specs=blk(),
            compiler_params=params,
        )(v)

    return step


# ---- (2) VPU fma throughput --------------------------------------------------
def make_fma(B0, B1, B2, K):
    blk = lambda: pl.BlockSpec((B0, B1, B2), lambda i, j, k: (i, j, k), memory_space=pltpu.VMEM)

    def kernel(i_ref, o_ref):
        v = i_ref[:]
        a0 = v
        a1 = v * 0.5
        a2 = v * 0.25
        a3 = v * 0.125
        for _ in range(K // 4):
            a0 = a0 * 1.0001 + 0.1
            a1 = a1 * 0.9999 + 0.1
            a2 = a2 * 1.0002 + 0.1
            a3 = a3 * 0.9998 + 0.1
        o_ref[:] = a0 + a1 + a2 + a3

    params = pltpu.CompilerParams(dimension_semantics=("parallel",) * 3, vmem_limit_bytes=100*1024*1024)

    def step(v):
        return pl.pallas_call(
            kernel, grid=(N // B0, N // B1, N // B2),
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            in_specs=[blk()], out_specs=blk(),
            compiler_params=params,
        )(v)

    return step


# ---- (3) contiguous slab DMA floor ------------------------------------------
def make_slab_v2(B0, B1):
    G0, G1 = N // B0, N // B1
    S0, S1 = B0 + 2 * _G, B1 + 2 * _G + 2  # dim1 rounded to +8

    def kernel(p_hbm, o_ref, slab, sem):
        i, j = pl.program_id(0), pl.program_id(1)
        pid = i * G1 + j

        def dma(slot, i2, j2):
            return pltpu.make_async_copy(
                p_hbm.at[pl.ds(i2 * B0, S0), pl.ds(j2 * B1, S1), :],
                slab.at[slot], sem.at[slot])

        slot = jax.lax.rem(pid, 2)
        nxt = pid + 1
        jj = jax.lax.rem(nxt, G1)
        ii = nxt // G1

        @pl.when(pid == 0)
        def _():
            dma(0, i, j).start()

        @pl.when(nxt < G0 * G1)
        def _():
            dma(1 - slot, ii, jj).start()

        dma(slot, i, j).wait()
        o_ref[:] = slab[slot, _G:_G + B0, _G:_G + B1, :]

    params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"),
        vmem_limit_bytes=100 * 1024 * 1024)
    blk = pl.BlockSpec((B0, B1, N), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)

    def step(v):
        p = jnp.pad(v, [(_G, _G), (_G, _G + 2), (0, 0)])  # (518, 520, 512)
        return pl.pallas_call(
            kernel, grid=(G0, G1),
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)], out_specs=blk,
            scratch_shapes=[pltpu.VMEM((2, S0, S1, N), dtype), pltpu.SemaphoreType.DMA((2,))],
            compiler_params=params,
        )(p)

    return step, (S0 * S1 * N / (B0 * B1 * N)) * nbytes + nbytes + 2 * nbytes  # slab + out + pad copy r/w


# ---- (4) full WENO arithmetic on streamed tiles (rolls; edge values wrong) ---
def make_weno_compute(B0, B1, analytic_u=True):
    blk = lambda: pl.BlockSpec((B0, B1, N), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)

    def kernel(i_ref, o_ref):
        v = i_ref[:]
        ham = jnp.zeros_like(v)
        for axis in range(3):
            sh = [pltpu.roll(v, -k, axis) for k in range(-3, 4)]
            dm = [(sh[m + 1] - sh[m]) * (1.0 / h[axis]) for m in range(6)]
            if analytic_u:
                if axis == 0:
                    ii = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1).astype(dtype)
                    u = 0.5 - ii * h[1]
                elif axis == 1:
                    ii = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0).astype(dtype)
                    u = ii * h[0] - 0.5
                else:
                    u = jnp.zeros_like(v)
            else:
                u = jnp.full_like(v, 0.3)
            ham = ham + st.weno5_upwind(dm, u)
        o_ref[:] = v - 0.001 * ham

    params = pltpu.CompilerParams(dimension_semantics=("parallel",) * 2, vmem_limit_bytes=100*1024*1024)

    def step(v):
        return pl.pallas_call(
            kernel, grid=(N // B0, N // B1),
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            in_specs=[blk()], out_specs=blk(),
            compiler_params=params,
        )(v)

    return step


# ---- (5) pure XLA WENO path --------------------------------------------------
def xla_weno(v, u0v, u1v, u2v):
    p = jnp.pad(v, 3, mode="wrap")
    out = 0.0
    for ax, hh in enumerate(h):
        out = out + st.weno5_upwind(st.weno5_pair_diffs(p, ax, hh, _G, shape), (u0v, u1v, u2v)[ax])
    return v - 0.001 * out


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "copy"):
        for b in [(8, 512, 512), (16, 256, 512), (32, 128, 512), (64, 128, 512), (16, 32, 512), (8, 256, 512)]:
            run(make_copy(*b), f"(1) copy blk={b}", traffic=2 * nbytes)
        run(make_copy(16, 256, 512, "arbitrary"), "(1) copy blk=(16,256,512) ARBITRARY", traffic=2 * nbytes)
    if which in ("all", "fma"):
        for K in (64, 256):
            run(make_fma(16, 256, 512, K), f"(2) fma x{K} blk=(16,256,512)", flops=K * cells)
    if which in ("all", "slab"):
        for b in [(16, 256), (32, 128), (8, 512), (64, 64), (64, 128)]:
            step, traffic = make_slab_v2(*b)
            run(step, f"(3) slab v2 {b}", traffic=traffic)
    if which in ("all", "weno"):
        run(make_weno_compute(16, 256, True), "(4) weno arith, rolls, analytic u")
        run(make_weno_compute(16, 256, False), "(4) weno arith, rolls, const u")
        run(make_weno_compute(32, 128, True), "(4) weno arith (32,128), analytic u")
    if which in ("all", "xla"):
        run(xla_weno, "(5) pure XLA weno (wrap pad)", args=(u0, u1, u2))
