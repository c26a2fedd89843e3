"""Round-2 micro pt4: find a pallas DMA configuration that matches XLA's BW.

XLA reads 512^3 at ~680 GB/s; pallas BlockSpec/manual DMA stalls at ~330.
Sweep (a) manual-DMA read-only by tile size x buffer depth, (b) a split-strip
variant (one tile fetched as K concurrent DMAs), (c) read+write with the best
read config.
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from docs.axon_timing import slope_time

N = 512
shape = (N, N, N)
nbytes = N * N * N * 4
x0 = jnp.ones(shape, jnp.float32)


def report(label, el, bytes_moved):
    print(f"{label:52s} {el*1e3:8.3f} ms  {bytes_moved/el/1e9:7.1f} GB/s",
          flush=True)


def read_only(B0, nbuf, strips=1, writeback=False):
    """Grid over dim0 slabs of (B0, 512, 512); manual in-DMA, nbuf-deep."""
    G0 = N // B0
    sb0 = B0 // strips

    def kernel(in_hbm, out_ref, slab, isem, *rest):
        pid = pl.program_id(0)

        def in_dma(slot, p, s):
            return pltpu.make_async_copy(
                in_hbm.at[pl.ds(p * B0 + s * sb0, sb0)],
                slab.at[slot, pl.ds(s * sb0, sb0)],
                isem.at[slot, s])

        @pl.when(pid == 0)
        def _():
            for q in range(nbuf - 1):
                for s in range(strips):
                    in_dma(q, jnp.asarray(q, jnp.int32), s).start()

        nxt = pid + nbuf - 1

        @pl.when(nxt < G0)
        def _():
            for s in range(strips):
                in_dma(jax.lax.rem(nxt, nbuf), nxt, s).start()

        slot = jax.lax.rem(pid, nbuf)
        for s in range(strips):
            in_dma(slot, pid, s).wait()
        if writeback:
            osem = rest[0]

            def out_dma(slot, p):
                return pltpu.make_async_copy(
                    slab.at[slot], out_hbm_ref.at[pl.ds(p * B0, B0)], osem.at[slot])

            # write back through the output ref
            out_hbm_ref = out_ref
            d = out_dma(slot, pid)
            d.start()
            d.wait()
        else:
            out_ref[:] = out_ref[:] + slab[slot, 0, :8]

    scratch = [pltpu.VMEM((nbuf, B0, N, N), jnp.float32),
               pltpu.SemaphoreType.DMA((nbuf, strips))]
    if writeback:
        scratch.append(pltpu.SemaphoreType.DMA((nbuf,)))
        out_shape = jax.ShapeDtypeStruct(shape, jnp.float32)
        out_specs = pl.BlockSpec(memory_space=pl.ANY)
    else:
        out_shape = jax.ShapeDtypeStruct((8, N), jnp.float32)
        out_specs = pl.BlockSpec((8, N), lambda i: (0, 0), memory_space=pltpu.VMEM)

    @partial(jax.jit, donate_argnums=(0,))
    def step(v):
        o = pl.pallas_call(
            kernel, grid=(G0,),
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=out_specs,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=110 * 1024 * 1024),
        )(v)
        if writeback:
            return o
        return v.at[0, :8, :].add(1e-20 * o)

    el = slope_time(step, lambda: x0 + 0.0)
    tag = "copy" if writeback else "read"
    report(f"manual {tag} B0={B0} nbuf={nbuf} strips={strips}",
           el, (2 if writeback else 1) * nbytes)


for B0, nbuf in [(8, 2), (8, 4), (8, 8), (16, 2), (16, 4), (32, 2), (32, 3)]:
    read_only(B0, nbuf)
read_only(32, 2, strips=4)
read_only(16, 4, strips=2)
read_only(16, 4, writeback=True)
read_only(32, 3, writeback=True)
