"""Round-2 micro pt2: why is pallas streaming at half of XLA bandwidth?

Hypothesis: the auto-pipeline serializes the input fetch and output writeback
(each alone ~700 GB/s -> together 350). Tests:
  (1) input-only kernel (tiny output)
  (2) output-only kernel (tiny input)
  (3) manual double-buffered DMA copy, in and out DMAs both async and
      overlapped across grid programs (deferred out-wait)
  (4) VPU throughput suite (from pt1, which crashed before reaching it)
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
VMEM100 = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def report(label, el, bytes_moved=None, flops=None):
    msg = f"{label:52s} {el*1e3:8.3f} ms"
    if bytes_moved:
        msg += f"  {bytes_moved/el/1e9:7.1f} GB/s"
    if flops:
        msg += f"  {flops/el/1e12:7.2f} Tflop/s"
    print(msg, flush=True)


B0, B1, B2 = 16, 128, 512
G = (N // B0, N // B1, N // B2)
blk = lambda: pl.BlockSpec((B0, B1, B2), lambda i, j, k: (i, j, k),
                           memory_space=pltpu.VMEM)

# (1) input-only: read blocks, write an (8,128) running sum per program
def in_only_kernel(in_ref, out_ref):
    out_ref[:] = jnp.sum(in_ref[:], axis=0)


@partial(jax.jit, donate_argnums=(0,))
def in_only(v):
    s = pl.pallas_call(
        in_only_kernel, grid=G,
        out_shape=jax.ShapeDtypeStruct((B1, B2), jnp.float32),
        in_specs=[blk()],
        out_specs=pl.BlockSpec((B1, B2), lambda i, j, k: (0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=VMEM100,
    )(v)
    return v.at[0, :B1, :B2].add(1e-12 * s)


el = slope_time(in_only, lambda: x0 + 0.0)
report("pallas IN only (read 4B/cell)", el, bytes_moved=nbytes)


# (2) output-only: write blocks from a broadcast scalar
def out_only_kernel(s_ref, out_ref):
    out_ref[:] = jnp.full((B0, B1, B2), s_ref[0], jnp.float32)


@partial(jax.jit, donate_argnums=(0,))
def out_only(v):
    o = pl.pallas_call(
        out_only_kernel, grid=G,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=blk(),
        compiler_params=VMEM100,
    )(v.ravel()[:1])
    return o


el = slope_time(out_only, lambda: x0 + 0.0)
report("pallas OUT only (write 4B/cell)", el, bytes_moved=nbytes)


# (3) manual DMA copy: NBUF-deep rotation, all DMAs async, out-wait deferred
def manual_copy(nbuf):
    G0, G1, G2 = 32, 4, 1
    b0, b1, b2 = N // G0, N // G1, N // G2  # 16 x 128 x 512 = 4 MB

    def kernel(in_hbm, out_hbm, slab, isem, osem):
        i, j, k = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        pid = (i * G1 + j) * G2 + k
        total = G0 * G1 * G2

        def idx(p):
            kk = jax.lax.rem(p, G2)
            jj = jax.lax.rem(p // G2, G1)
            ii = p // (G1 * G2)
            return ii, jj, kk

        def in_dma(slot, p):
            ii, jj, kk = idx(p)
            return pltpu.make_async_copy(
                in_hbm.at[pl.ds(ii * b0, b0), pl.ds(jj * b1, b1), pl.ds(kk * b2, b2)],
                slab.at[slot], isem.at[slot])

        def out_dma(slot, p):
            ii, jj, kk = idx(p)
            return pltpu.make_async_copy(
                slab.at[slot],
                out_hbm.at[pl.ds(ii * b0, b0), pl.ds(jj * b1, b1), pl.ds(kk * b2, b2)],
                osem.at[slot])

        slot = jax.lax.rem(pid, nbuf)

        @pl.when(pid == 0)
        def _():
            for q in range(nbuf - 1):
                in_dma(q, jnp.asarray(q, jnp.int32)).start()

        nxt = pid + nbuf - 1

        @pl.when(nxt < total)
        def _():
            # slot we are about to prefetch into: wait out-DMA from nbuf ago
            @pl.when(pid >= 1)
            def _():
                out_dma(jax.lax.rem(nxt, nbuf), nxt - nbuf).wait()
            in_dma(jax.lax.rem(nxt, nbuf), nxt).start()

        in_dma(slot, pid).wait()
        out_dma(slot, pid).start()

        @pl.when(pid == total - 1)
        def _():
            for q in range(nbuf):
                p = pid - q

                @pl.when(p >= 0)
                def _():
                    out_dma(jax.lax.rem(p, nbuf), p).wait()

    @partial(jax.jit, donate_argnums=(0,))
    def step(v):
        return pl.pallas_call(
            kernel, grid=(G0, G1, G2),
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((nbuf, b0, b1, b2), jnp.float32),
                pltpu.SemaphoreType.DMA((nbuf,)),
                pltpu.SemaphoreType.DMA((nbuf,)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",) * 3,
                vmem_limit_bytes=100 * 1024 * 1024),
        )(v)

    el = slope_time(step, lambda: x0 + 0.0)
    report(f"manual DMA copy nbuf={nbuf} (8B/cell)", el, bytes_moved=2 * nbytes)


for nbuf in (2, 3, 4):
    manual_copy(nbuf)


# (4) VPU throughput
def vpu_bench(label, body, ops_per_elem_iter, iters=256, blk_shape=(256, 512)):
    BB0, BB1 = blk_shape
    elems = BB0 * BB1

    def kernel(in_ref, out_ref):
        a = in_ref[:]
        out_ref[:] = jax.lax.fori_loop(0, iters, lambda i, a: body(a), a)

    @partial(jax.jit, donate_argnums=(0,))
    def step(v):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(blk_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=VMEM100,
        )(v)

    v0 = jnp.full(blk_shape, 0.5, jnp.float32)
    el = slope_time(step, lambda: v0 + 0.0)
    report(f"VPU {label}", el, flops=elems * iters * ops_per_elem_iter)


vpu_bench("fma chain (2 flops/it)", lambda a: a * 1.000001 + 1e-7, 2)
vpu_bench("mul+add indep (5 flops/it)",
          lambda a: (a * 1.000001) + (a + 1e-7) + (a * 0.999999), 5)
vpu_bench("where(a>0,a*c,a) (3 ops/it)",
          lambda a: jnp.where(a > 0.25, a * 0.999999, a), 3)
vpu_bench("max(a*c,a-1) (3 ops/it)",
          lambda a: jnp.maximum(a * 0.999999, a - 1.0), 3)
vpu_bench("divide a/(a+1) (2 ops/it)", lambda a: a / (a + 1.0), 2)
vpu_bench("recip approx (2 ops/it)",
          lambda a: pl.reciprocal(a + 1.0, approx=True) * 0.25, 3)
vpu_bench("rsqrt(a+1) (2 ops/it)", lambda a: jax.lax.rsqrt(a + 1.0), 2)
vpu_bench("lane roll+1 +fma (3 ops/it)",
          lambda a: pltpu.roll(a, 1, 1) * 1.000001 + 1e-8, 3)
vpu_bench("sublane roll+1 +fma (3 ops/it)",
          lambda a: pltpu.roll(a, 1, 0) * 1.000001 + 1e-8, 3)
