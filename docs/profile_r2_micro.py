"""Round-2 microbenchmarks: true HBM bandwidth and VPU throughput on the chip.

Three questions drive the round-2 kernel redesign:
  1. What bandwidth does a plain XLA elementwise op reach at 512^3? (upper
     bound for any streaming pipeline; round-1 pallas streams hit only 205 GB/s)
  2. What bandwidth does a minimal pallas BlockSpec stream reach, by tile shape
     and dimension semantics?
  3. What is the VPU's actual fp32 throughput for the op mix WENO uses
     (FMA, mul/add, select, max, reciprocal/divide)?
"""
import time
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


def report(label, el, bytes_moved=None, flops=None):
    msg = f"{label:48s} {el*1e3:8.3f} ms"
    if bytes_moved:
        msg += f"  {bytes_moved/el/1e9:7.1f} GB/s"
    if flops:
        msg += f"  {flops/el/1e12:7.2f} Tflop/s"
    print(msg, flush=True)


# ---- 1. XLA elementwise bandwidth --------------------------------------------------
@partial(jax.jit, donate_argnums=(0,))
def xla_scale(v):
    return v * 1.000001


el = slope_time(xla_scale, lambda: x0 + 0.0)
report("XLA v*c (read+write, 8B/cell)", el, bytes_moved=2 * nbytes)

y0 = jnp.ones(shape, jnp.float32)


@partial(jax.jit, donate_argnums=(0,))
def xla_add(v, y):
    return v + y


el = slope_time(xla_add, lambda: x0 + 0.0, args=(y0,))
report("XLA v+y (2 read+write, 12B/cell)", el, bytes_moved=3 * nbytes)


# ---- 2. Pallas stream bandwidth by tile shape / semantics --------------------------
def pallas_stream(tiles, semantics):
    B0, B1, B2 = tiles
    G = (N // B0, N // B1, N // B2)

    def kernel(in_ref, out_ref):
        out_ref[:] = in_ref[:] * 1.000001

    blk = lambda: pl.BlockSpec((B0, B1, B2), lambda i, j, k: (i, j, k),
                               memory_space=pltpu.VMEM)

    @partial(jax.jit, donate_argnums=(0,))
    def step(v):
        return pl.pallas_call(
            kernel, grid=G,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            in_specs=[blk()], out_specs=blk(),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(semantics,) * 3,
                vmem_limit_bytes=100 * 1024 * 1024),
        )(v)

    el = slope_time(step, lambda: x0 + 0.0)
    report(f"pallas copy {tiles} {semantics}", el, bytes_moved=2 * nbytes)


for tiles in [(16, 32, 512), (8, 512, 512), (64, 64, 512), (16, 512, 512),
              (256, 8, 512), (128, 128, 512)]:
    pallas_stream(tiles, "parallel")
pallas_stream((16, 32, 512), "arbitrary")
pallas_stream((8, 512, 512), "arbitrary")


# ---- 3. VPU throughput --------------------------------------------------------------
# Small resident block, many compute iterations; measure ops/s.
def vpu_bench(label, body, ops_per_elem_iter, iters=256, blk=(256, 512)):
    B0, B1 = blk
    elems = B0 * B1

    def kernel(in_ref, out_ref):
        a = in_ref[:]

        def it(i, a):
            return body(a)

        out_ref[:] = jax.lax.fori_loop(0, iters, it, a)

    @partial(jax.jit, donate_argnums=(0,))
    def step(v):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(blk, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(v)

    v0 = jnp.full(blk, 0.5, jnp.float32)
    el = slope_time(step, lambda: v0 + 0.0)
    total_ops = elems * iters * ops_per_elem_iter
    report(f"VPU {label}", el, flops=total_ops)


# chained FMA: a = a*c + d  (1 FMA = 2 flops)
vpu_bench("fma chain (2 flops/it)", lambda a: a * 1.000001 + 1e-7, 2)
# independent muls+adds: wider ILP
vpu_bench("mul+add indep (4 flops/it)",
          lambda a: (a * 1.000001) + (a + 1e-7) + (a * 0.999999), 5)
# select
vpu_bench("where(a>0,a*c,a) (~3 ops/it)",
          lambda a: jnp.where(a > 0.25, a * 0.999999, a), 3)
# max
vpu_bench("max(a*c, a) (~2 ops/it)",
          lambda a: jnp.maximum(a * 0.999999, a - 1.0), 3)
# divide
vpu_bench("divide a/(a+1) (~2 ops/it)", lambda a: a / (a + 1.0), 2)
# reciprocal approx
vpu_bench("recip approx (~2 ops/it)",
          lambda a: pl.reciprocal(a + 1.0, approx=True), 2)
# rsqrt
vpu_bench("rsqrt(a+1) (~2 ops/it)", lambda a: jax.lax.rsqrt(a + 1.0), 2)
# lane-rotate cost: shift along last (lane) dim
vpu_bench("lane roll +1 (~2 ops/it)",
          lambda a: pltpu.roll(a, 1, 1) + a * 1e-8, 3)
# sublane roll
vpu_bench("sublane roll +1 (~2 ops/it)",
          lambda a: pltpu.roll(a, 1, 0) + a * 1e-8, 3)
