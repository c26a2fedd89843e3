"""Round-2b: optimized-arithmetic v2 stage vs pure VPU compute ceiling.

(a) v2 fused FE stage (full correctness) at 512^3 for a couple of tile sets;
(b) compute-ceiling kernel: same WENO arithmetic + fast recip on BlockSpec
    streamed tiles with in-tile rolls (edge values wrong, op count right) --
    the VPU speed-of-light for this arithmetic;
(c) same as (b) with the OLD division-based combine for comparison.

Usage: python -m docs.profile_r2b [which: all|v2|ceil]
"""
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import lsm_tpu as lsm
from lsm_tpu.models import shapes
from lsm_tpu.integrators.fused import FusedStepper
from lsm_tpu.ops import stencils as st
from lsm_tpu.ops.weno_v2 import _fast_recip
from docs.axon_timing import slope_time

N = 512
cells = N ** 3
dtype = jnp.float32
h = (1.0 / (N - 1),) * 3
which = sys.argv[1] if len(sys.argv) > 1 else "all"


def report(label, el):
    print(f"{label:52s} {el*1e3:8.2f} ms   {cells/el/1e9:7.2f} G cells/s",
          flush=True)


def make_ceiling(B0, B1, recip):
    blk = lambda: pl.BlockSpec((B0, B1, N), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)

    def kernel(i_ref, o_ref):
        v = i_ref[:]
        ham = jnp.zeros_like(v)
        for axis in range(3):
            sh = [pltpu.roll(v, k % N, axis) for k in range(3, -4, -1)]
            dm = [(sh[m + 1] - sh[m]) * (1.0 / h[axis]) for m in range(6)]
            if axis == 0:
                ii = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1).astype(dtype)
                u = 0.5 - ii * h[1]
            elif axis == 1:
                ii = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0).astype(dtype)
                u = ii * h[0] - 0.5
            else:
                u = jnp.zeros_like(v)
            ham = ham + st.weno5_upwind(dm, u, recip)
        o_ref[:] = v - 0.001 * ham

    params = pltpu.CompilerParams(dimension_semantics=("parallel",) * 2,
                                  vmem_limit_bytes=100 * 1024 * 1024)

    def step(v):
        return pl.pallas_call(
            kernel, grid=(N // B0, N // B1),
            out_shape=jax.ShapeDtypeStruct((N, N, N), dtype),
            in_specs=[blk()], out_specs=blk(),
            compiler_params=params,
        )(v)

    return step


if which in ("all", "ceil"):
    x = jax.random.normal(jax.random.PRNGKey(0), (N, N, N), dtype)
    for recip, tag in ((_fast_recip, "fast-recip"), (None, "div")):
        for tiles in ((16, 256), (32, 128)):
            step = jax.jit(make_ceiling(*tiles, recip), donate_argnums=(0,))
            el = slope_time(step, lambda: x + 0.0)
            report(f"(b/c) ceiling {tiles} {tag}", el)

if which in ("all", "v2"):
    grid = lsm.Grid((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), (N, N, N))
    phi = lsm.sample(shapes.zalesak_sphere(), grid, lsm.Periodic(), dtype=dtype)
    velf = lambda xs, t: (0.5 - xs[1] + 0.0 * (xs[0] + xs[2]),
                          xs[0] - 0.5 + 0.0 * (xs[1] + xs[2]),
                          0.0 * (xs[0] + xs[1] + xs[2]))
    dt = jnp.float32(0.25 * grid.min_spacing)
    for tiles in ((32, 128), (16, 256), (32, 256)):
        stepper = FusedStepper((lsm.AdvectionTerm(velf),), phi,
                               lsm.ForwardEuler(), tiles=tiles)
        P0 = stepper.pack(phi.values)
        P0.block_until_ready()
        jstep = jax.jit(lambda P: stepper._step_impl(P, jnp.float32(0.0), dt),
                        donate_argnums=(0,))
        el = slope_time(jstep, lambda: P0 + 0.0)
        report(f"(a) v2 opt tiles={tiles}", el)
