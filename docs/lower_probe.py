"""Isolate what makes v2's Pallas lowering slow. Times .lower() of kernel
variants on tiny-vs-large lane extents. No TPU needed (CPU lowering for the
default backend is fine for relative timing -- but use the real device if
present so numbers match)."""
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lsm_tpu.core import bc as _bc
from lsm_tpu.ops import stencils as st
from lsm_tpu.ops import weno_v2 as v2

N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
which = sys.argv[2] if len(sys.argv) > 2 else "all"
B0, B1 = 8, 128
shape = (N, N, N)
dtype = jnp.float32
bcs = _bc.normalize_bcs(_bc.Periodic(), 3)
spacing = (1.0 / (N - 1),) * 3

P = jnp.zeros(v2.padded_shape(shape), dtype)
spec = v2.TermSpec("advection", "analytic",
                   lambda xs, t: (0.5 - xs[1], xs[0] - 0.5, 0.0 * xs[2]), 0)


def timed(label, fn, *args):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.perf_counter()
    print(f"{label:46s} lower {t1-t0:7.1f}s", flush=True)
    return lowered


if which in ("all", "full"):
    timed("full fused_stage", lambda p: v2.fused_stage(
        p, ((spec, ()),), (0.0, 1.0, 1e-3), 0.0, None, bcs, spacing, shape,
        (0.0, 0.0, 0.0), tiles=(B0, B1)), P)

if which in ("all", "noghost"):
    # monkeypatch _lane_extend to identity-pad via slicing the core (wrong
    # values, right shapes) -- isolates the concatenate
    orig = v2._lane_extend

    def fake_extend(core, bc_pair, n):
        return jnp.concatenate([core[..., :3], core, core[..., -3:]], axis=-1)

    v2._lane_extend = fake_extend
    try:
        timed("fake lane extend (contig 3-lane slices)", lambda p: v2.fused_stage(
            p, ((spec, ()),), (0.0, 1.0, 1e-3), 0.0, None, bcs, spacing, shape,
            (0.0, 0.0, 0.0), tiles=(B0, B1)), P)
    finally:
        v2._lane_extend = orig

if which in ("all", "nolane"):
    # skip the lane dim entirely: extend then immediately slice back? No --
    # replace ext by the core and shrink stencil reach g2=0 is invalid; instead
    # run a 2-axis Hamiltonian (axes 0/1 only) on the unextended core.
    def partial_stage(p):
        def ham2(ext_, tile_shape, g):
            out = 0.0
            for ax in (0, 1):
                out = out + st.weno5_upwind(
                    st.weno5_pair_diffs(ext_, ax, spacing[ax], g, tile_shape), 0.3)
            return out

        S0, S1 = B0 + 6, B1 + 16
        G0, G1 = N // B0, N // B1

        def kernel(p_hbm, out_hbm, slab, obuf, isem, osem):
            i = pl.program_id(0)
            j = pl.program_id(1)
            dma = pltpu.make_async_copy(
                p_hbm.at[pl.ds(i * B0, S0), pl.ds(j * B1, S1), :],
                slab.at[0], isem.at[0])
            dma.start()
            dma.wait()
            ham = ham2(slab[0], (B0, B1, N), (3, 8, 0))
            obuf[0] = ham
            od = pltpu.make_async_copy(
                obuf.at[0], out_hbm.at[pl.ds(3 + i * B0, B0), pl.ds(8 + j * B1, B1), :],
                osem.at[0])
            od.start()
            od.wait()

        return pl.pallas_call(
            kernel, grid=(G0, G1),
            out_shape=jax.ShapeDtypeStruct(v2.padded_shape(shape), dtype),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((1, S0, S1, N), dtype),
                pltpu.VMEM((1, B0, B1, N), dtype),
                pltpu.SemaphoreType.DMA((1,)),
                pltpu.SemaphoreType.DMA((1,)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )(p)

    timed("axes01-only (no lane ext, no lane stencil)", partial_stage, P)
