"""Round-3 probe pt1: is the WENO5 step VPU-compute-bound?

Round 2 framed the fused kernel's loss as a DMA gap (Pallas ~330 GB/s vs XLA
~680). But the arithmetic says otherwise: the XLA step's 3.95 G cells/s at
20 B/cell is only ~79 GB/s effective — 8x below what XLA streams — so the step
cannot be bandwidth-bound. At ~290 VPU ops/cell the suspect is the VPU.

This probe measures, all on VMEM-resident data (no per-program DMA):
  (a) peak f32 FMA throughput (independent chains),
  (b) the full 3-axis advection Hamiltonian compute rate,
  (c) axes {0,1} only (sublane shifts, no lane rolls),
  (d) axis {2} only (the lane-roll ghost synthesis path),
  (e) the 7 lane rolls alone (no WENO math).

If (b) lands near the measured end-to-end rate, the kernel is compute-bound
and the round-2 DMA work was aimed at the wrong bottleneck.
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from docs.axon_timing import slope_time
from lsm_tpu.ops import stencils as st
from lsm_tpu.ops.weno_v2 import _G, _G1, _LaneRollView, _fast_recip
from lsm_tpu.core import bc as _bc

B0, B1, N2 = 16, 128, 512
S0, S1 = B0 + 2 * _G, B1 + 2 * _G1
SPACING = (1.0 / 511,) * 3
T = 64  # programs (compute repetitions) per timed call


def report(label, el, cells, ops_per_cell=None):
    rate = cells / el
    extra = ""
    if ops_per_cell:
        extra = f"  {rate*ops_per_cell/1e12:6.2f} Tops/s @ {ops_per_cell} ops/cell"
    print(f"{label:44s} {el*1e3:8.3f} ms  {rate/1e9:7.2f} G cells/s{extra}",
          flush=True)


def run_kernel(kernel_body, label, cells_per_prog, ops_per_cell=None):
    """Time a kernel that computes on a resident slab, grid=(T,)."""
    def kernel(x_hbm, out_ref, slab, sem):
        pid = pl.program_id(0)

        @pl.when(pid == 0)
        def _():
            cp = pltpu.make_async_copy(x_hbm, slab, sem)
            cp.start()
            cp.wait()

        kernel_body(slab, out_ref, pid)

    x0 = jax.random.normal(jax.random.PRNGKey(0), (S0, S1, N2), jnp.float32)

    @partial(jax.jit, donate_argnums=(0,))
    def step(v):
        o = pl.pallas_call(
            kernel, grid=(T,),
            out_shape=jax.ShapeDtypeStruct((8, N2), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((8, N2), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((S0, S1, N2), jnp.float32),
                            pltpu.SemaphoreType.DMA],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(v)
        return v.at[0, :8, :].add(1e-30 * o)

    el = slope_time(step, lambda: x0 + 0.0)
    report(label, el / T, cells_per_prog, ops_per_cell)


bcs_pair = (_bc.Periodic(), _bc.Periodic())
tile_shape = (B0, B1, N2)


def _pid_dep(slab, pid):
    # defeat cross-program hoisting: make the whole computation depend on pid
    return slab[:] * (1.0 + pid.astype(jnp.float32) * 1e-12)


def ham_axes(axes):
    def body(slab, out_ref, pid):
        ext = _LaneRollView(_pid_dep(slab, pid), bcs_pair, tile_shape)
        ham = jnp.zeros(tile_shape, jnp.float32)
        for ax in axes:
            dm6 = st.weno5_pair_diffs(ext, ax, SPACING[ax], 0, tile_shape)
            u = 0.3 if ax == 0 else (-0.2 if ax == 1 else 0.1)
            ham = ham + st.weno5_upwind(dm6, jnp.float32(u), _fast_recip)
        out_ref[:] = out_ref[:] + jnp.sum(ham, axis=(0, 1))[None, :]
    return body


def rolls_only(slab, out_ref, pid):
    ext = _LaneRollView(_pid_dep(slab, pid), bcs_pair, tile_shape)
    acc = jnp.zeros(tile_shape, jnp.float32)
    for k in range(-3, 4):
        acc = acc + ext.shift_view((0, 0, k), tile_shape)
    out_ref[:] = out_ref[:] + jnp.sum(acc, axis=(0, 1))[None, :]


def fma_peak(slab, out_ref, pid):
    # 4 independent chains x 64 FMAs on a (B0, B1, N2) tile
    a = _pid_dep(slab, pid)[_G:_G + B0, _G1:_G1 + B1, :]
    x0_, x1, x2, x3 = a, a * 0.5, a * 0.25, a * 0.125
    for _ in range(64):
        x0_ = x0_ * 1.0000001 + 0.1
        x1 = x1 * 0.9999999 + 0.2
        x2 = x2 * 1.0000002 + 0.3
        x3 = x3 * 0.9999998 + 0.4
    out_ref[:] = out_ref[:] + jnp.sum(x0_ + x1 + x2 + x3, axis=(0, 1))[None, :]


cells = B0 * B1 * N2
run_kernel(fma_peak, "fma peak (256 FMA/cell)", cells, 256)
run_kernel(ham_axes((0, 1, 2)), "advection H, axes 0+1+2", cells, 290)
run_kernel(ham_axes((0, 1)), "advection H, axes 0+1", cells, 190)
run_kernel(ham_axes((2,)), "advection H, axis 2 (lane)", cells, 100)
run_kernel(rolls_only, "7 lane rolls + sum only", cells, 14)
