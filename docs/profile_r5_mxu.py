"""Round-5 probe: the MXU-offload experiment (VERDICT r3 #4, r4 #5, r5 #3).

Can the MXU take the linear WENO pieces? The only lane-axis linear work is
the first-difference table: all six ``dm_k`` feeding ``weno5_upwind`` are
lane-shifts of ONE array ``D[z] = (phi[z+1] - phi[z])/h``, so the maximal
honest offload is ``D = phi @ S`` with ``S`` the (n2, n2) bidiagonal
difference matrix (periodic wrap) — one MXU matmul replacing 2 VPU ops/cell,
after which the shifts/selects/indicators/weights (the ~100 VPU ops/cell of
nonlinear WENO math) are unchanged.

Variants (r3 harness: VMEM-resident slab, grid=(T,), result chained back
into the input, slope timing — one-off wall clocks and non-chained outputs
both produce impossible numbers over axon; Mosaic also hoists/elides any
per-program compute whose result is dead or loop-invariant, including
factoring affine pid-perturbations THROUGH a matmul):
  (a) axis-2 advection H, current roll+subtract path   (baseline)
  (b) axis-2 advection H, D via MXU matmul             (the experiment)
  (c) the D matmul alone                               (MXU f32 rate)

The arithmetic prediction: a width-2 lane stencil as a dense (n2, n2)
matmul occupies 2 useful columns per 128-wide systolic pass — n2/2 = 256x
wasted FLOPs — while the VPU does it in 2 ops/cell. MXU f32 is only ~10-15x
the VPU's f32 rate, so the offload must lose by ~an order of magnitude.
Run over axon: ``python docs/profile_r5_mxu.py``.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from docs.axon_timing import slope_time
from lsm_tpu.core import bc as _bc
from lsm_tpu.ops import stencils as st
from lsm_tpu.ops.weno_v2 import _G, _G1, _LaneRollView, _fast_recip

B0, B1, N2 = 16, 128, 512
S0, S1 = B0 + 2 * _G, B1 + 2 * _G1
H2 = 1.0 / 511
T = 64


def report(label, el, cells, ops_per_cell=None):
    rate = cells / el
    extra = ""
    if ops_per_cell:
        extra = f"  {rate*ops_per_cell/1e12:6.2f} Tops/s @ {ops_per_cell} ops/cell"
    print(f"{label:44s} {el*1e3:8.3f} ms  {rate/1e9:7.2f} G cells/s{extra}",
          flush=True)


def run_kernel(kernel_body, label, ops_per_cell=None, consts=()):
    nc = len(consts)

    def kernel(x_hbm, *rest):
        crefs = rest[:nc]
        out_ref, slab, sem = rest[nc:]
        pid = pl.program_id(0)

        @pl.when(pid == 0)
        def _():
            cp = pltpu.make_async_copy(x_hbm, slab, sem)
            cp.start()
            cp.wait()

        kernel_body(slab, out_ref, pid, crefs)

    x0 = jax.random.normal(jax.random.PRNGKey(0), (S0, S1, N2), jnp.float32)

    @partial(jax.jit, donate_argnums=(0,))
    def step(v, *cs):
        o = pl.pallas_call(
            kernel, grid=(T,),
            out_shape=jax.ShapeDtypeStruct((8, N2), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
            + [pl.BlockSpec((N2, N2), lambda i: (0, 0))] * nc,
            out_specs=pl.BlockSpec((8, N2), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((S0, S1, N2), jnp.float32),
                            pltpu.SemaphoreType.DMA],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(v, *cs)
        return v.at[0, :8, :].add(1e-30 * o)

    el = slope_time(step, lambda: x0 + 0.0, args=tuple(consts), r1=5, r2=45)
    report(label, el / T, B0 * B1 * N2, ops_per_cell)


def _pid_dep(slab, pid):
    return slab[:] * (1.0 + pid.astype(jnp.float32) * 1e-12)


def main():
    bcs_pair = (_bc.Periodic(), _bc.Periodic())
    tshape = (B0, B1, N2)

    def baseline(slab, out_ref, pid, crefs):
        ext = _LaneRollView(_pid_dep(slab, pid), bcs_pair, tshape)
        dm = st.weno5_pair_diffs(ext, 2, H2, 0, tshape)
        h = st.weno5_upwind(dm, jnp.float32(0.37), _fast_recip)
        out_ref[:] = out_ref[:] + jnp.sum(h, axis=(0, 1))[None, :]

    run_kernel(baseline, "axis-2 H, roll+subtract (baseline)", 107)

    # the difference matrix: out col z = (phi[z+1] - phi[z]) * inv_h, periodic
    Smat = np.zeros((N2, N2), np.float32)
    inv_h = np.float32(1.0 / H2)
    for z in range(N2):
        Smat[(z + 1) % N2, z] = inv_h
        Smat[z, z] = -inv_h
    Smat = jnp.asarray(Smat)

    def mxu_variant(slab, out_ref, pid, crefs):
        (smat,) = crefs
        # ref mutation inside the read region: affine pid-perturbations
        # FACTOR through the linear matmul and Mosaic hoists the
        # loop-invariant product (measured as >300 Tops/s "f32 matmuls");
        # a write-then-read cannot be hoisted
        slab[_G, _G1, :] = slab[_G, _G1, :] + 1e-6
        blk = slab[_G:_G + B0, _G1:_G1 + B1, :]
        D = jax.lax.dot_general(
            blk.reshape(B0 * B1, N2), smat[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(B0, B1, N2)
        # dm_k[z] = D[z + k - 3]: lane-rolls of ONE array (rolls stay VPU)
        dm = [pltpu.roll(D, (3 - k) % N2, axis=2) for k in range(6)]
        h = st.weno5_upwind(dm, jnp.float32(0.37), _fast_recip)
        out_ref[:] = out_ref[:] + jnp.sum(h, axis=(0, 1))[None, :]

    run_kernel(mxu_variant, "axis-2 H, D via MXU matmul", 107, consts=(Smat,))

    def matmul_only(slab, out_ref, pid, crefs):
        (smat,) = crefs
        slab[_G, _G1, :] = slab[_G, _G1, :] + 1e-6
        blk = slab[_G:_G + B0, _G1:_G1 + B1, :]
        D = jax.lax.dot_general(
            blk.reshape(B0 * B1, N2), smat[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(B0, B1, N2)
        out_ref[:] = out_ref[:] + jnp.sum(D, axis=(0, 1))[None, :]

    run_kernel(matmul_only, "D matmul alone (MXU default=bf16)", 2 * N2,
               consts=(Smat,))

    def mxu_highest(slab, out_ref, pid, crefs):
        (smat,) = crefs
        slab[_G, _G1, :] = slab[_G, _G1, :] + 1e-6
        blk = slab[_G:_G + B0, _G1:_G1 + B1, :]
        D = jax.lax.dot_general(
            blk.reshape(B0 * B1, N2), smat[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(B0, B1, N2)
        dm = [pltpu.roll(D, (3 - k) % N2, axis=2) for k in range(6)]
        h = st.weno5_upwind(dm, jnp.float32(0.37), _fast_recip)
        out_ref[:] = out_ref[:] + jnp.sum(h, axis=(0, 1))[None, :]

    run_kernel(mxu_highest, "axis-2 H, MXU matmul (HIGHEST f32)", 107,
               consts=(Smat,))


if __name__ == "__main__":
    main()
