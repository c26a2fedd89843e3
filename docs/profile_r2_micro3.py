"""Round-2 micro pt3: XLA read-only BW, and the WENO kernel's pure-compute rate.

(1) XLA read-only (sum-reduce 512^3) and write-only (broadcast) bandwidth —
    is HBM read itself capped near 350 GB/s, or is pallas DMA slow?
(2) The real WENO kernel body run on a RESIDENT slab (fetched once, reused by
    every grid program) with full-size output: isolates VPU arithmetic + out
    traffic from the phi streaming. Grid/tile shapes match the production
    kernel.
(3) Same but per-axis count (1 vs 3 axes) to get flops scaling.
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from docs.axon_timing import slope_time
from lsm_tpu.ops import stencils as st

N = 512
shape = (N, N, N)
nbytes = N * N * N * 4
cells = N ** 3
x0 = jnp.ones(shape, jnp.float32)
_G = 3


def report(label, el, bytes_moved=None, rate_cells=False):
    msg = f"{label:52s} {el*1e3:8.3f} ms"
    if bytes_moved:
        msg += f"  {bytes_moved/el/1e9:7.1f} GB/s"
    if rate_cells:
        msg += f"  {cells/el/1e9:7.2f} G cells/s"
    print(msg, flush=True)


# (1) XLA read-only / write-only
@partial(jax.jit, donate_argnums=(0,))
def xla_read(v):
    s = jnp.sum(v, dtype=jnp.float32)
    return v.at[0, 0, 0].add(1e-20 * s)


el = slope_time(xla_read, lambda: x0 + 0.0)
report("XLA sum-reduce (read 4B/cell)", el, bytes_moved=nbytes)


@partial(jax.jit, donate_argnums=(0,))
def xla_write(v):
    return jnp.full(shape, v[0, 0, 0] + 1e-7, jnp.float32)


el = slope_time(xla_write, lambda: x0 + 0.0)
report("XLA broadcast (write 4B/cell)", el, bytes_moved=nbytes)


# (2) WENO arithmetic on a resident slab
def weno_resident(axes, B0=16, B1=128, B2=512, out_small=False):
    G0, G1, G2 = N // B0, N // B1, N // B2
    h = (1.0 / (N - 1),) * 3
    S1 = B1 + 2 * _G + 2
    S2 = 640

    def kernel(p_hbm, u0, u1, u2, out_ref, slab, sem):
        # fetch ONE slab at pid 0; all programs compute from it (resident)
        pid = (pl.program_id(0) * G1 + pl.program_id(1)) * G2 + pl.program_id(2)

        @pl.when(pid == 0)
        def _():
            d = pltpu.make_async_copy(
                p_hbm.at[pl.ds(0, B0 + 2 * _G), pl.ds(0, S1), pl.ds(0, S2)],
                slab, sem)
            d.start()
            d.wait()

        def view(o0, o1, o2):
            return slab[_G + o0:_G + o0 + B0, _G + o1:_G + o1 + B1,
                        _G + o2:_G + o2 + B2]

        urefs = (u0, u1, u2)
        out = jnp.zeros((B0, B1, B2), dtype=jnp.float32)
        for axis in axes:
            off = lambda m: tuple(m if d == axis else 0 for d in range(3))
            nodes = [view(*off(m)) for m in range(-3, 4)]
            dm = [(nodes[m + 1] - nodes[m]) * (1.0 / h[axis]) for m in range(6)]
            out = out + st.weno5_upwind(dm, urefs[axis][0, 0])
        if out_small:
            out_ref[:] = out[:1]
        else:
            # keep values bounded so the chained steps don't diverge
            out_ref[:] = out * 1e-30 + view(0, 0, 0)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    if out_small:
        out_spec = pl.BlockSpec((1, B1, B2), lambda i, j, k: (0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((1, B1, B2), jnp.float32)
    else:
        out_spec = pl.BlockSpec((B0, B1, B2), lambda i, j, k: (i, j, k),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct(shape, jnp.float32)

    @partial(jax.jit, donate_argnums=(0,))
    def step(v):
        o = pl.pallas_call(
            kernel, grid=(G0, G1, G2),
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [smem] * 3,
            out_specs=out_spec,
            scratch_shapes=[
                pltpu.VMEM((B0 + 2 * _G, S1, S2), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",) * 3,
                vmem_limit_bytes=100 * 1024 * 1024),
        )(v, jnp.full((1, 1), 0.3, jnp.float32),
          jnp.full((1, 1), -0.2, jnp.float32), jnp.full((1, 1), 0.1, jnp.float32))
        if out_small:
            return v.at[:1, :B1, :B2].add(1e-20 * o)
        return o

    el = slope_time(step, lambda: x0 + 0.0)
    tag = "tiny-out" if out_small else "full-out"
    report(f"WENO resident {len(axes)}ax {tag} B=({B0},{B1},{B2})", el,
           rate_cells=True)


weno_resident((0, 1, 2), out_small=True)
weno_resident((0, 1, 2), out_small=False)
weno_resident((2,), out_small=True)
weno_resident((0,), out_small=True)
weno_resident((1,), out_small=True)
weno_resident((0, 1, 2), B0=8, B1=256, out_small=True)
