"""Round-3 probe pt2: is the v2 kernel's slab DMA descriptor-rate-bound?

The v2 fused kernel at tiles (16,128) fetches (22,144,512) slabs from the
(518,528,512) padded buffer: 22*144 = 3168 separate 2 KB contiguous chunks
per program. If the DMA engine is descriptor-bound (not bandwidth-bound),
that fetch crawls. A full-width dim-1 slab (B0+6, 528, 512) is 14-22
contiguous ~1 MB chunks — same bytes, 150x fewer descriptors.

Measures, per pattern: raw sequential DMA (start+wait, no overlap), so the
number is the DMA engine's achievable rate for that access shape.
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from docs.axon_timing import slope_time

N = 512
P0, P1, P2 = N + 6, N + 16, N  # v2 padded buffer
buf = jnp.ones((P0, P1, P2), jnp.float32)


def dma_probe(label, S, grid_sz, index_map, out_writeback=None):
    """Fetch an S-shaped slab per program via index_map(pid) -> offsets."""
    def kernel(x_hbm, out_ref, slab, sem):
        pid = pl.program_id(0)
        o0, o1, o2 = index_map(pid)
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(o0, S[0]), pl.ds(o1, S[1]), pl.ds(o2, S[2])],
            slab, sem)
        cp.start()
        cp.wait()
        out_ref[:] = out_ref[:] + slab[0, :8, :512]

    @partial(jax.jit, donate_argnums=(0,))
    def step(v):
        o = pl.pallas_call(
            kernel, grid=(grid_sz,),
            out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((8, 512), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM(S, jnp.float32),
                            pltpu.SemaphoreType.DMA],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=120 * 1024 * 1024),
        )(v)
        return v.at[0, :8, :512].add(1e-30 * o)

    el = slope_time(step, lambda: buf + 0.0)
    bytes_moved = grid_sz * S[0] * S[1] * S[2] * 4
    chunks = grid_sz * S[0] * (S[1] if S[1] != P1 else 1)
    print(f"{label:46s} {el*1e3:8.3f} ms  {bytes_moved/el/1e9:7.1f} GB/s  "
          f"({chunks} chunks)", flush=True)


# A: v2 tiles (16,128): (22,144,512) strided slabs, 32*4 = 128 programs
B0, B1 = 16, 128
dma_probe(
    "A: (22,144,512) strided   x128  [v2 today]",
    (B0 + 6, B1 + 16, N), 128,
    lambda p: ((p // 4) * B0, (p % 4) * B1, 0),
)

# B: full-width dim-1: (14,528,512) contiguous slabs, 64 programs
dma_probe(
    "B: (14,528,512) contiguous x64  [proposed]",
    (8 + 6, P1, N), 64,
    lambda p: (p * 8, 0, 0),
)

# C: same bytes as B but bigger B0 (fewer, larger fetches)
dma_probe(
    "C: (22,528,512) contiguous x32",
    (16 + 6, P1, N), 32,
    lambda p: (p * 16, 0, 0),
)

# D: strided but lane-full rows, half-width dim1 (moderate chunk count)
dma_probe(
    "D: (14,272,512) strided    x128",
    (8 + 6, 256 + 16, N), 128,
    lambda p: ((p // 2) * 8, (p % 2) * 256, 0),
)
