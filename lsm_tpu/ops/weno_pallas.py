"""Fused Pallas TPU kernel for the WENO5 advection Hamiltonian.

The hot loop of the whole engine (SURVEY.md section 3.2): per cell,
``sum_d u_d * (u_d > 0 ? weno5-(phi) : weno5+(phi))``. The pure-XLA path
materializes tens of shifted HBM-sized temporaries; this kernel computes the
entire Hamiltonian out of one VMEM-resident slab per tile:

- the BC-padded ``phi`` stays in HBM (``memory_space=ANY``); each program DMAs
  its *overlapping* ``(B0+6, B1+6, n2+6)`` halo slab into VMEM scratch (overlap
  cannot be expressed with BlockSpecs, which partition),
- velocity components and the output stream through regular double-buffered
  ``BlockSpec`` pipelines,
- all 36 one-sided differences, Jiang-Shu smoothness indicators and weights are
  register/VMEM-resident (VPU), so HBM traffic per cell-update drops to
  ~(redundant) phi reads + u + out.

The six backward differences per axis are shared between the left- and
right-biased reconstructions (``D+ at I+m == D- at I+m+1``), saving ~40% of the
difference arithmetic vs. the naive form.

``weno_advection_rhs`` is the public entry: custom-VJP wrapped (backward pass =
VJP of the reference jnp implementation, recomputed from the saved primals) so
the kernel is differentiable inside ``rollout``.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import stencils as st

try:  # Pallas is TPU/Mosaic-only; import lazily so CPU-only installs work
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

__all__ = ["weno_advection_rhs", "pallas_available", "weno_hamiltonian_pallas"]

_G = st.PAD_WENO5  # 3


def pallas_available() -> bool:
    if not _HAS_PALLAS:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _pick_tile(n: int, targets=(16, 8)) -> Optional[int]:
    for t in targets:
        if n % t == 0:
            return t
    return None


def _weno_pair_from_dm(dm):
    """(weno5-, weno5+) from the six shared backward differences ``dm[k]``,
    ``k = -2..3`` (offset index ``k+2``)."""
    minus = st._weno_core(dm[0], dm[1], dm[2], dm[3], dm[4])
    plus = st._weno_core(dm[5], dm[4], dm[3], dm[2], dm[1])
    return minus, plus


def _make_kernel_3d(B0: int, B1: int, shape, spacing):
    n0, n1, n2 = shape
    h = spacing
    # Mosaic constraint: DMA slice shapes must be tiling-aligned — a multiple
    # of 8 in the sublane (second-to-last) dim and of 128 in the lane (last)
    # dim. The slab therefore over-fetches B1+8 sublane rows and the whole
    # 128-rounded lane extent; the padded input carries matching junk tails.
    # Offsets i*B0 / j*B1 are 8-aligned since B is a multiple of 8.
    S1 = B1 + 2 * _G + 2
    S2 = -(-(n2 + 2 * _G) // 128) * 128

    def kernel(p_hbm, u0_ref, u1_ref, u2_ref, out_ref, slab, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        dma = pltpu.make_async_copy(
            p_hbm.at[pl.ds(i * B0, B0 + 2 * _G), pl.ds(j * B1, S1), :],
            slab,
            sem,
        )
        dma.start()
        dma.wait()

        def view(o0, o1, o2):
            return slab[
                _G + o0 : _G + o0 + B0,
                _G + o1 : _G + o1 + B1,
                _G + o2 : _G + o2 + n2,
            ]

        def axis_dm(axis):
            dm = []
            for k in range(-2, 4):  # D- at I+k needs phi[I+k] - phi[I+k-1]
                off_hi = [0, 0, 0]
                off_lo = [0, 0, 0]
                off_hi[axis] = k
                off_lo[axis] = k - 1
                dm.append((view(*off_hi) - view(*off_lo)) * (1.0 / h[axis]))
            return dm

        out = jnp.zeros((B0, B1, n2), dtype=out_ref.dtype)
        for axis, u_ref in ((0, u0_ref), (1, u1_ref), (2, u2_ref)):
            minus, plus = _weno_pair_from_dm(axis_dm(axis))
            u = u_ref[:]
            out = out + u * jnp.where(u > 0, minus, plus)
        out_ref[:] = out

    return kernel


def _make_kernel_2d(B0: int, shape, spacing):
    n0, n1 = shape
    h = spacing
    S0 = B0 + 2 * _G + 2  # sublane-aligned over-fetch (see 3D kernel)
    S1_l = -(-(n1 + 2 * _G) // 128) * 128  # lane-aligned extent

    def kernel(p_hbm, u0_ref, u1_ref, out_ref, slab, sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(
            p_hbm.at[pl.ds(i * B0, S0), :], slab, sem
        )
        dma.start()
        dma.wait()

        def view(o0, o1):
            return slab[_G + o0 : _G + o0 + B0, _G + o1 : _G + o1 + n1]

        def axis_dm(axis):
            dm = []
            for k in range(-2, 4):
                off_hi = [0, 0]
                off_lo = [0, 0]
                off_hi[axis] = k
                off_lo[axis] = k - 1
                dm.append((view(*off_hi) - view(*off_lo)) * (1.0 / h[axis]))
            return dm

        out = jnp.zeros((B0, n1), dtype=out_ref.dtype)
        for axis, u_ref in ((0, u0_ref), (1, u1_ref)):
            minus, plus = _weno_pair_from_dm(axis_dm(axis))
            u = u_ref[:]
            out = out + u * jnp.where(u > 0, minus, plus)
        out_ref[:] = out

    return kernel


def weno_hamiltonian_pallas(
    padded: jnp.ndarray, u: Tuple[jnp.ndarray, ...], spacing, shape, interpret: bool = False
) -> jnp.ndarray:
    """Run the fused kernel. ``padded`` is phi ghost-padded by 3 on every side;
    ``u`` the per-axis velocity arrays (interior shape). Returns the Hamiltonian.
    """
    ndim = len(shape)
    dtype = padded.dtype
    if ndim == 3:
        n0, n1, n2 = shape
        B0 = _pick_tile(n0)
        B1 = _pick_tile(n1)
        if B0 is None or B1 is None:
            raise ValueError(f"no tile size divides shape {shape}")
        kernel = _make_kernel_3d(B0, B1, shape, spacing)
        # junk tails keep the aligned over-fetches in bounds: +2 sublane rows,
        # lane dim rounded up to a multiple of 128
        lane_pad = -(-(n2 + 2 * _G) // 128) * 128 - (n2 + 2 * _G)
        padded = jnp.pad(padded, [(0, 0), (0, 2), (0, lane_pad)])
        grid = (n0 // B0, n1 // B1)
        ublock = lambda: pl.BlockSpec(
            (B0, B1, n2), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                ublock(),
                ublock(),
                ublock(),
            ],
            out_specs=pl.BlockSpec(
                (B0, B1, n2), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM(
                    (B0 + 2 * _G, B1 + 2 * _G + 2, -(-(n2 + 2 * _G) // 128) * 128),
                    dtype,
                ),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(padded, *u)
    if ndim == 2:
        n0, n1 = shape
        B0 = _pick_tile(n0)
        if B0 is None:
            raise ValueError(f"no tile size divides shape {shape}")
        kernel = _make_kernel_2d(B0, shape, spacing)
        lane_pad = -(-(n1 + 2 * _G) // 128) * 128 - (n1 + 2 * _G)
        padded = jnp.pad(padded, [(0, 2), (0, lane_pad)])
        grid = (n0 // B0,)
        ublock = lambda: pl.BlockSpec(
            (B0, n1), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY), ublock(), ublock()],
            out_specs=pl.BlockSpec((B0, n1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM(
                    (B0 + 2 * _G + 2, -(-(n1 + 2 * _G) // 128) * 128), dtype
                ),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(padded, *u)
    raise ValueError("pallas WENO kernel supports 2D and 3D only")


def _weno_hamiltonian_jnp(padded, u, spacing, shape):
    out = 0.0
    for ax, h in enumerate(spacing):
        dminus = st.weno5m(padded, ax, h, _G, shape)
        dplus = st.weno5p(padded, ax, h, _G, shape)
        out = out + u[ax] * jnp.where(u[ax] > 0, dminus, dplus)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def weno_advection_rhs(padded, u, spacing, shape, use_pallas=False):
    """WENO5 advection Hamiltonian on a ghost-padded field; differentiable.

    Forward runs the fused Pallas kernel when ``use_pallas`` and available
    (TPU, supported shape), else the whole-array jnp path; backward is the VJP
    of the jnp path, recomputed from the saved primals (the standard
    recompute-in-backward trade for stencils — residuals would cost more HBM
    than the recompute).

    ``use_pallas`` currently defaults to False: on the measured chip XLA's own
    stencil fusion beats the first-cut kernel (1.84 vs 3.01 ms at 128^3, see
    docs/perf-notes.md); the kernel stays available and tested for tuning.
    """
    if use_pallas and pallas_available() and len(shape) in (2, 3):
        try:
            return weno_hamiltonian_pallas(padded, tuple(u), spacing, shape)
        except ValueError:
            pass
    return _weno_hamiltonian_jnp(padded, tuple(u), spacing, shape)


def _rhs_fwd(padded, u, spacing, shape, use_pallas):
    out = weno_advection_rhs(padded, u, spacing, shape, use_pallas)
    return out, (padded, u)


def _rhs_bwd(spacing, shape, use_pallas, res, g):
    padded, u = res
    _, vjp = jax.vjp(lambda p, uu: _weno_hamiltonian_jnp(p, uu, spacing, shape), padded, tuple(u))
    d_padded, d_u = vjp(g)
    return d_padded, type(u)(d_u)


weno_advection_rhs.defvjp(_rhs_fwd, _rhs_bwd)
