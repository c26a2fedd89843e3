"""Fused Pallas TPU kernels for the WENO5 advection Hamiltonian.

The hot loop of the whole engine (SURVEY.md section 3.2): per cell,
``sum_d u_d * (u_d > 0 ? weno5-(phi) : weno5+(phi))``. The pure-XLA path
materializes tens of shifted HBM-sized temporaries; these kernels compute the
entire Hamiltonian out of one VMEM-resident slab per tile:

- the BC-padded ``phi`` stays in HBM (``memory_space=ANY``); each program DMAs
  its *overlapping* halo slab into VMEM scratch (overlap cannot be expressed
  with BlockSpecs, which partition), double-buffered ACROSS grid programs so
  the DMA overlaps the previous tile's VPU work,
- velocity components (and the optional axpy operand) stream through regular
  double-buffered ``BlockSpec`` pipelines,
- all one-sided differences, Jiang-Shu smoothness indicators and weights are
  VMEM-resident (VPU),
- the time-integrator axpy is fused into the same kernel
  (``out = alpha*aux + beta*center - gamma*H``), so a forward-Euler step or an
  RK stage makes ONE pass over HBM instead of Hamiltonian-then-update.

Arithmetic layout (:func:`lsm_tpu.ops.stencils.weno5_upwind`): WENO5 on TPU is
VPU-compute-bound, not HBM-bound, so the kernel selects the five stencil
*inputs* by upwind direction and runs a single reconstruction core per axis
(half the arithmetic of evaluating both biases), with one-division nonlinear
weights.

``weno_advection_rhs`` / ``weno_advection_stage`` are the public entries:
custom-VJP wrapped (backward pass = VJP of the reference jnp implementation,
recomputed from the saved primals) so the kernels are differentiable inside
``rollout``.
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

__all__ = [
    "weno_advection_rhs",
    "weno_advection_stage",
    "pallas_available",
    "weno_hamiltonian_pallas",
    "weno_stage_pallas",
]

_G = st.PAD_WENO5  # 3
_LANE = 128
_SUBLANE = 8
_VMEM_LIMIT = 100 * 1024 * 1024  # v5e has 128 MiB VMEM; leave headroom


def pallas_available() -> bool:
    if not _HAS_PALLAS:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _pick_tile(n: int, targets) -> Optional[int]:
    for t in targets:
        if n % t == 0:
            return t
    return None


def _make_kernel_3d(B0: int, B1: int, B2: int, S2: int, spacing, grid_dims, with_aux: bool):
    h = spacing
    G0, G1, G2 = grid_dims
    total = G0 * G1 * G2

    def kernel(coef_ref, p_hbm, u0_ref, u1_ref, u2_ref, *rest):
        if with_aux:
            aux_ref, out_ref, slab, sem = rest
        else:
            out_ref, slab, sem = rest
            aux_ref = None
        i = pl.program_id(0)
        j = pl.program_id(1)
        k = pl.program_id(2)
        pid = (i * G1 + j) * G2 + k

        # Aligned over-fetch: dim0 is unconstrained (fetch exactly B0+6 from
        # offset i*B0 — the padded array's left ghost makes that the halo
        # start); dim1 offset j*B1 is sublane-aligned (B1 % 8 == 0), size
        # rounded to B1+8; dim2 offset k*B2 is lane-aligned (B2 % 128 == 0 or
        # single whole-extent tile at offset 0), size S2 rounded up to a lane
        # multiple. The padded input carries matching junk tails.
        def dma(slot, i2, j2, k2):
            # G2 == 1 ⇒ the only lane-dim offset is 0; pass it as a constant so
            # Mosaic can prove lane alignment (a traced k2*B2 with B2 % 128 != 0
            # is rejected even though k2 is always 0).
            off2 = (k2 * B2) if G2 > 1 else 0
            return pltpu.make_async_copy(
                p_hbm.at[
                    pl.ds(i2 * B0, B0 + 2 * _G),
                    pl.ds(j2 * B1, B1 + 2 * _G + 2),
                    pl.ds(off2, S2),
                ],
                slab.at[slot],
                sem.at[slot],
            )

        # Double-buffered halo slabs pipelined ACROSS grid steps: each program
        # prefetches its successor's slab, so the (latency-bound) halo DMA
        # overlaps this program's VPU work. Requires "arbitrary" grid
        # semantics (cross-iteration scratch dependency).
        one = jnp.asarray(1, pid.dtype)
        slot = jax.lax.rem(pid, jnp.asarray(2, pid.dtype))
        nxt = pid + one
        k2 = jax.lax.rem(nxt, jnp.asarray(G2, pid.dtype))
        j2 = jax.lax.rem(nxt // jnp.asarray(G2, pid.dtype), jnp.asarray(G1, pid.dtype))
        i2 = nxt // jnp.asarray(G1 * G2, pid.dtype)

        @pl.when(pid == 0)
        def _():
            dma(0, i, j, k).start()

        @pl.when(nxt < total)
        def _():
            dma(1 - slot, i2, j2, k2).start()

        dma(slot, i, j, k).wait()

        def view(o0, o1, o2):
            return slab[
                slot,
                _G + o0 : _G + o0 + B0,
                _G + o1 : _G + o1 + B1,
                _G + o2 : _G + o2 + B2,
            ]

        def axis_dm(axis):
            dm = []
            for m in range(-3, 4):  # nodes I-3..I+3 -> D- at I-2..I+3
                off = [0, 0, 0]
                off[axis] = m
                dm.append(view(*off))
            return [(dm[m + 1] - dm[m]) * (1.0 / h[axis]) for m in range(6)]

        ham = jnp.zeros((B0, B1, B2), dtype=out_ref.dtype)
        for axis, u_ref in ((0, u0_ref), (1, u1_ref), (2, u2_ref)):
            ham = ham + st.weno5_upwind(axis_dm(axis), u_ref[:])
        beta = coef_ref[1]
        gamma = coef_ref[2]
        out = beta * view(0, 0, 0) - gamma * ham
        if with_aux:
            out = coef_ref[0] * aux_ref[:] + out
        out_ref[:] = out

    return kernel


def _make_kernel_2d(B0: int, shape, spacing, with_aux: bool):
    n0, n1 = shape
    h = spacing
    S0 = B0 + 2 * _G + 2  # sublane-aligned over-fetch
    S1_l = -(-(n1 + 2 * _G) // _LANE) * _LANE  # lane-aligned extent (whole rows)

    def kernel(coef_ref, p_hbm, u0_ref, u1_ref, *rest):
        if with_aux:
            aux_ref, out_ref, slab, sem = rest
        else:
            out_ref, slab, sem = rest
            aux_ref = None
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(p_hbm.at[pl.ds(i * B0, S0), :], slab, sem)
        dma.start()
        dma.wait()

        def view(o0, o1):
            return slab[_G + o0 : _G + o0 + B0, _G + o1 : _G + o1 + n1]

        def axis_dm(axis):
            dm = []
            for m in range(-3, 4):
                off = [0, 0]
                off[axis] = m
                dm.append(view(*off))
            return [(dm[m + 1] - dm[m]) * (1.0 / h[axis]) for m in range(6)]

        ham = jnp.zeros((B0, n1), dtype=out_ref.dtype)
        for axis, u_ref in ((0, u0_ref), (1, u1_ref)):
            ham = ham + st.weno5_upwind(axis_dm(axis), u_ref[:])
        out = coef_ref[1] * view(0, 0) - coef_ref[2] * ham
        if with_aux:
            out = coef_ref[0] * aux_ref[:] + out
        out_ref[:] = out

    return kernel, S0, S1_l


def weno_stage_pallas(
    padded: jnp.ndarray,
    u: Tuple[jnp.ndarray, ...],
    spacing,
    shape,
    coeffs=None,
    aux: Optional[jnp.ndarray] = None,
    interpret: bool = False,
    tiles: Optional[Tuple[int, ...]] = None,
) -> jnp.ndarray:
    """Fused ``out = alpha*aux + beta*phi - gamma*H(phi, u)`` on a ghost-padded
    field (``padded`` = phi padded by 3 on every side; ``u`` per-axis velocity,
    interior shape; ``coeffs = (alpha, beta, gamma)``). ``coeffs=None`` returns
    the plain Hamiltonian. One HBM pass per RK stage.
    """
    ndim = len(shape)
    dtype = padded.dtype
    with_aux = aux is not None
    if coeffs is None:
        coeffs = (0.0, 0.0, -1.0)
    coef = jnp.asarray(jnp.stack([jnp.asarray(c, dtype) for c in coeffs]))
    # "arbitrary" grid semantics: the cross-program double-buffered slab
    # prefetch is a deliberate cross-iteration dependency.
    params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",) * (3 if ndim == 3 else 1),
        vmem_limit_bytes=_VMEM_LIMIT,
    )
    if ndim == 3:
        n0, n1, n2 = shape
        if tiles is not None:
            B0, B1, B2 = tiles
        else:
            B0 = _pick_tile(n0, (16, 8, 4))
            B1 = _pick_tile(n1, (32, 16, 8))
            # lane-dim tiles must be 128-aligned (DMA offset k*B2); a single
            # whole-extent tile (offset always 0) is exempt
            B2 = _pick_tile(n2, (512, 256, 384, 128)) or n2
        if B0 is None or B1 is None or B2 is None:
            raise ValueError(f"no tile size divides shape {shape}")
        grid = (n0 // B0, n1 // B1, n2 // B2)
        # lane-dim fetch extent: B2+2*_G rounded up to a multiple of 128
        # (Mosaic requires DMA slice *sizes* on the lane dim to be lane-aligned)
        S2 = -(-(B2 + 2 * _G) // _LANE) * _LANE
        kernel = _make_kernel_3d(B0, B1, B2, S2, spacing, grid, with_aux)
        # junk tails keep the aligned over-fetches in bounds: +2 sublane rows,
        # +(S2-B2-6) lanes (fetch size S2 starting at the last k*B2)
        padded = jnp.pad(padded, [(0, 0), (0, 2), (0, S2 - B2 - 2 * _G)])
        block = lambda: pl.BlockSpec(
            (B0, B1, B2), lambda i, j, k: (i, j, k), memory_space=pltpu.VMEM
        )
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        in_specs = [smem, pl.BlockSpec(memory_space=pl.ANY)] + [block()] * 3
        args = [coef, padded, *u]
        if with_aux:
            in_specs.append(block())
            args.append(aux)
        return pl.pallas_call(
            kernel,
            grid=grid,
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            in_specs=in_specs,
            out_specs=block(),
            scratch_shapes=[
                pltpu.VMEM((2, B0 + 2 * _G, B1 + 2 * _G + 2, S2), dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=params,
            interpret=interpret,
        )(*args)
    if ndim == 2:
        n0, n1 = shape
        B0 = tiles[0] if tiles else _pick_tile(n0, (16, 8, 4))
        if B0 is None:
            raise ValueError(f"no tile size divides shape {shape}")
        kernel, S0, S1_l = _make_kernel_2d(B0, shape, spacing, with_aux)
        lane_pad = S1_l - (n1 + 2 * _G)
        padded = jnp.pad(padded, [(0, 2), (0, lane_pad)])
        grid = (n0 // B0,)
        ublock = lambda: pl.BlockSpec(
            (B0, n1), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        in_specs = [smem, pl.BlockSpec(memory_space=pl.ANY), ublock(), ublock()]
        args = [coef, padded, *u]
        if with_aux:
            in_specs.append(ublock())
            args.append(aux)
        return pl.pallas_call(
            kernel,
            grid=grid,
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((B0, n1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((S0, S1_l), dtype),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=params,
            interpret=interpret,
        )(*args)
    raise ValueError("pallas WENO kernel supports 2D and 3D only")


def weno_hamiltonian_pallas(
    padded: jnp.ndarray,
    u: Tuple[jnp.ndarray, ...],
    spacing,
    shape,
    interpret: bool = False,
    tiles: Optional[Tuple[int, ...]] = None,
) -> jnp.ndarray:
    """Plain WENO5 advection Hamiltonian (no fused axpy)."""
    return weno_stage_pallas(
        padded, u, spacing, shape, coeffs=None, aux=None, interpret=interpret, tiles=tiles
    )


def _weno_hamiltonian_jnp(padded, u, spacing, shape):
    out = 0.0
    for ax, h in enumerate(spacing):
        out = out + st.weno5_upwind(st.weno5_pair_diffs(padded, ax, h, _G, shape), u[ax])
    return out


def _stage_jnp(padded, u, aux, coeffs, spacing, shape):
    ham = _weno_hamiltonian_jnp(padded, u, spacing, shape)
    center = st.shift(padded, (0,) * len(shape), _G, shape)
    out = coeffs[1] * center - coeffs[2] * ham
    if aux is not None:
        out = coeffs[0] * aux + out
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def weno_advection_rhs(padded, u, spacing, shape, use_pallas=True):
    """WENO5 advection Hamiltonian on a ghost-padded field; differentiable.

    Forward runs the fused Pallas kernel when ``use_pallas`` and available
    (TPU, supported shape), else the whole-array jnp path; backward is the VJP
    of the jnp path, recomputed from the saved primals (the standard
    recompute-in-backward trade for stencils — residuals would cost more HBM
    than the recompute).
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def weno_advection_stage(padded, u, aux, coeffs, spacing, shape, use_pallas=True):
    """Fused RK-stage ``alpha*aux + beta*phi - gamma*H(phi, u)``; differentiable.

    ``coeffs = (alpha, beta, gamma)`` (traced scalars are fine — they land in
    SMEM, so CFL-adaptive ``dt`` does not recompile). ``aux`` may be ``None``
    (forward Euler / first RK stage). One HBM pass per stage on TPU.
    """
    coeffs = tuple(coeffs)
    if use_pallas and pallas_available() and len(shape) in (2, 3):
        try:
            return weno_stage_pallas(
                padded, tuple(u), spacing, shape, coeffs=coeffs, aux=aux
            )
        except ValueError:
            pass
    return _stage_jnp(padded, tuple(u), aux, coeffs, spacing, shape)


def _stage_fwd(padded, u, aux, coeffs, spacing, shape, use_pallas):
    out = weno_advection_stage(padded, u, aux, coeffs, spacing, shape, use_pallas)
    return out, (padded, u, aux, coeffs)


def _stage_bwd(spacing, shape, use_pallas, res, g):
    padded, u, aux, coeffs = res
    if aux is None:
        def f(p, uu, cf):
            return _stage_jnp(p, uu, None, cf, spacing, shape)

        _, vjp = jax.vjp(f, padded, tuple(u), tuple(coeffs))
        d_padded, d_u, d_coeffs = vjp(g)
        d_aux = None
    else:
        def f(p, uu, ax, cf):
            return _stage_jnp(p, uu, ax, cf, spacing, shape)

        _, vjp = jax.vjp(f, padded, tuple(u), aux, tuple(coeffs))
        d_padded, d_u, d_aux, d_coeffs = vjp(g)
    return d_padded, type(u)(d_u), d_aux, type(coeffs)(d_coeffs)


weno_advection_stage.defvjp(_stage_fwd, _stage_bwd)
