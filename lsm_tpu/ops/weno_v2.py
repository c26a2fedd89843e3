"""Persistent-padded fused multi-term stage kernel (round-2 redesign, 3D).

The round-1 kernel (:mod:`lsm_tpu.ops.weno_pallas`) spends most of its HBM
budget outside the Hamiltonian itself: a full XLA pad pass per stage
(read+write), 12 B/cell of streamed velocity, and 25% junk lanes on the slab
fetches. This module removes all three for the flagship 3D path, and fuses
EVERY Hamiltonian the engine knows (not just WENO5 advection) into one kernel
pass per RK stage:

- **Persistent padded state.** ``phi`` lives in a ``(n0+6, n1+8, n2)`` buffer:
  3 ghost layers on dims 0/1 (plus 2 junk rows keeping slab fetches in
  bounds) and NO stored ghosts on the lane dim — the kernel reconstructs lane
  ghosts in VMEM from the boundary condition (wrap / Lagrange extrapolation /
  mirror are all static-slice formulas, semantics of
  ``/root/reference/src/boundaryconditions.jl:90-153``). A stage writes its
  result straight into a new padded buffer (manual VMEM->HBM DMA at the
  interior offset); only the O(N^2) ghost shells are refreshed by XLA
  afterwards — no full-grid pad pass per stage.
- **Multi-term Hamiltonians in one pass.** The kernel evaluates the SUM of
  term contributions on the lane-extended VMEM slab by calling the very same
  whole-array stencil helpers the jnp path uses
  (:func:`lsm_tpu.ops.stencils.weno5_upwind` / ``godunov_norms`` /
  ``curvature_from_padded``), so fused vs unfused parity is by construction:
  * ``advection``  — WENO5 upwind ``u . grad phi`` (``levelsetterms.jl:45-96``)
  * ``normal``     — Godunov+ENO2 ``v |grad phi|`` (``levelsetterms.jl:130-187``)
  * ``curvature``  — ``b kappa |grad phi|`` (``levelsetterms.jl:99-127``)
  * ``eikonal``    — ``sign(phi)(|grad phi| - 1)`` (``levelsetterms.jl:190-265``)
- **Analytic coefficients.** A coordinate-callable coefficient (velocity,
  speed, curvature weight) is evaluated in-kernel from program-offset iota
  coordinates instead of streaming it from HBM (12 B/cell for a 3D velocity).
- **Fused RK-stage axpy** ``out = alpha*aux + beta*phi - gamma*H`` with the
  coefficients (and time) in SMEM, so CFL-adaptive ``dt`` never recompiles.

Forward-only: the differentiable path (``rollout``) keeps the custom-VJP v1
kernel. Parity oracle: :func:`stage_reference` (pure jnp on the same padded
layout) must match the kernel in interpret mode to FMA-contraction tolerance.

Lane-dim constraint: ``n2 % 128 == 0`` (DMA slice sizes on the lane dim);
callers fall back to the v1 kernel / plain XLA otherwise.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from ..core import bc as _bc
from . import stencils as st

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

__all__ = [
    "pack_padded",
    "unpack_padded",
    "refresh_ghosts",
    "refresh_ghosts_fast",
    "fused_stage",
    "stage_reference",
    "supports_v2",
    "TermSpec",
]

_G = st.PAD_WENO5  # 3 — ghost width on dims 0 and 2 (WENO5's reach)
_G1 = 8  # dim-1 (sublane) stored pad per side: 3 ghosts + junk, so the
# interior sits at sublane offset 8 and every output DMA offset 8 + j*B1 is
# 8-divisible (Mosaic requires provable sublane-tiling divisibility)
_LANE = 128
_VMEM_LIMIT = 100 * 1024 * 1024


def supports_v2(shape, bcs) -> bool:
    """v2 handles 3D grids whose lane dim is a multiple of 128 with
    kernel-reconstructible BCs (Periodic / Extrapolation / Symmetry)."""
    if len(shape) != 3 or shape[2] % _LANE != 0 or bcs is None:
        return False
    kinds = (_bc.Periodic, _bc.Extrapolation, _bc.Symmetry)
    return all(isinstance(b, kinds) for pair in bcs for b in pair)


def padded_shape(shape) -> Tuple[int, int, int]:
    n0, n1, n2 = shape
    return (n0 + 2 * _G, n1 + 2 * _G1, n2)


def pack_padded(values: jnp.ndarray, bcs) -> jnp.ndarray:
    """Interior values -> persistent padded layout (ghosts on dims 0/1, junk
    rows zeroed, no lane-dim ghosts)."""
    p = _bc.pad_ghost(values, bcs, _G, axes=(0, 1))
    j = _G1 - _G
    return jnp.pad(p, [(0, 0), (j, j), (0, 0)])


def unpack_padded(padded: jnp.ndarray, shape) -> jnp.ndarray:
    n0, n1, n2 = shape
    return padded[_G:_G + n0, _G1:_G1 + n1, :]


def refresh_ghosts(padded: jnp.ndarray, bcs, shape) -> jnp.ndarray:
    """Recompute the dim-0/dim-1 ghost shells from the (current) interior.

    Same composition order as ``pad_ghost``: dim 0 first from interior rows,
    then dim 1 from rows including the fresh dim-0 ghosts, so corner ghosts
    match the sequential pad exactly (``meshfield.jl:248-260`` semantics).
    """
    n0, n1, n2 = shape
    interior = padded[_G:_G + n0, _G1:_G1 + n1, :]
    l0 = _bc._ghost_block(interior, bcs[0][0], 0, _G, "left")
    r0 = _bc._ghost_block(interior, bcs[0][1], 0, _G, "right")
    padded = padded.at[:_G, _G1:_G1 + n1, :].set(l0)
    padded = padded.at[_G + n0:, _G1:_G1 + n1, :].set(r0)
    col = padded[:, _G1:_G1 + n1, :]  # full dim0 incl fresh ghosts
    l1 = _bc._ghost_block(col, bcs[1][0], 1, _G, "left")
    r1 = _bc._ghost_block(col, bcs[1][1], 1, _G, "right")
    padded = padded.at[:, _G1 - _G:_G1, :].set(l1)
    padded = padded.at[:, _G1 + n1:_G1 + n1 + _G, :].set(r1)
    return padded


# -- in-place Pallas ghost refresh --------------------------------------------------
#
# ``refresh_ghosts`` is semantically O(N^2) but measured at ~6.8 ms per call at
# 512^3 (docs/profile_r3_parts.py): every ``.at[].set`` on the 548 MB padded
# buffer costs XLA a full-buffer pass (~1.9 ms each, measured), so the "cheap"
# shell refresh ate 40% of the fused step. This kernel updates ONLY the shells
# (~60 MB of DMA at 512^3) with the buffer aliased in place.


def _dim0_shell(o_ref, src, wbuf, sem, bc, side, n0, n1, dtype):
    """Refresh one dim-0 ghost shell: read the source rows, compute the
    (_G, n1, n2) ghost block (exact ``_ghost_block`` semantics), write it."""
    if isinstance(bc, _bc.Periodic):
        r0, K = n0 - 1 if side == "left" else 4, _G
    elif isinstance(bc, _bc.Symmetry):
        r0, K = 4 if side == "left" else n0 - 1, _G
    else:
        P = bc.degree
        r0, K = _G if side == "left" else _G + n0 - 1 - P, P + 1
    rd = pltpu.make_async_copy(
        o_ref.at[pl.ds(r0, K), pl.ds(_G1, n1), :], src.at[pl.ds(0, K)], sem)
    rd.start()
    rd.wait()
    # write each ghost row by STATIC row index: negative-stride reversal and
    # jnp.stack along the major dim miscompile under Mosaic (compiled results
    # were wrong for Extrapolation and crashed for Symmetry while interpret
    # mode agreed with the oracle — caught by the on-chip BC parity test)
    if isinstance(bc, _bc.Periodic):
        wbuf[:] = src[pl.ds(0, K)]
    elif isinstance(bc, _bc.Symmetry):
        for g in range(_G):
            wbuf[g] = src[K - 1 - g]
    else:
        P = bc.degree
        W = _bc._lagrange_extrap_weights(_G, P)
        if side == "right":
            # right block is innermost-first and reads nodes n-1..n-1-P, but
            # we fetched rows ascending (n-1-P..n-1): flip both
            W = W[::-1, ::-1]
        # scalar-weighted sums (Pallas kernels cannot capture array constants)
        for g in range(_G):
            acc = float(W[g, 0]) * src[0]
            for j in range(1, P + 1):
                acc = acc + float(W[g, j]) * src[j]
            wbuf[g] = acc
    dst = 0 if side == "left" else _G + n0
    wr = pltpu.make_async_copy(
        wbuf, o_ref.at[pl.ds(dst, _G), pl.ds(_G1, n1), :], sem)
    wr.start()
    wr.wait()


def _dim1_ghost_cols(blkA, blkB, bc, side, n1, dtype):
    """The _G ghost columns for one side of dim 1 (outermost-first for left,
    innermost-first for right) from the aligned edge blocks A (interior cols
    0..7) and B (interior cols n1-8..n1-1)."""
    if isinstance(bc, _bc.Periodic):
        if side == "left":  # ghost -k -> col n1-1-k -> B local 7-k, k=3,2,1
            return [blkB[:, 7 - k, :] for k in (3, 2, 1)]
        return [blkA[:, k, :] for k in (1, 2, 3)]  # ghost +k -> col k
    if isinstance(bc, _bc.Symmetry):
        if side == "left":  # ghost -k -> col k -> A local k
            return [blkA[:, k, :] for k in (3, 2, 1)]
        return [blkB[:, 7 - k, :] for k in (1, 2, 3)]  # col n1-1-k
    P = bc.degree
    W = _bc._lagrange_extrap_weights(_G, P)
    cols = []
    rows = range(_G) if side == "left" else range(_G - 1, -1, -1)
    for g in rows:
        if side == "left":
            acc = float(W[g, 0]) * blkA[:, 0, :]
            for j in range(1, P + 1):
                acc = acc + float(W[g, j]) * blkA[:, j, :]
        else:
            acc = float(W[g, 0]) * blkB[:, 7, :]
            for j in range(1, P + 1):
                acc = acc + float(W[g, j]) * blkB[:, 7 - j, :]
        cols.append(acc)
    return cols


def refresh_ghosts_fast(padded: jnp.ndarray, bcs, shape,
                        interpret: bool = False) -> jnp.ndarray:
    """In-place Pallas equivalent of :func:`refresh_ghosts` (same composition
    order, bit-identical up to FP contraction): updates only the ghost shells
    via manual DMA with the buffer aliased, instead of XLA's full-buffer
    passes. Falls back to the XLA version when unsupported."""
    n0, n1, n2 = shape
    dtype = padded.dtype
    maxP = max(
        (b.degree for pair in bcs[:2] for b in pair
         if isinstance(b, _bc.Extrapolation)),
        default=0,
    )
    K0_est = max(_G, maxP + 1)
    vmem_est = jnp.dtype(dtype).itemsize * n2 * (
        (K0_est + _G) * n1 + 3 * 8 * (n0 + 2 * _G))
    if (
        not _HAS_PALLAS
        or n1 % 8
        or n1 < 8
        or maxP > 7
        or maxP + 1 > min(n0, n1)
        or vmem_est > 88 * 1024 * 1024
    ):
        return refresh_ghosts(padded, bcs, shape)
    S0 = n0 + 2 * _G
    K0 = max(_G, maxP + 1)

    def kernel(o_in, o_ref, src, wbuf, eA, eB, ebuf, sem):
        del o_in  # aliased to o_ref; all access goes through the output ref
        # dim 0 first, then dim 1 from columns including the fresh dim-0
        # ghosts — the pad_ghost composition order (corner ghosts match)
        _dim0_shell(o_ref, src, wbuf, sem, bcs[0][0], "left", n0, n1, dtype)
        _dim0_shell(o_ref, src, wbuf, sem, bcs[0][1], "right", n0, n1, dtype)
        rdA = pltpu.make_async_copy(o_ref.at[:, pl.ds(_G1, 8), :], eA, sem)
        rdA.start()
        rdA.wait()
        rdB = pltpu.make_async_copy(o_ref.at[:, pl.ds(n1, 8), :], eB, sem)
        rdB.start()
        rdB.wait()
        zero = jnp.zeros((S0, 1, n2), dtype)
        lcols = _dim1_ghost_cols(eA, eB, bcs[1][0], "left", n1, dtype)
        ebuf[:] = jnp.concatenate(
            [zero] * 5 + [c[:, None, :] for c in lcols], axis=1)
        wl = pltpu.make_async_copy(ebuf, o_ref.at[:, pl.ds(0, 8), :], sem)
        wl.start()
        wl.wait()
        rcols = _dim1_ghost_cols(eA, eB, bcs[1][1], "right", n1, dtype)
        ebuf[:] = jnp.concatenate(
            [c[:, None, :] for c in rcols] + [zero] * 5, axis=1)
        wr = pltpu.make_async_copy(ebuf, o_ref.at[:, pl.ds(_G1 + n1, 8), :], sem)
        wr.start()
        wr.wait()

    return pl.pallas_call(
        kernel,
        grid=(1,),
        out_shape=jax.ShapeDtypeStruct(padded.shape, dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((K0, n1, n2), dtype),      # dim-0 source rows
            pltpu.VMEM((_G, n1, n2), dtype),      # dim-0 ghost block
            pltpu.VMEM((S0, 8, n2), dtype),       # edge block A (first cols)
            pltpu.VMEM((S0, 8, n2), dtype),       # edge block B (last cols)
            pltpu.VMEM((S0, 8, n2), dtype),       # dim-1 write block
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(padded)


# -- in-kernel lane ghosts ----------------------------------------------------------


def _lane_ghosts(core: jnp.ndarray, bc, side: str, n: int):
    """The ``_G`` ghost lanes for one side of the lane dim, as a list of
    single-lane arrays ordered outermost-first (left) / innermost-first
    (right) — static-slice translation of :func:`lsm_tpu.core.bc._ghost_block`
    for ``width == _G`` (Mosaic-friendly: no gathers)."""

    def lane(j):
        return core[..., j:j + 1]

    if isinstance(bc, _bc.Periodic):
        # shared endpoint: left ghost -k -> node n-1-k; right ghost n-1+k -> node k
        if side == "left":
            return [lane(n - 1 - k) for k in range(_G, 0, -1)]
        return [lane(k) for k in range(1, _G + 1)]
    if isinstance(bc, _bc.Symmetry):
        if side == "left":  # ghost -k -> node k
            return [lane(k) for k in range(_G, 0, -1)]
        return [lane(n - 1 - k) for k in range(1, _G + 1)]
    if isinstance(bc, _bc.Extrapolation):
        P = bc.degree
        W = _bc._lagrange_extrap_weights(_G, P)  # (width, P+1), outermost-first
        if side == "left":
            nodes = [lane(j) for j in range(P + 1)]
            rows = range(_G)
        else:
            nodes = [lane(n - 1 - j) for j in range(P + 1)]
            rows = range(_G - 1, -1, -1)  # innermost-first
        out = []
        for g in rows:
            # Python-float weights: numpy f64 scalars would promote the whole
            # f32 kernel graph under jax_enable_x64
            acc = float(W[g, 0]) * nodes[0]
            for j in range(1, P + 1):
                acc = acc + float(W[g, j]) * nodes[j]
            out.append(acc)
        return out
    raise TypeError(f"unsupported boundary condition {bc!r}")


def _lane_extend(core: jnp.ndarray, bc_pair, n: int) -> jnp.ndarray:
    """Concatenate lane ghosts onto the core block: (..., n) -> (..., n+2G).

    (Kept for reference/tests; the kernel uses :class:`_LaneRollView` instead —
    the lane-unaligned concatenated width makes every downstream Mosaic op a
    masked multi-tile relayout and blows up compile time at large n.)
    """
    gl = _lane_ghosts(core, bc_pair[0], "left", n)
    gr = _lane_ghosts(core, bc_pair[1], "right", n)
    return jnp.concatenate(gl + [core] + gr, axis=-1)


from functools import partial as _part


@_part(jax.custom_vjp, nondiff_argnums=(1,))
def _lane_roll(x, s):
    """``pltpu.roll`` along the lane dim with a transpose rule (the raw Mosaic
    primitive has none): roll is linear, so the cotangent rolls back by
    ``n - s``. Forward-identical to ``pltpu.roll(x, s, axis=2)``."""
    return pltpu.roll(x, s, axis=2)


def _lane_roll_fwd(x, s):
    return _lane_roll(x, s), None


def _lane_roll_bwd(s, _, g):
    n = g.shape[2]
    return (_lane_roll(g, (n - s) % n),)


_lane_roll.defvjp(_lane_roll_fwd, _lane_roll_bwd)


def _lane_shift(block: jnp.ndarray, k: int, bc_pair, n: int,
                interpret: bool) -> jnp.ndarray:
    """``block`` shifted by ``k`` along the (full-grid-extent) lane dim with BC
    ghost values on the wrapped edge lanes — all shapes stay (B0, B1, n2), so
    Mosaic never sees an unaligned lane width."""
    if k == 0:
        return block
    if interpret:
        rolled = jnp.roll(block, -k, axis=2)
    else:
        # pltpu.roll rejects negative shifts; cyclic roll by -k == roll by n-k
        rolled = _lane_roll(block, (-k) % n)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
    out = rolled
    if k < 0:
        gl = _lane_ghosts(block, bc_pair[0], "left", n)  # outermost-first (d=3,2,1)
        for j in range(-k):  # lanes j: j + k < 0 -> ghost at distance -(j+k)
            out = jnp.where(iota == j, gl[_G + j + k], out)
    else:
        gr = _lane_ghosts(block, bc_pair[1], "right", n)  # innermost-first (d=1,2,3)
        for j in range(n - k, n):  # lanes j: j + k > n-1 -> ghost distance j+k-n+1
            out = jnp.where(iota == j, gr[j + k - n], out)
    return out


class _LaneRollView:
    """Virtual padded array over the VMEM halo slab.

    Dims 0/1 ghosts live in the slab (memory offsets ``_G`` / ``_G1``); lane-dim
    (dim 2) shifts are synthesized on demand by :func:`_lane_shift`. Every
    stencil helper reaches values through :func:`lsm_tpu.ops.stencils.shift`,
    which delegates here, so the whole jnp stencil library runs unchanged on
    the slab while every intermediate stays lane-aligned at width ``n2``.
    """

    __slots__ = ("slab", "bc_pair", "B0", "B1", "n2", "dtype", "interpret",
                 "goffs", "_cache")

    def __init__(self, slab, bc_pair, tile_shape, interpret=False,
                 goffs=(_G, _G1)):
        self.slab = slab
        self.bc_pair = bc_pair
        self.B0, self.B1, self.n2 = tile_shape
        self.dtype = slab.dtype
        self.interpret = interpret
        self.goffs = goffs  # (dim-0, dim-1) offset of the interior in the slab
        self._cache = {}

    def _block(self, o0: int, o1: int) -> jnp.ndarray:
        key = ("blk", o0, o1)
        if key not in self._cache:
            g0, g1 = self.goffs
            self._cache[key] = self.slab[
                g0 + o0:g0 + o0 + self.B0, g1 + o1:g1 + o1 + self.B1, :
            ]
        return self._cache[key]

    def shift_view(self, offsets, shape) -> jnp.ndarray:
        o0, o1, o2 = offsets
        if offsets not in self._cache:
            self._cache[offsets] = _lane_shift(
                self._block(o0, o1), o2, self.bc_pair, self.n2, self.interpret
            )
        return self._cache[offsets]


# -- term specs ---------------------------------------------------------------------


class TermSpec:
    """Static description of one fused term.

    ``kind`` in {"advection", "normal", "curvature", "eikonal"};
    ``coef`` is one of
      ("analytic", fn)  — coordinate callable evaluated in-kernel,
      ("stream", k)     — k arrays streamed via BlockSpec (3 for advection,
                          1 for scalar coefficients / frozen eikonal sign),
      ("const", value)  — compile-time scalar,
      ("none", None)    — eikonal with sign recomputed from phi.
    """

    __slots__ = ("kind", "coef_kind", "coef_static", "n_streams")

    def __init__(self, kind, coef_kind, coef_static=None, n_streams=0):
        self.kind = kind
        self.coef_kind = coef_kind
        self.coef_static = coef_static
        self.n_streams = n_streams

    def __repr__(self):
        return f"TermSpec({self.kind}, {self.coef_kind})"


def _fast_recip(x):
    """Newton-refined ``pl.reciprocal``: ~2^-26 relative error (below f32
    division rounding) at a fraction of a VPU divide's cycle count."""
    r = pl.reciprocal(x, approx=True)
    return r * (2.0 - x * r)


# NOTE a custom_vjp-wrapped fast reciprocal for the backward kernels was
# tried and MISCOMPILES: any jax.custom_vjp primitive evaluated inside the
# jax.vjp of a Pallas TPU kernel body produced order-1 wrong cotangents in
# compiled mode while interpret mode stayed correct — independent of whether
# the wrapped forward was pl.reciprocal or a true division (round-4 bisect).
# The backward path therefore uses plain division (recip=None), ~6% slower.


def _ham_contribution(spec: TermSpec, ext, tile_shape, spacing, coef, center,
                      dx_min, dtype, g=_G, recip=None):
    """One term's Hamiltonian on the lane-extended slab ``ext`` — the same
    stencil helpers as the unfused jnp path, for parity by construction.
    ``g`` is the per-axis (or uniform) ghost offset of the interior in ``ext``."""
    if spec.kind == "advection":
        out = 0.0
        for ax, h in enumerate(spacing):
            out = out + st.weno5_upwind(
                st.weno5_pair_diffs(ext, ax, h, g, tile_shape), coef[ax], recip
            )
        return out
    if spec.kind == "normal":
        gp, gm = st.godunov_norms(ext, spacing, g, tile_shape)
        v = coef[0]
        return jnp.maximum(v, 0.0) * gp + jnp.minimum(v, 0.0) * gm
    if spec.kind == "curvature":
        from ..geometry.queries import curvature_from_padded, grad_norm_from_padded

        kap = curvature_from_padded(ext, spacing, g, tile_shape)
        nrm = grad_norm_from_padded(ext, spacing, g, tile_shape)
        return coef[0] * kap * nrm
    if spec.kind == "eikonal":
        gp, gm = st.godunov_norms(ext, spacing, g, tile_shape)
        if spec.coef_kind == "none":
            # sign recomputed from current phi, gradient-aware smoothing
            # (O-F eq. 7.6; terms.py EikonalReinitializationTerm.rhs)
            sgn = jnp.sign(center)
            norm = jnp.where(sgn > 0, gp, gm)
            denom = jnp.sqrt(center**2 + norm**2 * dx_min * dx_min)
            s = jnp.where(denom == 0, 0.0, center / jnp.where(denom == 0, 1.0, denom))
        else:
            s = coef[0]
            norm = jnp.where(jnp.sign(s) > 0, gp, gm)
        return s * (norm - 1.0)
    raise ValueError(f"unknown term kind {spec.kind!r}")


def _coords_block(i, j, lo, spacing, B0, B1, n2, dtype, offs=None):
    """Sparse per-axis coordinate arrays for the tile at program (i, j).

    ``offs`` (optional traced scalars, index units) shifts the tile into the
    GLOBAL grid — the sharded drivers pass each shard's node offset so
    analytic coefficients see global coordinates."""
    i0 = jax.lax.broadcasted_iota(jnp.int32, (B0, 1, 1), 0)
    i1 = jax.lax.broadcasted_iota(jnp.int32, (1, B1, 1), 1)
    i2 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n2), 2)
    o0 = o1 = o2 = 0.0
    if offs is not None:
        o0, o1, o2 = offs
    x = lo[0] + (o0 + (i * B0 + i0).astype(dtype)) * spacing[0]
    y = lo[1] + (o1 + (j * B1 + i1).astype(dtype)) * spacing[1]
    z = lo[2] + (o2 + i2.astype(dtype)) * spacing[2]
    return x, y, z


def _as_components(u, k):
    if isinstance(u, (tuple, list)):
        return tuple(u)
    return tuple(u[d] for d in range(k)) if k > 1 else (u,)


# -- kernel -------------------------------------------------------------------------


def _make_kernel(B0, B1, shape, spacing, grid_dims, bcs2, term_specs,
                 with_aux, lo, dx_min, dtype, interpret=False):
    n0, n1, n2 = shape
    G0, G1 = grid_dims
    total = G0 * G1
    S0 = B0 + 2 * _G
    S1 = B1 + 2 * _G1
    n_streams = sum(s.n_streams for s in term_specs)

    def kernel(coef_ref, p_hbm, *rest):
        streams = rest[:n_streams]
        rest = rest[n_streams:]
        if with_aux:
            a_hbm = rest[0]
            rest = rest[1:]
        out_hbm, slab, obuf, isem, asem, osem = rest[:6]
        if with_aux:
            aslab = rest[6]

        i = pl.program_id(0)
        j = pl.program_id(1)
        pid = i * G1 + j
        one = jnp.asarray(1, pid.dtype)

        def dma_in(slot, i2, j2):
            return pltpu.make_async_copy(
                p_hbm.at[pl.ds(i2 * B0, S0), pl.ds(j2 * B1, S1), :],
                slab.at[slot], isem.at[slot])

        def dma_aux(slot, i2, j2):
            return pltpu.make_async_copy(
                a_hbm.at[pl.ds(i2 * B0, S0), pl.ds(j2 * B1, S1), :],
                aslab.at[slot], asem.at[slot])

        def dma_out(slot, i2, j2):
            return pltpu.make_async_copy(
                obuf.at[slot],
                out_hbm.at[pl.ds(_G + i2 * B0, B0), pl.ds(_G1 + j2 * B1, B1), :],
                osem.at[slot])

        def pidx(p):
            return p // G1, jax.lax.rem(p, jnp.asarray(G1, p.dtype))

        slot = jax.lax.rem(pid, jnp.asarray(2, pid.dtype))
        nxt = pid + one
        i2, j2 = pidx(nxt)

        # cross-program double-buffered prefetch (as v1)
        @pl.when(pid == 0)
        def _():
            dma_in(0, i, j).start()
            if with_aux:
                dma_aux(0, i, j).start()

        @pl.when(nxt < total)
        def _():
            dma_in(1 - slot, i2, j2).start()
            if with_aux:
                dma_aux(1 - slot, i2, j2).start()

        dma_in(slot, i, j).wait()

        # virtual padded view of the slab: dim-2 ghosts synthesized lane-aligned
        tile_shape = (B0, B1, n2)
        ext = _LaneRollView(slab[slot], bcs2, tile_shape, interpret=interpret)
        gview = 0  # ignored: the view bakes the ghost offsets in
        center = st.shift(ext, (0, 0, 0), gview, tile_shape)

        coords = None
        t = coef_ref[3]
        ham = jnp.zeros(tile_shape, dtype=dtype)
        si = 0
        for spec in term_specs:
            if spec.coef_kind == "analytic":
                if coords is None:
                    offs = (coef_ref[4], coef_ref[5], coef_ref[6])
                    coords = _coords_block(i, j, lo, spacing, B0, B1, n2,
                                           dtype, offs)
                k = 3 if spec.kind == "advection" else 1
                coef = _as_components(spec.coef_static(coords, t), k)
            elif spec.coef_kind == "stream":
                coef = tuple(streams[si + q][:] for q in range(spec.n_streams))
                si += spec.n_streams
            elif spec.coef_kind == "const":
                coef = (dtype(spec.coef_static) if callable(dtype)
                        else jnp.asarray(spec.coef_static, dtype),)
            else:  # "none"
                coef = ()
            ham = ham + _ham_contribution(
                spec, ext, tile_shape, spacing, coef, center, dx_min, dtype,
                g=gview, recip=None if interpret else _fast_recip,
            )

        beta = coef_ref[1]
        gamma = coef_ref[2]
        out = beta * center - gamma * ham
        if with_aux:
            dma_aux(slot, i, j).wait()
            out = coef_ref[0] * aslab[slot, _G:_G + B0, _G1:_G1 + B1, :] + out

        # deferred-wait output: program p reuses obuf slot p%2, so wait the
        # out-DMA issued two programs ago before overwriting the buffer
        @pl.when(pid >= 2)
        def _():
            iw, jw = pidx(pid - 2)
            dma_out(slot, iw, jw).wait()

        obuf[slot] = out
        dma_out(slot, i, j).start()

        @pl.when(pid == total - 1)
        def _():
            dma_out(slot, i, j).wait()

            @pl.when(pid >= 1)
            def _():
                iw, jw = pidx(pid - one)
                dma_out(1 - slot, iw, jw).wait()

    return kernel


def _pick_tiles(shape):
    # (8, 128) measured fastest at 512^3 on v5e (docs/profile_r3_parts.py:
    # 9.85 ms vs 11.6 ms for (16, 128)); prefer it wherever it divides.
    # B0=1 admits the 2D dummy-axis embedding (shape (1, n0, n1)).
    n0, n1, _ = shape
    B0 = next((b for b in (8, 16, 4, 2, 1) if n0 % b == 0), None)
    B1 = next((b for b in (128, 64, 32, 16, 8) if n1 % b == 0), None)
    return B0, B1


def fused_stage(
    padded: jnp.ndarray,
    term_specs_and_streams,
    coeffs,
    t,
    aux_padded: Optional[jnp.ndarray],
    bcs,
    spacing,
    shape,
    lo,
    tiles: Optional[Tuple[int, int]] = None,
    interpret: bool = False,
    origin=None,
) -> jnp.ndarray:
    """One fused RK stage on the persistent padded layout.

    ``out_interior = alpha*aux + beta*phi - gamma*sum_n H_n`` written into a
    fresh padded buffer (ghost shells NOT yet refreshed — compose with
    :func:`refresh_ghosts`). ``term_specs_and_streams`` is a sequence of
    ``(TermSpec, streams_tuple)`` where streams are interior-shaped coefficient
    arrays. ``coeffs=(alpha,beta,gamma)`` and ``t`` may be traced scalars.
    """
    n0, n1, n2 = shape
    dtype = padded.dtype
    if tiles is None:
        tiles = _pick_tiles(shape)
    B0, B1 = tiles
    if B0 is None or B1 is None or n0 % B0 or n1 % B1:
        raise ValueError(f"no v2 tile size divides shape {shape}")
    grid = (n0 // B0, n1 // B1)
    with_aux = aux_padded is not None
    term_specs = tuple(s for s, _ in term_specs_and_streams)
    all_streams = [a for _, arrs in term_specs_and_streams for a in arrs]
    for spec, arrs in term_specs_and_streams:
        assert len(arrs) == spec.n_streams, (spec, len(arrs))

    # SMEM stack: (alpha, beta, gamma, t, origin0, origin1, origin2) — the
    # origin offsets (index units, traced) shift analytic-coefficient
    # coordinates into the GLOBAL grid for sharded shards (zero locally)
    if origin is None:
        origin = (0.0, 0.0, 0.0)
    coef = jnp.stack([jnp.asarray(c, dtype) for c in (*coeffs, t, *origin)])
    S0 = B0 + 2 * _G
    S1 = B1 + 2 * _G1

    kernel = _make_kernel(
        B0, B1, shape, tuple(float(h) for h in spacing), grid, bcs[2],
        term_specs, with_aux, tuple(float(x) for x in lo),
        float(min(spacing)), dtype, interpret=interpret,
    )

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    ublock = lambda: pl.BlockSpec((B0, B1, n2), lambda i, j: (i, j, 0),
                                  memory_space=pltpu.VMEM)
    in_specs = [smem, anyspec] + [ublock() for _ in all_streams]
    args = [coef, padded] + all_streams
    if with_aux:
        in_specs.append(anyspec)
        args.append(aux_padded)

    scratch = [
        pltpu.VMEM((2, S0, S1, n2), dtype),          # phi slabs
        pltpu.VMEM((2, B0, B1, n2), dtype),          # out buffers
        pltpu.SemaphoreType.DMA((2,)),               # in
        pltpu.SemaphoreType.DMA((2,)),               # aux
        pltpu.SemaphoreType.DMA((2,)),               # out
    ]
    if with_aux:
        scratch.append(pltpu.VMEM((2, S0, S1, n2), dtype))

    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct(padded_shape(shape), dtype),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(*args)


# -- differentiable composite stage -------------------------------------------------


def _stage_refresh_jnp(P, streams_flat, coeffs, t, aux, specs, stream_counts,
                       bcs, spacing, shape, lo):
    """Pure-jnp (stage + ghost refresh) on the padded layout: the padded
    output equals the Pallas composite everywhere that is ever read
    (interior + ghost shells; junk is zero here, garbage there)."""
    it = iter(streams_flat)
    sas = tuple(
        (spec, tuple(next(it) for _ in range(k)))
        for spec, k in zip(specs, stream_counts)
    )
    interior = stage_reference(P, sas, coeffs, t, aux, bcs, spacing, shape, lo)
    return pack_padded(interior, bcs)


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_step_stage_p(P, streams_flat, coeffs, t, aux, statics):
    specs, stream_counts, bcs, spacing, shape, lo, tiles, interpret = statics
    it = iter(streams_flat)
    sas = tuple(
        (spec, tuple(next(it) for _ in range(k)))
        for spec, k in zip(specs, stream_counts)
    )
    out = fused_stage(P, sas, coeffs, t, aux, bcs, spacing, shape, lo,
                      tiles=tiles, interpret=interpret)
    return refresh_ghosts_fast(out, bcs, shape, interpret=interpret)


def _fss_fwd(P, streams_flat, coeffs, t, aux, statics):
    return _fused_step_stage_p(P, streams_flat, coeffs, t, aux, statics), (
        P, streams_flat, coeffs, t, aux)


def _fss_bwd(statics, res, g):
    P, streams_flat, coeffs, t, aux = res
    specs, stream_counts, bcs, spacing, shape, lo, _, interpret = statics

    # round-4: fused Pallas backward (tile-local VJP on the padded layout)
    # whenever the shape supports it; exact jnp-composite fallback otherwise.
    # LSM_TPU_JNP_BWD=1 forces the fallback for A/B comparison.
    import os

    from . import weno_v2_bwd as bwd

    if os.environ.get("LSM_TPU_JNP_BWD") != "1":
        return bwd.stage_backward(
            P, streams_flat, coeffs, t, aux, g, specs, stream_counts, bcs,
            spacing, shape, lo, interpret=interpret,
        )
    return bwd._jnp_stage_backward(P, streams_flat, coeffs, t, aux, g, specs,
                                  stream_counts, bcs, spacing, shape, lo)


_fused_step_stage_p.defvjp(_fss_fwd, _fss_bwd)


def fused_step_stage(P, term_specs_and_streams, coeffs, t, aux, bcs, spacing,
                     shape, lo, tiles=None, interpret=False):
    """One fused RK stage + in-place ghost refresh, DIFFERENTIABLE.

    Forward runs the Pallas kernels; backward is the VJP of the identical
    jnp composite recomputed from the saved primals. Gradients flow to the
    padded state, streamed coefficient arrays, the RK coefficients/time, and
    the ``aux`` buffer. Reference has no gradients at all — this is the
    north-star differentiable path on the fast layout.
    """
    specs = tuple(s for s, _ in term_specs_and_streams)
    streams_flat = tuple(a for _, arrs in term_specs_and_streams for a in arrs)
    stream_counts = tuple(len(arrs) for _, arrs in term_specs_and_streams)
    coeffs = tuple(jnp.asarray(c, P.dtype) for c in coeffs)
    statics = (specs, stream_counts, bcs, tuple(spacing), tuple(shape),
               tuple(lo), tiles, interpret)
    return _fused_step_stage_p(P, streams_flat, coeffs,
                               jnp.asarray(t, P.dtype), aux, statics)


# -- jnp reference (oracle) ---------------------------------------------------------


def stage_reference(
    padded, term_specs_and_streams, coeffs, t, aux_padded, bcs, spacing, shape,
    lo, origin=None,
):
    """Pure-jnp stage on the same padded layout; returns the INTERIOR array.

    Uses the identical stencil helpers on the fully lane-padded array, so the
    kernel must match to FMA-contraction tolerance in interpret mode.
    """
    n0, n1, n2 = shape
    dtype = padded.dtype
    trimmed = padded[:, _G1 - _G:_G1 + n1 + _G, :]  # uniform 3-pad on dim 1
    full = _bc.pad_axis(trimmed, bcs[2], 2, _G)
    center = full[_G:_G + n0, _G:_G + n1, _G:_G + n2]
    i0 = jnp.arange(n0, dtype=dtype).reshape(-1, 1, 1)
    i1 = jnp.arange(n1, dtype=dtype).reshape(1, -1, 1)
    i2 = jnp.arange(n2, dtype=dtype).reshape(1, 1, -1)
    if origin is not None:
        i0, i1, i2 = i0 + origin[0], i1 + origin[1], i2 + origin[2]
    coords = (
        lo[0] + i0 * float(spacing[0]),
        lo[1] + i1 * float(spacing[1]),
        lo[2] + i2 * float(spacing[2]),
    )
    dx_min = float(min(spacing))
    out = 0.0
    for spec, arrs in term_specs_and_streams:
        if spec.coef_kind == "analytic":
            k = 3 if spec.kind == "advection" else 1
            coef = _as_components(spec.coef_static(coords, jnp.asarray(t, dtype)), k)
        elif spec.coef_kind == "stream":
            coef = tuple(arrs)
        elif spec.coef_kind == "const":
            coef = (jnp.asarray(spec.coef_static, dtype),)
        else:
            coef = ()
        out = out + _ham_contribution(
            spec, full, shape, tuple(float(h) for h in spacing), coef, center,
            dx_min, dtype,
        )
    alpha, beta, gamma = coeffs
    res = beta * center - gamma * out
    if aux_padded is not None:
        res = alpha * unpack_padded(aux_padded, shape) + res
    return res
