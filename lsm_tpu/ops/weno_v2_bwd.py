"""Fused Pallas BACKWARD pass for the padded-state stage (round-4).

Rounds 1-3 ran the backward of :func:`lsm_tpu.ops.weno_v2.fused_step_stage`
as the VJP of the *jnp composite* recomputed from primals — correct, but it
executes on the slow XLA stencil path (~3x slower than the fused forward per
Hamiltonian evaluation, and a VJP is strictly more work), leaving the
north-star differentiable rollout unmeasured and ~5x off pace (VERDICT r3
missing #1; BASELINE demands forward+backward >= 80%).

This module computes the same cotangents with ONE Pallas kernel pass over
tiles of the padded layout. Structure (all windows static-shape, DMA offsets
8-aligned on the sublane dim):

- **Tile-local VJP with an extended evaluation window.** The VJP of a
  width-3 stencil is a width-3 stencil: the cotangent of ``P`` at ``x`` sums
  ``g[y] * d out[y]/d P[x]`` over outputs ``y`` within stencil reach of
  ``x``. Each program owns one ``(B0, B1)`` interior tile, re-evaluates the
  forward stage on an evaluation window extending ``>= 3`` beyond the tile
  (rows clamped into the interior, columns padded by the buffer layout), and
  calls ``jax.vjp`` of that window function ON THE SLAB; the slab cotangent
  restricted to the owned tile is exact and complete — ring contributions to
  neighbor-owned cells are recomputed by the neighbors, never double-counted.
- **Ghost cotangents, both directions.** Incoming: the cotangent arriving on
  the *output* buffer's ghost shells is folded back into interior edge
  strips (the transpose of ``refresh_ghosts``' linear ghost construction) by
  an in-place Pallas prep kernel (:func:`fold_ghost_cotangent_fast`) — XLA
  ``.at[].add`` would cost a full pass over the 548 MB buffer per strip.
  Outgoing: the stage READS the stored ghosts of the input buffer, so
  ``dP`` carries cotangents at ghost positions; edge tiles extract them from
  the slab cotangent (complete by the same reach argument).
- **Scalar cotangents without double counting.** ``d alpha / d beta /
  d gamma`` are ownership-masked reductions against the saved aux / center /
  recomputed Hamiltonian (the Hamiltonian rides out of the VJP as an
  auxiliary primal output); ``dt`` (only when a coordinate-callable
  coefficient may depend on ``t``) is one ``jax.jvp`` of the window function
  masked to the owned tile. All accumulate across the sequential grid in a
  VMEM scratch.

Oracle: the jnp-composite VJP (``weno_v2._fss_bwd``'s function), which the
interpret-mode parity tests compare against elementwise. Reference has no
gradients at all — the semantics anchor is the adjoint of the reference's
hot loop (``/root/reference/src/timestepping.jl:126-202`` stage algebra).

Subgradient-tie caveat (measured, understood, harmless): with
``Extrapolation(degree >= 2)`` the ghost construction makes the minmod
arguments ``d2 one-sided == d2 centered`` IDENTICALLY at boundary rows, so
the tie-break inside ``minmod`` is decided by last-bit rounding that can
differ between any two compiled graphs. The two routings differ only in how
the cotangent splits between a ghost entry and its interior sources — the
ghost IS that linear combination of sources, so after the downstream fold
(the next stage's prep, or ``pack_padded``'s transpose at the bottom) both
collapse to the SAME interior gradient (verified to 8e-16 end-to-end).
Raw-``dP`` comparisons must therefore use tie-free BCs (Periodic /
Extrapolation(<=1) / Symmetry); composite-gradient comparisons hold for all.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import bc as _bc
from . import stencils as st
from . import weno_v2 as v2
from .weno_v2 import (
    _G,
    _G1,
    _LaneRollView,
    _as_components,
    padded_shape,
)

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

__all__ = [
    "fold_ghost_cotangent",
    "fold_ghost_cotangent_fast",
    "supports_stage_bwd",
    "stage_backward",
]

_VMEM_LIMIT = 100 * 1024 * 1024


# -- ghost-cotangent fold (transpose of pack/refresh ghost construction) ------------


def fold_ghost_cotangent(g: jnp.ndarray, bcs, shape) -> jnp.ndarray:
    """Interior-shaped effective cotangent: ``g``'s interior plus the fold of
    its ghost-shell cotangents through the (linear) ghost construction.

    ``pack_padded`` / ``refresh_ghosts`` build ghosts as a linear map ``R`` of
    the interior; the composite stage's backward therefore needs
    ``g_int + R^T(g_shells)``. Implemented as the VJP of ``pack_padded``
    itself — exact by construction, used as the oracle and the small-grid
    fallback."""
    zero = jnp.zeros(shape, g.dtype)
    _, vjp = jax.vjp(lambda v: v2.pack_padded(v, bcs), zero)
    return vjp(g)[0]


def _fold_recipes(bc, side: str, n: int):
    """Transpose recipes for one (dim, side) ghost construction: a list of
    ``(block, local_index, weight, ghost_index)`` meaning
    ``block[local_index] += weight * ghosts[ghost_index]`` where ``ghosts``
    are ordered as stored (left shells outermost-first, right innermost-first),
    ``block`` is "near" (first 8 interior rows/cols) or "far" (last 8), and
    ``local_index`` indexes into that 8-wide block."""
    out = []
    if isinstance(bc, _bc.Periodic):
        if side == "left":  # ghost b <-> distance 3-b <-> source n-1-(3-b)
            for b in range(_G):
                out.append(("far", (n - 4 + b) - (n - 8), 1.0, b))
        else:  # ghost r <-> distance r+1 <-> source r+1
            for r in range(_G):
                out.append(("near", r + 1, 1.0, r))
        return out
    if isinstance(bc, _bc.Symmetry):
        if side == "left":  # ghost b <-> distance 3-b <-> source 3-b
            for b in range(_G):
                out.append(("near", _G - b, 1.0, b))
        else:  # ghost r <-> source n-2-r
            for r in range(_G):
                out.append(("far", (n - 2 - r) - (n - 8), 1.0, r))
        return out
    if isinstance(bc, _bc.Extrapolation):
        P = bc.degree
        W = _bc._lagrange_extrap_weights(_G, P)
        if side == "left":  # block[g] = sum_j W[g,j] v[j]
            for j in range(P + 1):
                for gi in range(_G):
                    out.append(("near", j, float(W[gi, j]), gi))
        else:  # block[r] = sum_j W[::-1][r,j] v[n-1-j]
            Wr = W[::-1]
            for j in range(P + 1):
                for r in range(_G):
                    out.append(("far", 7 - j, float(Wr[r, j]), r))
        return out
    raise TypeError(f"unsupported boundary condition {bc!r}")


def _supports_fast_fold(shape, bcs, dtype) -> bool:
    n0, n1, n2 = shape
    maxP = max(
        (b.degree for pair in bcs[:2] for b in pair
         if isinstance(b, _bc.Extrapolation)),
        default=0,
    )
    itemsize = jnp.dtype(dtype).itemsize
    vmem = itemsize * n2 * (5 * 8 * (n0 + 2 * _G) + 2 * 3 * n1 + 2 * 8 * n1)
    return (
        _HAS_PALLAS
        and n0 >= 16
        and n1 >= 16
        and n1 % 8 == 0
        and maxP <= 7
        and vmem <= 88 * 1024 * 1024
    )


def fold_ghost_cotangent_fast(g: jnp.ndarray, bcs, shape,
                              interpret: bool = False) -> jnp.ndarray:
    """In-place Pallas fold: returns ``g`` (padded layout, aliased) with the
    ghost-shell cotangents folded into the interior edge strips and the
    dim-1 ghost+junk column shells ZEROED (so the backward kernel's wide
    column windows read exact zeros at invalid outputs). Falls back to
    ``jnp.pad(fold_ghost_cotangent(g), ...)`` when unsupported."""
    n0, n1, n2 = shape
    dtype = g.dtype
    if not _supports_fast_fold(shape, bcs, dtype):
        return jnp.pad(
            fold_ghost_cotangent(g, bcs, shape),
            [(_G, _G), (_G1, _G1), (0, 0)],
        )
    S0 = n0 + 2 * _G

    rec1l = _fold_recipes(bcs[1][0], "left", n1)
    rec1r = _fold_recipes(bcs[1][1], "right", n1)
    rec0l = _fold_recipes(bcs[0][0], "left", n0)
    rec0r = _fold_recipes(bcs[0][1], "right", n0)

    def kernel(g_in, g_ref, bl, br, snear, sfar, zblk, rt, rb, tnear, tfar, sem):
        del g_in

        def copy(src, dst):
            cp = pltpu.make_async_copy(src, dst, sem)
            cp.start()
            cp.wait()

        # ---- dim 1 (ghost cols -> edge interior cols, ALL rows incl ghosts)
        copy(g_ref.at[:, pl.ds(0, 8), :], bl)           # junk+left ghosts
        copy(g_ref.at[:, pl.ds(n1 + 8, 8), :], br)      # right ghosts+junk
        copy(g_ref.at[:, pl.ds(_G1, 8), :], snear)      # first 8 interior cols
        copy(g_ref.at[:, pl.ds(n1, 8), :], sfar)        # last 8 interior cols
        ci = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1)
        accn = snear[:]
        accf = sfar[:]
        # left ghosts live in bl at local cols 5..7; right in br at 0..2
        for blk, loc, w, gi in rec1l:
            c = w * bl[:, 5 + gi:6 + gi, :]
            if blk == "near":
                accn = accn + jnp.where(ci == loc, c, 0.0)
            else:
                accf = accf + jnp.where(ci == loc, c, 0.0)
        for blk, loc, w, gi in rec1r:
            c = w * br[:, gi:gi + 1, :]
            if blk == "near":
                accn = accn + jnp.where(ci == loc, c, 0.0)
            else:
                accf = accf + jnp.where(ci == loc, c, 0.0)
        snear[:] = accn
        sfar[:] = accf
        copy(snear, g_ref.at[:, pl.ds(_G1, 8), :])
        copy(sfar, g_ref.at[:, pl.ds(n1, 8), :])
        zblk[:] = jnp.zeros((S0, 8, n2), dtype)
        copy(zblk, g_ref.at[:, pl.ds(0, 8), :])
        copy(zblk, g_ref.at[:, pl.ds(n1 + 8, 8), :])

        # ---- dim 0 (ghost rows -> edge interior rows, interior cols; reads
        # the POST-dim-1 values so corner cotangents compose exactly)
        copy(g_ref.at[pl.ds(0, _G), pl.ds(_G1, n1), :], rt)
        copy(g_ref.at[pl.ds(_G + n0, _G), pl.ds(_G1, n1), :], rb)
        copy(g_ref.at[pl.ds(_G, 8), pl.ds(_G1, n1), :], tnear)
        copy(g_ref.at[pl.ds(_G + n0 - 8, 8), pl.ds(_G1, n1), :], tfar)
        ri = jax.lax.broadcasted_iota(jnp.int32, (8, 1, 1), 0)
        accn = tnear[:]
        accf = tfar[:]
        for blk, loc, w, gi in rec0l:
            c = w * rt[gi:gi + 1]
            if blk == "near":
                accn = accn + jnp.where(ri == loc, c, 0.0)
            else:
                accf = accf + jnp.where(ri == loc, c, 0.0)
        for blk, loc, w, gi in rec0r:
            c = w * rb[gi:gi + 1]
            if blk == "near":
                accn = accn + jnp.where(ri == loc, c, 0.0)
            else:
                accf = accf + jnp.where(ri == loc, c, 0.0)
        tnear[:] = accn
        tfar[:] = accf
        copy(tnear, g_ref.at[pl.ds(_G, 8), pl.ds(_G1, n1), :])
        copy(tfar, g_ref.at[pl.ds(_G + n0 - 8, 8), pl.ds(_G1, n1), :])

    return pl.pallas_call(
        kernel,
        grid=(1,),
        out_shape=jax.ShapeDtypeStruct(g.shape, dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((S0, 8, n2), dtype),   # bl
            pltpu.VMEM((S0, 8, n2), dtype),   # br
            pltpu.VMEM((S0, 8, n2), dtype),   # snear
            pltpu.VMEM((S0, 8, n2), dtype),   # sfar
            pltpu.VMEM((S0, 8, n2), dtype),   # zero block
            pltpu.VMEM((_G, n1, n2), dtype),  # rt
            pltpu.VMEM((_G, n1, n2), dtype),  # rb
            pltpu.VMEM((8, n1, n2), dtype),   # tnear
            pltpu.VMEM((8, n1, n2), dtype),   # tfar
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(g)


# -- shell zeroing for the aux cotangent --------------------------------------------


def _zero_pad_shells(buf: jnp.ndarray, shape, interpret: bool = False) -> jnp.ndarray:
    """Zero the ghost+junk shells of a padded-layout buffer in place (the aux
    cotangent is interior-only: its oracle is the VJP of ``unpack_padded``)."""
    n0, n1, n2 = shape
    dtype = buf.dtype
    S0, S1 = n0 + 2 * _G, n1 + 2 * _G1
    if not _HAS_PALLAS or n1 % 8:
        z = jnp.zeros(shape, dtype)
        return jnp.pad(
            v2.unpack_padded(buf, shape) + 0.0 * z,
            [(_G, _G), (_G1, _G1), (0, 0)],
        )

    def kernel(b_in, b_ref, zrow, zcol, sem):
        del b_in

        def copy(src, dst):
            cp = pltpu.make_async_copy(src, dst, sem)
            cp.start()
            cp.wait()

        zrow[:] = jnp.zeros((_G, S1, n2), dtype)
        copy(zrow, b_ref.at[pl.ds(0, _G), :, :])
        copy(zrow, b_ref.at[pl.ds(_G + n0, _G), :, :])
        zcol[:] = jnp.zeros((S0, 8, n2), dtype)
        copy(zcol, b_ref.at[:, pl.ds(0, 8), :])
        copy(zcol, b_ref.at[:, pl.ds(n1 + 8, 8), :])

    return pl.pallas_call(
        kernel,
        grid=(1,),
        out_shape=jax.ShapeDtypeStruct(buf.shape, dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((_G, S1, n2), dtype),
            pltpu.VMEM((S0, 8, n2), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(buf)


# -- tile selection / support -------------------------------------------------------


def _pick_bwd_tiles(shape) -> Tuple[Optional[int], Optional[int]]:
    """Backward tiles are SMALLER than forward tiles: the VJP graph holds
    ~3x the live intermediates of the forward, and Mosaic must fit them in
    VMEM (measured: an (8, 64) eval window spills ~127 MB of vector
    registers at 512^3 and fails to compile; (8, 32) fits). The bound below
    caps the eval-window size so ~60 window-sized live values stay inside
    the budget. ``LSM_TPU_BWD_TILES=B0,B1`` overrides for tuning."""
    import os

    n0, n1, n2 = shape
    if os.environ.get("LSM_TPU_BWD_TILES"):
        b0, b1 = (int(x) for x in os.environ["LSM_TPU_BWD_TILES"].split(","))
        if n0 % b0 == 0 and n0 >= b0 + 6 and n1 % b1 == 0 and n1 >= b1 + 16:
            return b0, b1

    def fits(b0, b1):
        return (b0 + 6) * (b1 + 10) * n2 * 4 * 60 <= 85 * 1024 * 1024

    # measured at 512^3: (8,32) 144.7 ms/grad-step beats (16,16) 149.8 and
    # (8,16) 189.0; (16,32) exceeds VMEM — prefer B0=8 with the widest B1
    # that fits
    for b0 in (8, 16):
        if n0 % b0 or n0 < b0 + 6:
            continue
        for b1 in (128, 64, 32, 16, 8):
            if n1 % b1 or n1 < b1 + 16 or not fits(b0, b1):
                continue
            return b0, b1
    return None, None


def supports_stage_bwd(shape, bcs) -> bool:
    """Pallas backward handles 3D lane-aligned grids large enough for the
    extended windows; everything else falls back to the jnp-composite VJP."""
    if not v2.supports_v2(shape, bcs):
        return False
    B0, B1 = _pick_bwd_tiles(shape)
    return B0 is not None and B1 is not None


# -- the backward kernel ------------------------------------------------------------


def _coef_depends_on_t(fn, dtype) -> bool:
    """Exact trace-time test: does the coordinate-callable coefficient's
    output actually depend on ``t``? Most physical velocity fields are
    time-independent, and skipping the ``dt``-tangent pass saves a full
    forward-mode re-evaluation per backward stage. Conservative: any trace
    failure or opaque sub-jaxpr counts as time-dependent."""
    try:
        def probe(t):
            coords = (jnp.zeros((2, 1, 1), dtype), jnp.zeros((1, 2, 1), dtype),
                      jnp.zeros((1, 1, 2), dtype))
            out = fn(coords, t)
            return tuple(out) if isinstance(out, (tuple, list)) else (out,)

        closed = jax.make_jaxpr(probe)(jnp.zeros((), dtype))
        jaxpr = closed.jaxpr
        live = set(jaxpr.invars)
        for eqn in jaxpr.eqns:
            if any(getattr(v, "count", None) is not None and v in live
                   for v in eqn.invars):
                live.update(eqn.outvars)
        return any(getattr(v, "count", None) is not None and v in live
                   for v in jaxpr.outvars)
    except Exception:
        return True


def _roll1(block, shift, width, interpret):
    """Cyclic roll along the sublane dim by a TRACED shift (stream-window
    alignment): ``out[:, q] = block[:, (q + shift) % width]``."""
    if interpret:
        return jnp.roll(block, -shift, axis=1)
    return pltpu.roll(block, (width - shift) % width, axis=1)


def _make_bwd_kernel(B0, B1, shape, spacing, grid_dims, bcs, term_specs,
                     with_aux, needs_dt, lo, dx_min, dtype, interpret):
    n0, n1, n2 = shape
    G0, G1 = grid_dims
    total = G0 * G1
    B0e, B1e = B0 + 6, B1 + 10
    S0b, S1b = B0 + 12, B1 + 16
    n_streams = sum(s.n_streams for s in term_specs)
    espec = [float(h) for h in spacing]

    def kernel(coef_ref, p_hbm, g_hbm, *rest):
        s_hbm = rest[:n_streams]
        rest = rest[n_streams:]
        if with_aux:
            a_hbm = rest[0]
            rest = rest[1:]
        dp_hbm, part_hbm = rest[0], rest[1]
        rest = rest[2:]
        ds_hbm = rest[:n_streams]
        rest = rest[n_streams:]
        if with_aux:
            dax_hbm = rest[0]
            rest = rest[1:]
        (slab, gbuf, dbuf, pacc, sem) = rest[:5]
        rest = rest[5:]
        if n_streams:
            sbuf, dsbuf = rest[0], rest[1]
            rest = rest[2:]
        if with_aux:
            abuf = rest[0]

        i = pl.program_id(0)
        j = pl.program_id(1)
        pid = i * G1 + j

        alpha = coef_ref[0]
        beta = coef_ref[1]
        gamma = coef_ref[2]
        t = coef_ref[3]
        # global-grid origin offsets (index units; zero on a single device) —
        # sharded shards evaluate analytic coefficients at GLOBAL coordinates,
        # exactly as the forward kernel's coef_ref[4:7] (weno_v2._coords_block).
        # NB named og*: ``off0`` already names the slab row offset below — the
        # shadowing silently fed ``ro + 3`` into the coordinates (caught by
        # the analytic parity test as a 51% dP error)
        og0, og1, og2 = coef_ref[4], coef_ref[5], coef_ref[6]

        # clamped dim-0 window: interior rows [s0, s0+B0e) (always in range)
        s0 = jnp.clip(i * B0 - 3, 0, n0 - B0 - 6)
        ro = i * B0 - s0          # tile start within the eval window (rows)
        off0 = ro + 3             # tile start within the slab (rows)

        def copy(src, dst):
            cp = pltpu.make_async_copy(src, dst, sem)
            cp.start()
            cp.wait()

        copy(p_hbm.at[pl.ds(s0, S0b), pl.ds(j * B1, S1b), :], slab)
        copy(g_hbm.at[pl.ds(s0 + _G, B0e), pl.ds(j * B1, S1b), :], gbuf)
        if with_aux:
            copy(a_hbm.at[pl.ds(s0 + _G, B0e), pl.ds(j * B1, S1b), :], abuf)
        if n_streams:
            # offset built as 8 * k so Mosaic can PROVE sublane divisibility
            # (a clip of j*B1 - 8 is 8-divisible but not provably so)
            cs = 8 * jnp.clip((j * B1) // 8 - 1, 0, (n1 - B1 - 16) // 8)
            dlt = (j * B1 - 8) - cs  # in {-8, 0, +8}
            for q in range(n_streams):
                copy(s_hbm[q].at[pl.ds(s0, B0e), pl.ds(cs, S1b), :],
                     sbuf.at[q])

        # sanitize the slab's junk columns (uninitialized in steady state —
        # NaN there would poison zero-cotangent products in the VJP). A
        # linear RAMP, not zeros: an all-constant window has |grad phi| = 0,
        # where sqrt's infinite derivative times the (zero) cotangent of an
        # invalid output is NaN — the ramp keeps every junk-window gradient
        # nonzero while contributing nothing (those outputs' cotangents are
        # exact zeros).
        cib = jax.lax.broadcasted_iota(jnp.int32, (1, S1b, 1), 1) + j * B1
        junk = jnp.logical_or(cib < _G1 - _G, cib >= n1 + _G1 + _G)
        slab_v = jnp.where(junk, cib.astype(dtype), slab[:])

        # eval-window coefficient streams: window col b <-> interior col
        # j*B1 - 5 + b = cs + (3 + dlt) + b
        streams_e = ()
        if n_streams:
            streams_e = tuple(
                _roll1(sbuf[q], 3 + dlt, S1b, interpret)[:, :B1e, :]
                for q in range(n_streams)
            )

        g_e = gbuf[:, 3:3 + B1e, :]
        if with_aux:
            aux_e = abuf[:, 3:3 + B1e, :]

        tshape = (B0e, B1e, n2)

        def coords_for(tt):
            ia = jax.lax.broadcasted_iota(jnp.int32, (B0e, 1, 1), 0)
            ib = jax.lax.broadcasted_iota(jnp.int32, (1, B1e, 1), 1)
            ic = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n2), 2)
            return (
                lo[0] + (og0 + (s0 + ia).astype(dtype)) * espec[0],
                lo[1] + (og1 + (j * B1 - 5 + ib).astype(dtype)) * espec[1],
                lo[2] + (og2 + ic.astype(dtype)) * espec[2],
            )

        # The Hamiltonian is a SUM of per-term (per-axis, for advection)
        # contributions, so the backward splits into one small VJP per part
        # with cotangent ``-gamma * g``. One monolithic VJP of the whole
        # stage spills ~128 MB of vector registers under Mosaic (measured at
        # 512^3); per-part graphs keep the live set bounded.
        #
        # parts: (spec, stream_lo, ham_fn) where ham_fn(view, coef, center)
        # recip=None (true division): a custom_vjp fast-reciprocal inside a
        # kernel-level jax.vjp miscompiles under Mosaic (see weno_v2 note)
        recip = None

        def _adv_axis(ax):
            def fn(view, coef, center):
                return st.weno5_upwind(
                    st.weno5_pair_diffs(view, ax, espec[ax], 0, tshape),
                    coef[ax], recip)
            return fn

        parts = []
        si = 0
        for spec in term_specs:
            lo_s = si
            si += spec.n_streams
            if spec.kind == "advection":
                for ax in range(3):
                    parts.append((spec, lo_s, _adv_axis(ax)))
            else:
                def fn(view, coef, center, _spec=spec):
                    return v2._ham_contribution(
                        _spec, view, tshape, espec, coef, center, dx_min,
                        dtype, g=0, recip=recip)
                parts.append((spec, lo_s, fn))

        def make_part(spec, lo_s, hfn):
            def fp(slab_in, s_in, tt):
                view = _LaneRollView(slab_in, bcs[2], tshape,
                                     interpret=interpret, goffs=(3, 3))
                center = st.shift(view, (0, 0, 0), 0, tshape)
                if spec.coef_kind == "analytic":
                    k = 3 if spec.kind == "advection" else 1
                    coef = _as_components(
                        spec.coef_static(coords_for(tt), tt), k)
                elif spec.coef_kind == "stream":
                    coef = s_in
                elif spec.coef_kind == "const":
                    coef = (jnp.asarray(spec.coef_static, dtype),)
                else:
                    coef = ()
                return hfn(view, coef, center)
            return fp

        neg_g = -gamma * g_e
        center_e = slab_v[3:3 + B0e, 3:3 + B1e, :]
        dslab = jnp.zeros((S0b, S1b, n2), dtype)
        ham_e = jnp.zeros(tshape, dtype)
        dstreams_e = list(jnp.zeros(tshape, dtype) for _ in range(len(streams_e)))
        dt_ham = jnp.zeros(tshape, dtype)
        one_t = jnp.ones((), dtype)
        for spec, lo_s, hfn in parts:
            fp = make_part(spec, lo_s, hfn)
            s_in = streams_e[lo_s:lo_s + spec.n_streams]
            ham_p, vjp_p = jax.vjp(fp, slab_v, s_in, t)
            dsl, dstr, _ = vjp_p(neg_g)
            ham_e = ham_e + ham_p
            dslab = dslab + dsl
            for q in range(spec.n_streams):
                dstreams_e[lo_s + q] = dstreams_e[lo_s + q] + dstr[q]
            if needs_dt and spec.coef_kind == "analytic":
                _, dh_dt = jax.jvp(lambda tt: fp(slab_v, s_in, tt),
                                   (t,), (one_t,))
                dt_ham = dt_ham + dh_dt

        # ownership mask: exactly the owned tile inside the eval window
        ria = jax.lax.broadcasted_iota(jnp.int32, (B0e, 1, 1), 0)
        cia = jax.lax.broadcasted_iota(jnp.int32, (1, B1e, 1), 1)
        own = jnp.logical_and(
            jnp.logical_and(ria >= ro, ria < ro + B0),
            jnp.logical_and(cia >= 5, cia < 5 + B1),
        )
        zero = jnp.zeros((), dtype)
        g_own = jnp.where(own, g_e, zero)
        dbeta = jnp.sum(g_own * jnp.where(own, center_e, zero))
        dgamma = -jnp.sum(g_own * jnp.where(own, ham_e, zero))
        dalpha = (jnp.sum(g_own * jnp.where(own, aux_e, zero))
                  if with_aux else zero)
        if needs_dt:
            dt_part = jnp.sum(g_own * jnp.where(own, -gamma * dt_ham, zero))
        else:
            dt_part = zero

        # accumulate scalar partials across the sequential grid
        li = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        si8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        row = jnp.where(jnp.logical_and(si8 == 0, li == 0), dalpha, 0.0)
        row = row + jnp.where(jnp.logical_and(si8 == 0, li == 1), dbeta, 0.0)
        row = row + jnp.where(jnp.logical_and(si8 == 0, li == 2), dgamma, 0.0)
        row = row + jnp.where(jnp.logical_and(si8 == 0, li == 3), dt_part, 0.0)
        row = row.astype(dtype)

        @pl.when(pid == 0)
        def _():
            pacc[:] = row

        @pl.when(pid > 0)
        def _():
            pacc[:] = pacc[:] + row

        @pl.when(pid == total - 1)
        def _():
            copy(pacc, part_hbm)

        # dP: the owned interior tile, plus ghost shells for edge tiles.
        # The linear beta*center piece lands here as a ref-slice add (a
        # value-level .at[].add lowers to scatter-add, unimplemented in
        # Mosaic).
        dbuf[:] = dslab
        dbuf[3:3 + B0e, 3:3 + B1e, :] = (
            dbuf[3:3 + B0e, 3:3 + B1e, :] + beta * g_e)
        copy(dbuf.at[pl.ds(off0, B0), pl.ds(8, B1), :],
             dp_hbm.at[pl.ds(_G + i * B0, B0), pl.ds(_G1 + j * B1, B1), :])

        @pl.when(i == 0)
        def _():  # bottom ghost rows (slab rows 0..2 since s0 == 0)
            copy(dbuf.at[pl.ds(0, _G), pl.ds(8, B1), :],
                 dp_hbm.at[pl.ds(0, _G), pl.ds(_G1 + j * B1, B1), :])

        @pl.when(i == G0 - 1)
        def _():  # top ghost rows (slab rows B0+9..B0+11 since s0 == n0-B0-6)
            copy(dbuf.at[pl.ds(B0 + 9, _G), pl.ds(8, B1), :],
                 dp_hbm.at[pl.ds(_G + n0, _G), pl.ds(_G1 + j * B1, B1), :])

        @pl.when(j == 0)
        def _():  # left ghost cols + junk (slab cols 0..7; junk cots are 0)
            copy(dbuf.at[pl.ds(off0, B0), pl.ds(0, 8), :],
                 dp_hbm.at[pl.ds(_G + i * B0, B0), pl.ds(0, 8), :])

            @pl.when(i == 0)
            def _():
                copy(dbuf.at[pl.ds(0, _G), pl.ds(0, 8), :],
                     dp_hbm.at[pl.ds(0, _G), pl.ds(0, 8), :])

            @pl.when(i == G0 - 1)
            def _():
                copy(dbuf.at[pl.ds(B0 + 9, _G), pl.ds(0, 8), :],
                     dp_hbm.at[pl.ds(_G + n0, _G), pl.ds(0, 8), :])

        @pl.when(j == G1 - 1)
        def _():  # right ghost cols + junk
            copy(dbuf.at[pl.ds(off0, B0), pl.ds(B1 + 8, 8), :],
                 dp_hbm.at[pl.ds(_G + i * B0, B0), pl.ds(n1 + 8, 8), :])

            @pl.when(i == 0)
            def _():
                copy(dbuf.at[pl.ds(0, _G), pl.ds(B1 + 8, 8), :],
                     dp_hbm.at[pl.ds(0, _G), pl.ds(n1 + 8, 8), :])

            @pl.when(i == G0 - 1)
            def _():
                copy(dbuf.at[pl.ds(B0 + 9, _G), pl.ds(B1 + 8, 8), :],
                     dp_hbm.at[pl.ds(_G + n0, _G), pl.ds(n1 + 8, 8), :])

        # dstreams: owned tile slice of the eval-window cotangents. The
        # cotangent is staged at col offset 3 so the owned tile (window col
        # 5) sits at scratch col 8 — DMA sublane offsets must be provably
        # 8-divisible.
        for q in range(n_streams):
            dsbuf[q, :, 3:3 + B1e, :] = dstreams_e[q]
        for q in range(n_streams):
            copy(dsbuf.at[q, pl.ds(ro, B0), pl.ds(8, B1), :],
                 ds_hbm[q].at[pl.ds(i * B0, B0), pl.ds(j * B1, B1), :])

        # daux = alpha * g (pointwise, owned tile); shells zeroed afterwards
        if with_aux:
            abuf[:] = alpha * gbuf[:]
            copy(abuf.at[pl.ds(ro, B0), pl.ds(8, B1), :],
                 dax_hbm.at[pl.ds(_G + i * B0, B0), pl.ds(_G1 + j * B1, B1), :])

    return kernel


def stage_backward(P, streams_flat, coeffs, t, aux, g, specs, stream_counts,
                   bcs, spacing, shape, lo, interpret=False,
                   tiles: Optional[Tuple[int, int]] = None,
                   origin=None, prefolded: bool = False):
    """Cotangents of the (fused stage + ghost refresh) composite.

    Returns ``(dP, dstreams, dcoeffs, dt, daux)`` matching the jnp-composite
    VJP (``_stage_refresh_jnp``). Pallas path on supported shapes; exact jnp
    fallback otherwise.

    ``origin`` (traced index-unit offsets, default zero) shifts analytic
    coefficients to GLOBAL coordinates for sharded shards, mirroring the
    forward kernel's origin support. ``prefolded=True`` means the caller
    already applied the transpose of ITS OWN ghost refresh to ``g`` (the
    sharded composite folds through ppermute instead of the local BC), so the
    local fold is skipped and the kernel computes the stage-only transpose
    ``dP = S^T(g)`` — including cotangents at the input buffer's ghost
    positions, which the caller's previous-stage fold routes onward."""
    n0, n1, n2 = shape
    dtype = P.dtype
    if tiles is None:
        tiles = _pick_bwd_tiles(shape)
    B0, B1 = tiles
    if (
        B0 is None or B1 is None or not _HAS_PALLAS
        or not v2.supports_v2(shape, bcs)
    ):
        if prefolded:
            return _jnp_stage_only_backward(
                P, streams_flat, coeffs, t, aux, g, specs, stream_counts,
                bcs, spacing, shape, lo, origin)
        return _jnp_stage_backward(P, streams_flat, coeffs, t, aux, g, specs,
                                   stream_counts, bcs, spacing, shape, lo)

    term_specs = tuple(specs)
    n_streams = sum(stream_counts)
    assert len(streams_flat) == n_streams
    with_aux = aux is not None
    needs_dt = any(
        s.coef_kind == "analytic" and _coef_depends_on_t(s.coef_static, dtype)
        for s in term_specs
    )

    if prefolded:
        gp = g
    else:
        gp = fold_ghost_cotangent_fast(g, bcs, shape, interpret=interpret)

    if origin is None:
        origin = (0.0, 0.0, 0.0)
    G0, G1 = n0 // B0, n1 // B1
    coef = jnp.stack([jnp.asarray(c, dtype) for c in (*coeffs, t, *origin)])
    kernel = _make_bwd_kernel(
        B0, B1, shape, tuple(float(h) for h in spacing), (G0, G1), bcs,
        term_specs, with_aux, needs_dt, tuple(float(x) for x in lo),
        float(min(spacing)), dtype, interpret,
    )

    B0e, B1e = B0 + 6, B1 + 10
    S0b, S1b = B0 + 12, B1 + 16
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    args = [coef, P, gp, *streams_flat]
    in_specs = [smem] + [anyspec] * (2 + n_streams)
    if with_aux:
        args.append(aux)
        in_specs.append(anyspec)

    out_shape = [
        jax.ShapeDtypeStruct(padded_shape(shape), dtype),       # dP
        jax.ShapeDtypeStruct((8, 128), dtype),                  # scalar partials
    ]
    out_specs = [anyspec, anyspec]
    for _ in range(n_streams):
        out_shape.append(jax.ShapeDtypeStruct(shape, dtype))
        out_specs.append(anyspec)
    if with_aux:
        out_shape.append(jax.ShapeDtypeStruct(padded_shape(shape), dtype))
        out_specs.append(anyspec)

    scratch = [
        pltpu.VMEM((S0b, S1b, n2), dtype),   # P slab
        pltpu.VMEM((B0e, S1b, n2), dtype),   # g window
        pltpu.VMEM((S0b, S1b, n2), dtype),   # dslab staging
        pltpu.VMEM((8, 128), dtype),         # scalar accumulator
        pltpu.SemaphoreType.DMA,
    ]
    if n_streams:
        scratch.append(pltpu.VMEM((n_streams, B0e, S1b, n2), dtype))
        scratch.append(pltpu.VMEM((n_streams, B0e, S1b, n2), dtype))
    if with_aux:
        scratch.append(pltpu.VMEM((B0e, S1b, n2), dtype))

    outs = pl.pallas_call(
        kernel,
        grid=(G0, G1),
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(*args)

    dP = outs[0]
    partials = outs[1]
    dstreams = tuple(outs[2:2 + n_streams])
    daux = None
    if with_aux:
        daux = _zero_pad_shells(outs[2 + n_streams], shape, interpret=interpret)
    dalpha, dbeta, dgamma, dt_ = (partials[0, 0], partials[0, 1],
                                  partials[0, 2], partials[0, 3])
    dcoeffs = (dalpha, dbeta, dgamma)
    return dP, dstreams, dcoeffs, dt_, daux


def _jnp_stage_only_backward(P, streams_flat, coeffs, t, aux, g, specs,
                             stream_counts, bcs, spacing, shape, lo, origin):
    """Exact jnp VJP of the STAGE ALONE (no ghost refresh) on the padded
    layout, for pre-folded cotangents (the sharded composite's fallback on
    shapes the Pallas backward does not support). ``g``'s ghost/junk shells
    must be zero — the stage writes interior only, so a nonzero shell
    cotangent has no pre-image here."""
    if origin is None:
        origin = (0.0, 0.0, 0.0)

    def f(p, s, c, tt, a):
        it = iter(s)
        sas = tuple(
            (spec, tuple(next(it) for _ in range(k)))
            for spec, k in zip(specs, stream_counts)
        )
        interior = v2.stage_reference(p, sas, c, tt, a, bcs, spacing, shape,
                                      lo, origin=origin)
        return jnp.pad(interior, [(_G, _G), (_G1, _G1), (0, 0)])

    if aux is None:
        _, vjp = jax.vjp(lambda p, s, c, tt: f(p, s, c, tt, None),
                         P, streams_flat, coeffs, t)
        dP, ds, dc, dt_ = vjp(g)
        da = None
    else:
        _, vjp = jax.vjp(f, P, streams_flat, coeffs, t, aux)
        dP, ds, dc, dt_, da = vjp(g)
    return dP, ds, dc, dt_, da


def _jnp_stage_backward(P, streams_flat, coeffs, t, aux, g, specs,
                        stream_counts, bcs, spacing, shape, lo):
    """Exact jnp-composite VJP (the round-3 backward, kept as oracle and
    fallback for unsupported shapes)."""
    if aux is None:
        def f(p, s, c, tt):
            return v2._stage_refresh_jnp(p, s, c, tt, None, specs,
                                         stream_counts, bcs, spacing, shape, lo)

        _, vjp = jax.vjp(f, P, streams_flat, coeffs, t)
        dP, ds, dc, dt_ = vjp(g)
        da = None
    else:
        def f(p, s, c, tt, a):
            return v2._stage_refresh_jnp(p, s, c, tt, a, specs, stream_counts,
                                         bcs, spacing, shape, lo)

        _, vjp = jax.vjp(f, P, streams_flat, coeffs, t, aux)
        dP, ds, dc, dt_, da = vjp(g)
    return dP, ds, dc, dt_, da
