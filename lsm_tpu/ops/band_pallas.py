"""Active-tile narrow-band stage kernel: step cost proportional to the band.

The dense narrow band (:mod:`lsm_tpu.core.narrowband`) reproduces the
reference's band *semantics* but computes every stage on the full grid. This
module makes the stage cost proportional to the interface: the compute mask is
reduced to per-tile activity bits, the active tile coordinates are gathered
into a capacity-bounded dispatch list (``jnp.nonzero(size=...)``), and ONE
Pallas kernel runs only those tiles — fetching each tile's halo slab from a
persistently padded buffer, evaluating the fused multi-term stage
(:func:`lsm_tpu.ops.weno_v2._ham_contribution`, the same stencil helpers as
the jnp path), and scattering the result back. Reference semantics:
``update_band!``-maintained active set with per-active-node updates
(``/root/reference/src/meshfield.jl:553-588``, ``timestepping.jl:128-137``).

Layout (all DMA offsets provably aligned for Mosaic):

- padded buffer ``Q``: ``(n0 + 16, n1 + 16, n2 + 256)`` — dim-0 pad ``G0=8``
  (5 junk rows + 3 ghosts, interior at row 8), sublane pad ``G1=8`` (interior
  offset 8, ghosts at 5..7), lane pad ``L=128`` (interior offset 128, ghosts
  at 125..127). Off-band cells of ``Q`` are FROZEN (the interface only moves
  inside the band), so a stage writes active tiles into the *previous* padded
  buffer (ping-pong): every untouched cell there already holds the correct
  frozen value — no full-grid copy, no full-grid pad.
- tile ``(i,j,k)`` stage fetch: offsets ``(5 + i*B0, j*B1, k*B2)``
  (lane/sublane aligned), sizes ``(B0+6, B1+16, B2+256)``; interior sits at
  slab offsets ``(3, 8, 128)`` and the halo (reach 3) is inside the fetch by
  construction. The symmetric pads also admit aligned halo-8 fetches at
  offsets ``(i*B0, j*B1, k*B2)`` for mask-maintenance kernels.
- tile write-back: ``(B0, B1, B2)`` at ``(8+i*B0, 8+j*B1, 128+k*B2)`` —
  sublane/lane offsets are multiples of 8/128 because ``B1 % 8 == 0`` and
  ``B2 % 128 == 0``. The compute mask is stored in the same padded layout
  and phi's dtype (Mosaic rejects bool DMAs) so mask tiles ride identical
  addressing.

The dispatch list is scalar-prefetched (``PrefetchScalarGridSpec``) so each
program can compute its DMA offsets; sentinel entries (``-1`` past the active
count) skip all DMAs and writes. Streamed per-tile inputs (velocity fields,
the compute-mask tile used to freeze non-band cells, the RK ``aux`` tile) ride
the same dynamic-offset DMAs.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import bc as _bc
from . import stencils as st
from .weno_v2 import TermSpec, _ham_contribution, _fast_recip

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

__all__ = [
    "band_padded_shape",
    "pack_band_padded",
    "unpack_band_padded",
    "refresh_band_ghosts",
    "refresh_band_ghosts_fast",
    "tile_activity",
    "active_tile_ids",
    "band_stage",
    "band_stage_reference",
]

_G = st.PAD_WENO5  # 3 — ghost width (stencil reach)
_G0 = 8  # dim-0 stored pad: 5 junk rows + 3 ghosts, interior at row 8 so the
# retube kernel's halo-8 slab fetches (offset i*B0) stay in bounds
_G1 = 8
_L = 128
_VMEM_LIMIT = 100 * 1024 * 1024


def _lane_pad_extra(n2: int) -> int:
    """Extra right-side junk lanes breaking a power-of-two row pitch.

    The padded row pitch is ``(n2 + 2L) * 4`` bytes; when it is a multiple
    of 4096 B every 512 B run of a lane-strided DMA (the shell-refresh and
    re-tube access pattern) lands on the same HBM bank set and per-run
    throughput collapses ~16x — measured at 768^3 (pitch 4096 B: the lane
    shells cost 33 ms) vs 640^3/512^3 (pitch 3584/3072 B: ~2-3 ms scaled).
    All band-layout consumers index from the LEFT, so junk lanes on the
    right are invisible to them."""
    extra = 0
    while (n2 + 2 * _L + extra) % 1024 == 0:
        extra += 128
    return extra


def band_padded_shape(shape) -> Tuple[int, int, int]:
    n0, n1, n2 = shape
    return (n0 + 2 * _G0, n1 + 2 * _G1, n2 + 2 * _L + _lane_pad_extra(n2))


def pack_band_padded(values: jnp.ndarray, bcs) -> jnp.ndarray:
    """Interior values -> band-padded layout (ghosts on all three dims at
    offsets (8, 8, 128); junk elsewhere zeroed)."""
    p = _bc.pad_ghost(values, bcs, _G)  # uniform 3-pad, all dims
    x = _lane_pad_extra(values.shape[2])
    return jnp.pad(
        p, [(_G0 - _G, _G0 - _G), (_G1 - _G, _G1 - _G), (_L - _G, _L - _G + x)]
    )


def pack_band_mask(mask: jnp.ndarray, dtype) -> jnp.ndarray:
    """Node mask -> padded layout (zeros in the pad; phi's dtype for DMA)."""
    return jnp.pad(
        mask.astype(dtype),
        [(_G0, _G0), (_G1, _G1), (_L, _L + _lane_pad_extra(mask.shape[2]))]
    )


def unpack_band_padded(padded: jnp.ndarray, shape) -> jnp.ndarray:
    n0, n1, n2 = shape
    return padded[_G0:_G0 + n0, _G1:_G1 + n1, _L:_L + n2]


def refresh_band_ghosts(padded: jnp.ndarray, bcs, shape) -> jnp.ndarray:
    """Recompute the ghost shells (dims 0 -> 1 -> 2, the pad_ghost composition
    order) from the current interior. O(N^2) work."""
    n0, n1, n2 = shape
    interior = unpack_band_padded(padded, shape)
    # dim 0 from interior (ghost rows at [_G0-_G, _G0) and [_G0+n0, _G0+n0+_G))
    l0 = _bc._ghost_block(interior, bcs[0][0], 0, _G, "left")
    r0 = _bc._ghost_block(interior, bcs[0][1], 0, _G, "right")
    padded = padded.at[_G0 - _G:_G0, _G1:_G1 + n1, _L:_L + n2].set(l0)
    padded = padded.at[_G0 + n0:_G0 + n0 + _G, _G1:_G1 + n1, _L:_L + n2].set(r0)
    # dim 1 from rows incl. fresh dim-0 ghosts
    col = padded[:, _G1:_G1 + n1, _L:_L + n2]
    l1 = _bc._ghost_block(col, bcs[1][0], 1, _G, "left")
    r1 = _bc._ghost_block(col, bcs[1][1], 1, _G, "right")
    padded = padded.at[:, _G1 - _G:_G1, _L:_L + n2].set(l1)
    padded = padded.at[:, _G1 + n1:_G1 + n1 + _G, _L:_L + n2].set(r1)
    # dim 2 from the slab incl. fresh dim-0/1 ghosts
    slab = padded[:, _G1 - _G:_G1 + n1 + _G, _L:_L + n2]
    l2 = _bc._ghost_block(slab, bcs[2][0], 2, _G, "left")
    r2 = _bc._ghost_block(slab, bcs[2][1], 2, _G, "right")
    padded = padded.at[:, _G1 - _G:_G1 + n1 + _G, _L - _G:_L].set(l2)
    padded = padded.at[:, _G1 - _G:_G1 + n1 + _G, _L + n2:_L + n2 + _G].set(r2)
    return padded


# -- in-place Pallas ghost refresh (band layout) ------------------------------------
#
# Same motivation as :func:`lsm_tpu.ops.weno_v2.refresh_ghosts_fast`: each XLA
# ``.at[].set`` shell update costs a full pass over the ~840 MB band buffer at
# 512^3 (measured ~1.9 ms per shell for the v2 buffer, docs/profile_r3_parts).
# This kernel updates only the shells (~0.6 GB of DMA at 512^3, dominated by
# the aligned 128-lane edge blocks of the dim-2 phase) with the buffer
# aliased in place.


def _ghost_combo(locs, bc, side, n, P_weights=None):
    """(index, weight) ghost recipes against an edge block, outermost-first for
    the left side / innermost-first for the right (``_ghost_block`` order).
    ``locs(j)`` maps a source column (0-indexed from that side's boundary) to
    the local index in the edge block."""
    if isinstance(bc, _bc.Periodic):
        # left ghost -k -> col n-1-k (far side); right ghost +k -> col k
        if side == "left":
            return [[(locs("far", n - 1 - k), 1.0)] for k in (3, 2, 1)]
        return [[(locs("near", k), 1.0)] for k in (1, 2, 3)]
    if isinstance(bc, _bc.Symmetry):
        if side == "left":  # ghost -k -> col k
            return [[(locs("near", k), 1.0)] for k in (3, 2, 1)]
        return [[(locs("far", n - 1 - k), 1.0)] for k in (1, 2, 3)]
    P = bc.degree
    W = _bc._lagrange_extrap_weights(_G, P)
    out = []
    rows = range(_G) if side == "left" else range(_G - 1, -1, -1)
    for g in rows:
        if side == "left":
            out.append([(locs("near", j), float(W[g, j])) for j in range(P + 1)])
        else:
            out.append(
                [(locs("far", n - 1 - j), float(W[g, j])) for j in range(P + 1)])
    return out


def refresh_band_ghosts_fast(padded: jnp.ndarray, bcs, shape,
                             interpret: bool = False,
                             flags: Optional[jnp.ndarray] = None,
                             phases: Tuple[str, ...] = ("01", "2")) -> jnp.ndarray:
    """In-place Pallas equivalent of :func:`refresh_band_ghosts` (same
    dim 0 -> 1 -> 2 composition). Falls back to the XLA version when the
    layout constraints do not hold.

    ``flags`` (int32 ``(2,)``, traced): ``flags[0]`` gates the dim-0/1
    shells, ``flags[1]`` the lane shells — zero skips that phase's DMAs
    inside the kernel (``pl.when``; the buffer passes through aliased, no
    copies). A shell's content only changes when an ACTIVE tile touches the
    corresponding grid face, so a band evolution whose interface stays
    interior skips the whole O(N^2) refresh — which matters doubly at 768^3,
    where the lane-shell kernel's (C0, S1, 128) strided copies (512 B runs
    over a 1.9 GB buffer) measure ~33 ms against ~2 ms at 512^3 (round-5
    probe: HBM efficiency collapses on the scattered-chunk pattern as the
    buffer outgrows 512^3)."""
    n0, n1, n2 = shape
    dtype = padded.dtype
    maxP = max(
        (b.degree for pair in bcs for b in pair
         if isinstance(b, _bc.Extrapolation)),
        default=0,
    )
    S0 = n0 + 2 * _G0
    S1 = n1 + 2 * _G1
    C0 = 32  # dim-0 chunk rows for the dim-2 (lane) phase
    R1 = min(256, S0)  # row-chunk for the dim-1 phase: unchunked, the three
    # (S0, 8, n2) edge buffers alone are 58 MB at 768^3 — the vmem bound
    # tripped and this function SILENTLY fell back to the XLA shell refresh
    # (~58 ms of full-buffer passes, the real cost behind round-5's slow
    # 768^3 band step). Chunked, each phase stays well under the budget.
    itemsize = jnp.dtype(dtype).itemsize
    vmem_est = itemsize * max(
        max(_G, maxP + 1) * n1 * n2 + _G * n1 * n2      # dim-0 src + write
        + 3 * R1 * 8 * n2,                              # dim-1 A/B/write
        3 * C0 * S1 * _L,                               # dim-2 A/B/write
    )
    if (
        not _HAS_PALLAS
        or n1 % 8
        or n2 % _L
        or maxP > 7
        or maxP + 1 > min(n0, n1, n2, 128)
        or S0 < C0
        or vmem_est > 88 * 1024 * 1024
    ):
        return refresh_band_ghosts(padded, bcs, shape)
    K0 = max(_G, maxP + 1)
    nchunks = -(-S0 // C0)
    if flags is None:
        flags = jnp.ones((2,), jnp.int32)
    flags = jnp.asarray(flags, jnp.int32)

    def kernel01(o_in, f_ref, o_ref, src0, w0, eA, eB, e1w, sem):
        del o_in

        @pl.when(f_ref[0] != 0)
        def _body():
            def copy(src, dst):
                cp = pltpu.make_async_copy(src, dst, sem)
                cp.start()
                cp.wait()

            # -- dim 0 --------------------------------------------------------
            for side, bc in (("left", bcs[0][0]), ("right", bcs[0][1])):
                if isinstance(bc, _bc.Periodic):
                    r0, K = (_G0 + n0 - 4 if side == "left" else _G0 + 1), _G
                elif isinstance(bc, _bc.Symmetry):
                    r0, K = (_G0 + 1 if side == "left" else _G0 + n0 - 4), _G
                else:
                    P = bc.degree
                    r0, K = (_G0 if side == "left" else _G0 + n0 - 1 - P), P + 1
                copy(o_ref.at[pl.ds(r0, K), pl.ds(_G1, n1), pl.ds(_L, n2)],
                     src0.at[pl.ds(0, K)])
                # per-row static-index writes: negative-stride reversal and
                # jnp.stack along the major dim miscompile under Mosaic (see
                # weno_v2._dim0_shell)
                if isinstance(bc, _bc.Periodic):
                    w0[:] = src0[pl.ds(0, K)]
                elif isinstance(bc, _bc.Symmetry):
                    for g in range(_G):
                        w0[g] = src0[K - 1 - g]
                else:
                    P = bc.degree
                    W = _bc._lagrange_extrap_weights(_G, P)
                    if side == "right":
                        W = W[::-1, ::-1]
                    for g in range(_G):
                        acc = float(W[g, 0]) * src0[0]
                        for j in range(1, P + 1):
                            acc = acc + float(W[g, j]) * src0[j]
                        w0[g] = acc
                dst = _G0 - _G if side == "left" else _G0 + n0
                copy(w0, o_ref.at[pl.ds(dst, _G), pl.ds(_G1, n1), pl.ds(_L, n2)])

            # -- dim 1 (from columns incl. fresh dim-0 ghosts), row-chunked
            # (static chunk starts; the overlapping last chunk is idempotent
            # — writes target cols [0,8)/[G1+n1,+8), reads cols [G1,G1+8)/
            # [n1,n1+8), disjoint) ------------------------------------------
            def locs1(which, col):
                # near cols 0..7 live in eA at local col; far cols n1-8..n1-1
                # in eB at local col - (n1 - 8)
                return (eA, col) if which == "near" else (eB, col - (n1 - 8))

            for c in range(-(-S0 // R1)):
                r0c = min(c * R1, S0 - R1)
                copy(o_ref.at[pl.ds(r0c, R1), pl.ds(_G1, 8), pl.ds(_L, n2)],
                     eA)
                copy(o_ref.at[pl.ds(r0c, R1), pl.ds(n1, 8), pl.ds(_L, n2)],
                     eB)
                for side, bc, off in (("left", bcs[1][0], 0),
                                      ("right", bcs[1][1], _G1 + n1)):
                    combos = _ghost_combo(lambda w, cc: locs1(w, cc), bc,
                                          side, n1)
                    cols = []
                    for recipe in combos:
                        (buf, c0), w = recipe[0]
                        acc = w * buf[:, c0, :]
                        for (buf, cc), w in recipe[1:]:
                            acc = acc + w * buf[:, cc, :]
                        cols.append(acc[:, None, :])
                    zero = jnp.zeros((R1, 1, n2), dtype)
                    if side == "left":
                        e1w[:] = jnp.concatenate([zero] * 5 + cols, axis=1)
                    else:
                        e1w[:] = jnp.concatenate(cols + [zero] * 5, axis=1)
                    copy(e1w, o_ref.at[pl.ds(r0c, R1), pl.ds(off, 8),
                                       pl.ds(_L, n2)])

    # -- dim 2 (lane shells): gridded — ONE CHUNK PER PROGRAM. A single
    # unrolled program (17 chunks x ~4 DMAs at 512^3) blows Mosaic's compile
    # time superlinearly past 10 minutes; with the chunk as the grid axis the
    # program body is constant-size and compiles in seconds.
    def kernel2(o_in, f_ref, o_ref, zA, zB, zw, sem):
        del o_in
        pid = pl.program_id(0)
        r0 = jnp.minimum(pid * C0, jnp.asarray(S0 - C0, pid.dtype))

        @pl.when(f_ref[1] != 0)
        def _body():
            def copy(src, dst):
                cp = pltpu.make_async_copy(src, dst, sem)
                cp.start()
                cp.wait()

            def locs2(which, col):
                return (zA, col) if which == "near" else (zB, col - (n2 - _L))

            copy(o_ref.at[pl.ds(r0, C0), :, pl.ds(_L, _L)], zA)
            copy(o_ref.at[pl.ds(r0, C0), :, pl.ds(n2, _L)], zB)
            lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, _L), 2)
            for side, bc, off in (("left", bcs[2][0], 0),
                                  ("right", bcs[2][1], _L + n2)):
                combos = _ghost_combo(lambda w, c: locs2(w, c), bc, side, n2)
                # iota-select, NOT lane concatenation (Mosaic relayouts)
                acc0 = jnp.zeros((C0, S1, _L), dtype)
                for g, recipe in enumerate(combos):
                    (buf, c0), w = recipe[0]
                    lane = w * buf[:, :, c0:c0 + 1]
                    for (buf, c), w in recipe[1:]:
                        lane = lane + w * buf[:, :, c:c + 1]
                    pos = (_L - _G + g) if side == "left" else g
                    acc0 = jnp.where(lane_iota == pos, lane, acc0)
                zw[:] = acc0
                copy(zw, o_ref.at[pl.ds(r0, C0), :, pl.ds(off, _L)])

    smem_flags = pl.BlockSpec(memory_space=pltpu.SMEM)
    out01 = padded if "01" not in phases else pl.pallas_call(
        kernel01,
        grid=(1,),
        out_shape=jax.ShapeDtypeStruct(padded.shape, dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), smem_flags],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((K0, n1, n2), dtype),       # dim-0 source rows
            pltpu.VMEM((_G, n1, n2), dtype),       # dim-0 ghost block
            pltpu.VMEM((R1, 8, n2), dtype),        # dim-1 edge A (first cols)
            pltpu.VMEM((R1, 8, n2), dtype),        # dim-1 edge B (last cols)
            pltpu.VMEM((R1, 8, n2), dtype),        # dim-1 write block
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(padded, flags)
    if "2" not in phases:
        return out01
    return pl.pallas_call(
        kernel2,
        grid=(nchunks,),
        out_shape=jax.ShapeDtypeStruct(padded.shape, dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), smem_flags],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((C0, S1, _L), dtype),       # dim-2 edge A
            pltpu.VMEM((C0, S1, _L), dtype),       # dim-2 edge B
            pltpu.VMEM((C0, S1, _L), dtype),       # dim-2 write block
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(out01, flags)


# -- active-tile dispatch -----------------------------------------------------------


def tile_activity(compute_mask: jnp.ndarray, tiles) -> jnp.ndarray:
    """(G0, G1, G2) bool: does this tile contain any compute-band cell?"""
    B0, B1, B2 = tiles
    n0, n1, n2 = compute_mask.shape
    m = compute_mask.reshape(n0 // B0, B0, n1 // B1, B1, n2 // B2, B2)
    return jnp.any(m, axis=(1, 3, 5))


def active_tile_ids(compute_mask: jnp.ndarray, tiles, capacity: int):
    """Capacity-bounded flat ids of active tiles (sentinel -1 past the count).

    Returns ``(ids[capacity] int32, count int32)``. ``count > capacity`` means
    the dispatch list overflowed (caller must re-build with a larger capacity —
    results would silently miss tiles otherwise).
    """
    act = tile_activity(compute_mask, tiles).ravel()
    count = jnp.sum(act, dtype=jnp.int32)
    (ids,) = jnp.nonzero(act, size=capacity, fill_value=-1)
    return ids.astype(jnp.int32), count


# -- kernel -------------------------------------------------------------------------


def _make_band_kernel(B0, B1, B2, grid_dims, shape, spacing, term_specs,
                      with_aux, lo, dx_min, dtype, capacity, n_streams,
                      interpret):
    G0, G1, G2 = grid_dims
    S0, S1, S2 = B0 + 2 * _G, B1 + 2 * _G1, B2 + 2 * _L
    recip = None if interpret else _fast_recip

    def kernel(ids_ref, coef_ref, q_hbm, cmask_hbm, *rest):
        streams = rest[:n_streams]
        rest = rest[n_streams:]
        if with_aux:
            a_hbm = rest[0]
            rest = rest[1:]
        # rest[0] is out_init (aliased to the output; present as an input ref
        # but never read in-kernel), rest[1] the output
        out_hbm = rest[1]
        (slab, mbuf, obuf, abuf, isem, msem, asem, osem) = rest[2:10]
        if n_streams:
            sbuf, ssem = rest[10], rest[11]

        p = pl.program_id(0)
        tid = ids_ref[p]
        live = tid >= 0

        def decode(t):
            k = jax.lax.rem(t, jnp.asarray(G2, t.dtype))
            j = jax.lax.rem(t // jnp.asarray(G2, t.dtype), jnp.asarray(G1, t.dtype))
            i = t // jnp.asarray(G1 * G2, t.dtype)
            return i, j, k

        i, j, k = decode(tid)

        def dma_in(slot, i2, j2, k2):
            return pltpu.make_async_copy(
                q_hbm.at[pl.ds(i2 * B0 + _G0 - _G, S0), pl.ds(j2 * B1, S1),
                         pl.ds(k2 * B2, S2)],
                slab.at[slot], isem.at[slot])

        def dma_mask(slot, i2, j2, k2):
            return pltpu.make_async_copy(
                cmask_hbm.at[pl.ds(_G0 + i2 * B0, B0), pl.ds(_G1 + j2 * B1, B1),
                             pl.ds(_L + k2 * B2, B2)],
                mbuf.at[slot], msem.at[slot])

        def dma_aux(slot, i2, j2, k2):
            return pltpu.make_async_copy(
                a_hbm.at[pl.ds(_G0 + i2 * B0, B0), pl.ds(_G1 + j2 * B1, B1),
                         pl.ds(_L + k2 * B2, B2)],
                abuf.at[slot], asem.at[slot])

        def dma_stream(slot, q, i2, j2, k2):
            return pltpu.make_async_copy(
                streams[q].at[pl.ds(i2 * B0, B0), pl.ds(j2 * B1, B1),
                              pl.ds(k2 * B2, B2)],
                sbuf.at[slot, q], ssem.at[slot, q])

        def dma_out(slot, i2, j2, k2):
            return pltpu.make_async_copy(
                obuf.at[slot],
                out_hbm.at[pl.ds(_G0 + i2 * B0, B0), pl.ds(_G1 + j2 * B1, B1),
                           pl.ds(_L + k2 * B2, B2)],
                osem.at[slot])

        slot = jax.lax.rem(p, jnp.asarray(2, p.dtype))

        def start_in(slot2, t):
            i2, j2, k2 = decode(t)
            dma_in(slot2, i2, j2, k2).start()
            dma_mask(slot2, i2, j2, k2).start()
            if with_aux:
                dma_aux(slot2, i2, j2, k2).start()
            for q in range(n_streams):
                dma_stream(slot2, q, i2, j2, k2).start()

        # cross-program double-buffered prefetch over the DISPATCH LIST
        @pl.when(jnp.logical_and(p == 0, live))
        def _():
            start_in(0, tid)

        @pl.when(p + 1 < capacity)
        def _():
            nxt = ids_ref[p + 1]

            @pl.when(nxt >= 0)
            def _():
                start_in(1 - slot, nxt)

        # the next live id (or -1): sentinels trail the list, so this also
        # tells us whether WE are the last live program (and must drain)
        nxt_id = jnp.where(
            p + 1 < capacity,
            ids_ref[jnp.minimum(p + 1, jnp.asarray(capacity - 1, p.dtype))],
            jnp.asarray(-1, ids_ref.dtype),
        )

        @pl.when(live)
        def _():
            dma_in(slot, i, j, k).wait()
            dma_mask(slot, i, j, k).wait()

            ext = slab[slot]
            tile_shape = (B0, B1, B2)
            gview = (_G, _G1, _L)
            center = st.shift(ext, (0, 0, 0), gview, tile_shape)

            coords = None
            t = coef_ref[3]
            ham = jnp.zeros(tile_shape, dtype=dtype)
            si = 0
            for spec in term_specs:
                if spec.coef_kind == "analytic":
                    if coords is None:
                        i0 = jax.lax.broadcasted_iota(jnp.int32, (B0, 1, 1), 0)
                        i1 = jax.lax.broadcasted_iota(jnp.int32, (1, B1, 1), 1)
                        i2c = jax.lax.broadcasted_iota(jnp.int32, (1, 1, B2), 2)
                        coords = (
                            lo[0] + (i * B0 + i0).astype(dtype) * spacing[0],
                            lo[1] + (j * B1 + i1).astype(dtype) * spacing[1],
                            lo[2] + (k * B2 + i2c).astype(dtype) * spacing[2],
                        )
                    ncomp = 3 if spec.kind == "advection" else 1
                    cval = spec.coef_static(coords, t)
                    coef = tuple(cval) if isinstance(cval, (tuple, list)) else (cval,)
                    if ncomp == 1 and len(coef) != 1:
                        coef = (cval,)
                elif spec.coef_kind == "stream":
                    for q in range(spec.n_streams):
                        dma_stream(slot, si + q, i, j, k).wait()
                    coef = tuple(sbuf[slot, si + q] for q in range(spec.n_streams))
                    si += spec.n_streams
                elif spec.coef_kind == "const":
                    coef = (jnp.asarray(spec.coef_static, dtype),)
                else:
                    coef = ()
                ham = ham + _ham_contribution(
                    spec, ext, tile_shape, spacing, coef, center, dx_min,
                    dtype, g=gview, recip=recip,
                )

            beta = coef_ref[1]
            gamma = coef_ref[2]
            out = beta * center - gamma * ham
            if with_aux:
                dma_aux(slot, i, j, k).wait()
                out = coef_ref[0] * abuf[slot] + out
            # freeze non-compute-band cells inside active tiles: they must
            # keep the previous value (band semantics, meshfield.jl:481-511 /
            # narrowband.with_values). The mask tiles stream in phi's dtype
            # (Mosaic rejects bool-dtype DMAs) — nonzero means "in band".
            out = jnp.where(mbuf[slot] != 0, out, center)

            # deferred-wait output pipelining (see weno_v2): program p reuses
            # obuf slot p%2 -> wait the DMA issued two LIVE programs ago.
            # Sentinel programs never write, so waiting 2 programs back (live
            # or not) over-synchronizes harmlessly.
            @pl.when(p >= 2)
            def _():
                pm2 = ids_ref[p - 2]

                @pl.when(pm2 >= 0)
                def _():
                    im, jm, km = decode(pm2)
                    dma_out(slot, im, jm, km).wait()

            obuf[slot] = out
            dma_out(slot, i, j, k).start()

            # last LIVE program drains both in-flight output DMAs (trailing
            # sentinel programs skip everything, so nobody else would)
            @pl.when(nxt_id < 0)
            def _():
                dma_out(slot, i, j, k).wait()

                @pl.when(p >= 1)
                def _():
                    prv = ids_ref[p - 1]

                    @pl.when(prv >= 0)
                    def _():
                        im, jm, km = decode(prv)
                        dma_out(1 - slot, im, jm, km).wait()

    return kernel


def band_stage(
    padded: jnp.ndarray,
    out_init: jnp.ndarray,
    ids: jnp.ndarray,
    compute_mask: jnp.ndarray,
    term_specs_and_streams,
    coeffs,
    t,
    aux_padded: Optional[jnp.ndarray],
    bcs,
    spacing,
    shape,
    lo,
    tiles: Tuple[int, int, int],
    interpret: bool = False,
) -> jnp.ndarray:
    """One fused RK stage on the active tiles only.

    ``out_init`` is the ping-pong target buffer (donated/aliased): inactive
    regions keep its values — correct because off-band cells are frozen.
    Ghost shells are NOT refreshed here (compose with
    :func:`refresh_band_ghosts`). ``ids`` from :func:`active_tile_ids`.
    """
    n0, n1, n2 = shape
    B0, B1, B2 = tiles
    if n0 % B0 or n1 % B1 or n2 % B2 or B1 % 8 or B2 % 128:
        raise ValueError(f"band tiles {tiles} do not divide/align {shape}")
    dtype = padded.dtype
    if compute_mask.shape == tuple(shape):
        # interior-layout mask (tests/direct callers): densify + pad. Hot
        # callers (FusedBandStepper) keep the mask in the padded layout and
        # phi's dtype across steps (Mosaic rejects bool-dtype DMAs), so this
        # never runs per stage there.
        compute_mask = pack_band_mask(compute_mask != 0, dtype)
    grid_dims = (n0 // B0, n1 // B1, n2 // B2)
    capacity = int(ids.shape[0])
    with_aux = aux_padded is not None
    term_specs = tuple(s for s, _ in term_specs_and_streams)
    all_streams = [a for _, arrs in term_specs_and_streams for a in arrs]
    n_streams = len(all_streams)

    coef = jnp.stack([jnp.asarray(c, dtype) for c in (*coeffs, t)])
    S0, S1, S2 = B0 + 2 * _G, B1 + 2 * _G1, B2 + 2 * _L

    kernel = _make_band_kernel(
        B0, B1, B2, grid_dims, shape, tuple(float(h) for h in spacing),
        term_specs, with_aux, tuple(float(x) for x in lo),
        float(min(spacing)), dtype, capacity, n_streams, interpret,
    )

    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [smem, anyspec, anyspec]
    args = [coef, padded, compute_mask]
    for s in all_streams:
        in_specs.append(anyspec)
        args.append(s)
    if with_aux:
        in_specs.append(anyspec)
        args.append(aux_padded)
    in_specs.append(anyspec)  # out_init (aliased to the output)
    args.append(out_init)

    scratch = [
        pltpu.VMEM((2, S0, S1, S2), dtype),            # phi slabs
        pltpu.VMEM((2, B0, B1, B2), dtype),            # compute-mask tiles
        pltpu.VMEM((2, B0, B1, B2), dtype),            # out tiles
        pltpu.VMEM((2, B0, B1, B2), dtype),            # aux tiles
        pltpu.SemaphoreType.DMA((2,)),                 # in
        pltpu.SemaphoreType.DMA((2,)),                 # mask
        pltpu.SemaphoreType.DMA((2,)),                 # aux
        pltpu.SemaphoreType.DMA((2,)),                 # out
    ]
    if n_streams:
        scratch.append(pltpu.VMEM((2, n_streams, B0, B1, B2), dtype))
        scratch.append(pltpu.SemaphoreType.DMA((2, n_streams)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(capacity,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(band_padded_shape(shape), dtype),
        # alias indices count the scalar-prefetch arg (ids at 0), so out_init
        # sits at len(args): [ids, coef, padded, cmask, streams..., aux?, out_init]
        input_output_aliases={len(args): 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(ids, *args)


# -- differentiable composite stage -------------------------------------------------


def _band_stage_refresh_jnp(padded, out_init, ids, cmask, streams_flat,
                            coeffs, t, aux, specs, stream_counts, bcs,
                            spacing, shape, lo, tiles):
    it = iter(streams_flat)
    sas = tuple(
        (spec, tuple(next(it) for _ in range(k)))
        for spec, k in zip(specs, stream_counts)
    )
    out = band_stage_reference(padded, out_init, ids, cmask, sas, coeffs, t,
                               aux, bcs, spacing, shape, lo, tiles)
    return refresh_band_ghosts(out, bcs, shape)


from functools import partial as _partial


def refresh_flags_from_activity(act: jnp.ndarray) -> jnp.ndarray:
    """int32 ``(2,)`` gates for :func:`refresh_band_ghosts_fast` from the
    per-tile activity grid: a ghost shell's content changes only when an
    ACTIVE tile touches that face (ghost sources are the near-face rows,
    depth <= the boundary tile layer for every supported BC — periodic
    sources sit at the OPPOSITE face, also covered since both face layers
    are tested). ``flags[1]`` (lane shells) conservatively includes
    ``flags[0]``: lane ghosts of dim-0/1 ghost ROWS read the fresh dim-0/1
    shells."""
    a = act != 0
    f0 = jnp.any(a[0]) | jnp.any(a[-1])
    f1 = jnp.any(a[:, 0]) | jnp.any(a[:, -1])
    f01 = f0 | f1
    f2 = jnp.any(a[:, :, 0]) | jnp.any(a[:, :, -1]) | f01
    return jnp.stack([f01, f2]).astype(jnp.int32)


@_partial(jax.custom_vjp, nondiff_argnums=(9,))
def _band_step_stage_p(padded, out_init, ids, cmask, flags, streams_flat,
                       coeffs, t, aux, statics):
    specs, stream_counts, bcs, spacing, shape, lo, tiles, interpret = statics
    it = iter(streams_flat)
    sas = tuple(
        (spec, tuple(next(it) for _ in range(k)))
        for spec, k in zip(specs, stream_counts)
    )
    out = band_stage(padded, out_init, ids, cmask, sas, coeffs, t, aux, bcs,
                     spacing, shape, lo, tiles, interpret=interpret)
    return refresh_band_ghosts_fast(out, bcs, shape, interpret=interpret,
                                    flags=flags)


def _bss_fwd(padded, out_init, ids, cmask, flags, streams_flat, coeffs, t,
             aux, statics):
    out = _band_step_stage_p(padded, out_init, ids, cmask, flags,
                             streams_flat, coeffs, t, aux, statics)
    return out, (padded, out_init, ids, cmask, streams_flat, coeffs, t, aux)


def _bss_bwd(statics, res, g):
    import numpy as np

    padded, out_init, ids, cmask, streams_flat, coeffs, t, aux = res
    specs, stream_counts, bcs, spacing, shape, lo, tiles, _ = statics

    # NOTE the oracle recomputes the FULL refresh: when a phase was skipped
    # in the forward its shells were already consistent, so the full-refresh
    # composite produces the identical output — same function, same VJP.
    if aux is None:
        def f(p, oi, s, c, tt):
            return _band_stage_refresh_jnp(
                p, oi, ids, cmask, s, c, tt, None, specs, stream_counts,
                bcs, spacing, shape, lo, tiles)

        _, vjp = jax.vjp(f, padded, out_init, streams_flat, coeffs, t)
        dp, doi, ds, dc, dt_ = vjp(g)
        da = None
    else:
        def f(p, oi, s, c, tt, a):
            return _band_stage_refresh_jnp(
                p, oi, ids, cmask, s, c, tt, a, specs, stream_counts,
                bcs, spacing, shape, lo, tiles)

        _, vjp = jax.vjp(f, padded, out_init, streams_flat, coeffs, t, aux)
        dp, doi, ds, dc, dt_, da = vjp(g)
    d_ids = np.zeros(ids.shape, dtype=jax.dtypes.float0)
    d_flags = np.zeros((2,), dtype=jax.dtypes.float0)
    d_cmask = jnp.zeros_like(cmask)
    return dp, doi, d_ids, d_cmask, d_flags, ds, dc, dt_, da


_band_step_stage_p.defvjp(_bss_fwd, _bss_bwd)


def band_step_stage(padded, out_init, ids, cmask, term_specs_and_streams,
                    coeffs, t, aux, bcs, spacing, shape, lo, tiles,
                    interpret=False, flags=None):
    """Active-tile RK stage + in-place ghost refresh, DIFFERENTIABLE.

    Forward runs the Pallas kernels; backward is the VJP of the jnp band
    composite recomputed from primals. The dispatch list and compute mask are
    constants of the differentiation (zero cotangent) — matching the dense
    band path, whose ``where``-masking likewise has zero mask gradients.

    ``flags`` (from :func:`refresh_flags_from_activity`) lets the refresh
    skip faces no active tile touches; ``None`` refreshes everything.
    """
    specs = tuple(s for s, _ in term_specs_and_streams)
    streams_flat = tuple(a for _, arrs in term_specs_and_streams for a in arrs)
    stream_counts = tuple(len(arrs) for _, arrs in term_specs_and_streams)
    coeffs = tuple(jnp.asarray(c, padded.dtype) for c in coeffs)
    if flags is None:
        flags = jnp.ones((2,), jnp.int32)
    statics = (specs, stream_counts, bcs, tuple(spacing), tuple(shape),
               tuple(lo), tuple(tiles), interpret)
    return _band_step_stage_p(padded, out_init, ids, cmask,
                              jnp.asarray(flags, jnp.int32), streams_flat,
                              coeffs, jnp.asarray(t, padded.dtype), aux,
                              statics)


# -- jnp reference (oracle) ---------------------------------------------------------


def band_stage_reference(
    padded, out_init, ids, compute_mask, term_specs_and_streams, coeffs, t,
    aux_padded, bcs, spacing, shape, lo, tiles,
):
    """Pure-jnp oracle: dense fused stage masked to (compute band AND active
    tiles); everything else keeps ``out_init``'s interior. Returns the padded
    result with refreshed ghosts NOT applied (as :func:`band_stage`)."""
    from .weno_v2 import stage_reference, pack_padded

    n0, n1, n2 = shape
    interior_prev = unpack_band_padded(padded, shape)
    # dense stage on the v2 layout (same helpers)
    P2 = pack_padded(interior_prev, bcs)
    A2 = (
        pack_padded(unpack_band_padded(aux_padded, shape), bcs)
        if aux_padded is not None else None
    )
    dense = stage_reference(
        P2, term_specs_and_streams, coeffs, t, A2, bcs, spacing, shape, lo
    )
    B0, B1, B2 = tiles
    if compute_mask.shape != tuple(shape):  # padded-layout mask
        compute_mask = unpack_band_padded(compute_mask, shape)
    cm = compute_mask != 0 if compute_mask.dtype != jnp.bool_ else compute_mask
    act = tile_activity(cm, tiles)
    act_cells = jnp.repeat(jnp.repeat(jnp.repeat(
        act, B0, axis=0), B1, axis=1), B2, axis=2)
    write = act_cells & cm
    keep_prev = act_cells & ~cm
    out_interior = unpack_band_padded(out_init, shape)
    new_interior = jnp.where(
        write, dense, jnp.where(keep_prev, interior_prev, out_interior)
    )
    return out_init.at[_G0:_G0 + n0, _G1:_G1 + n1, _L:_L + n2].set(new_interior)


# -- incremental re-tube (round 4) --------------------------------------------------
#
# The full-grid re-tube (cut detect + stamp + two box dilations + dispatch
# rebuild) is O(grid) XLA work — ~22 ms/step at 512^3, more than the dense
# fused step itself, so the band lost on a single chip (VERDICT r3 missing
# #3; docs/perf-notes.md band table). The reference's Dict re-tube is
# interface-proportional by construction (``meshfield.jl:553-588``). These
# kernels recover that: between re-tubes the interface moves <= cfl cells
# and the band machinery reaches ``1 + nlayers + COMPUTE_HALO`` cells beyond
# a cut cell, so ONLY tiles within one tile of the currently-active set can
# change (tile dims >= that reach, checked by the driver). Two passes over
# the CANDIDATE tile list (active ⊕ 1 tile, computed on the tiny tile grid):
#
#   pass A: recompute the ACTIVE mask per candidate tile from the phi slab
#           (cut cells among active cells -> corner stamp -> box nlayers),
#           written in place into the padded mask buffer;
#   pass B: recompute the COMPUTE mask (mask ⊕ COMPUTE_HALO) per candidate
#           tile from the FRESH mask buffer, plus a per-tile activity flag
#           feeding the dispatch-list rebuild.
#
# Both use the symmetric halo-8 aligned slab fetches the padded layout was
# designed for. Non-candidate tiles keep their (still-correct) masks.


def _tile_view(slab, halo, ext, tiles, d0=0, d1=0, d2=0):
    """Static slice of a halo-``halo`` slab: the tile ⊕ ``ext`` region
    shifted by (d0, d1, d2). Lane halo is 128 in the band layout."""
    B0, B1, B2 = tiles
    return jax.lax.slice(
        slab,
        (halo - ext + d0, halo - ext + d1, _L - ext + d2),
        (halo - ext + d0 + B0 + 2 * ext, halo - ext + d1 + B1 + 2 * ext,
         _L - ext + d2 + B2 + 2 * ext),
    )


def _shift_local(a, base_ext, out_ext, tiles, d):
    """Slice of a LOCAL tile ⊕ ``base_ext`` array: the tile ⊕ ``out_ext``
    region shifted by ``d`` (static)."""
    starts = tuple(base_ext - out_ext + d[i] for i in range(3))
    sizes = tuple(tiles[i] + 2 * out_ext for i in range(3))
    return jax.lax.slice(a, starts,
                         tuple(st + sz for st, sz in zip(starts, sizes)))


def _mixed_slice(a, ext, axis, out_ext, tiles, d):
    """Slice of a LOCAL array with per-axis extents ``ext``: reduce ``axis``
    to ``out_ext`` shifted by ``d``; other axes unchanged."""
    starts = [0, 0, 0]
    sizes = [tiles[i] + 2 * ext[i] for i in range(3)]
    starts[axis] = (ext[axis] - out_ext) + d
    sizes[axis] = tiles[axis] + 2 * out_ext
    return jax.lax.slice(
        a, tuple(starts), tuple(st + sz for st, sz in zip(starts, sizes)))


def _box_or_local(cur, ext_in, ext_out, tiles):
    """Separable box-OR dilation of radius ``ext_in - ext_out`` on a LOCAL
    tile ⊕ ``ext_in`` boolean array, by shifted static slices (no pads or
    embeds — lane-dim concatenation and dynamic_update_slice are Mosaic
    hazards). Doubling scheme: once ``t`` covers radius c, OR-ing shifts
    ±s (s <= c+1) extends it to c+s — O(log r) steps instead of 2r+1.
    Returns tile ⊕ ``ext_out``."""
    r = ext_in - ext_out
    ext = [ext_in, ext_in, ext_in]
    for axis in range(3):
        covered = 0
        while covered < r:
            srt = min(covered + 1, r - covered)
            out_e = ext[axis] - srt
            a = _mixed_slice(cur, ext, axis, out_e, tiles, -srt)
            b = _mixed_slice(cur, ext, axis, out_e, tiles, 0)
            c = _mixed_slice(cur, ext, axis, out_e, tiles, srt)
            cur = a | b | c
            ext[axis] = out_e
            covered += srt
        if ext[axis] != ext_out:
            # covered == r exactly, so ext must already be ext_out
            raise AssertionError("box_or_local extent bookkeeping")
    return cur


def _box_or_shrink(slab_bool, ext_in, ext_out, tiles):
    """As :func:`_box_or_local` but starting from a full band-layout slab
    (halo ``_G0``/``_G1``/``_L``) whose tile ⊕ ``ext_in`` region is valid."""
    B0, B1, B2 = tiles
    cur = jax.lax.slice(
        slab_bool,
        (_G0 - ext_in, _G1 - ext_in, _L - ext_in),
        (_G0 + B0 + ext_in, _G1 + B1 + ext_in, _L + B2 + ext_in),
    )
    return _box_or_local(cur, ext_in, ext_out, tiles)


def _retube_kernels(B0, B1, B2, grid_dims, nlayers, chalo, dtype, capacity):
    G0, G1, G2 = grid_dims
    S0, S1, S2 = B0 + 2 * _G0, B1 + 2 * _G1, B2 + 2 * _L
    na = nlayers

    def decode(t):
        k = jax.lax.rem(t, jnp.asarray(G2, t.dtype))
        j = jax.lax.rem(t // jnp.asarray(G2, t.dtype), jnp.asarray(G1, t.dtype))
        i = t // jnp.asarray(G1 * G2, t.dtype)
        return i, j, k

    def kernel_mask(ids_ref, q_hbm, band_in, band_ref, stash, a_ref,
                    pslab, mslab, obuf, abuf, tbuf, isem, msem, osem, asem,
                    tsem):
        # COMBINED mask encoding (round 5): one buffer, 0 = outside the
        # band, 1 = compute-band only, 2 = active band (active ⊆ compute, so
        # combined = cmask + mask as 0/1 sums). Consumers: the stage tests
        # ``!= 0`` (compute band — unchanged), the cut detection here tests
        # ``> 1.5`` (active band). One buffer instead of two halves the
        # band state's mask memory (the margin that fits 768^3 in HBM).
        #
        # TWO PHASES, one kernel, NO full-buffer copy: the old design passed
        # the buffer twice (read-old + aliased init) and XLA's defensive
        # copy of the 2.8 GB buffer cost ~30 ms at 768^3. Now phase A
        # (programs 0..C-1) reads old-mask slabs from the ALIASED buffer and
        # writes each candidate's fresh tile to an HBM STASH; phase B
        # (programs C..2C-1) copies the stash back into the buffer. Programs
        # run sequentially, so every phase-A read completes before any
        # phase-B write — read-old/write-new ordering with ~1 GB of stash
        # traffic instead of a 5.7 GB copy.
        # SINGLE PASS per candidate: because cmask = dilate(mask, CH) =
        # dilate(stamp, nlayers + CH), the compute mask and the activity
        # flag come out of the same slab when nlayers + CH + 2 <= 8 (the
        # halo). Cross-program double-buffered prefetch in both phases.
        del band_in
        p = pl.program_id(0)
        inA = p < capacity
        slot = jax.lax.rem(p, jnp.asarray(2, p.dtype))
        capm1 = jnp.asarray(capacity - 1, p.dtype)
        tid = ids_ref[jnp.minimum(p, capm1)]
        live = jnp.logical_and(inA, tid >= 0)

        def dma_p(slot2, t):
            i2, j2, k2 = decode(t)
            return pltpu.make_async_copy(
                q_hbm.at[pl.ds(i2 * B0, S0), pl.ds(j2 * B1, S1),
                         pl.ds(k2 * B2, S2)], pslab.at[slot2], isem.at[slot2])

        def dma_m(slot2, t):
            i2, j2, k2 = decode(t)
            return pltpu.make_async_copy(
                band_ref.at[pl.ds(i2 * B0, S0), pl.ds(j2 * B1, S1),
                            pl.ds(k2 * B2, S2)], mslab.at[slot2],
                msem.at[slot2])

        def dma_out(slot2, pp):
            # phase A: fresh tile -> stash row pp (static-indexed by program)
            return pltpu.make_async_copy(
                obuf.at[slot2], stash.at[pp], osem.at[slot2])

        @pl.when(jnp.logical_and(p == 0, live))
        def _():
            dma_p(0, tid).start()
            dma_m(0, tid).start()

        @pl.when(jnp.logical_and(inA, p + 1 < capacity))
        def _():
            nxt = ids_ref[jnp.minimum(p + 1, capm1)]

            @pl.when(nxt >= 0)
            def _():
                dma_p(1 - slot, nxt).start()
                dma_m(1 - slot, nxt).start()

        nxt_id = jnp.where(
            p + 1 < capacity,
            ids_ref[jnp.minimum(p + 1, capm1)],
            jnp.asarray(-1, ids_ref.dtype),
        )

        @pl.when(live)
        def _():
            dma_p(slot, tid).wait()
            dma_m(slot, tid).wait()
            tiles = (B0, B1, B2)
            # restrict to the needed extent FIRST (the full slab carries a
            # 128-lane halo per side; the math needs na+chalo+2 <= 8): ~2x
            # less VPU bool work per tile
            e_cells = na + chalo + 1
            e_node = na + chalo + 2
            pw = jax.lax.slice(
                pslab[slot], (_G0 - e_node, _G1 - e_node, _L - e_node),
                (_G0 + B0 + e_node, _G1 + B1 + e_node, _L + B2 + e_node))
            mw = jax.lax.slice(
                mslab[slot], (_G0 - e_node, _G1 - e_node, _L - e_node),
                (_G0 + B0 + e_node, _G1 + B1 + e_node, _L + B2 + e_node))

            def corner_reduce(x, op, base_ext):
                # separable 2-corner reduce per axis: 6 slices, not 24
                ext = [base_ext] * 3
                for ax in range(3):
                    a = _mixed_slice(x, ext, ax, e_cells, tiles, 0)
                    b = _mixed_slice(x, ext, ax, e_cells, tiles, 1)
                    x = op(a, b)
                    ext[ax] = e_cells
                return x

            anyneg = corner_reduce(pw <= 0.0, jnp.logical_or, e_node)
            anypos = corner_reduce(pw >= 0.0, jnp.logical_or, e_node)
            # ACTIVE band in the combined encoding is the value 2
            allact = corner_reduce(mw > 1.5, jnp.logical_and, e_node)
            cut = anyneg & anypos & allact  # cells (LOCAL), tile ⊕ (na+CH+1)
            # corner stamp, separable: node n is a corner of cells n-1, n
            e_stamp = na + chalo
            ext = [e_cells] * 3
            st_ = cut
            for ax in range(3):
                a = _mixed_slice(st_, ext, ax, e_stamp, tiles, 0)
                b = _mixed_slice(st_, ext, ax, e_stamp, tiles, -1)
                st_ = a | b
                ext[ax] = e_stamp
            # mask = stamp ⊕ nlayers; cmask = stamp ⊕ (nlayers + CH)
            mask_tile = _box_or_local(
                _shift_local(st_, e_stamp, na, tiles, (0, 0, 0)), na, 0, tiles)
            cmask_tile = _box_or_local(st_, e_stamp, 0, tiles)

            @pl.when(p >= 2)
            def _():
                pm2 = ids_ref[p - 2]

                @pl.when(pm2 >= 0)
                def _():
                    dma_out(slot, p - 2).wait()

            # combined = cmask + mask (mask ⊆ cmask, so values are 0/1/2)
            obuf[slot] = cmask_tile.astype(dtype) + mask_tile.astype(dtype)
            dma_out(slot, p).start()
            flag = jnp.max(obuf[slot])
            li = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            si = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            abuf[:] = jnp.where(jnp.logical_and(si == 0, li == 0), flag, 0.0)
            cpa = pltpu.make_async_copy(abuf, a_ref.at[p], asem)
            cpa.start()
            cpa.wait()

            @pl.when(nxt_id < 0)
            def _():
                dma_out(slot, p).wait()

                @pl.when(p >= 1)
                def _():
                    prv = ids_ref[p - 1]

                    @pl.when(prv >= 0)
                    def _():
                        dma_out(1 - slot, p - 1).wait()

        # ---- phase B: stash -> buffer (candidates form a live PREFIX of
        # the id list, so liveness guards mirror phase A's) ------------------
        pB = p - jnp.asarray(capacity, p.dtype)
        pBc = jnp.clip(pB, 0, capm1)
        tidB = ids_ref[pBc]
        liveB = jnp.logical_and(p >= capacity, tidB >= 0)

        def dma_stash_in(slot2, pp):
            return pltpu.make_async_copy(stash.at[pp], tbuf.at[slot2],
                                         tsem.at[slot2])

        def dma_tile_out(slot2, t):
            i2, j2, k2 = decode(t)
            return pltpu.make_async_copy(
                tbuf.at[slot2],
                band_ref.at[pl.ds(_G0 + i2 * B0, B0),
                            pl.ds(_G1 + j2 * B1, B1),
                            pl.ds(_L + k2 * B2, B2)], osem.at[slot2])

        @pl.when(jnp.logical_and(pB == 0, liveB))
        def _():
            dma_stash_in(slot, pBc).start()

        nxtB_id = jnp.where(
            pB + 1 < capacity,
            ids_ref[jnp.minimum(jnp.maximum(pB + 1, 0), capm1)],
            jnp.asarray(-1, ids_ref.dtype),
        )

        # prefetch the NEXT stash row into 1-slot, after waiting the 1-back
        # tile-out that last read tbuf[1-slot] (each tile-out is waited
        # EXACTLY once: by the successor's prefetch, or by the final drain)
        @pl.when(jnp.logical_and(p >= capacity, nxtB_id >= 0))
        def _():
            @pl.when(pB >= 1)
            def _():
                prv = ids_ref[jnp.maximum(pBc - 1, 0)]

                @pl.when(prv >= 0)
                def _():
                    dma_tile_out(1 - slot, prv).wait()

            dma_stash_in(1 - slot, pB + 1).start()

        @pl.when(liveB)
        def _():
            dma_stash_in(slot, pBc).wait()
            dma_tile_out(slot, tidB).start()

            @pl.when(nxtB_id < 0)
            def _():
                dma_tile_out(slot, tidB).wait()

                @pl.when(pB >= 1)
                def _():
                    prv = ids_ref[jnp.maximum(pBc - 1, 0)]

                    @pl.when(prv >= 0)
                    def _():
                        dma_tile_out(1 - slot, prv).wait()

    return kernel_mask


def band_retube_incremental(Q, band_p, cand_ids, nlayers, chalo,
                            shape, tiles, interpret=False):
    """Incremental re-tube over the candidate tile list — ONE kernel pass.

    ``Q`` the current phi padded buffer; ``band_p`` the padded COMBINED mask
    buffer (0 outside, 1 compute-only, 2 active; phi's dtype;
    donated/aliased). Returns ``(band_p, act_flags)`` where ``act_flags[p]``
    is nonzero iff candidate ``p``'s tile has any compute-band cell.
    Requires ``nlayers + chalo + 2 <= 8`` (the layout halo); exact relative
    to the full-grid re-tube provided every changeable tile is in the
    candidate list (the active ⊕ 1-tile guarantee; see the module note)."""
    n0, n1, n2 = shape
    B0, B1, B2 = tiles
    dtype = Q.dtype
    grid_dims = (n0 // B0, n1 // B1, n2 // B2)
    capacity = int(cand_ids.shape[0])
    kernel_mask = _retube_kernels(
        B0, B1, B2, grid_dims, nlayers, chalo, dtype, capacity)
    S0, S1, S2 = B0 + 2 * _G0, B1 + 2 * _G1, B2 + 2 * _L
    anyspec = pl.BlockSpec(memory_space=pl.ANY)

    band_new, _stash, act_flags = pl.pallas_call(
        kernel_mask,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(2 * capacity,),
            in_specs=[anyspec, anyspec],
            out_specs=(anyspec, anyspec, anyspec),
            scratch_shapes=[
                pltpu.VMEM((2, S0, S1, S2), dtype),   # phi slabs
                pltpu.VMEM((2, S0, S1, S2), dtype),   # old-mask slabs
                pltpu.VMEM((2, B0, B1, B2), dtype),   # fresh-tile staging
                pltpu.VMEM((8, 128), dtype),          # activity flag row
                pltpu.VMEM((2, B0, B1, B2), dtype),   # phase-B bounce
                pltpu.SemaphoreType.DMA((2,)),        # phi in
                pltpu.SemaphoreType.DMA((2,)),        # mask in
                pltpu.SemaphoreType.DMA((2,)),        # stash/tile out
                pltpu.SemaphoreType.DMA,              # activity
                pltpu.SemaphoreType.DMA((2,)),        # stash in
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct(band_p.shape, dtype),
            jax.ShapeDtypeStruct((capacity, B0, B1, B2), dtype),  # stash
            jax.ShapeDtypeStruct((capacity, 8, 128), dtype),
        ),
        # the combined buffer (arg 2, counting the prefetch ids) aliases the
        # output directly — the two-phase kernel needs NO defensive copy
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(cand_ids, Q, band_p)
    return band_new, act_flags[:, 0, 0]


from functools import partial as _p4


@_p4(jax.custom_vjp, nondiff_argnums=(3,))
def band_retube_incremental_d(Q, band_p, cand_ids, statics):
    """Differentiation-safe wrapper: masks are piecewise constant in phi, so
    every cotangent is zero (matching the jnp path, where boolean mask ops
    carry no gradient) — without this the Pallas re-tube kernels would fail
    under ``jax.grad`` in the band rollout."""
    nlayers, chalo, shape, tiles, interpret = statics
    return band_retube_incremental(Q, band_p, cand_ids, nlayers,
                                   chalo, shape, tiles, interpret=interpret)


def _bri_fwd(Q, band_p, cand_ids, statics):
    out = band_retube_incremental_d(Q, band_p, cand_ids, statics)
    return out, (Q, band_p, cand_ids)


def _bri_bwd(statics, res, g):
    import numpy as _np

    Q, band_p, cand_ids = res
    return (jnp.zeros_like(Q), jnp.zeros_like(band_p),
            _np.zeros(cand_ids.shape, dtype=jax.dtypes.float0))


band_retube_incremental_d.defvjp(_bri_fwd, _bri_bwd)
