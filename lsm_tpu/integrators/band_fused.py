"""Band-proportional fused evolution driver (active-tile dispatch).

Drives :func:`lsm_tpu.ops.band_pallas.band_stage` for dense 3D narrow-band
fields (2D grids ride along through the exact constant dummy-axis embedding):
per accepted step the compute mask is reduced to an active-tile dispatch
list, each RK stage runs ONE Pallas kernel over just those tiles, and the
band is re-tubed (``update_band!`` semantics,
``/root/reference/src/meshfield.jl:553-588``) — separable box-dilation mask
passes, skippable between steps via ``retube_every`` within the CFL safety
budget. Stage cost scales with the dispatched tiles (the interface area);
the re-tube keeps an O(grid) mask pass whose cost the cadence amortizes.

Buffer discipline: three persistent padded buffers rotate through the RK
stages. Off-band cells are frozen by the band invariant, so every buffer
always holds correct values outside the compute band — a stage only writes
its active tiles into the ping-pong target and inactive regions need no copy.

  FE :  A -> B                                  next state (B, A, C)
  RK2:  A -> B;  (B, aux A) -> C                next state (C, A, B)
  RK3:  A -> B;  (B, aux A) -> C; (C, aux A) -> B   next state (B, A, C)
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.narrowband import NarrowBandField, band_mask_from_values, box_dilate
from ..ops import band_pallas as bp
from .explicit import RK2, RK3, ForwardEuler, TimeIntegrator
from .fused import _embed_specs_2d, _term_spec

__all__ = ["BandState", "FusedBandStepper", "supports_band_fused"]


class BandState(NamedTuple):
    """Jittable band-evolution state (a pytree)."""

    bufs: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]  # (current, spare, spare)
    band: jnp.ndarray        # COMBINED mask, PADDED layout in phi's dtype
    #                          (Mosaic rejects bool DMAs): 0 = outside,
    #                          1 = compute band only, 2 = active band. One
    #                          buffer instead of separate mask/cmask — the
    #                          stage tests != 0 (compute band), the re-tube
    #                          > 1.5 (active); halves mask HBM (round 5)
    act: jnp.ndarray         # per-tile activity (G0, G1, G2) bool
    ids: jnp.ndarray         # active-tile dispatch list (capacity,)
    count: jnp.ndarray       # live tiles (<= capacity or the list overflowed)


def supports_band_fused(terms, nb) -> bool:
    """3D lane-aligned bands natively; 2D bands via the constant dummy-axis
    embedding (the 2D grid rides the 3D kernel as ``(1, n0, n1)`` — see
    :meth:`FusedBandStepper` for why that is exact)."""
    if not isinstance(terms, (tuple, list)):
        terms = (terms,)
    if not (isinstance(nb, NarrowBandField) and nb.bcs is not None):
        return False
    if len(nb.shape) == 3:
        ok_shape = nb.shape[2] % 128 == 0
    elif len(nb.shape) == 2:
        ok_shape = nb.shape[1] % 128 == 0
    else:
        return False
    return ok_shape and all(_term_spec(t, nb) is not None for t in terms)


def _default_tiles(shape) -> Tuple[int, int, int]:
    # round-5 sweep (docs/perf-notes.md): B0=16 amortizes the dim-0 halo and
    # beats B0=8 at 512^3 (18.8 vs 20.2 ms/step) and 768^3 (39.7 vs 44.7);
    # B2=384 wins where it divides (768^3: 38.2 ms)
    n0, n1, n2 = shape
    B0 = next((b for b in (16, 8, 4, 2, 1) if n0 % b == 0))
    B1 = next((b for b in (32, 16, 8) if n1 % b == 0), None)
    B2 = next((b for b in (384, 256, 128) if n2 % b == 0), None)
    if B1 is None or B2 is None:
        raise ValueError(f"no band tile size fits shape {shape}")
    return (B0, B1, B2)


class FusedBandStepper:
    """Active-tile fused stepping for a 3D :class:`NarrowBandField`.

    Usage::

        stepper = FusedBandStepper(terms, nb, integrator)
        state = stepper.pack(nb)
        for _ in range(nsteps):
            state = stepper.step(state, t, dt)   # jitted
            t += dt
        nb_out = stepper.unpack(state)

    ``capacity`` bounds the dispatch list (a static compile-time size).
    ``state.count > capacity`` means the band outgrew the list and results
    are incomplete — check :meth:`overflowed` periodically on long runs.
    """

    def __init__(self, terms, nb: NarrowBandField, integrator: TimeIntegrator,
                 tiles: Optional[Tuple[int, int, int]] = None,
                 capacity: Optional[int] = None, slack: float = 1.5,
                 retube_every: int = 1, interpret: bool = False):
        if not isinstance(terms, (tuple, list)):
            terms = (terms,)
        if not supports_band_fused(terms, nb):
            raise ValueError("configuration not supported by the band stepper")
        # Re-tube cadence. The CFL condition bounds the interface speed by
        # ``cfl`` cells per accepted step, and the compute band reaches
        # ``COMPUTE_HALO`` cells beyond the active band (cut cells + nlayers),
        # so every cell within stencil reach of the interface stays inside the
        # *stale* compute band for ``COMPUTE_HALO / cfl`` steps — skipping the
        # O(grid) re-tube between those steps changes which far-from-interface
        # cells are frozen, never the near-interface evolution. (The reference
        # re-tubes every step, ``timestepping.jl:115``; ``retube_every=1``
        # reproduces that exactly and is the default.)
        # margin = min(nlayers, COMPUTE_HALO): the interface must neither
        # outrun the stale compute band nor the stale active band (ADVICE r3;
        # NarrowBandField enforces nlayers >= COMPUTE_HALO today, so the min
        # is defensive)
        margin = min(nb.nlayers, NarrowBandField.COMPUTE_HALO)
        max_skip = max(1, int(margin / integrator.cfl))
        if not 1 <= retube_every <= max_skip:
            raise ValueError(
                f"retube_every={retube_every} outside the safe range "
                f"[1, {max_skip}] for cfl={integrator.cfl} "
                f"(interface may outrun the stale compute band)"
            )
        self.retube_every = int(retube_every)
        self.is2d = len(nb.shape) == 2
        self.grid2 = nb.grid
        self.bcs2 = nb.bcs
        self.terms = tuple(terms)
        self.integrator = integrator
        self.nlayers = nb.nlayers
        self.interpret = interpret
        specs = tuple(_term_spec(t, nb) for t in terms)
        if self.is2d:
            # exact dummy-axis embedding: phi3(w, x, y) = phi2(x, y) extended
            # constantly (Extrapolation(0) ghosts), so every axis-0 one-sided
            # difference is exactly zero and each 3D Hamiltonian reduces to
            # its 2D form (curvature included: the extruded direction
            # contributes nothing to Delta/grad/Hessian quadratic form)
            from ..core.bc import Extrapolation

            self.shape = (1,) + tuple(nb.shape)
            self.bcs = ((Extrapolation(0), Extrapolation(0)),) + tuple(nb.bcs)
            self.spacing = (1.0,) + tuple(float(h) for h in nb.grid.spacing)
            self.lo = (0.0,) + tuple(float(x) for x in nb.grid.lo)
            self.specs = _embed_specs_2d(specs, nb.dtype)
        else:
            self.shape = tuple(nb.shape)
            self.bcs = nb.bcs
            self.spacing = tuple(float(h) for h in nb.grid.spacing)
            self.lo = tuple(float(x) for x in nb.grid.lo)
            self.specs = specs
        self.tiles = tiles or _default_tiles(self.shape)
        if capacity is None:
            cm = nb.compute_mask[None] if self.is2d else nb.compute_mask
            n_active = int(bp.tile_activity(cm, self.tiles).sum())
            total = 1
            for n, b in zip(self.shape, self.tiles):
                total *= n // b
            capacity = min(total, max(64, int(n_active * slack) + 32))
        self.capacity = int(capacity)
        reach = 1 + self.nlayers + NarrowBandField.COMPUTE_HALO
        total = 1
        for n, b in zip(self.shape, self.tiles):
            total *= n // b
        #: incremental re-tube applies when the change reach fits in a tile
        #: (candidates = active ⊕ 1 tile) and the slab halos cover the
        #: node reach (nlayers + 2 <= 8, the band layout's dim-0/1 pad)
        self._incremental = (
            reach <= min(self.tiles)
            and self.nlayers + NarrowBandField.COMPUTE_HALO + 2 <= 8
            and bp._HAS_PALLAS
        )
        self.cand_capacity = int(min(total, max(4 * self.capacity, 128)))
        if isinstance(integrator, RK3):
            self._table = "rk3"
        elif isinstance(integrator, RK2):
            self._table = "rk2"
        elif isinstance(integrator, ForwardEuler):
            self._table = "fe"
        else:
            raise ValueError(f"unsupported integrator {integrator!r}")
        # host-loop step: only the buffers a table WRITES cross the jit
        # boundary as donated args, and nothing passes through unchanged —
        # XLA COPIES donated inputs that are returned as-is (~2.2 ms per
        # 840 MB buffer at 512^3; measured +8.8 ms/step for the full
        # BandState pass-through)
        # two jits per table: donation must differ (a retube step consumes
        # the combined mask via in-place aliasing; a cadence-skipped step
        # must NOT donate it — the host keeps the original)
        if self._table == "fe":
            self._step_core_rt = jax.jit(
                lambda A, B, m, a, i, t, dt, s:
                    self._core_fe(A, B, m, a, i, True, t, dt, s),
                donate_argnums=(1, 2))
            self._step_core_nrt = jax.jit(
                lambda A, B, m, a, i, t, dt, s:
                    self._core_fe(A, B, m, a, i, False, t, dt, s),
                donate_argnums=(1,))
        else:
            self._step_core_rt = jax.jit(
                lambda A, B, C, m, a, i, t, dt, s:
                    self._core_rk(A, B, C, m, a, i, True, t, dt, s),
                donate_argnums=(1, 2, 3))
            self._step_core_nrt = jax.jit(
                lambda A, B, C, m, a, i, t, dt, s:
                    self._core_rk(A, B, C, m, a, i, False, t, dt, s),
                donate_argnums=(1, 2))
        self._cfl = jax.jit(self._cfl_impl)
        # pack as ONE compiled graph: eagerly it is ~20 separate ops, each a
        # multi-second remote compile through the axon tunnel at 512^3
        self._pack = jax.jit(self._pack_impl)

    # -- layout -----------------------------------------------------------------

    def pack(self, nb: NarrowBandField) -> BandState:
        return self._pack(nb.values, nb.mask, nb.compute_mask)

    def pack_consuming(self, nb: NarrowBandField) -> BandState:
        """Pack with the field's arrays DONATED: XLA frees the dense values
        and masks as the padded buffers are built, cutting the pack-time HBM
        peak by ~2.6 GB at 768^3 — the margin between fitting and
        RESOURCE_EXHAUSTED there. ``nb`` must not be used afterwards."""
        if not hasattr(self, "_pack_don"):
            self._pack_don = jax.jit(self._pack_impl,
                                     donate_argnums=(0, 1, 2))
        return self._pack_don(nb.values, nb.mask, nb.compute_mask)

    def _pack_impl(self, values, nb_mask, compute_mask) -> BandState:
        cm = compute_mask[None] if self.is2d else compute_mask
        if self.is2d:
            values = values[None]
        Q = bp.pack_band_padded(values, self.bcs)
        ids, count = bp.active_tile_ids(cm, self.tiles, self.capacity)
        # fresh copies: step() donates the state, and aliasing the caller's
        # mask arrays would delete them out from under the NarrowBandField
        mask3 = nb_mask[None] if self.is2d else nb_mask
        # combined encoding: cmask + mask as 0/1 sums (mask ⊆ cmask → 0/1/2)
        band = (bp.pack_band_mask(cm, Q.dtype)
                + bp.pack_band_mask(mask3, Q.dtype))
        act = bp.tile_activity(cm, self.tiles)
        # FE ping-pongs TWO buffers; the third slot is a scalar placeholder
        # (a real third buffer is 2.8 GB dead weight at 768^3 — the size
        # that decides whether the 768^3 band state fits HBM at all)
        spare2 = Q + 0.0 if self._table != "fe" else jnp.zeros((), Q.dtype)
        return BandState((Q, Q + 0.0, spare2), band, act, ids, count)

    def unpack(self, state: BandState) -> NarrowBandField:
        # fail loud on a dispatch-list overflow (count > capacity means tiles
        # were dropped and the evolved values are incomplete) — cheap post-hoc
        # check at the exit boundary; silent when the count is traced (the
        # equation driver checks it per accepted step instead, equation.py)
        try:
            if int(state.count) > self.capacity:
                import warnings

                warnings.warn(
                    f"band dispatch list overflowed (count={int(state.count)} "
                    f"> capacity={self.capacity}): some active tiles were "
                    f"never stepped — use regrow() and re-run",
                    RuntimeWarning, stacklevel=2)
        except (jax.errors.ConcretizationTypeError,
                jax.errors.TracerIntegerConversionError):
            pass
        values = bp.unpack_band_padded(state.bufs[0], self.shape)
        ub = bp.unpack_band_padded(state.band, self.shape)
        cmask = ub != 0
        mask = ub > 1.5
        if self.is2d:
            values, cmask, mask = values[0], cmask[0], mask[0]
        return NarrowBandField(
            values, self.grid2, self.bcs2, mask, self.nlayers,
            _normalized=True, _cmask=cmask,
        )

    def overflowed(self, state: BandState) -> bool:
        return int(state.count) > self.capacity

    # -- stepping ---------------------------------------------------------------

    @property
    def _stream_args(self):
        # streamed coefficient arrays ride as explicit jit ARGUMENTS (closed
        # over, they would bake into the HLO as constants — GBs for a 512^3
        # vector velocity, rejected by the axon remote compiler). A property,
        # not a snapshot: callers may swap ``self.specs`` between steps (the
        # update_func idiom) and must see the current arrays.
        return tuple(a for _, arrs in self.specs for a in arrs)

    def _specs_with(self, streams):
        it = iter(streams)
        return tuple(
            (spec, tuple(next(it) for _ in arrs)) for spec, arrs in self.specs
        )

    def _stage(self, src, dst, ids, cmask, specs, coeffs, t_stage, aux,
               flags=None):
        # differentiable composite: Pallas active-tile stage + in-place
        # Pallas shell refresh forward (XLA's .at[].set costs a full pass
        # over the band buffer PER SHELL — docs/perf-notes.md), custom VJP
        # backward. ``flags`` gates the refresh to faces the active set
        # touches (the lane-shell pass alone costs ~33 ms at 768^3 when run
        # unconditionally — docs/profile_r5_band.py).
        return bp.band_step_stage(
            src, dst, ids, cmask, specs, coeffs, t_stage, aux,
            self.bcs, self.spacing, self.shape, self.lo, self.tiles,
            interpret=self.interpret, flags=flags,
        )

    def _step_impl(self, state: BandState, t, dt, retube: bool = True):
        """Step with the constructor-captured streams (tests/direct callers;
        :meth:`step` passes streams as jit arguments)."""
        return self._step_full(state, t, dt, retube, self._stream_args)

    def _step_full(self, state: BandState, t, dt, retube, streams):
        specs = self._specs_with(streams)
        A, B, C = state.bufs
        ids, cmask = state.ids, state.band
        fl = bp.refresh_flags_from_activity(state.act)
        t = jnp.asarray(t, A.dtype)
        dt = jnp.asarray(dt, A.dtype)
        if self._table == "fe":
            B = self._stage(A, B, ids, cmask, specs, (0.0, 1.0, dt), t, None,
                            fl)
            cur, s1, s2 = B, A, C
        elif self._table == "rk2":
            B = self._stage(A, B, ids, cmask, specs, (0.0, 1.0, dt), t, None,
                            fl)
            C = self._stage(B, C, ids, cmask, specs, (0.5, 0.5, 0.5 * dt),
                            t + dt, A, fl)
            cur, s1, s2 = C, A, B
        else:
            B = self._stage(A, B, ids, cmask, specs, (0.0, 1.0, dt), t, None,
                            fl)
            C = self._stage(B, C, ids, cmask, specs, (0.75, 0.25, 0.25 * dt),
                            t + dt, A, fl)
            third = 1.0 / 3.0
            B = self._stage(
                C, B, ids, cmask, specs, (third, 2.0 * third, 2.0 * third * dt),
                t + 0.5 * dt, A, fl,
            )
            cur, s1, s2 = B, A, C

        if not retube:  # cadence-skipped step: masks/dispatch stay as-is
            return BandState((cur, s1, s2), state.band, state.act,
                             ids, state.count)

        if self._incremental:
            return self._retube_incremental(cur, s1, s2, state)
        return self._retube_full(cur, s1, s2, state)

    def _combined_from(self, mask, cmask, dtype):
        m3 = mask[None] if self.is2d else mask
        cm3 = cmask[None] if self.is2d else cmask
        return (bp.pack_band_mask(cm3, dtype)
                + bp.pack_band_mask(m3, dtype))

    def _retube_full(self, cur, s1, s2, state: BandState) -> BandState:
        """Full-grid re-tube (``update_band!`` semantics) + dispatch rebuild
        — O(grid) XLA passes; the pack-time baseline and the fallback when
        the incremental candidate list overflows."""
        values = bp.unpack_band_padded(cur, self.shape)
        prev_mask = bp.unpack_band_padded(state.band, self.shape) > 1.5
        if self.is2d:
            values, prev_mask = values[0], prev_mask[0]
        mask = band_mask_from_values(values, self.nlayers, prev_mask)
        cmask = box_dilate(mask, NarrowBandField.COMPUTE_HALO)
        cm3 = (cmask[None] if self.is2d else cmask)
        ids, count = bp.active_tile_ids(cm3, self.tiles, self.capacity)
        act = bp.tile_activity(cm3, self.tiles)
        return BandState(
            (cur, s1, s2), self._combined_from(mask, cmask, cur.dtype),
            act, ids, count)

    def _retube_incremental(self, cur, s1, s2, state: BandState) -> BandState:
        """Interface-proportional re-tube (round 4): only tiles within one
        tile of the active set can change (reach = 1 + nlayers +
        COMPUTE_HALO <= min tile dim, validated at construction), so the
        mask kernel runs over the candidate list only. Falls back to
        the full re-tube in-graph when the candidate list overflows."""
        cand = box_dilate(state.act, 1)  # tile grid — trivial
        ccount = jnp.sum(cand, dtype=jnp.int32)
        (cids,) = jnp.nonzero(cand.ravel(), size=self.cand_capacity,
                              fill_value=-1)
        cids = cids.astype(jnp.int32)

        def incremental(args):
            cur, band_p, act = args
            band_p, flags = bp.band_retube_incremental_d(
                cur, band_p, cids,
                (self.nlayers, NarrowBandField.COMPUTE_HALO, self.shape,
                 self.tiles, self.interpret))
            act_flat = act.ravel()
            safe = jnp.where(cids >= 0, cids, act_flat.shape[0])
            act_new = act_flat.at[safe].set(flags > 0,
                                            mode="drop").reshape(act.shape)
            return band_p, act_new

        def full(args):
            cur, band_p, act = args
            values = bp.unpack_band_padded(cur, self.shape)
            prev_mask = bp.unpack_band_padded(band_p, self.shape) > 1.5
            if self.is2d:
                values, prev_mask = values[0], prev_mask[0]
            mask = band_mask_from_values(values, self.nlayers, prev_mask)
            cmask = box_dilate(mask, NarrowBandField.COMPUTE_HALO)
            cm3 = (cmask[None] if self.is2d else cmask)
            return (self._combined_from(mask, cmask, cur.dtype),
                    bp.tile_activity(cm3, self.tiles))

        band_p, act = jax.lax.cond(
            ccount <= self.cand_capacity, incremental, full,
            (cur, state.band, state.act))
        act_int = act.ravel()
        count = jnp.sum(act_int, dtype=jnp.int32)
        (ids,) = jnp.nonzero(act_int, size=self.capacity, fill_value=-1)
        return BandState((cur, s1, s2), band_p, act,
                         ids.astype(jnp.int32), count)

    def _retube_outputs(self, cur, band, act):
        """(band', act', ids', count') for the post-stage state."""
        st8 = BandState((cur, cur, cur), band, act,
                        jnp.zeros((1,), jnp.int32), jnp.zeros((), jnp.int32))
        if self._incremental:
            out = self._retube_incremental(cur, cur, cur, st8)
        else:
            out = self._retube_full(cur, cur, cur, st8)
        return out.band, out.act, out.ids, out.count

    def _core_fe(self, A, B, band, act, ids, retube, t, dt, streams):
        specs = self._specs_with(streams)
        fl = bp.refresh_flags_from_activity(act)
        t = jnp.asarray(t, A.dtype)
        dt = jnp.asarray(dt, A.dtype)
        cur = self._stage(A, B, ids, band, specs, (0.0, 1.0, dt), t, None,
                          fl)
        if not retube:
            return (cur,)
        return (cur,) + self._retube_outputs(cur, band, act)

    def _core_rk(self, A, B, C, band, act, ids, retube, t, dt,
                 streams):
        specs = self._specs_with(streams)
        fl = bp.refresh_flags_from_activity(act)
        t = jnp.asarray(t, A.dtype)
        dt = jnp.asarray(dt, A.dtype)
        if self._table == "rk2":
            B = self._stage(A, B, ids, band, specs, (0.0, 1.0, dt), t, None,
                            fl)
            cur = self._stage(B, C, ids, band, specs, (0.5, 0.5, 0.5 * dt),
                              t + dt, A, fl)
            spare = B
        else:
            B = self._stage(A, B, ids, band, specs, (0.0, 1.0, dt), t, None,
                            fl)
            C = self._stage(B, C, ids, band, specs, (0.75, 0.25, 0.25 * dt),
                            t + dt, A, fl)
            third = 1.0 / 3.0
            cur = self._stage(C, B, ids, band, specs,
                              (third, 2.0 * third, 2.0 * third * dt),
                              t + 0.5 * dt, A, fl)
            spare = C
        if not retube:
            return (cur, spare)
        return (cur, spare) + self._retube_outputs(cur, band, act)

    def step(self, state: BandState, t, dt, retube: bool = True) -> BandState:
        """One accepted step. ``retube=False`` skips the re-tube — valid
        only within the ``retube_every`` cadence (see the constructor note
        on the CFL safety bound). Untouched buffers stay host-side (never
        copied); the written buffers are donated."""
        A, B, C = state.bufs
        core = self._step_core_rt if retube else self._step_core_nrt
        if self._table == "fe":
            outs = core(A, B, state.band, state.act,
                        state.ids, t, dt, self._stream_args)
            bufs = (outs[0], A, C)
        else:
            outs = core(A, B, C, state.band, state.act,
                        state.ids, t, dt, self._stream_args)
            bufs = (outs[0], A, outs[1])
        k = 1 if self._table == "fe" else 2
        if not retube:
            return BandState(bufs, state.band, state.act,
                             state.ids, state.count)
        band, act, ids, count = outs[k:]
        return BandState(bufs, band, act, ids, count)

    # -- adaptive CFL + overflow recovery -----------------------------------------

    def _cfl_impl(self, state: BandState, t, terms):
        from ..terms.terms import compute_cfl

        values = bp.unpack_band_padded(state.bufs[0], self.shape)
        ub = bp.unpack_band_padded(state.band, self.shape)
        cmask = ub != 0
        mask = ub > 1.5
        if self.is2d:
            values, cmask, mask = values[0], cmask[0], mask[0]
        nb = NarrowBandField(
            values, self.grid2, self.bcs2, mask, self.nlayers,
            _normalized=True, _cmask=cmask,
        )
        dt = compute_cfl(terms, nb, jnp.asarray(t, values.dtype))
        return dt, state.count

    def cfl(self, state: BandState, t):
        """``(largest stable dt, live tile count)`` for the current state
        (jitted; one fused device->host transfer serves both the adaptive-CFL
        loop — reference ``timestepping.jl:101-122`` — and overflow
        detection). CFL reduces over the ACTIVE band only, matching the
        reference's active-node reduction (``levelsetterms.jl:31-38``)."""
        return self._cfl(state, t, self.terms)

    def regrow(self, state: BandState, factor: int = 2):
        """Recover from a dispatch-list overflow: rebuild this stepper with
        ``factor``x capacity and re-pack the current state. Returns
        ``(stepper, state)``. The overflow is detected BEFORE the oversized
        band is stepped (see :meth:`cfl` /
        :meth:`~lsm_tpu.equation.LevelSetEquation.integrate`), so no update
        was ever lost."""
        total = 1
        for n, b in zip(self.shape, self.tiles):
            total *= n // b
        nb = self.unpack(state)
        stepper = FusedBandStepper(
            self.terms, nb, self.integrator, tiles=self.tiles,
            capacity=min(total, max(self.capacity * factor, 64)),
            retube_every=self.retube_every, interpret=self.interpret,
        )
        return stepper, stepper.pack(nb)
