"""Forward-only fused evolution driver on the persistent padded layout.

The fast path for dense 3D lane-aligned grids whose terms are all fusible
(WENO5 advection / Godunov normal motion / curvature / Eikonal reinit with no
``update_func``): the level set lives in the v2 padded buffer between steps,
each RK stage is ONE :func:`~lsm_tpu.ops.weno_v2.fused_stage` kernel pass plus
an O(N^2) ghost-shell refresh — no full-grid pad, no separate axpy, and (for
coordinate-callable coefficients) no coefficient streaming.

Reference stage algebra: ``/root/reference/src/timestepping.jl:126-202``.
Differentiable and general cases stay on the v1 path
(:meth:`AdvectionTerm.stage_values` inside the standard integrators).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.field import MeshField
from ..ops import weno_v2 as v2
from .explicit import RK2, RK3, ForwardEuler, TimeIntegrator

__all__ = ["FusedStepper", "supports_fused"]


def _term_spec(term, phi, allow_update=False):
    """(TermSpec, streams) for a fusible term, or None.

    Vector coefficients must carry exactly ``phi.ndim`` components (ADVICE r3:
    the previous hard-coded 3 silently duplicated a component via JAX's
    out-of-bounds index clamping for 2D fields)."""
    from ..terms import terms as T

    n_dim = len(phi.shape)

    def coef_spec(kind, coef, n_comp):
        if isinstance(coef, MeshField):
            if n_comp > 1:
                if not coef.is_vector or coef.values.shape[0] != n_comp:
                    return None
                return v2.TermSpec(kind, "stream", None, n_comp), tuple(
                    coef.values[d] for d in range(n_comp))
            return v2.TermSpec(kind, "stream", None, 1), (coef.values,)
        if callable(coef):
            return v2.TermSpec(kind, "analytic", coef, 0), ()
        if isinstance(coef, (float, int)):
            return v2.TermSpec(kind, "const", float(coef), 0), ()
        arr = jnp.asarray(coef)
        if n_comp > 1:
            if arr.shape[0] != n_comp:
                return None
            return v2.TermSpec(kind, "stream", None, n_comp), tuple(
                arr[d] for d in range(n_comp))
        return v2.TermSpec(kind, "stream", None, 1), (arr,)

    if isinstance(term, T.AdvectionTerm):
        if term.scheme != "weno5":
            return None
        if term.update_func is not None and not allow_update:
            return None
        return coef_spec("advection", term.velocity, n_dim)
    if isinstance(term, T.NormalMotionTerm):
        if term.update_func is not None and not allow_update:
            return None
        return coef_spec("normal", term.speed, 1)
    if isinstance(term, T.CurvatureTerm):
        return coef_spec("curvature", term.b, 1)
    if isinstance(term, T.EikonalReinitializationTerm):
        if term.s0 is None:
            return v2.TermSpec("eikonal", "none", None, 0), ()
        return v2.TermSpec("eikonal", "stream", None, 1), (term.s0.values,)
    return None


def _embed_specs_2d(specs2, dtype):
    """Adapt 2D term specs to the dummy-axis 3D embedding: analytic
    coefficients ignore the dummy coordinate; the dummy velocity component is
    zero; streamed arrays gain the leading length-1 axis."""
    from ..ops.weno_v2 import TermSpec

    out = []
    for spec, arrs in specs2:
        if spec.coef_kind == "analytic":
            f2 = spec.coef_static
            if spec.kind == "advection":
                def f3(xs, t, _f=f2):
                    u, v = _f((xs[1], xs[2]), t)
                    return (0.0 * (xs[0] + xs[1] + xs[2]), u, v)
            else:
                def f3(xs, t, _f=f2):
                    return _f((xs[1], xs[2]), t)
            out.append((TermSpec(spec.kind, "analytic", f3, 0), ()))
        elif spec.coef_kind == "stream":
            arrs3 = tuple(a[None] for a in arrs)
            if spec.kind == "advection":
                arrs3 = (jnp.zeros_like(arrs3[0]),) + arrs3
            out.append(
                (TermSpec(spec.kind, "stream", None, len(arrs3)), arrs3))
        else:
            out.append((spec, arrs))
    return tuple(out)


def _supports_shape(shape, bcs) -> bool:
    """3D lane-aligned natively; 2D via the constant dummy-axis embedding
    (``phi3(w, x, y) = phi2(x, y)`` with Extrapolation(0) dummy ghosts — every
    axis-0 one-sided difference is exactly zero, so each 3D Hamiltonian
    reduces to its 2D form; validated by the band stepper in round 3)."""
    if len(shape) == 3:
        return v2.supports_v2(tuple(shape), bcs)
    if len(shape) == 2:
        from ..core.bc import Extrapolation

        bcs3 = None if bcs is None else (
            ((Extrapolation(0), Extrapolation(0)),) + tuple(bcs))
        return v2.supports_v2((1,) + tuple(shape), bcs3)
    return False


def supports_fused(terms, phi: MeshField, allow_update: bool = True) -> bool:
    """Whether (terms, phi) qualifies for the fused padded-state driver.

    Terms with ``update_func`` qualify since round 4: the stepper re-evaluates
    the coefficient between stages (the reference's per-stage ``update_term!``,
    ``timestepping.jl:149,158,174,185,196``) and re-streams it."""
    if not isinstance(terms, (tuple, list)):
        terms = (terms,)
    return (
        _supports_shape(tuple(phi.shape), phi.bcs)
        and not phi.is_vector
        and phi.active_mask is None  # dense fields only
        and all(_term_spec(t, phi, allow_update=allow_update) is not None
                for t in terms)
    )


class FusedStepper:
    """Padded-state stepping for ``phi_t + sum_n H_n = 0`` (fusible terms).

    Usage::

        stepper = FusedStepper(terms, phi, integrator)
        P = stepper.pack(phi.values)
        for _ in range(nsteps):
            P = stepper.step(P, t, dt)     # jitted, donates P
            t += dt
        values = stepper.unpack(P)
    """

    def __init__(self, terms, phi: MeshField, integrator: TimeIntegrator,
                 tiles: Optional[Tuple[int, int]] = None, interpret: bool = False):
        if not isinstance(terms, (tuple, list)):
            terms = (terms,)
        if not supports_fused(terms, phi):
            raise ValueError("configuration not supported by the fused driver")
        self.is2d = len(phi.shape) == 2
        self.grid = phi.grid
        self.bcs2 = phi.bcs
        self.terms = tuple(terms)
        if self.is2d:
            from ..core.bc import Extrapolation

            self.shape = (1,) + tuple(phi.shape)
            self.bcs = ((Extrapolation(0), Extrapolation(0)),) + tuple(phi.bcs)
            self.spacing = (1.0,) + tuple(float(h) for h in phi.spacing)
            self.lo = (0.0,) + tuple(float(x) for x in phi.grid.lo)
        else:
            self.shape = tuple(phi.shape)
            self.bcs = phi.bcs
            self.spacing = tuple(float(h) for h in phi.spacing)
            self.lo = tuple(float(x) for x in phi.grid.lo)
        self.tiles = tiles
        self.interpret = interpret
        self._has_update = any(
            getattr(t, "update_func", None) is not None for t in self.terms)
        specs = tuple(_term_spec(t, phi, allow_update=True) for t in terms)
        self.specs = _embed_specs_2d(specs, phi.dtype) if self.is2d else specs
        self._cfl = jax.jit(self._cfl_impl)
        self._cfl_update = jax.jit(self._cfl_update_impl)
        self._step_terms = jax.jit(self._step_terms_impl, donate_argnums=(0,))
        if isinstance(integrator, RK3):
            self._table = "rk3"
        elif isinstance(integrator, RK2):
            self._table = "rk2"
        elif isinstance(integrator, ForwardEuler):
            self._table = "fe"
        else:
            raise ValueError(f"unsupported integrator {integrator!r} for fused driver")
        self._step = jax.jit(self._step_full, donate_argnums=(0,))

    # -- layout -----------------------------------------------------------------

    def pack(self, values: jnp.ndarray) -> jnp.ndarray:
        if self.is2d:
            values = values[None]
        return v2.pack_padded(values, self.bcs)

    def unpack(self, padded: jnp.ndarray) -> jnp.ndarray:
        out = v2.unpack_padded(padded, self.shape)
        return out[0] if self.is2d else out

    def _field(self, P) -> MeshField:
        return MeshField(self.unpack(P), self.grid, self.bcs2,
                         _normalized=True)

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

    def _stage(self, P, specs, coeffs, t_stage, aux):
        # differentiable composite: Pallas stage + in-place Pallas shell
        # refresh forward (the XLA .at[].set refresh costs a full-buffer pass
        # PER SHELL — docs/profile_r3_parts.py), custom VJP backward
        return v2.fused_step_stage(
            P, specs, coeffs, t_stage, aux, self.bcs, self.spacing,
            self.shape, self.lo, tiles=self.tiles, interpret=self.interpret,
        )

    def _step_full(self, P, t, dt, streams):
        specs = self._specs_with(streams)
        t = jnp.asarray(t, P.dtype)
        dt = jnp.asarray(dt, P.dtype)
        if self._table == "fe":
            return self._stage(P, specs, (0.0, 1.0, dt), t, None)
        if self._table == "rk2":
            p1 = self._stage(P, specs, (0.0, 1.0, dt), t, None)
            return self._stage(p1, specs, (0.5, 0.5, 0.5 * dt), t + dt, P)
        p1 = self._stage(P, specs, (0.0, 1.0, dt), t, None)
        p2 = self._stage(p1, specs, (0.75, 0.25, 0.25 * dt), t + dt, P)
        third = 1.0 / 3.0
        return self._stage(p2, specs, (third, 2.0 * third, 2.0 * third * dt),
                           t + 0.5 * dt, P)

    def _step_impl(self, P, t, dt):
        """Step with the constructor-captured streams (differentiable-path
        compatibility; prefer :meth:`step`, whose jit takes streams as
        arguments). Not valid for ``update_func`` configurations — use
        :meth:`step_with_terms`."""
        return self._step_full(P, t, dt, self._stream_args)

    def step(self, P: jnp.ndarray, t, dt) -> jnp.ndarray:
        """One accepted step (jitted; donates ``P``)."""
        return self._step(P, t, dt, self._stream_args)

    # -- update_func configurations ----------------------------------------------

    def _stage_specs(self, P, t_stage, terms_cur):
        """Per-stage coefficient refresh: ``update_terms`` with the STAGE
        state and time (reference per-stage ``update_term!`` calls,
        ``timestepping.jl:149,158,174,185,196``), then re-spec/re-stream."""
        from ..terms.terms import update_terms

        field = self._field(P)
        terms_new = update_terms(terms_cur, field, t_stage)
        specs = tuple(_term_spec(tm, field, allow_update=True)
                      for tm in terms_new)
        if self.is2d:
            specs = _embed_specs_2d(specs, field.dtype)
        return specs, terms_new

    def _step_terms_impl(self, P, t, dt, terms):
        t = jnp.asarray(t, P.dtype)
        dt = jnp.asarray(dt, P.dtype)
        specs, terms = self._stage_specs(P, t, terms)
        if self._table == "fe":
            return self._stage(P, specs, (0.0, 1.0, dt), t, None), terms
        if self._table == "rk2":
            p1 = self._stage(P, specs, (0.0, 1.0, dt), t, None)
            specs, terms = self._stage_specs(p1, t + dt, terms)
            return self._stage(p1, specs, (0.5, 0.5, 0.5 * dt), t + dt, P), terms
        p1 = self._stage(P, specs, (0.0, 1.0, dt), t, None)
        specs, terms = self._stage_specs(p1, t + dt, terms)
        p2 = self._stage(p1, specs, (0.75, 0.25, 0.25 * dt), t + dt, P)
        specs, terms = self._stage_specs(p2, t + 0.5 * dt, terms)
        third = 1.0 / 3.0
        out = self._stage(p2, specs, (third, 2.0 * third, 2.0 * third * dt),
                          t + 0.5 * dt, P)
        return out, terms

    def step_with_terms(self, P, t, dt, terms):
        """One accepted step for ``update_func`` configurations: the terms
        thread through (jitted; donates ``P``). Returns ``(P_new, terms)``."""
        return self._step_terms(P, t, dt, terms)

    # -- adaptive CFL on the fast path --------------------------------------------

    def _cfl_impl(self, P, t, terms):
        from ..terms.terms import compute_cfl

        field = self._field(P)
        return compute_cfl(terms, field, jnp.asarray(t, P.dtype))

    def _cfl_update_impl(self, P, t, terms):
        """``update_terms`` with the accepted-step state, then the CFL bound
        (the reference's pre-step ``update_term!`` + ``compute_cfl``,
        ``timestepping.jl:107-111``). Returns ``(dt, terms_updated)``."""
        from ..terms.terms import compute_cfl, update_terms

        field = self._field(P)
        t = jnp.asarray(t, P.dtype)
        terms = update_terms(terms, field, t)
        return compute_cfl(terms, field, t), terms

    def cfl_with_terms(self, P, t, terms):
        return self._cfl_update(P, t, terms)

    def cfl(self, P: jnp.ndarray, t) -> jnp.ndarray:
        """Largest stable ``dt`` for the current padded state (jitted; the
        fused-path equivalent of ``compute_cfl`` — reference loop semantics
        ``/root/reference/src/timestepping.jl:101-122``). The terms ride as
        pytree ARGUMENTS so coefficient fields never bake into the HLO."""
        return self._cfl(P, t, self.terms)
