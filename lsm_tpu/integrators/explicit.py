"""Explicit TVD Runge-Kutta time integrators.

TPU-native analogue of ``/root/reference/src/timestepping.jl:1-202``: each
integrator is a tiny frozen (static, hashable) dataclass with a pure
``advance(terms, phi, t, dt) -> (phi_new, terms_new)`` stage function, designed to
be composed under ``jax.jit`` / ``lax.scan`` / ``lax.while_loop`` by the drivers in
:mod:`lsm_tpu.integrators.loop` and :mod:`lsm_tpu.equation`.

Terms are re-``update``-d at every stage with the stage state and time, matching the
reference's per-stage ``update_term!`` calls (``timestepping.jl:149,158,174,185,196``).
Every integrator carries a ``cfl`` safety factor (default 0.5).
"""

from __future__ import annotations

import dataclasses

from ..core.field import MeshField
from ..terms.terms import total_rhs, update_terms

__all__ = ["TimeIntegrator", "ForwardEuler", "RK2", "RK3"]


@dataclasses.dataclass(frozen=True)
class TimeIntegrator:
    cfl: float = 0.5

    def advance(self, terms, phi: MeshField, t, dt):
        raise NotImplementedError

    def describe(self) -> str:
        raise NotImplementedError

    def __repr__(self):
        return f"{self.describe()}\n  `- cfl: {self.cfl}"


@dataclasses.dataclass(frozen=True, repr=False)
class ForwardEuler(TimeIntegrator):
    """First-order explicit forward Euler (``timestepping.jl:126-137``)."""

    def advance(self, terms, phi, t, dt):
        terms = update_terms(terms, phi, t)
        phi_new = phi.with_values(phi.values - dt * total_rhs(terms, phi, t))
        return phi_new, terms

    def describe(self):
        return "ForwardEuler (1st order explicit)"


@dataclasses.dataclass(frozen=True, repr=False)
class RK2(TimeIntegrator):
    """Second-order TVD Runge-Kutta (Heun predictor-corrector,
    ``timestepping.jl:141-164``)."""

    def advance(self, terms, phi, t, dt):
        terms = update_terms(terms, phi, t)
        k1 = total_rhs(terms, phi, t)
        pred = phi.with_values(phi.values - dt * k1)
        terms = update_terms(terms, pred, t + dt)
        k2 = total_rhs(terms, pred, t + dt)
        phi_new = phi.with_values(phi.values - 0.5 * dt * (k1 + k2))
        return phi_new, terms

    def describe(self):
        return "RK2 (2nd order TVD Runge-Kutta, Heun's method)"


@dataclasses.dataclass(frozen=True, repr=False)
class RK3(TimeIntegrator):
    """Third-order Shu-Osher TVD Runge-Kutta (``timestepping.jl:168-202``)."""

    def advance(self, terms, phi, t, dt):
        terms = update_terms(terms, phi, t)
        u1 = phi.with_values(phi.values - dt * total_rhs(terms, phi, t))
        terms = update_terms(terms, u1, t + dt)
        u2_vals = 0.75 * phi.values + 0.25 * (u1.values - dt * total_rhs(terms, u1, t + dt))
        u2 = phi.with_values(u2_vals)
        terms = update_terms(terms, u2, t + 0.5 * dt)
        new_vals = (phi.values + 2.0 * (u2.values - dt * total_rhs(terms, u2, t + 0.5 * dt))) / 3.0
        return phi.with_values(new_vals), terms

    def describe(self):
        return "RK3 (3rd order TVD Runge-Kutta)"
