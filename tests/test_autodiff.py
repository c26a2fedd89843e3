"""Differentiability oracles — new surface the reference lacks (SURVEY.md sec. 4):
finite-difference checks of gradients through full rollouts, and the
shape-optimization benchmark configs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lsm_tpu import (
    AdvectionTerm, CurvatureTerm, Extrapolation, Grid, MeshField,
    NormalMotionTerm, Periodic, RK2, RK3, rollout, sample, volume,
)
from lsm_tpu.models import benchmarks, shapes


def _fd_check(loss, args, idx, eps=1e-7, atol=1e-6, n_probes=5, rng_seed=0):
    """Central finite differences vs autodiff on a few random entries.

    The Hamiltonians are only piecewise smooth (minmod / Godunov / upwind
    branches), so an FD probe that happens to straddle a branch switch can
    legitimately disagree with autodiff at O(branch jump), not O(eps^2).
    Majority rule: every probe must be within 1% relative, and all but one
    must meet the tight tolerance.
    """
    g = jax.grad(loss, argnums=idx)(*args)
    rng = np.random.default_rng(rng_seed)
    arr = np.asarray(args[idx])
    flat_g = np.asarray(g).ravel()
    n_loose = 0
    for _ in range(n_probes):
        j = rng.integers(arr.size)
        pert = np.zeros(arr.size)
        pert[j] = eps
        pert = pert.reshape(arr.shape)
        up = list(args); up[idx] = args[idx] + pert
        dn = list(args); dn[idx] = args[idx] - pert
        fd = (float(loss(*up)) - float(loss(*dn))) / (2 * eps)
        err = abs(fd - flat_g[j])
        assert err < atol + 1e-2 * abs(flat_g[j]), (fd, flat_g[j])
        if err >= atol + 1e-3 * abs(flat_g[j]):
            n_loose += 1
    assert n_loose <= 1, f"{n_loose}/{n_probes} probes off tight tolerance"


def test_grad_through_weno_advection_rollout():
    grid = Grid((-1.0, -1.0), (1.0, 1.0), (24, 24))
    phi = sample(shapes.circle(radius=0.5), grid, Periodic())
    vel = sample(lambda X, Y: (-Y + 0 * X, X + 0 * Y), grid, vector=True)
    dt = 0.3 * grid.min_spacing

    def loss(phi_vals, vel_vals):
        f = phi.with_values(phi_vals)
        term = AdvectionTerm(vel.with_values(vel_vals))
        out, _ = rollout(RK3(), (term,), f, 0.0, dt, 6)
        return volume(out)

    _fd_check(loss, (phi.values, vel.values), 0)
    _fd_check(loss, (phi.values, vel.values), 1)


def test_grad_through_curvature_and_normal_motion():
    grid = Grid((-1.0, -1.0), (1.0, 1.0), (20, 20))
    phi = sample(shapes.circle(radius=0.5), grid, Extrapolation(2))
    speed = jnp.full(grid.shape, 0.15)
    dt = 0.2 * grid.min_spacing**2

    def loss(phi_vals, speed_vals):
        f = phi.with_values(phi_vals)
        terms = (CurvatureTerm(-0.1), NormalMotionTerm(MeshField(speed_vals, grid)))
        out, _ = rollout(RK2(), terms, f, 0.0, dt, 4)
        return jnp.sum(out.values**2)

    _fd_check(loss, (phi.values, speed), 0, atol=1e-6)
    _fd_check(loss, (phi.values, speed), 1, atol=1e-6)


def test_config5_shape_optimization_descends():
    loss_and_grad, phi0, speed0 = benchmarks.config5_shape_opt_3d(
        n=24, nsteps=3, dtype=jnp.float64
    )
    pv, sv = phi0.values, speed0
    l0, (gp, gs) = loss_and_grad(pv, sv)
    assert np.isfinite(float(l0)) and np.isfinite(np.asarray(gp)).all()
    assert float(jnp.linalg.norm(gs)) > 0
    # two gradient-descent steps on the speed reduce the loss
    lr = 0.5 / max(float(jnp.abs(gs).max()), 1e-12)
    l1, (gp1, gs1) = loss_and_grad(pv, sv - lr * gs)
    assert float(l1) < float(l0), (float(l0), float(l1))


def test_benchmark_configs_run():
    eq1, exact1 = benchmarks.config1_circle_advection(n=50)
    eq1.integrate(0.1)
    err = np.abs(
        np.asarray(eq1.current_state.values) - np.asarray(exact1(0.1).values)
    )
    X, Y = [np.asarray(c) for c in eq1.grid.dense_coords()]
    near = np.abs(np.asarray(exact1(0.1).values)) < 0.2
    assert err[near].max() < 0.05

    eq2 = benchmarks.config2_zalesak(n=64)
    a0 = float(eq2.volume())
    eq2.integrate(0.25)  # quarter revolution
    assert abs(float(eq2.volume()) - a0) / a0 < 0.02

    eq3 = benchmarks.config3_vortex_spiral(n=64, period=2.0)
    a0 = float(eq3.volume())
    eq3.integrate(0.25)
    assert np.isfinite(np.asarray(eq3.current_state.values)).all()

    eq4 = benchmarks.config4_curvature_normal(n=48)
    p0 = float(eq4.perimeter())
    eq4.integrate(0.02)
    assert np.isfinite(np.asarray(eq4.current_state.values)).all()
