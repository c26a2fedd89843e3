"""End-to-end evolution oracles: method-of-exact-solutions convergence orders.

Mirrors reference ``test/test-levelsetequation.jl`` and ``test/test-timestepping.jl``.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lsm_tpu import (
    AdvectionTerm,
    CurvatureTerm,
    EikonalReinitializationTerm,
    Extrapolation,
    ForwardEuler,
    Grid,
    LevelSetEquation,
    LinearExtrapolation,
    Neumann,
    NormalMotionTerm,
    Periodic,
    RK2,
    RK3,
    sample,
)
from conftest import convergence_orders


def _advect_1d_error(integrator, n, u=1.0, tf=0.5, scheme="weno5"):
    grid = Grid((-1.0,), (1.0,), (n,))
    phi = sample(lambda X: jnp.sin(jnp.pi * X), grid)
    eq = LevelSetEquation(
        terms=(AdvectionTerm(lambda xs, t: (jnp.full_like(xs[0], u),), scheme=scheme),),
        ic=phi,
        bc=Periodic(),
        integrator=integrator,
    )
    eq.integrate(tf)
    x = np.asarray(grid.axis_coords(0))
    exact = np.sin(np.pi * (x - u * tf))
    return np.abs(np.asarray(eq.current_state.values) - exact).max()


def test_weno5_spatial_order():
    # WENO5 is 5th-order in space; cfl=1e-2 suppresses the O(dt^3) temporal error
    ns = [20, 40, 80]
    errors = [_advect_1d_error(RK3(cfl=1e-2), n) for n in ns]
    assert min(convergence_orders(errors, ns)) >= 4.5, errors


def test_upwind_spatial_order():
    ns = [50, 100, 200]
    errors = [_advect_1d_error(RK3(cfl=1e-2), n, scheme="upwind") for n in ns]
    assert min(convergence_orders(errors, ns)) >= 0.8, errors


@pytest.mark.parametrize(
    "integrator,threshold",
    [(ForwardEuler(), 0.05), (RK2(), 1e-3), (RK3(), 1e-5)],
)
def test_integrator_accuracy(integrator, threshold):
    assert _advect_1d_error(integrator, 200) < threshold


@pytest.mark.parametrize(
    "integrator,expected", [(ForwardEuler(), 1), (RK2(), 2), (RK3(), 3)]
)
def test_temporal_orders(integrator, expected):
    ns = [50, 100, 200]
    errors = [_advect_1d_error(integrator, n) for n in ns]
    assert min(convergence_orders(errors, ns)) >= expected - 0.5, errors


def test_normal_motion_expanding_circle_order():
    # phi0 = |x| - r0 expands at speed v: exact phi(x,t) = |x| - r0 - v t
    r0, v, tf = 0.5, 0.5, 0.2
    ns = [30, 60, 120]
    errors = []
    for n in ns:
        grid = Grid((-2.0, -2.0), (2.0, 2.0), (n, n))
        phi = sample(lambda X, Y: jnp.sqrt(X**2 + Y**2) - r0, grid)
        eq = LevelSetEquation(
            terms=(NormalMotionTerm(lambda xs, t: v),),
            ic=phi,
            bc=Extrapolation(2),
            integrator=RK3(),
        )
        eq.integrate(tf)
        X, Y = [np.asarray(c) for c in grid.dense_coords()]
        r = np.sqrt(X**2 + Y**2)
        exact = r - r0 - v * tf
        err = np.abs(np.asarray(eq.current_state.values) - exact)
        err = np.where((r >= 0.5) & (r <= 1.5), err, 0.0)
        errors.append(err.max())
    assert min(convergence_orders(errors, ns)) >= 1.5, errors


def test_curvature_flow_circle_order():
    # 2D curvature flow of a circle: phi(x,t) = sqrt(|x|^2 - 2 b t) - r0
    r0, b, tf = 0.7, -0.1, 0.2
    ns = [30, 60, 120]
    errors = []
    for n in ns:
        grid = Grid((-2.0, -2.0), (2.0, 2.0), (n, n))
        phi = sample(lambda X, Y: jnp.sqrt(X**2 + Y**2) - r0, grid)
        eq = LevelSetEquation(
            terms=(CurvatureTerm(lambda xs, t: b),),
            ic=phi,
            bc=Extrapolation(2),
            integrator=RK3(),
        )
        eq.integrate(tf)
        X, Y = [np.asarray(c) for c in grid.dense_coords()]
        r = np.sqrt(X**2 + Y**2)
        exact = np.sqrt(r**2 - 2 * b * tf) - r0
        err = np.abs(np.asarray(eq.current_state.values) - exact)
        err = np.where((r >= 0.5) & (r <= 1.5), err, 0.0)
        errors.append(err.max())
    assert min(convergence_orders(errors, ns)) >= 1.5, errors


def test_eikonal_term_scaled_sdf():
    # phi = 2*(x - 0.3) has the right zero set but |grad| = 2; pseudo-time marching
    # with the frozen-sign Eikonal term should converge toward x - 0.3
    grid = Grid((-1.0,), (1.0,), (101,))
    phi = sample(lambda X: 2.0 * (X - 0.3), grid)
    eq = LevelSetEquation(
        terms=(EikonalReinitializationTerm.from_initial(phi.with_bcs(LinearExtrapolation())),),
        ic=phi,
        bc=LinearExtrapolation(),
    )
    eq.integrate(2.0)
    x = np.asarray(grid.axis_coords(0))
    out = np.asarray(eq.current_state.values)
    err = np.where(np.abs(out) > 0.5, 0.0, np.abs(out - (x - 0.3)))
    assert err.max() < 0.05


def test_nan_robustness_curvature_flat_center():
    grid = Grid((-2.0, -2.0), (2.0, 2.0), (31, 31))
    phi = sample(lambda X, Y: jnp.sqrt(X**2 + Y**2) - 0.7, grid)
    eq = LevelSetEquation(
        terms=(CurvatureTerm(-0.1),), ic=phi, bc=Neumann(), integrator=RK2()
    )
    eq.integrate(0.1)
    assert np.isfinite(np.asarray(eq.current_state.values)).all()


def test_nan_robustness_eikonal_flat_field():
    grid = Grid((-1.0,), (1.0,), (31,))
    phi = sample(lambda X: 0.0 * X, grid)
    eq = LevelSetEquation(
        terms=(EikonalReinitializationTerm(),), ic=phi, bc=Neumann(), integrator=RK2()
    )
    eq.integrate(0.1)
    assert np.isfinite(np.asarray(eq.current_state.values)).all()


def test_cfl_formulas():
    from lsm_tpu import compute_cfl

    # advection: dt = 1 / sum(|u_d|/h_d)
    grid = Grid((-1.0,), (1.0,), (100,))
    phi = sample(lambda X: X, grid, Neumann())
    term = AdvectionTerm(lambda xs, t: (jnp.full_like(xs[0], 2.0),))
    assert np.isclose(float(compute_cfl((term,), phi, 0.0)), grid.spacing[0] / 2.0)

    # curvature: dt = min(h)^2 / (2|b|)
    grid2 = Grid((-1.0, -1.0), (1.0, 1.0), (50, 50))
    phi2 = sample(lambda X, Y: jnp.sqrt(X**2 + Y**2) - 0.5, grid2, Neumann())
    term2 = CurvatureTerm(0.5)
    assert np.isclose(
        float(compute_cfl((term2,), phi2, 0.0)), grid2.min_spacing**2 / (2 * 0.5)
    )

    # normal motion: dt = 1 / (|v| * sum 1/h_d)
    term3 = NormalMotionTerm(3.0)
    assert np.isclose(float(compute_cfl((term3,), phi, 0.0)), grid.spacing[0] / 3.0)


def test_hooks_and_step_count():
    grid = Grid((-1.0,), (1.0,), (64,))
    phi = sample(lambda X: jnp.sin(jnp.pi * X), grid)
    eq = LevelSetEquation(
        terms=(AdvectionTerm(lambda xs, t: (jnp.ones_like(xs[0]),)),),
        ic=phi,
        bc=Periodic(),
    )
    calls = {"pre": 0, "post": 0}
    eq.integrate(0.1, prehook=lambda e: calls.__setitem__("pre", calls["pre"] + 1),
                 posthook=lambda e: calls.__setitem__("post", calls["post"] + 1))
    assert calls["pre"] == calls["post"] > 0
    assert np.isclose(eq.t, 0.1)


def test_max_steps_reports_reached_time():
    # an early stop on max_steps must report the time actually integrated to,
    # not tf (round-1 regression: equation.py set self.t = tf unconditionally)
    def make_eq():
        grid = Grid((-1.0,), (1.0,), (64,))
        phi = sample(lambda X: jnp.sin(jnp.pi * X), grid)
        return LevelSetEquation(
            terms=(AdvectionTerm(lambda xs, t: (jnp.ones_like(xs[0]),)),),
            ic=phi, bc=Periodic(),
        )

    tf = 1.0
    # device-resident branch (no hooks)
    eq = make_eq()
    eq.integrate(tf, max_steps=3)
    assert eq.t < tf
    assert eq.t > 0.0
    t3 = eq.t
    # host-loop branch (hooks installed) stops at the same time
    eq2 = make_eq()
    eq2.integrate(tf, max_steps=3, posthook=lambda e: None)
    assert eq2.t < tf
    assert np.isclose(eq2.t, t3, rtol=1e-6)
    # continuing to tf still lands exactly on tf
    eq2.integrate(tf)
    assert eq2.t == tf


def test_bc_resolution_rules():
    grid = Grid((-1.0,), (1.0,), (16,))
    phi = sample(lambda X: X, grid)
    term = AdvectionTerm(lambda xs, t: (jnp.ones_like(xs[0]),))
    with pytest.raises(ValueError):
        LevelSetEquation(terms=(term,), ic=phi)  # no BCs anywhere
    with pytest.warns(UserWarning):
        LevelSetEquation(terms=(term,), ic=phi.with_bcs(Neumann()), bc=Periodic())
    eq = LevelSetEquation(terms=(term,), ic=phi.with_bcs(Neumann()))
    assert isinstance(eq.boundary_conditions[0][0], Extrapolation)


def test_state_dependent_velocity_update_func():
    # update_func refreshes the velocity from the state before each stage
    grid = Grid((-1.0,), (1.0,), (64,))
    phi = sample(lambda X: jnp.sin(jnp.pi * X), grid)

    def refill(vel, phi_field, t):
        # must preserve the velocity pytree structure (stacked (ndim, *shape) array)
        return jnp.ones_like(vel)

    term = AdvectionTerm(jnp.zeros((1,) + grid.shape), update_func=refill)
    eq = LevelSetEquation(terms=(term,), ic=phi, bc=Periodic())
    eq.integrate(0.25)
    x = np.asarray(grid.axis_coords(0))
    exact = np.sin(np.pi * (x - 0.25))
    assert np.abs(np.asarray(eq.current_state.values) - exact).max() < 1e-3
