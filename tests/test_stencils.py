"""Stencil-operator unit tests on closed forms.

Oracle: reference ``test/test-derivatives.jl`` — f(x,y) = x^3 + x*y^2 with exact
derivative error bounds for all first/second/WENO operators.
"""

import numpy as np
import jax.numpy as jnp

from lsm_tpu import Grid, LinearExtrapolation, sample
from lsm_tpu.ops import stencils as st


def _setup():
    grid = Grid((-2.0, -2.0), (2.0, 2.0), (400, 200))
    phi = sample(lambda X, Y: X**3 + X * Y**2, grid, LinearExtrapolation())
    return grid, phi


def test_first_derivatives():
    grid, phi = _setup()
    h = grid.spacing
    g = st.PAD_WENO5
    p = phi.pad(g)
    X, Y = [np.asarray(c) for c in grid.dense_coords()]
    exact = [3 * X**2 + Y**2, 2 * X * Y]
    # interior window away from boundary effects (extrapolation BC is only exact
    # to its own degree; the reference samples a single interior node)
    win = (slice(8, -8), slice(8, -8))
    for ax in range(2):
        for op, tol in [(st.dp, 10 * h[ax]), (st.dm, 10 * h[ax]), (st.d0, 5 * h[ax] ** 2)]:
            err = np.abs(np.asarray(op(p, ax, h[ax], g, grid.shape)) - exact[ax])[win]
            assert err.max() < tol, (op.__name__, ax)
        for op in (st.weno5m, st.weno5p):
            err = np.abs(np.asarray(op(p, ax, h[ax], g, grid.shape)) - exact[ax])[win]
            assert err.max() < 5 * h[ax] ** 2, (op.__name__, ax)


def test_second_derivatives():
    grid, phi = _setup()
    h = grid.spacing
    g = st.PAD_ENO2
    p = phi.pad(g)
    X, Y = [np.asarray(c) for c in grid.dense_coords()]
    exact_diag = [6 * X, 2 * X]
    win = (slice(8, -8), slice(8, -8))
    for ax in range(2):
        for op, tol in [
            (st.d2c, 5 * h[ax]),
            (st.d2pp, 10 * h[ax]),
            (st.d2mm, 10 * h[ax]),
        ]:
            err = np.abs(np.asarray(op(p, ax, h[ax], g, grid.shape)) - exact_diag[ax])[win]
            assert err.max() < tol, (op.__name__, ax)
    exact_cross = 2 * Y
    for ax1, ax2 in [(0, 1), (1, 0)]:
        d = st.d2_mixed(p, ax1, ax2, h[ax1], h[ax2], g, grid.shape)
        err = np.abs(np.asarray(d) - exact_cross)[win]
        assert err.max() < 5 * h[0] * h[1]


def test_weno_exact_order_convergence():
    # WENO5 achieves 5th order on a smooth periodic profile
    from lsm_tpu import Periodic

    errs = []
    ns = [32, 64, 128]
    for n in ns:
        grid = Grid((0.0,), (2.0,), (n + 1,))
        phi = sample(lambda X: jnp.sin(np.pi * X), grid, Periodic())
        h = grid.spacing[0]
        p = phi.pad(st.PAD_WENO5)
        d = np.asarray(st.weno5m(p, 0, h, st.PAD_WENO5, grid.shape))
        x = np.asarray(grid.axis_coords(0))
        errs.append(np.abs(d - np.pi * np.cos(np.pi * x)).max())
    orders = [np.log(errs[i] / errs[i + 1]) / np.log(2) for i in range(2)]
    assert min(orders) > 4.5, (errs, orders)


def test_minmod():
    x = jnp.asarray([1.0, -1.0, 2.0, -3.0, 0.0])
    y = jnp.asarray([2.0, -0.5, -2.0, -4.0, 1.0])
    out = np.asarray(st.minmod(x, y))
    assert np.allclose(out, [1.0, -0.5, 0.0, -3.0, 0.0])


def test_godunov_norms_sdf():
    # for phi = |x| (1D SDF kink at 0), the Godunov norm should be ~1 away from the kink
    grid = Grid((-1.0,), (1.0,), (101,))
    phi = sample(lambda X: jnp.abs(X), grid, LinearExtrapolation())
    p = phi.pad(st.PAD_ENO2)
    gp, gm = st.godunov_norms(p, grid.spacing, st.PAD_ENO2, grid.shape)
    gp, gm = np.asarray(gp), np.asarray(gm)
    # away from the kink both norms are exactly 1
    assert np.allclose(gp[5:48], 1.0, atol=1e-10)
    assert np.allclose(gp[53:-5], 1.0, atol=1e-10)
    # at the kink (x=0): outward motion sees no admissible upwind slope (gp = 0),
    # inward motion sees both slopes (gm = sqrt(2))
    assert gp[50] < 1e-10
    assert np.isclose(gm[50], np.sqrt(2.0), atol=1e-10)
