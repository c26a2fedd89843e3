"""Display pinning (reference ``test/test-show.jl``): the human-readable trees
for grids, fields, BCs, integrators and equations are part of the API surface —
pin their load-bearing lines so refactors don't silently degrade them."""

import jax.numpy as jnp

import lsm_tpu as lsm


def test_grid_show():
    g = lsm.Grid((0, 0), (1, 1), (10, 4))
    s = repr(g)
    assert s.startswith("Grid in R^2")
    assert "domain:  [0, 1] x [0, 1]" in s
    assert "nodes:   10 x 4" in s
    assert "spacing: h = (0.1111, 0.3333)" in s


def test_bc_show():
    # reference pins: Periodic / Neumann / Linear extrapolation /
    # Degree 4 extrapolation / Symmetry (test-show.jl BoundaryConditions set)
    assert str(lsm.Periodic()) == "Periodic"
    assert str(lsm.Neumann()) == "Neumann"
    assert str(lsm.LinearExtrapolation()) == "Linear extrapolation"
    assert str(lsm.Extrapolation(4)) == "Degree 4 extrapolation"
    assert str(lsm.Symmetry()) == "Symmetry"


def test_meshfield_show():
    grid = lsm.Grid((-1, -1), (1, 1), (5, 5))
    phi = lsm.sample(lambda X, Y: X**2 + Y**2 - 0.25, grid)
    s = repr(phi)
    assert s.startswith("MeshField (scalar, float64)")
    assert "grid: 5 x 5 nodes in R^2" in s
    assert "bcs:  none" in s

    s = repr(phi.with_bcs(lsm.Neumann()))
    assert "bcs:  Neumann (all)" in s

    u = lsm.sample(lambda X, Y: (X, Y), grid, vector=True)
    assert repr(u).startswith("MeshField (vector, float64)")

    # mixed per-dimension BCs print per-axis
    s = repr(phi.with_bcs([lsm.Neumann(), lsm.Symmetry()]))
    assert "x: Neumann" in s and "y: Symmetry" in s


def test_narrowband_show():
    grid = lsm.Grid((-2, -2), (2, 2), (40, 40))
    phi = lsm.sample(
        lambda X, Y: jnp.sqrt(X**2 + Y**2) - 0.5, grid, lsm.Extrapolation(2)
    )
    nb = lsm.NarrowBandField.from_field(phi)
    s = repr(nb)
    assert s.startswith("NarrowBandField")
    assert "active:" in s and "3-layer halo" in s
    assert "Degree 2 extrapolation (all)" in s


def test_integrator_show():
    assert repr(lsm.RK3()).splitlines()[0] == "RK3 (3rd order TVD Runge-Kutta)"
    assert "cfl: 0.3" in repr(lsm.ForwardEuler(cfl=0.3))
    assert repr(lsm.SemiImplicitI2OE()).splitlines()[0].startswith(
        "SemiImplicitI2OE"
    )


def test_equation_show():
    grid = lsm.Grid((-1, -1), (1, 1), (5, 5))
    phi = lsm.sample(lambda X, Y: X**2 + Y**2 - 0.25, grid)
    eq = lsm.LevelSetEquation(
        terms=lsm.NormalMotionTerm(1.0), ic=phi, bc=lsm.Neumann()
    )
    s = repr(eq)
    # the PDE line is the reference's headline (levelsetequation.jl:101-117)
    assert "phi_t + NormalMotionTerm = 0" in s
    assert "integrator: RK3 (3rd order TVD Runge-Kutta)" in s
    assert "t: 0.0" in s
    assert "state: (5, 5) float64" in s
