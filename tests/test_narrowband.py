"""Narrow-band oracles: band-vs-dense agreement near the interface.

Mirrors reference ``test/test-narrow-band.jl`` and the narrow-band testsets of
``test/test-levelsetequation.jl:144-248``: same equation run dense and banded must
agree near the interface; band measures equal dense measures; the band follows a
moving interface.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lsm_tpu import (
    AdvectionTerm,
    CurvatureTerm,
    Extrapolation,
    Grid,
    LevelSetEquation,
    MeshField,
    NarrowBandField,
    Periodic,
    perimeter,
    reinitialize,
    sample,
    volume,
)
from lsm_tpu.models import shapes


def _nb_full_error(nb, full, nlayers):
    """Max |band - dense| over active nodes within half the band width of the
    interface (reference ``_nb_full_error``)."""
    gamma = nlayers * nb.grid.min_spacing
    mask = np.asarray(nb.active_mask) & (np.abs(np.asarray(nb.values)) < gamma / 2)
    diff = np.abs(np.asarray(nb.values) - np.asarray(full.values))
    return diff[mask].max() if mask.any() else 0.0


def test_band_construction():
    grid = Grid((-2.0, -2.0), (2.0, 2.0), (60, 60))
    phi = sample(lambda X, Y: jnp.sqrt(X**2 + Y**2) - 0.5, grid, Extrapolation(2))
    nb = NarrowBandField.from_field(phi, nlayers=3)
    m = np.asarray(nb.active_mask)
    assert 0 < m.sum() < grid.num_nodes // 2  # band is sparse
    # every node within ~1.5 h of the interface is active
    close = np.abs(np.asarray(phi.values)) <= 1.5 * grid.min_spacing
    assert (m | ~close).all()
    # nodes well inside the band radius are active, far nodes are not
    h = grid.min_spacing
    vals = np.abs(np.asarray(phi.values))
    assert m[vals <= 2.0 * h].all()
    assert not m[vals >= 8.0 * h].any()


def test_band_rejects_periodic():
    grid = Grid((-1.0, -1.0), (1.0, 1.0), (32, 32))
    phi = sample(lambda X, Y: jnp.sqrt(X**2 + Y**2) - 0.5, grid)
    with pytest.raises(ValueError):
        NarrowBandField(phi.values, grid, Periodic())


def test_band_measures_match_dense():
    grid = Grid((-2.0, -2.0), (2.0, 2.0), (120, 120))
    cases = [
        lambda X, Y: jnp.sqrt(X**2 + Y**2) - 0.5,  # compact circle
        lambda X, Y: jnp.minimum(  # two components
            jnp.sqrt((X + 1.0) ** 2 + Y**2) - 0.4,
            jnp.sqrt((X - 1.0) ** 2 + Y**2) - 0.3,
        ),
        lambda X, Y: jnp.sqrt(X**2 + (Y + 1.8) ** 2) - 0.7,  # clipped by the border
    ]
    for f in cases:
        phi = sample(f, grid, Extrapolation(2))
        nb = NarrowBandField.from_field(phi)
        assert np.isclose(float(volume(nb)), float(volume(phi)), rtol=1e-12)
        assert np.isclose(float(perimeter(nb)), float(perimeter(phi)), rtol=1e-12)


def test_band_advection_matches_full():
    # reference test: 60x60, u=(1,0), tf=0.1, err < 1e-3 near interface
    grid = Grid((-2.0, -2.0), (2.0, 2.0), (60, 60))
    phi = sample(lambda X, Y: jnp.sqrt(X**2 + Y**2) - 0.5, grid)
    u = lambda xs, t: (jnp.ones_like(xs[0] + xs[1]), jnp.zeros_like(xs[0] + xs[1]))
    bc = Extrapolation(2)
    eq_nb = LevelSetEquation(
        terms=(AdvectionTerm(u),), ic=NarrowBandField.from_field(phi, nlayers=5), bc=bc
    )
    eq_full = LevelSetEquation(terms=(AdvectionTerm(u),), ic=phi, bc=bc)
    eq_full.integrate(0.1)
    eq_nb.integrate(0.1)
    assert isinstance(eq_nb.current_state, NarrowBandField)
    assert _nb_full_error(eq_nb.current_state, eq_full.current_state, 5) < 1e-3


def test_band_full_rotation():
    # reference: 40x40, circle at (0.8, 0), rigid rotation by 2 pi, err < 0.02
    grid = Grid((-2.0, -2.0), (2.0, 2.0), (40, 40))
    phi = sample(lambda X, Y: jnp.sqrt((X - 0.8) ** 2 + Y**2) - 0.5, grid)
    u = shapes.rigid_rotation_velocity()
    bc = Extrapolation(2)
    eq_nb = LevelSetEquation(
        terms=(AdvectionTerm(u),), ic=NarrowBandField.from_field(phi), bc=bc
    )
    eq_full = LevelSetEquation(terms=(AdvectionTerm(u),), ic=phi, bc=bc)
    eq_full.integrate(2 * np.pi)
    # the reference re-distances the band along the way (posthook reinit,
    # test-levelsetequation.jl:202); with the PDE reinitializer the right cadence
    # is every ~20 steps — per-step calls would accumulate its O(h^2) anchor bias
    h = grid.min_spacing
    count = {"n": 0}

    def reinit_hook(e):
        count["n"] += 1
        if count["n"] % 20 == 0:
            e.state = reinitialize(e.state, band_width=3 * h, cfl=0.45)

    eq_nb.integrate(2 * np.pi, posthook=reinit_hook)
    nb = eq_nb.current_state
    assert int(nb.active_count()) > 0
    assert _nb_full_error(nb, eq_full.current_state, 3) < 0.02
    # the band followed the interface all the way around
    X, Y = [np.asarray(c) for c in grid.dense_coords()]
    exact = np.sqrt((X - 0.8) ** 2 + Y**2) - 0.5
    m = np.asarray(nb.active_mask)
    assert m[np.abs(exact) <= grid.min_spacing].all()


def test_band_star_rotation():
    # reference: 40x40 star, rotation by pi, err < 0.05
    grid = Grid((-1.0, -1.0), (1.0, 1.0), (40, 40))
    phi = sample(shapes.star(), grid)
    u = shapes.rigid_rotation_velocity()
    bc = Extrapolation(2)
    eq_nb = LevelSetEquation(
        terms=(AdvectionTerm(u),), ic=NarrowBandField.from_field(phi), bc=bc
    )
    eq_full = LevelSetEquation(terms=(AdvectionTerm(u),), ic=phi, bc=bc)
    eq_full.integrate(np.pi)
    eq_nb.integrate(np.pi)
    assert int(eq_nb.current_state.active_count()) > 0
    assert _nb_full_error(eq_nb.current_state, eq_full.current_state, 3) < 0.05


def test_band_curvature_spiral_matches_full():
    # reference test-levelsetequation.jl:174-194 — multi-arm spiral under
    # curvature flow stresses band rebuild (inter-arm gaps narrower than band)
    grid = Grid((-1.0, -1.0), (1.0, 1.0), (50, 50))
    r0, th0, alpha = 0.5, -np.pi / 3, np.pi / 100
    c, s = np.cos(alpha), np.sin(alpha)
    R = np.array([[c, -s], [s, c]])
    M = R @ np.diag([1 / 0.06**2, 1 / (4 * np.pi**2)]) @ R.T

    def spiral(X, Y):
        r = jnp.sqrt(X**2 + Y**2)
        th = jnp.arctan2(Y, X)
        best = None
        for i in range(5):
            v0 = r - r0
            v1 = th + (2 * i - 4) * np.pi - th0
            q = jnp.sqrt(M[0, 0] * v0**2 + 2 * M[0, 1] * v0 * v1 + M[1, 1] * v1**2) - 1
            best = q if best is None else jnp.minimum(best, q)
        return best

    phi = sample(spiral, grid)
    bc = Extrapolation(2)
    eq_nb = LevelSetEquation(
        terms=(CurvatureTerm(-0.1),), ic=NarrowBandField.from_field(phi), bc=bc
    )
    eq_full = LevelSetEquation(terms=(CurvatureTerm(-0.1),), ic=phi, bc=bc)
    eq_full.integrate(0.1)
    eq_nb.integrate(0.1)
    assert _nb_full_error(eq_nb.current_state, eq_full.current_state, 3) < 0.05


def test_band_with_reinit_posthook():
    # advect + reinitialize every step; final state near-interface matches the
    # translated exact SDF (reference test-levelsetequation.jl:156-172, tol 0.01)
    grid = Grid((-2.0, -2.0), (2.0, 2.0), (60, 60))
    phi = sample(lambda X, Y: jnp.sqrt(X**2 + Y**2) - 0.5, grid)
    u = lambda xs, t: (jnp.ones_like(xs[0] + xs[1]), jnp.zeros_like(xs[0] + xs[1]))
    eq = LevelSetEquation(
        terms=(AdvectionTerm(u),), ic=NarrowBandField.from_field(phi), bc=Extrapolation(2)
    )
    h = grid.min_spacing

    def reinit_hook(e):
        e.state = reinitialize(e.state, band_width=3 * h, cfl=0.45)

    eq.integrate(0.1, posthook=reinit_hook)
    nb = eq.current_state
    X, Y = [np.asarray(c) for c in grid.dense_coords()]
    exact = np.sqrt((X - 0.1) ** 2 + Y**2) - 0.5
    gamma = 3 * h
    m = np.asarray(nb.active_mask) & (np.abs(np.asarray(nb.values)) < gamma / 2)
    assert m.any()
    assert np.abs(np.asarray(nb.values) - exact)[m].max() < 0.01


def test_band_masked_with_values():
    grid = Grid((-1.0, -1.0), (1.0, 1.0), (48, 48))
    phi = sample(lambda X, Y: jnp.sqrt(X**2 + Y**2) - 0.5, grid, Extrapolation(1))
    nb = NarrowBandField.from_field(phi)
    out = nb.with_values(jnp.zeros_like(nb.values))
    out_np = np.asarray(out.values)
    cm = np.asarray(nb.compute_mask)
    assert (out_np[cm] == 0).all()  # compute band written
    assert (out_np[~cm] == np.asarray(phi.values)[~cm]).all()  # off-band frozen


def test_band_adopted_sparse_vector_velocity_update_func():
    """Reference ``test-levelsetequation.jl:223-248``: a vector velocity held
    only on the level set's band (the *adopted-band* pattern), refreshed from
    the state's active set before each stage via the term's ``update_func``,
    then read through the WENO5 advection stencil. In the masked-dense design
    the sparse Dict becomes values defined on the state's compute mask and
    zero elsewhere — off-band values are never read because updates only land
    on the compute band."""
    grid = Grid((-2.0, -2.0), (2.0, 2.0), (60, 60))
    phi = sample(lambda X, Y: jnp.sqrt(X**2 + Y**2) - 0.5, grid)
    bc = Extrapolation(2)
    velfun = lambda xs, t: (-xs[1] + 0.0 * xs[0], xs[0] + 0.0 * xs[1])

    def refill(u, psi, t):
        # rebuild the sparse field from the state's current active set: values
        # exist on the compute band, a poison value elsewhere proves the
        # stencil never consumes off-band velocity entries
        xs = psi.grid.coords(dtype=psi.dtype)
        comps = jnp.stack(
            [jnp.broadcast_to(c, psi.shape) for c in velfun(xs, t)]
        )
        cm = psi.compute_mask
        vals = jnp.where(cm[None], comps, jnp.inf)
        return MeshField(vals, psi.grid, _normalized=True)

    ic = NarrowBandField.from_field(phi, nlayers=5)
    vel0 = refill(None, ic, 0.0)
    eq_nb = LevelSetEquation(
        terms=(AdvectionTerm(vel0, update_func=refill),), ic=ic, bc=bc
    )
    eq_full = LevelSetEquation(terms=(AdvectionTerm(velfun),), ic=phi, bc=bc)
    eq_full.integrate(0.3)
    eq_nb.integrate(
        0.3, posthook=lambda eq: setattr(
            eq, "state", reinitialize(eq.state, band_width=5 * grid.min_spacing)
        )
    )
    assert eq_nb.current_state.values.ndim == 2
    assert np.isfinite(np.asarray(eq_nb.current_state.values)).all()
    assert _nb_full_error(eq_nb.current_state, eq_full.current_state, 5) < 0.05
