"""Reinitialization + velocity-extension oracles.

Adapted from reference ``test/test-reinitializer.jl`` (thresholds relaxed to the
PDE method's order — the reference uses a Newton closest-point solver; SURVEY.md
section 3.3 designates its accuracy as the oracle, not its machinery) and
``test/test-velocityextension.jl`` (kept essentially verbatim).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lsm_tpu import (
    Extrapolation,
    Grid,
    LinearExtrapolation,
    MeshField,
    Periodic,
    extend_along_normals,
    grad_norm,
    reinitialize,
    sample,
    volume,
)
from conftest import convergence_orders


def test_reinit_2d_circle():
    # phi = x^2 + y^2 - 0.25: right zero set, wrong gradient
    grid = Grid((-1.0, -1.0), (1.0, 1.0), (100, 100))
    phi = sample(lambda X, Y: X**2 + Y**2 - 0.25, grid, LinearExtrapolation())
    assert abs(float(volume(phi)) - np.pi / 4) < 1e-2

    out = reinitialize(phi)
    X, Y = [np.asarray(c) for c in grid.dense_coords()]
    exact = np.sqrt(X**2 + Y**2) - 0.5
    err = np.abs(np.asarray(out.values) - exact)
    # global error limited by the center kink; ~4e-3 measured at n=100
    assert err.max() < 1e-2, err.max()
    # near the interface the quadratic subcell fix (Min JCP 2010) pins the
    # zero contour to O(h^2)-ish: ~9e-5 measured at n=100
    near = np.abs(exact) < 0.1
    assert err[near].max() < 5e-4, err[near].max()
    # |grad phi| == 1 away from the center kink
    gn = np.asarray(grad_norm(out))
    r = np.sqrt(X**2 + Y**2)
    ring = (r > 0.2) & (r < 0.8)
    assert np.abs(gn[ring] - 1.0).max() < 0.1
    # volume (interface) preserved
    assert abs(float(volume(out)) - np.pi / 4) < 1e-2


def test_reinit_3d_sphere():
    grid = Grid((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0), (31, 31, 31))
    phi = sample(
        lambda X, Y, Z: (X**2 + Y**2 + Z**2) - 0.45**2, grid, LinearExtrapolation()
    )
    out = reinitialize(phi)
    X, Y, Z = [np.asarray(c) for c in grid.dense_coords()]
    exact = np.sqrt(X**2 + Y**2 + Z**2) - 0.45
    err = np.abs(np.asarray(out.values) - exact)
    near = np.abs(exact) < 0.15
    # ~1.8e-3 measured at 31^3 with the quadratic subcell fix
    assert err[near].max() < 5e-3, err[near].max()


def test_reinit_h_convergence():
    # input: exact SDF values (zero set already right); the PDE solve must not
    # degrade it below its own order. Measured near the interface.
    r = 0.5
    ns = [20, 40, 80]
    errors = []
    for n in ns:
        grid = Grid((-1.0, -1.0), (1.0, 1.0), (n, n))
        phi = sample(
            lambda X, Y: 1.5 * (jnp.sqrt(X**2 + Y**2) - r), grid, Extrapolation(2)
        )
        out = reinitialize(phi)
        X, Y = [np.asarray(c) for c in grid.dense_coords()]
        exact = np.sqrt(X**2 + Y**2) - r
        err = np.abs(np.asarray(out.values) - exact)
        near = np.abs(exact) < 0.2
        errors.append(err[near].max())
    # quadratic subcell fix: measured orders ~1.5-1.8 near the interface
    # (minmod limiting at curvature keeps it below clean 2nd order)
    assert min(convergence_orders(errors, ns)) >= 1.3, (errors,)


def test_reinit_band_width_freezes_far_field():
    grid = Grid((-1.0, -1.0), (1.0, 1.0), (64, 64))
    phi = sample(lambda X, Y: 2.0 * (jnp.sqrt(X**2 + Y**2) - 0.5), grid, LinearExtrapolation())
    out = reinitialize(phi, band_width=0.2)
    changed = np.asarray(out.values) != np.asarray(phi.values)
    far = np.abs(np.asarray(phi.values)) > 0.2
    assert not changed[far].any()
    X, Y = [np.asarray(c) for c in grid.dense_coords()]
    exact = np.sqrt(X**2 + Y**2) - 0.5
    near = np.abs(exact) < 0.05
    assert np.abs(np.asarray(out.values) - exact)[near].max() < 1e-2


def test_extend_plane():
    # phi = x; speeds sin(pi*y) seeded on the interface band extend constant in x
    grid = Grid((-1.0, -1.0), (1.0, 1.0), (81, 61))
    phi = sample(lambda X, Y: X + 0.0 * Y, grid)
    X, Y = [np.asarray(c) for c in grid.dense_coords()]
    dx = grid.min_spacing
    frozen = np.abs(X) <= dx
    F = np.where(frozen, np.sin(np.pi * Y), 0.0)
    F_seed = F.copy()

    out = extend_along_normals(jnp.asarray(F), phi, nb_iters=150, frozen=jnp.asarray(frozen))
    out = np.asarray(out)
    F_ref = np.sin(np.pi * Y)
    assert np.abs(out - F_ref).max() < 0.08
    assert (out[frozen] == F_seed[frozen]).all()


def test_extend_circle_normal_derivative():
    grid = Grid((-1.0, -1.0), (1.0, 1.0), (121, 121))
    R = 0.55
    phi = sample(lambda X, Y: jnp.sqrt(X**2 + Y**2) - R, grid, Periodic())
    X, Y = [np.asarray(c) for c in grid.dense_coords()]
    r = np.sqrt(X**2 + Y**2)
    dx = grid.min_spacing
    frozen = np.abs(np.asarray(phi.values)) <= 1.1 * dx
    v = np.where(frozen, Y / np.maximum(r, np.finfo(float).eps), 0.0)
    v_seed = v.copy()

    out = np.asarray(
        extend_along_normals(jnp.asarray(v), phi, nb_iters=100, frozen=jnp.asarray(frozen))
    )
    assert (out[frozen] == v_seed[frozen]).all()

    # n . grad(v) should be ~0 in the extension band off the seed
    vf = MeshField(jnp.asarray(out), grid, Periodic())
    from lsm_tpu.ops import stencils as st

    p = vf.pad(1)
    vx = np.asarray(st.d0(p, 0, grid.spacing[0], 1, grid.shape))
    vy = np.asarray(st.d0(p, 1, grid.spacing[1], 1, grid.shape))
    gp = phi.with_bcs(Periodic(), replace=True).pad(1)
    nx = np.asarray(st.d0(gp, 0, grid.spacing[0], 1, grid.shape))
    ny = np.asarray(st.d0(gp, 1, grid.spacing[1], 1, grid.shape))
    nrm = np.sqrt(nx**2 + ny**2)
    ok = nrm > 1e-10
    nx, ny = np.where(ok, nx / np.where(ok, nrm, 1), 0), np.where(ok, ny / np.where(ok, nrm, 1), 0)
    band = (np.abs(np.asarray(phi.values)) <= 5.0 * dx) & ~frozen & ok
    n_dot_grad = np.abs(nx * vx + ny * vy)[band]
    assert band.sum() > 100
    assert n_dot_grad.mean() < 0.12


def test_extend_argument_checks():
    grid = Grid((-1.0, -1.0), (1.0, 1.0), (41, 41))
    phi = sample(lambda X, Y: X + Y, grid)
    F = MeshField(jnp.zeros(grid.shape), grid)
    out = extend_along_normals(F, phi, nb_iters=5)
    assert isinstance(out, MeshField)

    with pytest.raises(ValueError):
        extend_along_normals(jnp.zeros(grid.shape, dtype=jnp.int32), phi)
    with pytest.raises(ValueError):
        extend_along_normals(jnp.zeros((2, 2)), phi)
    with pytest.raises(ValueError):
        extend_along_normals(
            jnp.zeros(grid.shape), phi, frozen=jnp.zeros((40, 41), dtype=bool)
        )
    with pytest.raises(ValueError):
        extend_along_normals(jnp.zeros(grid.shape), phi, nb_iters=-1)
    with pytest.raises(ValueError):
        extend_along_normals(jnp.zeros(grid.shape), phi, cfl=0.0)


def test_newton_vs_eikonal_reinit_accuracy_gap():
    """Quantify the accuracy gap between the two reinitialization methods
    (VERDICT r1 weak #7): the Newton closest-point oracle (reference
    ``reinitialize!``, O(h^(k+1)) at order k) must beat the subcell-fixed
    Eikonal PDE solve near the interface, and by a growing factor as h -> 0."""
    from lsm_tpu import reinitialize_newton

    r = 0.5
    ratios = {}
    errs = {}
    for n in (32, 64):
        grid = Grid((-1.0, -1.0), (1.0, 1.0), (n, n))
        # right zero set, distorted gradient: both methods must rebuild the SDF
        phi = sample(
            lambda X, Y: (jnp.sqrt(X**2 + Y**2) - r)
            * (1.5 + 0.5 * jnp.sin(2.0 * X) * jnp.cos(Y)),
            grid, Extrapolation(2),
        )
        X, Y = [np.asarray(c) for c in grid.dense_coords()]
        exact = np.sqrt(X**2 + Y**2) - r
        near = np.abs(exact) < 0.2

        e = {}
        for name, out in (
            ("newton", reinitialize_newton(phi, order=3)),
            ("eikonal", reinitialize(phi)),
        ):
            err = np.abs(np.asarray(out.values) - exact)
            e[name] = err[near].max()
        ratios[n] = e["eikonal"] / e["newton"]
        errs[n] = e
    # Newton is the high-order oracle: at least ~5x better already at n=32,
    # and the gap must widen with refinement (higher convergence order)
    assert ratios[32] > 5.0, (ratios, errs)
    assert ratios[64] > 2.0 * ratios[32], (ratios, errs)
    # absolute floor for the Newton method at n=64 (order 3 => O(h^4))
    assert errs[64]["newton"] < 5e-4, errs


def test_reinitialize_newton_overflow_fails_loud():
    """Seed-set truncation (cut cells > max_cut_cells) warns by default and
    raises with on_overflow="raise" (VERDICT r4 next #7); an adequate
    capacity stays silent."""
    import warnings

    import lsm_tpu as lsm
    from lsm_tpu import reinitialize_newton

    grid = lsm.Grid((-1.0, -1.0), (1.0, 1.0), (24, 24))
    phi = lsm.sample(lambda X, Y: jnp.sqrt(X**2 + Y**2) - 0.55,
                     grid, lsm.Extrapolation(1))
    with pytest.warns(RuntimeWarning, match="max_cut_cells"):
        reinitialize_newton(phi, order=2, upsample=1, max_cut_cells=4)
    with pytest.raises(RuntimeError, match="max_cut_cells"):
        reinitialize_newton(phi, order=2, upsample=1, max_cut_cells=4,
                            on_overflow="raise")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        reinitialize_newton(phi, order=2, upsample=1, max_cut_cells=4,
                            on_overflow="ignore")
        reinitialize_newton(phi, order=2, upsample=1, max_cut_cells=4096)
