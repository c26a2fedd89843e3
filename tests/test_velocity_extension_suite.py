"""Velocity-extension breadth oracles ported from the reference suite
(``/root/reference/test/test-velocityextension.jl``): the update-hook protocol,
periodic circle extension quality (``n . grad F ~ 0`` off the interface),
classical curvature-driven reconstruction cycles in 2D and 3D, and the crystal
anisotropy-reduction regression."""

import jax.numpy as jnp
import numpy as np

import lsm_tpu as lsm
from lsm_tpu import (
    Grid,
    LevelSetEquation,
    MeshField,
    NormalMotionTerm,
    EikonalReinitializationTerm,
    ForwardEuler,
    Periodic,
    extend_along_normals,
    sample,
)
from lsm_tpu.terms.terms import update_terms


def test_normal_motion_update_hook():
    # reference test-velocityextension.jl:4-17 — update_func refreshes the
    # speed before term evaluation; here it returns the new coefficient.
    grid = Grid((-1.0, -1.0), (1.0, 1.0), (21, 21))
    phi = sample(lambda X, Y: jnp.sqrt(X**2 + Y**2) - 0.5, grid, Periodic())
    speed = MeshField(jnp.zeros(grid.shape), grid)
    term = NormalMotionTerm(
        speed, update_func=lambda v, f, t: v.with_values(jnp.full(f.shape, 2 * t))
    )
    (new_term,) = update_terms((term,), phi, 0.3)
    assert np.allclose(np.asarray(new_term.speed.values), 0.6)


def test_circle_periodic_extension_quality():
    # reference test-velocityextension.jl:46-86 — extend v = y/r seeded on
    # |phi| <= 1.1 h off the circle; frozen nodes exact, n . grad v ~ 0 in a
    # 5 h band.
    grid = Grid((-1.0, -1.0), (1.0, 1.0), (121, 121))
    R = 0.55
    phi = sample(lambda X, Y: jnp.sqrt(X**2 + Y**2) - R, grid, Periodic())
    X, Y = grid.dense_coords()
    r = jnp.sqrt(X**2 + Y**2)
    h = grid.min_spacing
    frozen = jnp.abs(phi.values) <= 1.1 * h
    v_seed = jnp.where(frozen, Y / jnp.maximum(r, 1e-300), 0.0)

    v = extend_along_normals(v_seed, phi, nb_iters=100, cfl=0.45, frozen=frozen)
    assert np.array_equal(np.asarray(v)[np.asarray(frozen)],
                          np.asarray(v_seed)[np.asarray(frozen)])

    vf = MeshField(v, grid, phi.bcs)
    n = lsm.normal(phi)
    gv = lsm.gradient(vf)
    n_dot_grad = jnp.abs(jnp.sum(n * gv, axis=0))
    band = (jnp.abs(phi.values) <= 5.0 * h) & ~frozen & ~jnp.any(jnp.isnan(n), axis=0)
    nb_samples = int(jnp.sum(band))
    assert nb_samples > 100
    assert float(jnp.sum(jnp.where(band, n_dot_grad, 0.0)) / nb_samples) < 0.12


def _run_curvature_extension_cycle(phi, *, nsteps, dt_motion, dt_reinit,
                                   ext_iters, seed_band=1.5):
    """Curvature speed seeded on the interface, extended along normals, driving
    normal motion — the classical reconstruction cycle
    (test-velocityextension.jl:106-151). As in the reference, the Eikonal
    equation integrates an independent copy of the state."""
    grid = phi.grid
    h = grid.min_spacing

    def update_speed(v, state, t):
        frozen = jnp.abs(state.values) <= seed_band * h
        vals = jnp.where(frozen, -lsm.curvature(state), 0.0)
        return extend_along_normals(vals, state, frozen=frozen, cfl=0.3,
                                    nb_iters=ext_iters)

    speed0 = jnp.zeros(grid.shape)
    eq_motion = LevelSetEquation(
        terms=(NormalMotionTerm(speed0, update_func=update_speed),),
        ic=phi, bc=Periodic(), integrator=ForwardEuler(cfl=0.35),
    )
    eq_reinit = LevelSetEquation(
        terms=(EikonalReinitializationTerm(),),
        ic=phi, bc=Periodic(), integrator=ForwardEuler(cfl=0.45),
    )
    for _ in range(nsteps):
        eq_motion.integrate(eq_motion.current_time + dt_motion, dt_motion)
        eq_reinit.integrate(eq_reinit.current_time + dt_reinit, dt_reinit)
    return eq_motion.current_state


def _interface_radius_stats(phi, band=1.5):
    coords = phi.grid.dense_coords()
    r = jnp.sqrt(sum(c**2 for c in coords))
    mask = jnp.abs(phi.values) <= band * phi.grid.min_spacing
    radii = np.asarray(r)[np.asarray(mask)]
    return float(radii.mean()), float(radii.std()), radii.size


def test_classical_circular_reconstruction_2d():
    # reference test-velocityextension.jl:170-195
    grid = Grid((-0.5, -0.5), (0.5, 0.5), (128, 128))
    R0 = 0.45
    phi = sample(lambda X, Y: jnp.sqrt(X**2 + Y**2) - R0, grid)
    h = grid.min_spacing
    phif = _run_curvature_extension_cycle(
        phi, nsteps=3, dt_motion=1.2e-3, dt_reinit=float(h), ext_iters=30
    )
    rmean, rstd, npts = _interface_radius_stats(phif, band=1.5)
    assert npts > 300
    assert rmean < R0  # curvature flow shrinks the circle
    assert rstd / rmean < 0.05  # and keeps it round


def test_classical_spherical_reconstruction_3d():
    # reference test-velocityextension.jl:197-215
    grid = Grid((-0.5, -0.5, -0.5), (0.5, 0.5, 0.5), (48, 48, 48))
    R0 = 0.45
    phi = sample(lambda X, Y, Z: jnp.sqrt(X**2 + Y**2 + Z**2) - R0, grid)
    h = grid.min_spacing
    phif = _run_curvature_extension_cycle(
        phi, nsteps=2, dt_motion=7.0e-4, dt_reinit=0.15 * float(h), ext_iters=22
    )
    rmean, rstd, npts = _interface_radius_stats(phif, band=1.5)
    assert npts > 2000
    assert rmean < R0
    assert rstd / rmean < 0.09


def test_crystal_normal_extension_signs():
    # reference test-velocityextension.jl:228-290 — a 6-fold flower: extended
    # -curvature speed is negative at the tips (bulges retreat) and positive
    # at the kinks (notches fill); one short step reduces shape anisotropy.
    grid = Grid((-1.0, -1.0), (1.0, 1.0), (161, 161))
    R, deformation, nfacets = 0.6, 0.45, 6
    phi = sample(
        lambda X, Y: jnp.sqrt(X**2 + Y**2)
        - R * (1 + deformation * jnp.cos(nfacets * jnp.arctan2(Y, X))),
        grid, Periodic(),
    )
    h = grid.min_spacing
    frozen = jnp.abs(phi.values) <= 1.5 * h
    v = jnp.where(frozen, -lsm.curvature(phi), 0.0)
    v = extend_along_normals(v, phi, frozen=frozen, cfl=0.3, nb_iters=45)

    def closest_index(x, y):
        i = int(round((x - grid.lo[0]) / grid.spacing[0]))
        j = int(round((y - grid.lo[1]) / grid.spacing[1]))
        return (int(np.clip(i, 0, grid.shape[0] - 1)),
                int(np.clip(j, 0, grid.shape[1] - 1)))

    vn = np.asarray(v)
    tips, kinks = [], []
    for k in range(nfacets):
        th_tip = 2 * np.pi * k / nfacets
        r_tip = R * (1 + deformation * np.cos(nfacets * th_tip))
        tips.append(vn[closest_index(r_tip * np.cos(th_tip), r_tip * np.sin(th_tip))])
        th_kink = (2 * k + 1) * np.pi / nfacets
        r_kink = R * (1 + deformation * np.cos(nfacets * th_kink))
        kinks.append(vn[closest_index(r_kink * np.cos(th_kink), r_kink * np.sin(th_kink))])
    assert np.mean(tips) < 0
    assert np.mean(kinks) > 0

    def cv(state):
        rmean, rstd, _ = _interface_radius_stats(state, band=1.5)
        return rstd / rmean

    cv0 = cv(phi)
    eq = LevelSetEquation(
        terms=(NormalMotionTerm(MeshField(v, grid)),), ic=phi,
        integrator=ForwardEuler(cfl=0.3),
    )
    eq.integrate(2.5e-3, 2.5e-3)
    assert cv(eq.current_state) < cv0
