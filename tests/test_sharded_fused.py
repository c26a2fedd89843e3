"""Fused Pallas kernels under shard_map (VERDICT r3 missing #2).

``make_sharded_evolve(..., fused=True)`` runs the padded-state fused stage on
each shard's local block with ppermute ghost refresh; the trajectory must
match the single-device :class:`FusedStepper` (same kernel, same adaptive
CFL) to floating-point tolerance on the 8-device CPU mesh, in interpret mode.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import lsm_tpu as lsm
from lsm_tpu.core.field import MeshField
from lsm_tpu.integrators.fused import FusedStepper, supports_fused
from lsm_tpu.parallel import make_sharded_evolve
from lsm_tpu.parallel.sharding import make_mesh, shard_field

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh")


def _single_device_fused_trajectory(terms, phi, t0, tf, integrator,
                                    max_steps=None):
    """Host-driven adaptive loop over the single-device FusedStepper —
    exactly what eq.integrate's fast path runs."""
    import math

    stepper = FusedStepper(terms, phi, integrator, interpret=True)
    P = stepper.pack(phi.values)
    t = float(t0)
    eps = float(jnp.finfo(phi.dtype).eps) * max(abs(tf), 1.0)
    n = 0
    while t <= tf - eps:
        if max_steps is not None and n >= max_steps:
            break
        dt = min(float(integrator.cfl) * float(stepper.cfl(P, t)), tf - t)
        P = stepper._step_impl(P, t, dt)
        t += dt
        n += 1
    return stepper.unpack(P), t, n


def _run_case(vel, phi, integrator, tf, max_steps=6):
    mesh = make_mesh(n_devices=8)
    grid = phi.grid
    terms = (lsm.AdvectionTerm(vel),)
    assert supports_fused(terms, phi)
    ev = make_sharded_evolve(integrator, mesh, grid, fused=True,
                             max_steps=max_steps, interpret=True)
    out_sh, t_sh, n_sh = ev(terms, shard_field(phi, mesh), 0.0, tf)
    ref_vals, t_ref, n_ref = _single_device_fused_trajectory(
        terms, phi, 0.0, tf, integrator, max_steps=max_steps)
    assert int(n_sh) == n_ref, (int(n_sh), n_ref)
    np.testing.assert_allclose(float(t_sh), t_ref, rtol=1e-12)
    a, b = np.asarray(out_sh.values), np.asarray(ref_vals)
    scale = max(np.abs(b).max(), 1.0)
    assert np.abs(a - b).max() < 1e-11 * scale, np.abs(a - b).max() / scale


def test_sharded_fused_analytic_periodic_rk3():
    """Analytic (in-kernel) velocity with GLOBAL coordinates via the origin
    offsets; periodic wrap across shard faces with the duplicated-endpoint
    correction."""
    grid = lsm.Grid((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), (32, 32, 128))
    phi = lsm.sample(
        lambda X, Y, Z: jnp.sin(2 * jnp.pi * X) * jnp.cos(2 * jnp.pi * Y)
        + 0.3 * jnp.sin(2 * jnp.pi * Z), grid, lsm.Periodic())
    vel = lambda xs, t: (0.5 - xs[1] + 0.0 * (xs[0] + xs[2]),
                         xs[0] - 0.5 + 0.0 * (xs[1] + xs[2]),
                         0.2 + 0.0 * (xs[0] + xs[1] + xs[2]))
    _run_case(vel, phi, lsm.RK3(), tf=0.05)


def test_sharded_fused_streamed_extrapolation_fe():
    """Streamed velocity arrays sharded alongside phi; extrapolation BCs on
    the physical faces of the outermost shards."""
    grid = lsm.Grid((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0), (32, 32, 128))
    rng = np.random.default_rng(3)
    phi = lsm.sample(
        lambda X, Y, Z: jnp.sqrt(X**2 + Y**2 + Z**2) - 0.5, grid,
        lsm.Extrapolation(1))
    vel = lsm.sample(
        lambda X, Y, Z: (-Y + 0.0 * (X + Z), X + 0.0 * (Y + Z),
                         0.1 + 0.0 * (X + Y + Z)),
        grid, vector=True)
    _run_case(vel, phi, lsm.ForwardEuler(), tf=0.03)


def test_sharded_fused_mixed_bcs_multi_term():
    """Mixed BC kinds per dimension + a multi-term Hamiltonian (advection +
    eikonal reinit), RK2."""
    grid = lsm.Grid((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), (32, 32, 128))
    phi = lsm.sample(
        lambda X, Y, Z: jnp.sqrt((X - 0.5)**2 + (Y - 0.4)**2 + (Z - 0.6)**2)
        - 0.25, grid,
        bc=[(lsm.Symmetry(), lsm.Extrapolation(2)), lsm.Extrapolation(1),
            lsm.Symmetry()])
    vel = lambda xs, t: (0.5 - xs[1] + 0.0 * (xs[0] + xs[2]),
                         xs[0] - 0.5 + 0.0 * (xs[1] + xs[2]),
                         0.0 * (xs[0] + xs[1] + xs[2]))
    mesh = make_mesh(n_devices=8)
    terms = (lsm.AdvectionTerm(vel),
             lsm.EikonalReinitializationTerm.from_initial(phi))
    assert supports_fused(terms, phi)
    ev = make_sharded_evolve(lsm.RK2(), mesh, grid, fused=True, max_steps=4,
                             interpret=True)
    out_sh, t_sh, n_sh = ev(terms, shard_field(phi, mesh), 0.0, 0.05)
    ref_vals, t_ref, n_ref = _single_device_fused_trajectory(
        terms, phi, 0.0, 0.05, lsm.RK2(), max_steps=4)
    assert int(n_sh) == n_ref
    a, b = np.asarray(out_sh.values), np.asarray(ref_vals)
    scale = max(np.abs(b).max(), 1.0)
    assert np.abs(a - b).max() < 1e-11 * scale, np.abs(a - b).max() / scale
