"""Differentiable SHARDED fused path (VERDICT r4 next #5).

``make_sharded_fused_rollout`` must produce gradients that match the
single-device fused rollout on the 8-device CPU mesh: the custom VJP's
backward is the per-shard Pallas ``stage_backward`` (pre-folded mode)
composed with the TRANSPOSE of the sharded ghost refresh (reversed ppermute
on interior faces, BC fold on physical faces). Both the Pallas-backward
shards (local n1 large enough for backward tiles) and the jnp-fallback
shards (small local blocks) are exercised.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import lsm_tpu as lsm
from lsm_tpu.integrators import loop as _loop
from lsm_tpu.integrators.fused import FusedStepper, supports_fused
from lsm_tpu.parallel.fused_evolve import make_sharded_fused_rollout
from lsm_tpu.parallel.sharding import make_mesh, shard_field

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh")


def _single_device_loss_grad(terms, phi, integrator, t0, dt, nsteps, wrt):
    """Gradient of the fused single-device rollout loss (interpret mode)."""
    stepper = FusedStepper(terms, phi, integrator, interpret=True)

    def loss(x):
        if wrt == "phi":
            P = stepper.pack(x)
            streams = stepper._stream_args
        else:  # wrt a streamed velocity component: swap it into the streams
            P = stepper.pack(phi.values)
            streams = tuple(
                x if q == wrt else a
                for q, a in enumerate(stepper._stream_args))
        t = jnp.asarray(t0, phi.dtype)
        dtj = jnp.asarray(dt, phi.dtype)
        for _ in range(nsteps):
            P = stepper._step_full(P, t, dtj, streams)
            t = t + dtj
        return jnp.sum(stepper.unpack(P) ** 2)

    x0 = phi.values if wrt == "phi" else stepper._stream_args[wrt]
    return jax.value_and_grad(loss)(x0)


def _check(vs, gs, vr, gr, tol=1e-11):
    np.testing.assert_allclose(float(vs), float(vr), rtol=1e-12)
    a, b = np.asarray(gs), np.asarray(gr)
    scale = max(np.abs(b).max(), 1.0)
    assert np.abs(a - b).max() < tol * scale, np.abs(a - b).max() / scale
    assert np.abs(b).max() > 0


def test_sharded_rollout_grad_matches_single_device_analytic_rk3():
    """Analytic (in-kernel) velocity at global coordinates, periodic wrap
    across shard faces, RK3, 3 steps. Local shards (8, 16, 128) take the
    jnp-fallback backward; the refresh transpose still rides ppermute."""
    grid = lsm.Grid((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), (32, 32, 128))
    phi = lsm.sample(
        lambda X, Y, Z: jnp.sin(2 * jnp.pi * X) * jnp.cos(2 * jnp.pi * Y)
        + 0.3 * jnp.sin(2 * jnp.pi * Z), grid, lsm.Periodic())
    vel = lambda xs, t: (0.5 - xs[1] + 0.0 * (xs[0] + xs[2]),
                         xs[0] - 0.5 + 0.0 * (xs[1] + xs[2]),
                         0.2 + 0.0 * (xs[0] + xs[1] + xs[2]))
    terms = (lsm.AdvectionTerm(vel),)
    assert supports_fused(terms, phi)
    mesh = make_mesh(n_devices=8)
    dt = 0.3 * grid.min_spacing
    ro = make_sharded_fused_rollout(lsm.RK3(), mesh, grid, nsteps=3,
                                    interpret=True)

    def loss_sh(v):
        out = ro(terms, shard_field(phi.with_values(v), mesh), 0.0, dt)
        return jnp.sum(out.values ** 2)

    vs, gs = jax.value_and_grad(loss_sh)(phi.values)
    vr, gr = _single_device_loss_grad(terms, phi, lsm.RK3(), 0.0, dt, 3,
                                      wrt="phi")
    _check(vs, gs, vr, gr)


def test_sharded_rollout_grad_matches_single_device_streamed_pallas_bwd():
    """Streamed velocity, mixed BCs on physical faces, FE, 2 steps. Local
    shards (16, 32, 128) support backward tiles (8, 16) — the per-shard
    PALLAS backward runs (interpret mode) behind the ppermute fold.
    Gradients w.r.t. BOTH phi and a streamed velocity component."""
    grid = lsm.Grid((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0), (64, 64, 128))
    rng = np.random.default_rng(5)
    phi = lsm.sample(
        lambda X, Y, Z: jnp.sqrt((X + 0.013)**2 + (Y - 0.021)**2 + Z**2)
        - 0.493,
        grid, bc=[(lsm.Symmetry(), lsm.Extrapolation(2)),
                  lsm.Extrapolation(1), lsm.Periodic()])
    phi = phi.with_values(
        phi.values + jnp.asarray(rng.standard_normal(grid.shape)) * 1e-3)
    vel = lsm.sample(
        lambda X, Y, Z: (-Y + 0.0 * (X + Z), X + 0.0 * (Y + Z),
                         0.1 + 0.0 * (X + Y + Z)),
        grid, vector=True)
    terms = (lsm.AdvectionTerm(vel),)
    assert supports_fused(terms, phi)

    from lsm_tpu.ops import weno_v2_bwd as bwd

    assert bwd._pick_bwd_tiles((16, 32, 128))[0] is not None  # Pallas bwd

    mesh = make_mesh(n_devices=8)
    dt = 0.3 * grid.min_spacing
    ro = make_sharded_fused_rollout(lsm.ForwardEuler(), mesh, grid, nsteps=2,
                                    interpret=True)

    def loss_sh_phi(v):
        out = ro(terms, shard_field(phi.with_values(v), mesh), 0.0, dt)
        return jnp.sum(out.values ** 2)

    vs, gs = jax.value_and_grad(loss_sh_phi)(phi.values)
    vr, gr = _single_device_loss_grad(terms, phi, lsm.ForwardEuler(), 0.0,
                                      dt, 2, wrt="phi")
    _check(vs, gs, vr, gr)

    def loss_sh_vel(u0):
        v3 = vel.values.at[0].set(u0)
        t = lsm.AdvectionTerm(vel.with_values(v3))
        out = ro((t,), shard_field(phi, mesh), 0.0, dt)
        return jnp.sum(out.values ** 2)

    vs, gs = jax.value_and_grad(loss_sh_vel)(vel.values[0])
    vr, gr = _single_device_loss_grad(terms, phi, lsm.ForwardEuler(), 0.0,
                                      dt, 2, wrt=0)
    _check(vs, gs, vr, gr)


def test_sharded_rollout_remat_matches():
    """Step-level remat inside the sharded rollout is gradient-neutral."""
    grid = lsm.Grid((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), (32, 32, 128))
    phi = lsm.sample(
        lambda X, Y, Z: jnp.sin(2 * jnp.pi * X) + jnp.cos(2 * jnp.pi * Y)
        + 0.1 * jnp.sin(2 * jnp.pi * Z), grid, lsm.Periodic())
    vel = lambda xs, t: (1.0 + 0.0 * (xs[0] + xs[1] + xs[2]),
                         0.5 + 0.0 * (xs[0] + xs[1] + xs[2]),
                         0.25 + 0.0 * (xs[0] + xs[1] + xs[2]))
    terms = (lsm.AdvectionTerm(vel),)
    mesh = make_mesh(n_devices=8)
    dt = 0.3 * grid.min_spacing

    def grad_with(remat):
        ro = make_sharded_fused_rollout(lsm.RK2(), mesh, grid, nsteps=3,
                                        remat=remat, interpret=True)

        def loss(v):
            out = ro(terms, shard_field(phi.with_values(v), mesh), 0.0, dt)
            return jnp.sum(out.values ** 2)

        return jax.grad(loss)(phi.values)

    g1, g0 = grad_with(True), grad_with(False)
    scale = max(float(jnp.abs(g0).max()), 1.0)
    assert float(jnp.abs(g1 - g0).max()) < 1e-13 * scale
