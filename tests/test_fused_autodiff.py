"""Differentiability of the fused fast-path steppers (VERDICT r2 missing #5).

``fused_step_stage`` / ``band_step_stage`` carry custom VJPs (Pallas forward,
recompute-from-primals jnp backward), so ``FusedStepper.step`` and
``FusedBandStepper.step`` compose under ``jax.grad``. Oracles:

- dense fused rollout gradient vs central finite differences;
- band fused rollout gradient vs the dense band path's AD gradient, to
  machine precision on tie-free data. (On exactly mirror-symmetric data the
  two algebraically-identical formulations may pick different subgradients at
  upwind/minmod ties — both valid; the test data is deliberately asymmetric.)
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import lsm_tpu as lsm
from lsm_tpu.core.field import MeshField
from lsm_tpu.core.narrowband import NarrowBandField
from lsm_tpu.integrators import loop as _loop
from lsm_tpu.integrators.band_fused import FusedBandStepper
from lsm_tpu.integrators.fused import FusedStepper


def _setup():
    grid = lsm.Grid((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0), (16, 16, 128))
    rng = np.random.default_rng(7)
    base = lsm.sample(
        lambda X, Y, Z: jnp.sqrt(
            (X + 0.013) ** 2 + (Y - 0.021) ** 2 + (Z + 0.007) ** 2) - 0.493,
        grid, lsm.Extrapolation(1),
    )
    phi_v = base.values + jnp.asarray(rng.standard_normal(grid.shape)) * 1e-3
    speed = jnp.asarray(0.1 + 0.01 * rng.standard_normal(grid.shape))
    return grid, base, phi_v, speed


def test_dense_fused_gradient_matches_finite_differences():
    grid, base, phi_v, _ = _setup()
    vel = lambda xs, t: (-xs[1] + 0.0 * (xs[0] + xs[2]),
                         xs[0] + 0.0 * (xs[1] + xs[2]),
                         0.0 * (xs[0] + xs[1] + xs[2]))
    term = lsm.AdvectionTerm(vel)
    phi = base.with_values(phi_v)
    stepper = FusedStepper((term,), phi, lsm.RK3(), interpret=True)
    dt = jnp.asarray(0.3 * grid.min_spacing)

    def loss(values):
        P = stepper.pack(values)
        for k in range(2):
            P = stepper._step_impl(P, k * dt, dt)
        return jnp.sum(stepper.unpack(P) ** 2)

    g = jax.grad(loss)(phi_v)
    rng = np.random.default_rng(0)
    eps = 1e-6
    for _ in range(3):
        ij = tuple(rng.integers(0, s) for s in phi_v.shape)
        fd = (loss(phi_v.at[ij].add(eps)) - loss(phi_v.at[ij].add(-eps))) / (2 * eps)
        assert abs(float(g[ij]) - float(fd)) < 1e-5 * max(1.0, abs(float(fd)))


@pytest.mark.parametrize("integrator", [lsm.ForwardEuler(), lsm.RK2(), lsm.RK3()],
                         ids=["fe", "rk2", "rk3"])
def test_band_fused_gradient_matches_dense_band_path(integrator):
    grid, base, phi_v, speed = _setup()
    nb0 = NarrowBandField(phi_v, grid, base.bcs, nlayers=3, _normalized=True)
    term = lsm.NormalMotionTerm(MeshField(speed, grid, base.bcs, _normalized=True))
    stepper = FusedBandStepper((term,), nb0, integrator, interpret=True)
    dt = jnp.asarray(0.3 * grid.min_spacing)

    def loss_fused(v):
        nb = NarrowBandField(v, grid, base.bcs, nlayers=3, _normalized=True)
        state = stepper.pack(nb)
        state = stepper._step_impl(state, 0.0 * dt, dt)
        return jnp.sum(stepper.unpack(state).values ** 2)

    def loss_dense(v):
        nb = NarrowBandField(v, grid, base.bcs, nlayers=3, _normalized=True)
        nb, _ = _loop.step(integrator, (term,), nb, 0.0, float(dt))
        nb = nb.update_band()
        return jnp.sum(nb.values ** 2)

    assert abs(float(loss_fused(phi_v)) - float(loss_dense(phi_v))) < 1e-9
    gf = jax.grad(loss_fused)(phi_v)
    gd = jax.grad(loss_dense)(phi_v)
    err = float(jnp.abs(gf - gd).max())
    scale = float(jnp.abs(gd).max())
    assert err < 1e-12 * max(scale, 1.0)


def test_band_fused_speed_gradient():
    """Gradients flow to STREAMED coefficient arrays (BASELINE config-5
    surface: differentiable shape optimization over a speed field)."""
    grid, base, phi_v, speed = _setup()
    nb0 = NarrowBandField(phi_v, grid, base.bcs, nlayers=3, _normalized=True)
    dt = jnp.asarray(0.3 * grid.min_spacing)

    from lsm_tpu.integrators.fused import _term_spec

    term0 = lsm.NormalMotionTerm(MeshField(speed, grid, base.bcs, _normalized=True))
    stepper = FusedBandStepper((term0,), nb0, lsm.RK2(), interpret=True)

    def loss_fused(s):
        term = lsm.NormalMotionTerm(MeshField(s, grid, base.bcs, _normalized=True))
        stepper.specs = (_term_spec(term, nb0),)
        state = stepper.pack(nb0)
        state = stepper._step_impl(state, 0.0 * dt, dt)
        return jnp.sum(stepper.unpack(state).values ** 2)

    def loss_dense(s):
        term = lsm.NormalMotionTerm(MeshField(s, grid, base.bcs, _normalized=True))
        nb, _ = _loop.step(lsm.RK2(), (term,), nb0, 0.0, float(dt))
        return jnp.sum(nb.update_band().values ** 2)

    gf = jax.grad(loss_fused)(speed)
    gd = jax.grad(loss_dense)(speed)
    err = float(jnp.abs(gf - gd).max())
    assert err < 1e-12 * max(float(jnp.abs(gd).max()), 1.0)
    assert float(jnp.abs(gd).max()) > 0  # the gradient is actually nonzero


@pytest.mark.parametrize("band", [False, True], ids=["dense", "band"])
def test_rollout_selects_fused_path_with_matching_gradients(band):
    """``rollout(fast=...)`` drives the fused steppers and stays
    differentiable; values and gradients match the generic path."""
    grid, base, phi_v, _ = _setup()
    vel = lambda xs, t: (-xs[1] + 0.0 * (xs[0] + xs[2]),
                         xs[0] + 0.0 * (xs[1] + xs[2]),
                         0.0 * (xs[0] + xs[1] + xs[2]))
    term = lsm.AdvectionTerm(vel)
    dt = 0.3 * grid.min_spacing
    phi = base.with_values(phi_v)

    def make_loss(fast):
        def loss(v):
            if band:
                f = NarrowBandField(v, grid, base.bcs, nlayers=3, _normalized=True)
            else:
                f = phi.with_values(v)
            out, _ = _loop.rollout(lsm.RK3(), (term,), f, 0.0, dt, 3, fast=fast)
            return jnp.sum(out.values ** 2)
        return loss

    lf, lo = make_loss("interpret"), make_loss("off")
    assert abs(float(lf(phi_v)) - float(lo(phi_v))) < 1e-10
    gf = jax.grad(lf)(phi_v)
    go = jax.grad(lo)(phi_v)
    assert float(jnp.abs(gf - go).max()) < 1e-11 * max(float(jnp.abs(go).max()), 1.0)


@pytest.mark.parametrize("fast", ["interpret", "off"])
def test_rollout_remat_gradients_match(fast):
    """Step-level rematerialization (VERDICT r4 next #2) is value- and
    gradient-neutral: ``remat=True`` (the default) and chunked two-level
    remat reproduce the ``remat=False`` rollout gradient exactly — remat
    changes WHEN residuals are (re)computed, never what is computed."""
    grid, base, phi_v, _ = _setup()
    vel = lambda xs, t: (-xs[1] + 0.0 * (xs[0] + xs[2]),
                         xs[0] + 0.0 * (xs[1] + xs[2]),
                         0.0 * (xs[0] + xs[1] + xs[2]))
    term = lsm.AdvectionTerm(vel)
    dt = 0.3 * grid.min_spacing
    phi = base.with_values(phi_v)

    def make_loss(remat, remat_chunk=None):
        def loss(v):
            out, _ = _loop.rollout(lsm.RK3(), (term,), phi.with_values(v),
                                   0.0, dt, 5, fast=fast, remat=remat,
                                   remat_chunk=remat_chunk)
            return jnp.sum(out.values ** 2)
        return loss

    g_plain = jax.grad(make_loss(False))(phi_v)
    g_remat = jax.grad(make_loss(True))(phi_v)
    g_chunk = jax.grad(make_loss(True, remat_chunk=2))(phi_v)
    scale = max(float(jnp.abs(g_plain).max()), 1.0)
    assert float(jnp.abs(g_remat - g_plain).max()) < 1e-12 * scale
    assert float(jnp.abs(g_chunk - g_plain).max()) < 1e-12 * scale
    assert float(jnp.abs(g_plain).max()) > 0
