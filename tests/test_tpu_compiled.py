"""Compiled-Pallas parity on real TPU hardware (VERDICT r1 weak #5).

The CPU suite exercises the kernels only in interpret mode; a Mosaic-level
regression (layout, DMA, roll semantics) would slip through. This module runs
the ACTUAL compiled kernels on the chip and compares against the jnp oracles.

Run with:  LSM_TPU_TESTS=1 python -m pytest tests/test_tpu_compiled.py -q
(the driver/verify flow; skipped automatically on CPU-only sessions).
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

requires_tpu = pytest.mark.skipif(
    os.environ.get("LSM_TPU_TESTS") != "1"
    or jax.default_backend() in ("cpu", "interpreter"),
    reason="needs LSM_TPU_TESTS=1 and a TPU backend",
)


def _setup(n0, n1, n2):
    from lsm_tpu import Grid, Periodic, sample
    from lsm_tpu.models import shapes

    grid = Grid((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), (n0, n1, n2))
    phi = sample(shapes.zalesak_sphere(), grid, Periodic(), dtype=jnp.float32)
    vel = sample(
        lambda X, Y, Z: (0.5 - Y + 0 * (X + Z), X - 0.5 + 0 * (Y + Z),
                         0.1 + 0 * (X + Y + Z)),
        grid, vector=True, dtype=jnp.float32,
    )
    return grid, phi, tuple(vel.values[d] for d in range(3))


@requires_tpu
def test_v1_hamiltonian_compiled_parity():
    from lsm_tpu.ops.weno_pallas import _weno_hamiltonian_jnp, weno_hamiltonian_pallas

    grid, phi, u = _setup(64, 64, 128)
    p = phi.pad(3)
    ref = jax.jit(_weno_hamiltonian_jnp, static_argnums=(2, 3))(
        p, u, grid.spacing, grid.shape)
    out = weno_hamiltonian_pallas(p, u, grid.spacing, grid.shape)
    ref, out = np.asarray(ref), np.asarray(out)
    assert np.isfinite(out).all()
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() <= 1e-5 * max(scale, 1.0)


@requires_tpu
def test_v2_fused_stage_compiled_parity():
    from functools import partial

    from lsm_tpu.ops import weno_v2 as v2

    grid, phi, u = _setup(64, 64, 128)
    bcs = phi.bcs
    shape = tuple(grid.shape)
    velf = lambda xs, t: (0.5 - xs[1] + 0.0 * (xs[0] + xs[2]),
                          xs[0] - 0.5 + 0.0 * (xs[1] + xs[2]),
                          0.1 + 0.0 * (xs[0] + xs[1] + xs[2]))
    specs = (
        (v2.TermSpec("advection", "analytic", velf, 0), ()),
        (v2.TermSpec("eikonal", "none", None, 0), ()),
    )
    dt = jnp.float32(1e-3)
    P = v2.pack_padded(phi.values, bcs)

    run = jax.jit(partial(
        v2.fused_stage, term_specs_and_streams=specs, coeffs=(0.0, 1.0, dt),
        t=0.0, aux_padded=None, bcs=bcs, spacing=grid.spacing, shape=shape,
        lo=grid.lo))
    out = v2.unpack_padded(run(P), shape)
    ref = v2.stage_reference(
        P, specs, (0.0, 1.0, dt), 0.0, None, bcs, grid.spacing, shape, grid.lo)
    out, ref = np.asarray(out), np.asarray(ref)
    assert np.isfinite(out).all()
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() <= 1e-5 * max(scale, 1.0)


@requires_tpu
def test_band_kernel_compiled_parity():
    from lsm_tpu.core.narrowband import NarrowBandField
    from lsm_tpu.integrators.band_fused import FusedBandStepper, supports_band_fused
    from lsm_tpu import AdvectionTerm, RK3
    from lsm_tpu import Extrapolation, Grid, sample
    from lsm_tpu.models import shapes

    grid = Grid((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0), (64, 64, 128))
    phi = sample(
        lambda X, Y, Z: jnp.sqrt(X**2 + Y**2 + Z**2) - 0.5, grid,
        Extrapolation(2), dtype=jnp.float32,
    )
    nb = NarrowBandField.from_field(phi, nlayers=4)
    velf = lambda xs, t: (-xs[1] + 0.0 * (xs[0] + xs[2]),
                          xs[0] + 0.0 * (xs[1] + xs[2]),
                          0.0 * (xs[0] + xs[1] + xs[2]))
    term = AdvectionTerm(velf)
    if not supports_band_fused((term,), nb):
        pytest.skip("band-fused driver does not support this configuration")
    stepper = FusedBandStepper((term,), nb, RK3())
    dt = jnp.float32(0.25 * grid.min_spacing)

    state = stepper.pack(nb)
    for k in range(3):
        state = stepper.step(state, dt * k, dt)
    got = stepper.unpack(state)

    # dense-integrator oracle on the same band semantics
    ref = nb
    from lsm_tpu.integrators import loop as _loop

    for k in range(3):
        ref, _ = _loop.step(RK3(), (term,), ref, float(dt) * k, float(dt))
        ref = ref.update_band()
    assert np.isfinite(np.asarray(got.values)).all()
    np.testing.assert_allclose(
        np.asarray(got.values), np.asarray(ref.values), rtol=2e-5, atol=2e-6)
    assert np.array_equal(np.asarray(got.active_mask), np.asarray(ref.active_mask))
