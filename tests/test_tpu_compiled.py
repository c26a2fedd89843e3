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


@requires_tpu
def test_refresh_and_bc_pad_compiled_parity_all_bc_kinds():
    """Compiled ghost machinery across BC kinds (the round-3 on-chip smoke
    found two bugs the Periodic-only tests missed: Mosaic miscompiling
    major-dim stack/reversal in the refresh kernels, and the XLA pad path's
    tensordot running at TPU default bf16 matmul precision — ~1e-2 relative
    ghost error for every Extrapolation BC)."""
    from lsm_tpu.core import bc as B
    from lsm_tpu.ops import band_pallas as bp
    from lsm_tpu.ops import weno_v2 as v2

    rng = np.random.default_rng(0)
    shape = (32, 32, 128)
    n0, n1, n2 = shape
    vals = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    cases = [
        B.normalize_bcs(B.Extrapolation(2), 3),
        B.normalize_bcs(B.Symmetry(), 3),
        B.normalize_bcs([(B.Symmetry(), B.Extrapolation(1)), B.Periodic(),
                         (B.Extrapolation(3), B.Symmetry())], 3),
    ]
    for bcs in cases:
        P = v2.pack_padded(vals, bcs)
        Pd = (P.at[0:3].add(7.0).at[-3:].add(-3.0)
               .at[:, 5:8].add(2.0).at[:, -8:-5].add(1.0))
        ref = jax.jit(lambda p, b=bcs: v2.refresh_ghosts(p, b, shape))(Pd)
        got = jax.jit(lambda p, b=bcs: v2.refresh_ghosts_fast(p, b, shape))(Pd)
        r = np.asarray(ref[:, 5:11 + n1])
        g = np.asarray(got[:, 5:11 + n1])
        rel = np.abs(g - r).max() / max(np.abs(r).max(), 1.0)
        assert rel < 2e-6, (B.bcs_str(bcs), rel)
    # band layout, extrapolation (the test_band_kernel config's BC kind)
    bcs = cases[0]
    P = bp.pack_band_padded(vals, bcs)
    Pd = (P.at[5:8].add(7.0).at[-8:-5].add(-3.0)
           .at[:, 5:8].add(2.0).at[:, -8:-5].add(1.0)
           .at[:, :, 125:128].add(4.0).at[:, :, -131:-125].add(5.0))
    ref = bp.refresh_band_ghosts(Pd, bcs, shape)
    got = jax.jit(lambda p: bp.refresh_band_ghosts_fast(p, bcs, shape))(Pd)
    r = np.asarray(ref[:, 5:11 + n1, 125:131 + n2])
    g = np.asarray(got[:, 5:11 + n1, 125:131 + n2])
    assert np.abs(g - r).max() / max(np.abs(r).max(), 1.0) < 2e-6
