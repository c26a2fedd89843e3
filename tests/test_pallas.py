"""Pallas fused WENO5 kernel: interpret-mode parity with the jnp path, and the
custom-VJP gradient check (the compiled kernel is exercised on real TPU by
bench.py and the verify drives; CPU CI runs the interpreter)."""

import numpy as np
import jax
import jax.numpy as jnp

from lsm_tpu import Grid, Periodic, Extrapolation, sample
from lsm_tpu.models import shapes
from lsm_tpu.ops.weno_pallas import (
    _weno_hamiltonian_jnp,
    weno_advection_rhs,
    weno_hamiltonian_pallas,
)


def _setup(dims, n, dtype=jnp.float32):
    grid = Grid((0.0,) * dims, (1.0,) * dims, (n,) * dims)
    if dims == 3:
        phi = sample(shapes.zalesak_sphere(), grid, Periodic(), dtype=dtype)
        vel = sample(
            lambda X, Y, Z: (0.5 - Y + 0 * (X + Z), X - 0.5 + 0 * (Y + Z), 0.1 + 0 * (X + Y + Z)),
            grid, vector=True, dtype=dtype,
        )
    else:
        phi = sample(shapes.zalesak_disk(), grid, Periodic(), dtype=dtype)
        vel = sample(lambda X, Y: (0.5 - Y + 0 * X, X - 0.5 + 0 * Y), grid, vector=True, dtype=dtype)
    u = tuple(vel.values[d] for d in range(dims))
    return grid, phi, u


def test_interpret_parity_3d():
    grid, phi, u = _setup(3, 32)
    p = phi.pad(3)
    ref = _weno_hamiltonian_jnp(p, u, grid.spacing, grid.shape)
    out = weno_hamiltonian_pallas(p, u, grid.spacing, grid.shape, interpret=True)
    assert int(jnp.isnan(out).sum()) == 0
    assert float(jnp.abs(out - ref).max()) < 1e-5


def test_interpret_parity_3d_multi_lane_tile():
    # exercises the G2 > 1 branch (traced lane-dim DMA offset k2*B2): lane
    # extent 256 split into two 128-wide tiles
    grid = Grid((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), (8, 8, 256))
    phi = sample(shapes.zalesak_sphere(), grid, Periodic(), dtype=jnp.float32)
    vel = sample(
        lambda X, Y, Z: (0.5 - Y + 0 * (X + Z), X - 0.5 + 0 * (Y + Z), 0.1 + 0 * (X + Y + Z)),
        grid, vector=True, dtype=jnp.float32,
    )
    u = tuple(vel.values[d] for d in range(3))
    p = phi.pad(3)
    ref = _weno_hamiltonian_jnp(p, u, grid.spacing, grid.shape)
    out = weno_hamiltonian_pallas(
        p, u, grid.spacing, grid.shape, interpret=True, tiles=(8, 8, 128)
    )
    assert int(jnp.isnan(out).sum()) == 0
    assert float(jnp.abs(out - ref).max()) < 1e-5


def test_interpret_parity_2d():
    grid, phi, u = _setup(2, 64)
    p = phi.pad(3)
    ref = _weno_hamiltonian_jnp(p, u, grid.spacing, grid.shape)
    out = weno_hamiltonian_pallas(p, u, grid.spacing, grid.shape, interpret=True)
    assert float(jnp.abs(out - ref).max()) < 1e-5


def test_flat_region_no_nan_f32():
    # uniform stencils used to produce inf*0=NaN in f32 (1e-99 flushes to zero)
    grid = Grid((0.0, 0.0), (1.0, 1.0), (32, 32))
    phi = sample(lambda X, Y: 0.0 * X + 0.0 * Y + 1.0, grid, Periodic(), dtype=jnp.float32)
    vel = sample(lambda X, Y: (1.0 + 0 * X + 0 * Y, -1.0 + 0 * X + 0 * Y), grid, vector=True, dtype=jnp.float32)
    u = tuple(vel.values[d] for d in range(2))
    p = phi.pad(3)
    ref = _weno_hamiltonian_jnp(p, u, grid.spacing, grid.shape)
    out = weno_hamiltonian_pallas(p, u, grid.spacing, grid.shape, interpret=True)
    assert int(jnp.isnan(ref).sum()) == 0
    assert int(jnp.isnan(out).sum()) == 0
    assert float(jnp.abs(ref).max()) < 1e-6  # flat field: zero Hamiltonian


def test_custom_vjp_matches_jnp_grads():
    grid, phi, u = _setup(2, 32, dtype=jnp.float64)
    p = phi.pad(3)

    def loss_wrapped(p, u):
        return jnp.sum(weno_advection_rhs(p, u, tuple(grid.spacing), tuple(grid.shape)) ** 2)

    def loss_plain(p, u):
        return jnp.sum(_weno_hamiltonian_jnp(p, u, grid.spacing, grid.shape) ** 2)

    g1p, g1u = jax.grad(loss_wrapped, argnums=(0, 1))(p, u)
    g2p, g2u = jax.grad(loss_plain, argnums=(0, 1))(p, u)
    assert np.allclose(np.asarray(g1p), np.asarray(g2p), atol=1e-12)
    for a, b in zip(g1u, g2u):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-12)
