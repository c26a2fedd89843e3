"""Sharded == unsharded oracles on the 8-device virtual CPU mesh.

New surface the reference lacks (SURVEY.md section 2.3): domain decomposition via
jax.sharding with (a) auto-SPMD jit and (b) explicit shard_map halo exchange.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lsm_tpu import (
    AdvectionTerm,
    CurvatureTerm,
    Extrapolation,
    Grid,
    LinearExtrapolation,
    MeshField,
    NormalMotionTerm,
    Periodic,
    RK3,
    Symmetry,
    sample,
)
from lsm_tpu.models import shapes
from lsm_tpu.parallel import HaloField, make_mesh, make_sharded_step, shard_field
from lsm_tpu.core.bc import pad_ghost, normalize_bcs
from lsm_tpu.parallel.halo import halo_pad_axis
from jax import shard_map
from jax.sharding import PartitionSpec as P


def _mesh2d():
    return make_mesh(8, mesh_shape=(4, 2), axis_names=("x", "y"))


@pytest.mark.parametrize(
    "bc", [Periodic(), Extrapolation(0), Extrapolation(2), Symmetry()]
)
def test_halo_pad_matches_local_pad(bc):
    # sharded halo pad of each axis == the single-device ghost pad
    mesh = _mesh2d()
    grid = Grid((-1.0, -1.0), (1.0, 1.0), (32, 16))
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.standard_normal(grid.shape))
    bcs = normalize_bcs(bc, 2)
    expect = np.asarray(pad_ghost(v, bcs, 3))

    def local(vloc):
        out = halo_pad_axis(vloc, 0, "x", 4, bcs[0], 3)
        out = halo_pad_axis(out, 1, "y", 2, bcs[1], 3)
        return out

    fn = shard_map(
        local, mesh=mesh, in_specs=P("x", "y"), out_specs=P("x", "y"), check_vma=False
    )
    got = np.asarray(fn(v))
    # shard_map tiles each shard's (l0+6, l1+6) padded block back in mesh order;
    # shard (i, j)'s block must equal the matching window of the GLOBAL ghost pad
    # (interior + exchanged halos + physical BC ghosts, including corners).
    l0, l1 = 32 // 4, 16 // 2
    b0, b1 = l0 + 6, l1 + 6
    assert got.shape == (b0 * 4, b1 * 2)
    for i in range(4):
        for j in range(2):
            block = got[i * b0 : (i + 1) * b0, j * b1 : (j + 1) * b1]
            want = expect[i * l0 : i * l0 + b0, j * l1 : j * l1 + b1]
            np.testing.assert_allclose(block, want, rtol=0, atol=1e-12,
                                       err_msg=f"shard ({i},{j}) ghost values")


@pytest.mark.parametrize(
    "bc",
    [Periodic(), Extrapolation(2), Symmetry()],
)
def test_sharded_step_matches_unsharded(bc):
    mesh = _mesh2d()
    grid = Grid((-1.0, -1.0), (1.0, 1.0), (64, 32))
    phi = sample(lambda X, Y: jnp.sqrt(X**2 + Y**2) - 0.5, grid, bc)
    vel = sample(lambda X, Y: (-Y + 0 * X, X + 0 * Y), grid, vector=True)
    term = AdvectionTerm(vel)
    integrator = RK3()
    dt = 0.4 * grid.min_spacing

    ref, _ = integrator.advance((term,), phi, 0.0, dt)

    step = make_sharded_step(integrator, mesh, grid)
    phi_sharded = shard_field(phi, mesh)
    vel_sharded = shard_field(vel, mesh)
    out = step((AdvectionTerm(vel_sharded),), phi_sharded, 0.0, dt)
    err = np.abs(np.asarray(out.values) - np.asarray(ref.values)).max()
    assert err < 1e-12, err


def test_sharded_multi_term_step():
    mesh = _mesh2d()
    grid = Grid((-2.0, -2.0), (2.0, 2.0), (64, 64))
    phi = sample(lambda X, Y: jnp.sqrt(X**2 + Y**2) - 0.7, grid, Extrapolation(2))
    vel = sample(lambda X, Y: (-Y + 0 * X, X + 0 * Y), grid, vector=True)
    speed = sample(lambda X, Y: 0.2 + 0 * X + 0 * Y, grid)
    terms = (
        AdvectionTerm(vel),
        NormalMotionTerm(speed),
        CurvatureTerm(-0.05),
    )
    integrator = RK3()
    dt = 0.2 * grid.min_spacing**2  # parabolic-safe

    ref, _ = integrator.advance(terms, phi, 0.0, dt)
    step = make_sharded_step(integrator, mesh, grid)
    sharded_terms = (
        AdvectionTerm(shard_field(vel, mesh)),
        NormalMotionTerm(shard_field(speed, mesh)),
        CurvatureTerm(-0.05),
    )
    out = step(sharded_terms, shard_field(phi, mesh), 0.0, dt)
    err = np.abs(np.asarray(out.values) - np.asarray(ref.values)).max()
    assert err < 1e-12, err


def test_sharded_multistep_evolution():
    # several chained sharded steps stay equal to the single-device evolution
    mesh = _mesh2d()
    grid = Grid((0.0, 0.0), (1.0, 1.0), (64, 64))
    phi = sample(shapes.zalesak_disk(), grid, Periodic())
    vel = sample(lambda X, Y: (0.5 - Y + 0 * X, X - 0.5 + 0 * Y), grid, vector=True)
    integrator = RK3()
    dt = 0.4 * grid.min_spacing

    ref = phi
    term = (AdvectionTerm(vel),)
    for k in range(5):
        ref, _ = integrator.advance(term, ref, k * dt, dt)

    step = make_sharded_step(integrator, mesh, grid)
    out = shard_field(phi, mesh)
    sterm = (AdvectionTerm(shard_field(vel, mesh)),)
    for k in range(5):
        out = step(sterm, out, k * dt, dt)
    err = np.abs(np.asarray(out.values) - np.asarray(ref.values)).max()
    assert err < 1e-11, err


def test_auto_spmd_matches_unsharded():
    # the zero-effort path: jit + NamedSharding, XLA inserts the collectives
    mesh = _mesh2d()
    grid = Grid((0.0, 0.0), (1.0, 1.0), (64, 64))
    phi = sample(shapes.zalesak_disk(), grid, Periodic())
    vel = sample(lambda X, Y: (0.5 - Y + 0 * X, X - 0.5 + 0 * Y), grid, vector=True)
    integrator = RK3()
    dt = 0.4 * grid.min_spacing
    term = (AdvectionTerm(vel),)

    ref, _ = integrator.advance(term, phi, 0.0, dt)

    phi_s = shard_field(phi, mesh)
    term_s = (AdvectionTerm(shard_field(vel, mesh)),)

    @jax.jit
    def step(terms, f):
        out, _ = integrator.advance(terms, f, 0.0, dt)
        return out

    out = step(term_s, phi_s)
    err = np.abs(np.asarray(out.values) - np.asarray(ref.values)).max()
    assert err < 1e-12, err


def test_sharded_3d():
    mesh = make_mesh(8, mesh_shape=(2, 2, 2), axis_names=("x", "y", "z"))
    grid = Grid((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), (16, 16, 16))
    phi = sample(shapes.sphere((0.5, 0.5, 0.5), 0.3), grid, Extrapolation(1))
    vel = sample(
        lambda X, Y, Z: (0.5 - Y + 0 * (X + Z), X - 0.5 + 0 * (Y + Z), 0.1 + 0 * (X + Y + Z)),
        grid, vector=True,
    )
    integrator = RK3()
    dt = 0.4 * grid.min_spacing
    ref, _ = integrator.advance((AdvectionTerm(vel),), phi, 0.0, dt)
    step = make_sharded_step(integrator, mesh, grid)
    out = step(
        (AdvectionTerm(shard_field(vel, mesh)),), shard_field(phi, mesh), 0.0, dt
    )
    err = np.abs(np.asarray(out.values) - np.asarray(ref.values)).max()
    assert err < 1e-12, err
