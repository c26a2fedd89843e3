"""Active-tile band kernel: interpret-mode parity with the masked-dense oracle
and exact agreement of the FusedBandStepper with the dense NarrowBandField
evolution path (VERDICT r1 next-round #3; reference semantics
``meshfield.jl:553-588`` + ``timestepping.jl:128-137``)."""

import jax.numpy as jnp
import numpy as np
import pytest

import lsm_tpu as lsm
from lsm_tpu.core.narrowband import NarrowBandField
from lsm_tpu.integrators.band_fused import (
    BandState,
    FusedBandStepper,
    supports_band_fused,
)
from lsm_tpu.integrators.loop import step as dense_step
from lsm_tpu.models import shapes
from lsm_tpu.core import bc as _bc
from lsm_tpu.ops import band_pallas as bp
from lsm_tpu.ops.weno_v2 import TermSpec

SHAPE = (32, 32, 128)
TILES = (8, 8, 128)


def _nb(dtype=jnp.float32):
    grid = lsm.Grid((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), SHAPE)
    phi = lsm.sample(
        shapes.sphere((0.5, 0.5, 0.5), 0.3), grid, lsm.Extrapolation(2),
        dtype=dtype,
    )
    return NarrowBandField.from_field(phi)


def _velf(xs, t):
    return (
        0.5 - xs[1] + 0.0 * (xs[0] + xs[2]),
        xs[0] - 0.5 + 0.0 * (xs[1] + xs[2]),
        0.1 + 0.0 * (xs[0] + xs[1] + xs[2]),
    )


def test_pack_roundtrip():
    nb = _nb()
    Q = bp.pack_band_padded(nb.values, nb.bcs)
    assert Q.shape == bp.band_padded_shape(SHAPE)
    np.testing.assert_array_equal(
        np.asarray(bp.unpack_band_padded(Q, SHAPE)), np.asarray(nb.values)
    )
    # refresh after scribbling the lane ghost shells reproduces the pack
    # (compared on the READ window: ghost shells + interior; junk rows beyond
    # the dim-1 shells are never read and never refreshed)
    L, G1, G = bp._L, bp._G1, bp._G
    n0, n1, n2 = SHAPE
    Q2 = Q.at[:, G1 - G:G1 + n1 + G, L - 3:L].set(9.0)
    R = bp.refresh_band_ghosts(Q2, nb.bcs, SHAPE)
    w = np.s_[:, G1 - G:G1 + n1 + G, L - 3:L + n2 + 3]
    np.testing.assert_allclose(np.asarray(R[w]), np.asarray(Q[w]), atol=1e-12)


def test_active_tile_ids_and_overflow():
    nb = _nb()
    ids, count = bp.active_tile_ids(nb.compute_mask, TILES, capacity=512)
    c = int(count)
    assert 0 < c < 512
    got = np.asarray(ids)
    assert (got[:c] >= 0).all() and (got[c:] == -1).all()
    # capacity smaller than the live count: detectable overflow
    ids2, count2 = bp.active_tile_ids(nb.compute_mask, TILES, capacity=4)
    assert int(count2) == c and np.asarray(ids2).shape == (4,)


def _run_stage(nb, specs, coeffs=(0.0, 1.0, 1e-3), t=0.0, with_aux=False):
    g = nb.grid
    Q = bp.pack_band_padded(nb.values, nb.bcs)
    out_init = Q + 0.0
    aux = (Q * 1.05 + 0.01) if with_aux else None
    ids, _ = bp.active_tile_ids(nb.compute_mask, TILES, capacity=256)
    args = (ids, nb.compute_mask, specs, coeffs, t, aux, nb.bcs,
            g.spacing, SHAPE, g.lo, TILES)
    got = bp.band_stage(Q, out_init, *args, interpret=True)
    ref = bp.band_stage_reference(Q, Q + 0.0, *args)
    return got, ref


@pytest.mark.parametrize(
    "specs",
    [
        ((TermSpec("advection", "analytic", _velf, 0), ()),),
        ((TermSpec("normal", "const", 0.4, 0), ()),),
        (
            (TermSpec("advection", "analytic", _velf, 0), ()),
            (TermSpec("curvature", "const", -0.02, 0), ()),
        ),
    ],
    ids=["advection", "normal", "advection+curvature"],
)
def test_band_stage_parity(specs):
    nb = _nb()
    got, ref = _run_stage(nb, specs)
    d = jnp.abs(bp.unpack_band_padded(got, SHAPE) - bp.unpack_band_padded(ref, SHAPE))
    assert int(jnp.isnan(d).sum()) == 0
    assert float(d.max()) < 2e-5


def test_band_stage_parity_with_aux_and_streams():
    nb = _nb()
    vel = lsm.sample(lambda X, Y, Z: _velf((X, Y, Z), 0.0), nb.grid,
                     vector=True, dtype=jnp.float32)
    specs = ((TermSpec("advection", "stream", None, 3),
              tuple(vel.values[d] for d in range(3))),)
    got, ref = _run_stage(nb, specs, coeffs=(0.3, 0.7, 5e-4), t=0.2,
                          with_aux=True)
    d = jnp.abs(bp.unpack_band_padded(got, SHAPE) - bp.unpack_band_padded(ref, SHAPE))
    assert float(d.max()) < 2e-5


def test_band_stage_off_tile_passthrough():
    # inactive tiles must keep the ping-pong target's values untouched
    nb = _nb()
    Q = bp.pack_band_padded(nb.values, nb.bcs)
    marker = Q + 7.0
    ids, _ = bp.active_tile_ids(nb.compute_mask, TILES, capacity=256)
    specs = ((TermSpec("advection", "analytic", _velf, 0), ()),)
    out = bp.band_stage(Q, marker, ids, nb.compute_mask, specs,
                        (0.0, 1.0, 1e-3), 0.0, None, nb.bcs, nb.grid.spacing,
                        SHAPE, nb.grid.lo, TILES, interpret=True)
    act = bp.tile_activity(nb.compute_mask, TILES)
    act_cells = np.repeat(np.repeat(np.repeat(
        np.asarray(act), TILES[0], 0), TILES[1], 1), TILES[2], 2)
    got = np.asarray(bp.unpack_band_padded(out, SHAPE))
    want_marker = np.asarray(bp.unpack_band_padded(marker, SHAPE))
    np.testing.assert_array_equal(got[~act_cells], want_marker[~act_cells])


@pytest.mark.parametrize("integ", [lsm.ForwardEuler(), lsm.RK2(), lsm.RK3()],
                         ids=["fe", "rk2", "rk3"])
def test_band_stepper_matches_dense_band(integ):
    nb = _nb(dtype=jnp.float64)
    term = lsm.AdvectionTerm(_velf)
    assert supports_band_fused((term,), nb)
    stepper = FusedBandStepper((term,), nb, integ, tiles=TILES, interpret=True)
    state = stepper.pack(nb)
    dt = 0.2 * nb.grid.min_spacing
    t = 0.0
    ref = nb
    for _ in range(3):
        state = stepper.step(state, t, dt)
        ref, _ = dense_step(integ, (term,), ref, t, dt)
        ref = ref.update_band()
        t += dt
    assert not stepper.overflowed(state)
    out = stepper.unpack(state)
    np.testing.assert_array_equal(np.asarray(out.mask), np.asarray(ref.mask))
    d = float(jnp.abs(out.values - ref.values).max())
    assert d < 1e-11  # identical stencil helpers on the same cells


class TestRefreshBandGhostsFast:
    """In-place Pallas band shell refresh == the XLA oracle for every BC kind
    (junk sublanes/lanes excluded: never read by any consumer)."""

    CASES = [
        _bc.normalize_bcs(_bc.Symmetry(), 3),
        _bc.normalize_bcs(_bc.Extrapolation(0), 3),
        _bc.normalize_bcs(_bc.Extrapolation(2), 3),
        _bc.normalize_bcs(_bc.Periodic(), 3),
        _bc.normalize_bcs(
            [(_bc.Symmetry(), _bc.Extrapolation(1)), _bc.Extrapolation(3),
             (_bc.Extrapolation(2), _bc.Symmetry())], 3),
    ]

    @pytest.mark.parametrize("bcs", CASES, ids=lambda b: _bc.bcs_str(b))
    def test_parity(self, bcs):
        rng = np.random.default_rng(1)
        shape = (28, 16, 128)
        n1 = shape[1]
        n2 = shape[2]
        vals = jnp.asarray(rng.standard_normal(shape))
        P = bp.pack_band_padded(vals, bcs)
        Pd = (P.at[0:3].add(7.0).at[-3:].add(-3.0)
               .at[:, 5:8].add(2.0).at[:, -8:-5].add(1.0)
               .at[:, :, 125:128].add(4.0).at[:, :, -131:-125].add(5.0))
        ref = bp.refresh_band_ghosts(Pd, bcs, shape)
        got = bp.refresh_band_ghosts_fast(Pd, bcs, shape, interpret=True)
        r = ref[:, 5:11 + n1, 125:131 + n2]
        g = got[:, 5:11 + n1, 125:131 + n2]
        assert float(jnp.abs(g - r).max()) < 1e-11


def test_unpack_warns_on_dispatch_overflow():
    """The r4 overflow indicator fails LOUD at the API boundary (VERDICT r4
    next #7): unpack of an overflowed state raises a RuntimeWarning."""
    import warnings

    grid = lsm.Grid((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0), (16, 16, 128))
    phi = lsm.sample(lambda X, Y, Z: jnp.sqrt(X**2 + Y**2 + Z**2) - 0.5,
                     grid, lsm.Extrapolation(1))
    nb = NarrowBandField(phi.values, grid, phi.bcs, nlayers=3,
                         _normalized=True)
    term = lsm.AdvectionTerm(lambda xs, t: (
        -xs[1] + 0.0 * (xs[0] + xs[2]), xs[0] + 0.0 * (xs[1] + xs[2]),
        0.0 * (xs[0] + xs[1] + xs[2])))
    stepper = FusedBandStepper((term,), nb, lsm.ForwardEuler(),
                               interpret=True)
    state = stepper.pack(nb)
    bad = state._replace(count=jnp.asarray(stepper.capacity + 1, jnp.int32))
    with pytest.warns(RuntimeWarning, match="overflow"):
        stepper.unpack(bad)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        stepper.unpack(state)  # non-overflowed: silent


def test_refresh_flags_skip_interior_band_matches_dense():
    """Active-aware shell refresh (round 5): an interface that never touches
    a grid face skips the whole O(N^2) refresh — the evolution must still
    match the dense band path exactly, and the flags must really be zero
    (the skip is the 768^3 win: the unconditional lane-shell pass costs
    ~33 ms there, docs/profile_r5_band.py)."""
    grid = lsm.Grid((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), (64, 64, 384))
    phi = lsm.sample(shapes.sphere((0.5, 0.5, 0.5), 0.12), grid,
                     lsm.Extrapolation(2), dtype=jnp.float64)
    nb = NarrowBandField.from_field(phi)
    term = lsm.AdvectionTerm(_velf)
    stepper = FusedBandStepper((term,), nb, lsm.RK2(), tiles=(8, 8, 128),
                               interpret=True)
    state = stepper.pack(nb)
    fl = np.asarray(bp.refresh_flags_from_activity(state.act))
    assert fl.tolist() == [0, 0], fl  # interior band: every face skipped
    dt = 0.2 * nb.grid.min_spacing
    t, ref = 0.0, nb
    for _ in range(3):
        state = stepper.step(state, t, dt)
        ref, _ = dense_step(lsm.RK2(), (term,), ref, t, dt)
        ref = ref.update_band()
        t += dt
    out = stepper.unpack(state)
    np.testing.assert_array_equal(np.asarray(out.mask), np.asarray(ref.mask))
    assert float(jnp.abs(out.values - ref.values).max()) < 1e-11


def test_refresh_flags_fire_on_boundary_band_matches_dense():
    """A band crossing grid faces must fire the refresh flags and still
    match the dense band path."""
    grid = lsm.Grid((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), (32, 32, 256))
    phi = lsm.sample(shapes.sphere((0.15, 0.5, 0.02), 0.25), grid,
                     bc=[lsm.Extrapolation(2), lsm.Extrapolation(1),
                         lsm.Symmetry()], dtype=jnp.float64)
    nb = NarrowBandField.from_field(phi)
    term = lsm.AdvectionTerm(_velf)
    stepper = FusedBandStepper((term,), nb, lsm.ForwardEuler(),
                               tiles=(8, 8, 128), interpret=True)
    state = stepper.pack(nb)
    fl = np.asarray(bp.refresh_flags_from_activity(state.act))
    assert fl.tolist() == [1, 1], fl
    dt = 0.2 * nb.grid.min_spacing
    t, ref = 0.0, nb
    for _ in range(3):
        state = stepper.step(state, t, dt)
        ref, _ = dense_step(lsm.ForwardEuler(), (term,), ref, t, dt)
        ref = ref.update_band()
        t += dt
    out = stepper.unpack(state)
    np.testing.assert_array_equal(np.asarray(out.mask), np.asarray(ref.mask))
    assert float(jnp.abs(out.values - ref.values).max()) < 1e-11
