"""v2 persistent-padded fused multi-term stage kernel: interpret-mode parity
with the pure-jnp reference on the same layout, FusedStepper equivalence with
the standard integrators, and the packed-layout round trip.

The compiled (Mosaic) kernel is exercised on the real chip by ``bench.py``'s
built-in small-size parity assert; CPU CI runs the interpreter.
Reference semantics: stage algebra ``/root/reference/src/timestepping.jl:126-202``,
terms ``/root/reference/src/levelsetterms.jl``.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import lsm_tpu as lsm
from lsm_tpu.core import bc
from lsm_tpu.core import bc as _bc
from lsm_tpu.integrators.fused import FusedStepper, supports_fused
from lsm_tpu.models import shapes
from lsm_tpu.ops import weno_v2 as v2

SHAPE = (16, 16, 128)
DT = jnp.float32


def _grid():
    return lsm.Grid((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), SHAPE)


def _phi(bc=None, dtype=DT):
    return lsm.sample(shapes.zalesak_sphere(), _grid(), bc or lsm.Periodic(), dtype=dtype)


def _velf(xs, t):
    return (
        0.5 - xs[1] + 0.0 * (xs[0] + xs[2]),
        xs[0] - 0.5 + 0.0 * (xs[1] + xs[2]),
        0.1 + 0.0 * (xs[0] + xs[1] + xs[2]),
    )


def _run_stage(phi, specs, coeffs=(0.0, 1.0, 1e-3), t=0.0, aux=None):
    g = phi.grid
    P = v2.pack_padded(phi.values, phi.bcs)
    A = v2.pack_padded(aux, phi.bcs) if aux is not None else None
    out = v2.fused_stage(
        P, specs, coeffs, t, A, phi.bcs, g.spacing, tuple(phi.shape), g.lo,
        interpret=True,
    )
    ref = v2.stage_reference(
        P, specs, coeffs, t, A, phi.bcs, g.spacing, tuple(phi.shape), g.lo
    )
    return v2.unpack_padded(out, phi.shape), ref


def _assert_close(got, ref, tol=2e-5):
    assert int(jnp.isnan(got).sum()) == 0
    assert float(jnp.abs(got - ref).max()) < tol


# -- per-term parity ----------------------------------------------------------------


def test_advection_analytic():
    spec = v2.TermSpec("advection", "analytic", _velf, 0)
    got, ref = _run_stage(_phi(), ((spec, ()),))
    _assert_close(got, ref)


def test_advection_streamed():
    g = _grid()
    vel = lsm.sample(lambda X, Y, Z: _velf((X, Y, Z), 0.0), g, vector=True, dtype=DT)
    spec = v2.TermSpec("advection", "stream", None, 3)
    streams = tuple(vel.values[d] for d in range(3))
    got, ref = _run_stage(_phi(), ((spec, streams),))
    _assert_close(got, ref)


def test_normal_motion_const_speed():
    spec = v2.TermSpec("normal", "const", 0.7, 0)
    got, ref = _run_stage(_phi(), ((spec, ()),))
    _assert_close(got, ref)


def test_normal_motion_analytic_speed():
    speed = lambda xs, t: 0.3 * xs[0] - 0.1 * (xs[1] + xs[2]) + 0.5
    spec = v2.TermSpec("normal", "analytic", speed, 0)
    got, ref = _run_stage(_phi(), ((spec, ()),))
    _assert_close(got, ref)


def test_curvature_const():
    spec = v2.TermSpec("curvature", "const", -0.05, 0)
    got, ref = _run_stage(_phi(), ((spec, ()),))
    _assert_close(got, ref)


def test_eikonal_recomputed_sign():
    spec = v2.TermSpec("eikonal", "none", None, 0)
    got, ref = _run_stage(_phi(), ((spec, ()),))
    _assert_close(got, ref)


def test_eikonal_frozen_sign_streamed():
    phi = _phi()
    term = lsm.EikonalReinitializationTerm.from_initial(phi)
    spec = v2.TermSpec("eikonal", "stream", None, 1)
    got, ref = _run_stage(phi, ((spec, (term.s0.values,)),))
    _assert_close(got, ref)


def test_multi_term_sum_with_aux():
    phi = _phi()
    specs = (
        (v2.TermSpec("advection", "analytic", _velf, 0), ()),
        (v2.TermSpec("normal", "const", 0.2, 0), ()),
        (v2.TermSpec("curvature", "const", -0.01, 0), ()),
    )
    aux = phi.values * 1.1 + 0.05
    got, ref = _run_stage(phi, specs, coeffs=(0.4, 0.6, 5e-4), t=0.3, aux=aux)
    _assert_close(got, ref)


# -- boundary conditions ------------------------------------------------------------


@pytest.mark.parametrize(
    "bc",
    [
        lsm.Periodic(),
        lsm.Extrapolation(0),
        lsm.Extrapolation(1),
        lsm.Extrapolation(2),
        lsm.Symmetry(),
    ],
    ids=["periodic", "neumann", "linear", "quadratic", "symmetry"],
)
def test_lane_ghosts_per_bc(bc):
    """In-kernel lane-ghost reconstruction must match pad_ghost for every BC
    kind (the kernel rebuilds dim-2 ghosts from static-slice formulas)."""
    spec = v2.TermSpec("advection", "analytic", _velf, 0)
    got, ref = _run_stage(_phi(bc), ((spec, ()),))
    _assert_close(got, ref)


def test_mixed_bcs_per_side():
    bcs = (
        (lsm.Extrapolation(1), lsm.Extrapolation(1)),
        (lsm.Symmetry(), lsm.Extrapolation(2)),
        (lsm.Extrapolation(0), lsm.Symmetry()),
    )
    phi = lsm.sample(shapes.zalesak_sphere(), _grid(), None, dtype=DT).with_bcs(bcs)
    spec = v2.TermSpec("advection", "analytic", _velf, 0)
    got, ref = _run_stage(phi, ((spec, ()),))
    _assert_close(got, ref)


# -- packed layout ------------------------------------------------------------------


def test_pack_unpack_roundtrip_and_ghosts():
    phi = _phi(lsm.Extrapolation(2))
    P = v2.pack_padded(phi.values, phi.bcs)
    assert P.shape == v2.padded_shape(phi.shape)
    np.testing.assert_array_equal(
        np.asarray(v2.unpack_padded(P, phi.shape)), np.asarray(phi.values)
    )
    # ghost shells must equal the uniform-3 pad of the same interior
    full = _bc.pad_ghost(phi.values, phi.bcs, 3, axes=(0, 1))
    j = v2._G1 - v2._G
    np.testing.assert_allclose(
        np.asarray(P[:, j:-j, :]), np.asarray(full), rtol=0, atol=0
    )


def test_refresh_ghosts_matches_pack():
    phi = _phi(lsm.Extrapolation(1))
    P = v2.pack_padded(phi.values, phi.bcs)
    # scribble on the ghost shells (not the junk rows, which are never read),
    # then refresh: must equal a fresh pack
    g1 = v2._G1
    Q = P.at[:3, :, :].set(-7.0).at[:, g1 - 3 : g1, :].set(3.0)
    R = v2.refresh_ghosts(Q, phi.bcs, phi.shape)
    # compare the READ window only (ghosts + interior); the junk rows outside
    # the dim-1 ghost shells are fetched by DMA but never used in arithmetic,
    # and refresh_ghosts intentionally leaves them alone
    n1 = phi.shape[1]
    w = np.s_[:, g1 - 3 : g1 + n1 + 3, :]
    np.testing.assert_allclose(np.asarray(R[w]), np.asarray(P[w]), atol=1e-12)


# -- FusedStepper vs standard integrators -------------------------------------------


@pytest.mark.parametrize("integ", [lsm.ForwardEuler(), lsm.RK2(), lsm.RK3()],
                         ids=["fe", "rk2", "rk3"])
def test_stepper_matches_standard_integrator(integ):
    phi = _phi(dtype=jnp.float64)
    term = lsm.AdvectionTerm(_velf)
    assert supports_fused((term,), phi)
    stepper = FusedStepper((term,), phi, integ, interpret=True)
    P = stepper.pack(phi.values)
    dt = 0.2 * phi.grid.min_spacing
    t = 0.0
    for _ in range(3):
        P = stepper.step(P, t, dt)
        t += dt
    eq = lsm.LevelSetEquation(terms=term, ic=phi, integrator=integ)
    eq.integrate(3 * dt, dt_max=dt)
    d = float(jnp.abs(stepper.unpack(P) - eq.current_state.values).max())
    assert d < 1e-11  # identical stencil helpers: bit-level-ish in f64


def test_supports_fused_rejections():
    phi = _phi()
    term = lsm.AdvectionTerm(_velf)
    # unsupported lane dim
    g2 = lsm.Grid((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), (16, 16, 100))
    p2 = lsm.sample(shapes.zalesak_sphere(), g2, lsm.Periodic(), dtype=DT)
    assert not supports_fused((term,), p2)
    # update_func qualifies since round 4 (per-stage re-evaluation)
    t2 = lsm.AdvectionTerm(_velf, update_func=lambda u, phi, t: u)
    assert supports_fused((t2,), phi)
    # dense 2D qualifies since round 4 (dummy-axis embedding)
    g3 = lsm.Grid((0.0, 0.0), (1.0, 1.0), (64, 128))
    p3 = lsm.sample(shapes.zalesak_disk(), g3, lsm.Periodic(), dtype=DT)
    assert supports_fused((lsm.AdvectionTerm(lambda xs, t: (1.0 + 0 * xs[0], 0 * xs[1])),), p3)
    # the upwind scheme stays on the general path
    assert not supports_fused((lsm.AdvectionTerm(_velf, scheme="upwind"),), phi)
    # 2D with an unaligned trailing dim stays off
    g4 = lsm.Grid((0.0, 0.0), (1.0, 1.0), (64, 100))
    p4 = lsm.sample(shapes.zalesak_disk(), g4, lsm.Periodic(), dtype=DT)
    assert not supports_fused((lsm.AdvectionTerm(lambda xs, t: (1.0 + 0 * xs[0], 0 * xs[1])),), p4)


class TestRefreshGhostsFast:
    """In-place Pallas shell refresh == the XLA oracle for every BC kind
    (junk sublanes excluded: they are never read by any consumer)."""

    CASES = [
        bc.normalize_bcs(bc.Periodic(), 3),
        bc.normalize_bcs(bc.Symmetry(), 3),
        bc.normalize_bcs(bc.Extrapolation(0), 3),
        bc.normalize_bcs(bc.Extrapolation(2), 3),
        bc.normalize_bcs(
            [(bc.Symmetry(), bc.Extrapolation(1)), bc.Periodic(),
             (bc.Extrapolation(3), bc.Symmetry())], 3),
    ]

    @pytest.mark.parametrize("bcs", CASES, ids=lambda b: bc.bcs_str(b))
    def test_parity(self, bcs):
        rng = np.random.default_rng(0)
        shape = (12, 16, 128)
        n1 = shape[1]
        vals = jnp.asarray(rng.standard_normal(shape))
        P = v2.pack_padded(vals, bcs)
        # scribble every shell so the refresh has real work to do
        Pd = (P.at[0:3].add(7.0).at[-3:].add(-3.0)
               .at[:, 5:8].add(2.0).at[:, -8:-5].add(1.0))
        ref = v2.refresh_ghosts(Pd, bcs, shape)
        got = v2.refresh_ghosts_fast(Pd, bcs, shape, interpret=True)
        err = float(jnp.abs(got[:, 5:11 + n1] - ref[:, 5:11 + n1]).max())
        assert err < 1e-11
