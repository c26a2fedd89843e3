"""Pallas backward-pass parity (round-4, VERDICT r3 missing #1).

``stage_backward`` (tile-local VJP kernel, interpret mode) must reproduce the
jnp-composite VJP oracle (``_jnp_stage_backward``) for every cotangent output:
the padded state, streamed coefficients, RK scalars, time, and the aux buffer.

Raw-``dP`` comparisons use tie-free BCs (Periodic / Extrapolation(<=1) /
Symmetry): with ``Extrapolation(degree >= 2)`` the ghost construction makes
the minmod arguments identically equal at boundary rows, where the
subgradient split between a ghost entry and its interior sources is
implementation-defined — but provably equivalent after the ghost fold, which
the dedicated composite-gradient test checks (see the module docstring of
``lsm_tpu.ops.weno_v2_bwd``).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import lsm_tpu as lsm
from lsm_tpu.core import bc as B
from lsm_tpu.core.field import MeshField
from lsm_tpu.core.grid import Grid
from lsm_tpu.integrators.fused import FusedStepper
from lsm_tpu.ops import weno_v2 as v2
from lsm_tpu.ops import weno_v2_bwd as bwd

SHAPE = (16, 32, 128)
SPACING = (0.07, 0.05, 0.06)
LO = (0.0, -1.0, 0.5)


def _smooth_phi(rng):
    x = np.linspace(0, 1, SHAPE[0])[:, None, None]
    y = np.linspace(0, 1, SHAPE[1])[None, :, None]
    z = np.linspace(0, 1, SHAPE[2])[None, None, :]
    return jnp.asarray(
        np.sqrt((x - 0.5) ** 2 + (y - 0.4) ** 2 + (z - 0.6) ** 2) - 0.3
        + 1e-3 * rng.standard_normal(SHAPE)
    )


def _compare(bcs_in, specs_streams, with_aux, smooth=False, seed=0, rtol=1e-9):
    rng = np.random.default_rng(seed)
    bcs = B.normalize_bcs(bcs_in, 3)
    phi = _smooth_phi(rng) if smooth else jnp.asarray(rng.standard_normal(SHAPE))
    P = v2.pack_padded(phi, bcs)
    aux = (v2.pack_padded(jnp.asarray(rng.standard_normal(SHAPE)), bcs)
           if with_aux else None)
    g = jnp.asarray(rng.standard_normal(v2.padded_shape(SHAPE)))
    specs = tuple(s for s, _ in specs_streams)
    streams = tuple(a for _, arrs in specs_streams for a in arrs)
    counts = tuple(len(arrs) for _, arrs in specs_streams)
    coeffs = tuple(jnp.asarray(c) for c in (0.3, 0.7, 0.12))
    t = jnp.asarray(0.37)
    ref = bwd._jnp_stage_backward(P, streams, coeffs, t, aux, g, specs, counts,
                                  bcs, SPACING, SHAPE, LO)
    out = bwd.stage_backward(P, streams, coeffs, t, aux, g, specs, counts,
                             bcs, SPACING, SHAPE, LO, interpret=True)
    for name, r, o in zip(["dP", "dstreams", "dcoeffs", "dt", "daux"], ref, out):
        if r is None:
            assert o is None
            continue
        for k, (a, b) in enumerate(zip(jax.tree_util.tree_leaves(r),
                                       jax.tree_util.tree_leaves(o))):
            a, b = np.asarray(a), np.asarray(b)
            assert np.isfinite(a).all() and np.isfinite(b).all(), (name, k)
            scale = max(np.abs(a).max(), 1e-300)
            assert np.abs(a - b).max() / scale < rtol, (
                name, k, np.abs(a - b).max() / scale)


def _vel_t(xs, t):
    return (jnp.sin(xs[1]) + 0.1 * t + 0 * (xs[0] + xs[2]),
            0.5 * xs[0] + 0 * (xs[1] + xs[2]),
            0.2 + 0 * (xs[0] + xs[1] + xs[2]))


def test_advection_analytic_periodic_with_aux():
    _compare(B.Periodic(),
             ((v2.TermSpec("advection", "analytic", _vel_t, 0), ()),), True)


def test_advection_analytic_time_gradient():
    """dt flows through a genuinely time-dependent analytic coefficient
    (and the trace-time t-independence detector keeps it exact)."""
    assert bwd._coef_depends_on_t(_vel_t, jnp.float64)
    assert not bwd._coef_depends_on_t(
        lambda xs, t: (0 * xs[0], 0 * xs[1], 0 * xs[2]), jnp.float64)
    _compare(B.Extrapolation(1),
             ((v2.TermSpec("advection", "analytic", _vel_t, 0), ()),), False)


def test_advection_streamed_symmetry_with_aux():
    rng = np.random.default_rng(3)
    u = tuple(jnp.asarray(rng.standard_normal(SHAPE)) * 0.3 for _ in range(3))
    _compare(B.Symmetry(),
             ((v2.TermSpec("advection", "stream", None, 3), u),), True)


def test_mixed_terms_mixed_bcs():
    rng = np.random.default_rng(4)
    sp = (jnp.asarray(0.1 + 0.02 * rng.standard_normal(SHAPE)),)
    _compare((B.Periodic(), B.Extrapolation(1), B.Symmetry()),
             ((v2.TermSpec("normal", "stream", None, 1), sp),
              (v2.TermSpec("curvature", "const", -0.05, 0), ()),
              (v2.TermSpec("eikonal", "none", None, 0), ())),
             True, smooth=True)


def test_eikonal_frozen_sign_stream():
    rng = np.random.default_rng(5)
    sp = (jnp.asarray(rng.standard_normal(SHAPE)),)
    _compare(B.Extrapolation(1),
             ((v2.TermSpec("eikonal", "stream", None, 1), sp),), False)


def test_fold_matches_pack_transpose():
    rng = np.random.default_rng(6)
    for bc in (B.Periodic(), B.Extrapolation(1), B.Extrapolation(3), B.Symmetry()):
        bcs = B.normalize_bcs(bc, 3)
        g = jnp.asarray(rng.standard_normal(v2.padded_shape(SHAPE)))
        ref = np.asarray(bwd.fold_ghost_cotangent(g, bcs, SHAPE))
        fast = np.asarray(bwd.fold_ghost_cotangent_fast(g, bcs, SHAPE,
                                                        interpret=True))
        n0, n1, _ = SHAPE
        np.testing.assert_allclose(fast[3:3 + n0, 8:8 + n1, :], ref,
                                   rtol=1e-12, atol=1e-14)
        # the backward kernel's wide column windows rely on zeroed col shells
        assert np.abs(fast[:, 0:8, :]).max() == 0.0
        assert np.abs(fast[:, n1 + 8:, :]).max() == 0.0


def test_extrapolation2_composite_gradient_parity():
    """Degree-2 extrapolation creates exact minmod ties at boundary rows
    where per-buffer cotangents legitimately differ; the INTERIOR gradient
    (through pack/unpack — the only public surface) must still match the
    jnp backward to machine precision."""
    import os

    rng = np.random.default_rng(7)
    grid = Grid((0.0, 0.0, 0.0), (1.0, 2.0, 4.0), SHAPE)
    phi_v = _smooth_phi(rng)
    speed = jnp.asarray(0.1 + 0.02 * rng.standard_normal(SHAPE))
    bcs = B.normalize_bcs(B.Extrapolation(2), 3)
    phi = MeshField(phi_v, grid, bcs, _normalized=True)
    term = lsm.NormalMotionTerm(MeshField(speed, grid, bcs, _normalized=True))
    stepper = FusedStepper((term,), phi, lsm.RK3(), interpret=True)
    dt = jnp.asarray(0.3 * grid.min_spacing)

    def loss(values):
        P = stepper.pack(values)
        for k in range(2):
            P = stepper._step_impl(P, k * dt, dt)
        return jnp.sum(stepper.unpack(P) ** 2)

    g_new = jax.grad(loss)(phi_v)
    os.environ["LSM_TPU_JNP_BWD"] = "1"
    try:
        stepper2 = FusedStepper((term,), phi, lsm.RK3(), interpret=True)

        def loss2(values):
            P = stepper2.pack(values)
            for k in range(2):
                P = stepper2._step_impl(P, k * dt, dt)
            return jnp.sum(stepper2.unpack(P) ** 2)

        g_ref = jax.grad(loss2)(phi_v)
    finally:
        del os.environ["LSM_TPU_JNP_BWD"]
    err = float(jnp.abs(g_new - g_ref).max())
    scale = float(jnp.abs(g_ref).max())
    assert err < 1e-12 * max(scale, 1.0), err / scale


def test_hand_backward_f32_accuracy_at_tie_cells():
    """The round-5 discovery, pinned: at WENO-symmetric cells (|v1| == |v5|
    etc. — ubiquitous on smooth radial fields) the f32 AUTODIFF backward of
    ``weno5_upwind`` is wrong by order 1 (the eps-path multiplies a
    catastrophically-cancelled ``dr`` by ``r^2 ~ 1e21``), while the hand
    backward (``weno5_upwind_fwd_bwd``) matches the f64 ground truth. Both
    agree exactly in f64 (also asserted)."""
    from lsm_tpu.ops import stencils as st

    dmv = [0.00313568115234375, 0.003143310546875, 0.00313568115234375, 0.0,
           -0.00313568115234375, -0.003143310546875]
    gv = 1.2142245769500732

    def run(dtype):
        dm = [jnp.asarray([v], dtype) for v in dmv]
        u = jnp.asarray([-0.5], dtype)
        g = jnp.asarray([gv], dtype)
        _, vjp = jax.vjp(lambda d: st.weno5_upwind(d, u), tuple(dm))
        ddm_ad = vjp(g)[0]
        _, ddm_hand, _ = st.weno5_upwind_fwd_bwd(dm, u, g)
        return (np.array([float(d[0]) for d in ddm_ad]),
                np.array([float(d[0]) for d in ddm_hand]))

    ad64, hand64 = run(jnp.float64)
    np.testing.assert_allclose(hand64, ad64, rtol=1e-10, atol=1e-14)

    ad32, hand32 = run(jnp.float32)
    scale = np.abs(ad64).max()
    assert np.abs(hand32 - ad64).max() < 1e-2 * scale  # hand f32 ~ truth
    assert np.abs(ad32 - ad64).max() > scale  # f32 autodiff: order-1 wrong


def test_small_grid_falls_back_to_jnp():
    """Grids too small for the extended windows silently use the exact jnp
    path — gradients must exist for every supported shape."""
    shape = (8, 16, 128)
    assert not bwd.supports_stage_bwd(shape, B.normalize_bcs(B.Periodic(), 3))
    grid = Grid((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), shape)
    rng = np.random.default_rng(8)
    phi_v = jnp.asarray(rng.standard_normal(shape)) * 0.1
    phi = MeshField(phi_v, grid, B.normalize_bcs(B.Periodic(), 3),
                    _normalized=True)
    term = lsm.AdvectionTerm(lambda xs, t: (
        -xs[1] + 0 * (xs[0] + xs[2]), xs[0] + 0 * (xs[1] + xs[2]),
        0 * (xs[0] + xs[1] + xs[2])))
    stepper = FusedStepper((term,), phi, lsm.ForwardEuler(), interpret=True)
    dt = jnp.asarray(0.2 * grid.min_spacing)

    def loss(values):
        P = stepper.pack(values)
        P = stepper._step_impl(P, 0.0 * dt, dt)
        return jnp.sum(stepper.unpack(P) ** 2)

    g = jax.grad(loss)(phi_v)
    assert np.isfinite(np.asarray(g)).all()
