"""Whole-array finite-difference / WENO stencil operators.

TPU-native form of the reference's pointwise per-node operators
(``/root/reference/src/derivatives.jl``): every operator maps a *ghost-padded* array
``p`` (pad width ``g`` on each side of every spatial axis, produced by
``MeshField.pad`` / ``pad_ghost``) to an interior-shaped array, expressed as shifted
dense slices that XLA fuses into a single vectorized loop (and that the Pallas
kernels in :mod:`lsm_tpu.ops.weno_kernels` reimplement as fused VMEM tiles).

Required pad widths: first derivatives and centered second derivatives need
``g >= 1``; the mixed second derivative needs corner ghosts with ``g >= 1``; the
second-order ENO combinations need ``g >= 2``; WENO5 needs ``g >= 3``
(reference stencil reach: ``derivatives.jl:89-121``).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

__all__ = [
    "PAD_D0",
    "PAD_ENO2",
    "PAD_WENO5",
    "shift",
    "d0",
    "dp",
    "dm",
    "d2c",
    "d2pp",
    "d2mm",
    "d2_mixed",
    "weno5m",
    "weno5p",
    "minmod",
    "eno2_onesided",
    "godunov_norms",
]

PAD_D0 = 1
PAD_ENO2 = 2
PAD_WENO5 = 3


def shift(
    p: jnp.ndarray, offsets, g, shape: Sequence[int]
) -> jnp.ndarray:
    """Interior-shaped view ``phi[I + offsets]`` of a padded array.

    ``offsets`` is a per-spatial-dim tuple of integer shifts. ``g`` is the ghost
    width — an int (uniform) or a per-spatial-dim tuple (the fused kernels pad
    the sublane dim wider for DMA alignment). Leading (component) axes of ``p``
    beyond ``len(shape)`` are passed through.
    """
    if hasattr(p, "shift_view"):
        # virtual padded arrays (e.g. the fused kernels' lane-roll slab view)
        # synthesize shifted tiles themselves; ``g`` is baked into the view
        return p.shift_view(tuple(offsets), tuple(shape))
    nspatial = len(shape)
    lead = p.ndim - nspatial
    gs = (g,) * nspatial if isinstance(g, int) else tuple(g)
    sl = [slice(None)] * lead
    for d in range(nspatial):
        off = gs[d] + offsets[d]
        sl.append(slice(off, off + shape[d]))
    return p[tuple(sl)]


def _axis_offset(axis: int, k: int, ndim: int) -> Tuple[int, ...]:
    return tuple(k if d == axis else 0 for d in range(ndim))


def _s(p, axis, k, g, shape):
    return shift(p, _axis_offset(axis, k, len(shape)), g, shape)


# -- first derivatives (derivatives.jl:28-57) --------------------------------------


def d0(p, axis, h, g, shape):
    """Centered first derivative along ``axis``."""
    return (_s(p, axis, 1, g, shape) - _s(p, axis, -1, g, shape)) / (2.0 * h)


def dp(p, axis, h, g, shape):
    """Forward first derivative along ``axis``."""
    return (_s(p, axis, 1, g, shape) - _s(p, axis, 0, g, shape)) / h


def dm(p, axis, h, g, shape):
    """Backward first derivative along ``axis``."""
    return (_s(p, axis, 0, g, shape) - _s(p, axis, -1, g, shape)) / h


# -- second derivatives (derivatives.jl:124-175) -----------------------------------


def d2c(p, axis, h, g, shape):
    """Centered second derivative along ``axis``."""
    return (
        _s(p, axis, 1, g, shape) - 2.0 * _s(p, axis, 0, g, shape) + _s(p, axis, -1, g, shape)
    ) / (h * h)


def d2pp(p, axis, h, g, shape):
    """One-sided (forward) second derivative along ``axis``."""
    return (
        _s(p, axis, 0, g, shape) - 2.0 * _s(p, axis, 1, g, shape) + _s(p, axis, 2, g, shape)
    ) / (h * h)


def d2mm(p, axis, h, g, shape):
    """One-sided (backward) second derivative along ``axis``."""
    return (
        _s(p, axis, -2, g, shape) - 2.0 * _s(p, axis, -1, g, shape) + _s(p, axis, 0, g, shape)
    ) / (h * h)


def d2_mixed(p, ax1, ax2, h1, h2, g, shape):
    """Mixed second derivative d^2/dx_ax1 dx_ax2 (``derivatives.jl:144-149``)."""
    n = len(shape)

    def two(a_k, b_k):
        off = [0] * n
        off[ax1] += a_k
        off[ax2] += b_k
        return shift(p, tuple(off), g, shape)

    return (two(1, 1) - two(1, -1) - two(-1, 1) + two(-1, -1)) / (4.0 * h1 * h2)


# -- WENO5 (derivatives.jl:61-121, Osher-Fedkiw sec. 3.4) --------------------------


def _weno_core(v1, v2, v3, v4, v5):
    """Classic fifth-order WENO reconstruction from five one-sided differences
    ordered from the upwind end inward (Jiang-Shu smoothness indicators, weights
    0.1/0.6/0.3, fudge factor ``1e-6 * max(v_i^2) + 1e-99``)."""
    d1 = (1.0 / 3.0) * v1 - (7.0 / 6.0) * v2 + (11.0 / 6.0) * v3
    d2 = -(1.0 / 6.0) * v2 + (5.0 / 6.0) * v3 + (1.0 / 3.0) * v4
    d3 = (1.0 / 3.0) * v3 + (5.0 / 6.0) * v4 - (1.0 / 6.0) * v5
    s1 = (13.0 / 12.0) * (v1 - 2.0 * v2 + v3) ** 2 + 0.25 * (v1 - 4.0 * v2 + 3.0 * v3) ** 2
    s2 = (13.0 / 12.0) * (v2 - 2.0 * v3 + v4) ** 2 + 0.25 * (v2 - v4) ** 2
    s3 = (13.0 / 12.0) * (v3 - 2.0 * v4 + v5) ** 2 + 0.25 * (3.0 * v3 - 4.0 * v4 + v5) ** 2
    vmax = jnp.maximum(
        jnp.maximum(jnp.maximum(v1 * v1, v2 * v2), jnp.maximum(v3 * v3, v4 * v4)), v5 * v5
    )
    # absolute floor. The reference's 1e-99 flushes to zero below float64, and a
    # uniform stencil (all v_i = 0) then yields inf * 0 = NaN; worse, the
    # *gradient* of the weights contains (s + eps)^-3 terms, so the floor must
    # keep eps^-3 finite in the working dtype (differentiability through flat
    # regions). Any |v| above ~1e3*sqrt(floor) keeps the adaptive 1e-6*vmax term
    # dominant, so the WENO weights are unchanged where the field varies.
    floor = 1.0e-36 if jnp.result_type(v1) == jnp.float64 else 1.0e-12
    eps = 1.0e-6 * vmax + floor
    a1 = 0.1 / (s1 + eps) ** 2
    a2 = 0.6 / (s2 + eps) ** 2
    a3 = 0.3 / (s3 + eps) ** 2
    inv = 1.0 / (a1 + a2 + a3)
    return (a1 * d1 + a2 * d2 + a3 * d3) * inv


def _weno_eps(vmax, dtype):
    # absolute floor: see the note in _weno_core.
    floor = 1.0e-36 if dtype == jnp.float64 else 1.0e-12
    return 1.0e-6 * vmax + floor


def _weno_combine(s1, s2, s3, eps, d1, d2, d3, recip=None):
    """Weighted combination with ONE division (plus one shared reciprocal).

    Classic form needs four divisions (three ``a_i = g_i/(s_i+eps)^2`` plus the
    normalization). Rewrite with ``b_i = (s_i+eps)/eps >= 1``:
    ``a_i \\propto g_i * (b_j b_k)^2`` (j,k the other two), so the weights
    ``a_i / sum(a)`` are unchanged (the common ``prod(b)^2 / eps^4`` cancels).
    The ``1/eps`` normalization keeps every intermediate in fp32 range:
    ``1 <= b_i <= ~26/1e-6`` so ``(b_j b_k)^2 <= ~5e29 < fp32 max``, and a flat
    stencil gives ``b_i = 1`` -> exact 0.1/0.6/0.3 weights (never 0/0).

    ``recip`` optionally replaces the two reciprocals (the fused TPU kernels
    pass a Newton-refined ``pl.reciprocal`` whose ~2^-26 relative error is
    below f32 division rounding — VPU divisions are many-cycle).
    """
    r = (1.0 / eps) if recip is None else recip(eps)
    b1 = s1 * r + 1.0
    b2 = s2 * r + 1.0
    b3 = s3 * r + 1.0
    q1 = 0.1 * (b2 * b3) ** 2
    q2 = 0.6 * (b1 * b3) ** 2
    q3 = 0.3 * (b1 * b2) ** 2
    qsum = q1 + q2 + q3
    w = (1.0 / qsum) if recip is None else recip(qsum)
    return (q1 * d1 + q2 * d2 + q3 * d3) * w


def weno5_pair(dm):
    """Fused (weno5-, weno5+) from the six shared backward differences ``dm[k]``,
    ``k = -2..3`` relative to node ``I`` (i.e. ``dm[j] = D- at I + j - 2``).

    Shares the difference table between the left- and right-biased
    reconstructions: ``e[k]`` (first differences of ``dm``) and ``c[k]`` (second
    differences) appear in the Jiang-Shu indicators of BOTH biases, saving ~35%
    of the arithmetic vs. two independent ``_weno_core`` calls; combined with the
    one-division weight form this is the arithmetic layout the fused Pallas
    kernel uses. Identical in exact arithmetic to
    ``(_weno_core(dm[0..4]), _weno_core(dm[5],dm[4],dm[3],dm[2],dm[1]))``.
    """
    dtype = jnp.result_type(dm[0])
    c13 = 13.0 / 12.0
    e = [dm[k + 1] - dm[k] for k in range(5)]
    c = [e[k + 1] - e[k] for k in range(4)]
    c_sq = [ck * ck for ck in c]
    # minus-biased (stencil dm[0..4])
    s1m = c13 * c_sq[0] + 0.25 * (c[0] + 2.0 * e[1]) ** 2
    s2m = c13 * c_sq[1] + 0.25 * (e[1] + e[2]) ** 2
    s3m = c13 * c_sq[2] + 0.25 * (c[2] - 2.0 * e[2]) ** 2
    # plus-biased (stencil dm[5..1], i.e. the reflection)
    s1p = c13 * c_sq[3] + 0.25 * (c[3] - 2.0 * e[3]) ** 2
    s2p = c13 * c_sq[2] + 0.25 * (e[2] + e[3]) ** 2
    s3p = c13 * c_sq[1] + 0.25 * (c[1] + 2.0 * e[2]) ** 2
    sq = [v * v for v in dm]
    mid = jnp.maximum(
        jnp.maximum(sq[1], sq[2]), jnp.maximum(sq[3], sq[4])
    )  # shared dm[1..4]
    eps_m = _weno_eps(jnp.maximum(mid, sq[0]), dtype)
    eps_p = _weno_eps(jnp.maximum(mid, sq[5]), dtype)
    d1m = (1.0 / 3.0) * dm[0] - (7.0 / 6.0) * dm[1] + (11.0 / 6.0) * dm[2]
    d2m = -(1.0 / 6.0) * dm[1] + (5.0 / 6.0) * dm[2] + (1.0 / 3.0) * dm[3]
    d3m = (1.0 / 3.0) * dm[2] + (5.0 / 6.0) * dm[3] - (1.0 / 6.0) * dm[4]
    d1p = (1.0 / 3.0) * dm[5] - (7.0 / 6.0) * dm[4] + (11.0 / 6.0) * dm[3]
    d2p = -(1.0 / 6.0) * dm[4] + (5.0 / 6.0) * dm[3] + (1.0 / 3.0) * dm[2]
    d3p = (1.0 / 3.0) * dm[3] + (5.0 / 6.0) * dm[2] - (1.0 / 6.0) * dm[1]
    minus = _weno_combine(s1m, s2m, s3m, eps_m, d1m, d2m, d3m)
    plus = _weno_combine(s1p, s2p, s3p, eps_p, d1p, d2p, d3p)
    return minus, plus


def weno5_upwind(dm, u, recip=None):
    """Upwinded WENO5 advection contribution ``u * (u>0 ? weno5- : weno5+)``
    along one axis, from the six shared backward differences ``dm`` (see
    :func:`weno5_pair_diffs`) and that axis's velocity component ``u``.

    Instead of evaluating BOTH biased reconstructions and selecting the output
    (``u * where(u>0, weno5m, weno5p)``), select the five stencil *inputs* by
    the sign of ``u`` and run ONE core — the plus-biased core is the minus core
    on the reflected stencil ``(dm5,dm4,dm3,dm2,dm1)``, so five ``where``s
    replace an entire second set of smoothness indicators, weights, and
    candidates (~2x less VPU arithmetic; WENO5 on TPU is compute-bound).
    Identical result: at ``u == 0`` both forms pick the plus branch and
    multiply by zero.

    Arithmetic layout: the Jiang-Shu indicators and the 3rd-order candidates
    are expressed through the shared first/second difference tables
    ``e_k = v_{k+1}-v_k`` / ``c_k = e_{k+1}-e_k`` (algebraically identical to
    the textbook form, ~25% fewer VPU ops). ``recip`` as in
    :func:`_weno_combine`.
    """
    cond = u > 0
    v1 = jnp.where(cond, dm[0], dm[5])
    v2 = jnp.where(cond, dm[1], dm[4])
    v3 = jnp.where(cond, dm[2], dm[3])
    v4 = jnp.where(cond, dm[3], dm[2])
    v5 = jnp.where(cond, dm[4], dm[1])
    e2 = v3 - v2
    e3 = v4 - v3
    c1 = e2 - (v2 - v1)
    c2 = e3 - e2
    c3 = (v5 - v4) - e3
    # candidates anchored at v3: d1 = v3 + e2/2 + c1/3, etc. (same 1/3,-7/6,
    # 11/6... coefficients after expansion)
    d1 = v3 + 0.5 * e2 + (1.0 / 3.0) * c1
    d2 = v3 + 0.5 * e3 - (1.0 / 6.0) * c2
    d3 = v3 + 0.5 * e3 - (1.0 / 6.0) * c3
    c13 = 13.0 / 12.0
    t1 = c1 + 2.0 * e2  # = v1 - 4 v2 + 3 v3
    t2 = e2 + e3        # = v4 - v2 (squared below, sign irrelevant)
    t3 = c3 - 2.0 * e3  # = 3 v3 - 4 v4 + v5
    s1 = c13 * (c1 * c1) + 0.25 * (t1 * t1)
    s2 = c13 * (c2 * c2) + 0.25 * (t2 * t2)
    s3 = c13 * (c3 * c3) + 0.25 * (t3 * t3)
    vmax = jnp.maximum(
        jnp.maximum(jnp.maximum(v1 * v1, v2 * v2), jnp.maximum(v3 * v3, v4 * v4)),
        v5 * v5,
    )
    eps = _weno_eps(vmax, jnp.result_type(v1))
    return u * _weno_combine(s1, s2, s3, eps, d1, d2, d3, recip)


def weno5_upwind_fwd_bwd(dm, u, g, recip=None):
    """Forward value AND hand-derived cotangents of :func:`weno5_upwind` in
    one pass: ``(H, ddm[6], dcore_du)`` with ``H = u * core`` and ``g`` the
    cotangent of ``H``. ``dcore_du = core * g`` is the ``u`` cotangent.

    Exists because the fused Pallas backward kernel may not use
    ``jax.custom_vjp`` (array-residual custom VJPs miscompile under a
    kernel-level ``jax.vjp`` — see the round-4 note in ``weno_v2``), and the
    mechanical ``jax.vjp`` reverse of the WENO chain costs ~2.7x the forward;
    this explicit backward reuses every forward intermediate and costs ~1.3x.
    Plain jnp ops only — Mosaic-safe inside kernels, and differentiable
    itself should anyone ever need second order through the fallback paths.

    Matches ``jax.vjp(weno5_upwind)`` elementwise (same operations, same
    branch structure); the ``vmax`` maximum tree replicates JAX's
    tie-splitting semantics (0.5/0.5 on exact ties — ``lax._balanced_eq``),
    so flat regions where all ``v_i^2`` tie give bitwise-matching subgradients.

    ``recip`` as in :func:`_weno_combine`. Unlike the autodiff route, a fast
    reciprocal IS safe here (the hazard was custom-vjp primitives under a
    kernel-level ``jax.vjp``; this is plain forward code), and the backward
    uses the analytic ``d(1/x) = -r^2`` with the same approximate ``r`` —
    consistent to the approximation's 2^-26 relative error.
    """
    cond = u > 0
    v1 = jnp.where(cond, dm[0], dm[5])
    v2 = jnp.where(cond, dm[1], dm[4])
    v3 = jnp.where(cond, dm[2], dm[3])
    v4 = jnp.where(cond, dm[3], dm[2])
    v5 = jnp.where(cond, dm[4], dm[1])
    # -- forward (identical arithmetic to weno5_upwind) --
    e2 = v3 - v2
    e3 = v4 - v3
    c1 = e2 - (v2 - v1)
    c2 = e3 - e2
    c3 = (v5 - v4) - e3
    d1 = v3 + 0.5 * e2 + (1.0 / 3.0) * c1
    d2 = v3 + 0.5 * e3 - (1.0 / 6.0) * c2
    d3 = v3 + 0.5 * e3 - (1.0 / 6.0) * c3
    c13 = 13.0 / 12.0
    t1 = c1 + 2.0 * e2
    t2 = e2 + e3
    t3 = c3 - 2.0 * e3
    s1 = c13 * (c1 * c1) + 0.25 * (t1 * t1)
    s2 = c13 * (c2 * c2) + 0.25 * (t2 * t2)
    s3 = c13 * (c3 * c3) + 0.25 * (t3 * t3)
    sq1, sq2, sq3, sq4, sq5 = v1 * v1, v2 * v2, v3 * v3, v4 * v4, v5 * v5
    m12 = jnp.maximum(sq1, sq2)
    m34 = jnp.maximum(sq3, sq4)
    m14 = jnp.maximum(m12, m34)
    vmax = jnp.maximum(m14, sq5)
    eps = _weno_eps(vmax, jnp.result_type(v1))
    r = (1.0 / eps) if recip is None else recip(eps)
    b1 = s1 * r + 1.0
    b2 = s2 * r + 1.0
    b3 = s3 * r + 1.0
    p1 = b2 * b3
    p2 = b1 * b3
    p3 = b1 * b2
    q1 = 0.1 * (p1 * p1)
    q2 = 0.6 * (p2 * p2)
    q3 = 0.3 * (p3 * p3)
    qsum = q1 + q2 + q3
    w = (1.0 / qsum) if recip is None else recip(qsum)
    core = (q1 * d1 + q2 * d2 + q3 * d3) * w
    H = u * core

    # -- backward (reverse of the chain above, intermediates reused) --
    du = core * g
    gc = u * g
    wgc = w * gc
    dd1 = q1 * wgc
    dd2 = q2 * wgc
    dd3 = q3 * wgc
    # core = num*w, w = 1/qsum: dq_i = (d_i - core) * w * gc
    dq1 = (d1 - core) * wgc
    dq2 = (d2 - core) * wgc
    dq3 = (d3 - core) * wgc
    dp1 = 0.2 * p1 * dq1
    dp2 = 1.2 * p2 * dq2
    dp3 = 0.6 * p3 * dq3
    db1 = b3 * dp2 + b2 * dp3
    db2 = b3 * dp1 + b1 * dp3
    db3 = b2 * dp1 + b1 * dp2
    ds1 = r * db1
    ds2 = r * db2
    ds3 = r * db3
    dr = s1 * db1 + s2 * db2 + s3 * db3
    dvmax = -1.0e-6 * (r * r) * dr  # through eps = 1e-6*vmax + floor
    # maximum-tree backward, JAX tie semantics: on a==b both sides get 0.5

    def mbwd(a, b, ans, gm):
        ga = gm * jnp.where(a == ans, jnp.where(b == ans, 0.5, 1.0), 0.0)
        gb = gm * jnp.where(b == ans, jnp.where(a == ans, 0.5, 1.0), 0.0)
        return ga, gb

    dm14, dsq5 = mbwd(m14, sq5, vmax, dvmax)
    dm12, dm34 = mbwd(m12, m34, m14, dm14)
    dsq1, dsq2 = mbwd(sq1, sq2, m12, dm12)
    dsq3, dsq4 = mbwd(sq3, sq4, m34, dm34)
    dv1 = 2.0 * v1 * dsq1
    dv2 = 2.0 * v2 * dsq2
    dv3 = 2.0 * v3 * dsq3
    dv4 = 2.0 * v4 * dsq4
    dv5 = 2.0 * v5 * dsq5
    # s_i = c13*c_i^2 + 0.25*t_i^2
    dc1 = 2.0 * c13 * c1 * ds1
    dc2 = 2.0 * c13 * c2 * ds2
    dc3 = 2.0 * c13 * c3 * ds3
    dt1 = 0.5 * t1 * ds1
    dt2 = 0.5 * t2 * ds2
    dt3 = 0.5 * t3 * ds3
    # t1 = c1 + 2 e2 ; t2 = e2 + e3 ; t3 = c3 - 2 e3
    dc1 = dc1 + dt1
    de2 = 2.0 * dt1 + dt2
    de3 = dt2 - 2.0 * dt3
    dc3 = dc3 + dt3
    # candidates
    dv3 = dv3 + dd1 + dd2 + dd3
    de2 = de2 + 0.5 * dd1
    de3 = de3 + 0.5 * (dd2 + dd3)
    dc1 = dc1 + (1.0 / 3.0) * dd1
    dc2 = dc2 - (1.0 / 6.0) * dd2
    dc3 = dc3 - (1.0 / 6.0) * dd3
    # c1 = e2 - (v2 - v1); c2 = e3 - e2; c3 = (v5 - v4) - e3
    de2 = de2 + dc1 - dc2
    de3 = de3 + dc2 - dc3
    dv1 = dv1 + dc1
    dv2 = dv2 - dc1
    dv4 = dv4 - dc3
    dv5 = dv5 + dc3
    # e2 = v3 - v2; e3 = v4 - v3
    dv3 = dv3 + de2 - de3
    dv2 = dv2 - de2
    dv4 = dv4 + de3
    # undo the input selection
    zero = jnp.zeros((), jnp.result_type(v1))
    ddm = (
        jnp.where(cond, dv1, zero),
        jnp.where(cond, dv2, dv5),
        jnp.where(cond, dv3, dv4),
        jnp.where(cond, dv4, dv3),
        jnp.where(cond, dv5, dv2),
        jnp.where(cond, zero, dv1),
    )
    return H, ddm, du


def weno5_pair_diffs(p, axis, h, g, shape):
    """The six backward differences ``D- at I-2 .. I+3`` along ``axis`` feeding
    :func:`weno5_pair` (shared between both biases: ``D+ at I+m == D- at I+m+1``)."""
    s = [_s(p, axis, k, g, shape) for k in range(-3, 4)]  # offsets -3..3
    inv_h = 1.0 / h
    return [(s[k + 1] - s[k]) * inv_h for k in range(6)]


def weno5m(p, axis, h, g, shape):
    """Left-biased fifth-order WENO derivative along ``axis`` (``weno5-``).

    Uses the five backward differences at ``I-2 .. I+2``; needs ``g >= 3``.
    """
    s = [_s(p, axis, k, g, shape) for k in range(-3, 3)]  # offsets -3..2
    diffs = [(s[k + 1] - s[k]) / h for k in range(5)]  # D- at I-2..I+2
    return _weno_core(*diffs)


def weno5p(p, axis, h, g, shape):
    """Right-biased fifth-order WENO derivative along ``axis`` (``weno5+``).

    Uses the five forward differences at ``I+2 .. I-2`` (upwind end first).
    """
    s = [_s(p, axis, k, g, shape) for k in range(-2, 4)]  # offsets -2..3
    diffs = [(s[k + 1] - s[k]) / h for k in range(5)]  # D+ at I-2..I+2
    return _weno_core(diffs[4], diffs[3], diffs[2], diffs[1], diffs[0])


# -- ENO2 / Godunov building blocks (levelsetterms.jl:156-187,252-265) -------------


def minmod(x, y):
    """Minmod limiter: zero when signs differ, else the smaller magnitude."""
    same = x * y > 0.0
    pick = jnp.where(jnp.abs(x) <= jnp.abs(y), x, y)
    return jnp.where(same, pick, 0.0)


def eno2_onesided(p, axis, h, g, shape):
    """Second-order ENO one-sided derivatives ``(A, B)`` along ``axis``:

    ``A = D- + 0.5 h minmod(D2--, D2_0)`` and ``B = D+ - 0.5 h minmod(D2++, D2_0)``
    (reference ``levelsetterms.jl:156-170``). Needs ``g >= 2``.
    """
    c = d2c(p, axis, h, g, shape)
    A = dm(p, axis, h, g, shape) + 0.5 * h * minmod(d2mm(p, axis, h, g, shape), c)
    B = dp(p, axis, h, g, shape) - 0.5 * h * minmod(d2pp(p, axis, h, g, shape), c)
    return A, B


def safe_sqrt(x):
    """``sqrt`` with a finite derivative at 0 (double-where guard).

    Forward-identical to ``jnp.sqrt`` for ``x >= 0``; the VJP at ``x == 0``
    is 0 (a valid subgradient) instead of ``0 * inf = NaN``. Godunov norms
    are EXACTLY zero on locally monotone/flat profiles, so the bare sqrt
    poisons gradients of every normal-motion/eikonal term there."""
    safe = x > 0
    return jnp.where(safe, jnp.sqrt(jnp.where(safe, x, 1.0)), 0.0)


def godunov_norms(p, spacing, g, shape):
    """Godunov upwind gradient magnitudes ``(|grad+|, |grad-|)`` with ENO2 one-sided
    derivatives (Osher-Fedkiw eq. 6.28; reference ``levelsetterms.jl:156-170``):

    ``|grad+|^2 = sum_d max(A,0)^2 + min(B,0)^2`` — for outward motion (v > 0)
    ``|grad-|^2 = sum_d min(A,0)^2 + max(B,0)^2`` — for inward motion (v < 0)
    """
    gp2 = 0.0
    gm2 = 0.0
    for ax, h in enumerate(spacing):
        A, B = eno2_onesided(p, ax, h, g, shape)
        gp2 = gp2 + jnp.maximum(A, 0.0) ** 2 + jnp.minimum(B, 0.0) ** 2
        gm2 = gm2 + jnp.minimum(A, 0.0) ** 2 + jnp.maximum(B, 0.0) ** 2
    return safe_sqrt(gp2), safe_sqrt(gm2)
