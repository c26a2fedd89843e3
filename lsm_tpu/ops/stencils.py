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
    p: jnp.ndarray, offsets, g: int, shape: Sequence[int]
) -> jnp.ndarray:
    """Interior-shaped view ``phi[I + offsets]`` of a padded array.

    ``offsets`` is a per-spatial-dim tuple of integer shifts. Leading (component)
    axes of ``p`` beyond ``len(shape)`` are passed through.
    """
    nspatial = len(shape)
    lead = p.ndim - nspatial
    sl = [slice(None)] * lead
    for d in range(nspatial):
        off = offsets[d]
        sl.append(slice(g + off, g + off + shape[d]))
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
    return jnp.sqrt(gp2), jnp.sqrt(gm2)
