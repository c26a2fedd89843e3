"""Geometric queries and CSG on level-set fields.

TPU-native analogue of ``/root/reference/src/levelsetops.jl``: smoothed-Heaviside
volume, smoothed-Dirac perimeter, centered-difference gradient / normal / Hessian /
mean curvature, and min/max constructive solid geometry — all as whole-array
reductions and elementwise maps (``jnp.sum`` replaces the reference's band scanline
tricks since dense reductions are free on TPU; the narrow-band module reuses these
with masks).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from ..core.bc import LinearExtrapolation
from ..core.field import MeshField
from ..ops import stencils as st

__all__ = [
    "smooth_heaviside",
    "smooth_delta",
    "volume",
    "perimeter",
    "gradient",
    "grad_norm",
    "normal",
    "hessian",
    "curvature",
    "union",
    "intersection",
    "complement",
    "difference",
]


# -- smoothed distributions (levelsetops.jl:171-183) -------------------------------


def smooth_heaviside(x, alpha):
    """Smoothed Heaviside with transition half-width ``alpha`` (from "A Variational
    Level Set Approach to Multiphase Motion")."""
    core = 0.5 * (1.0 + x / alpha + jnp.sin(jnp.pi * x / alpha) / jnp.pi)
    return jnp.where(x > alpha, 1.0, jnp.where(x < -alpha, 0.0, core))


def smooth_delta(x, alpha):
    """Smoothed Dirac delta with support ``|x| <= alpha``."""
    return jnp.where(jnp.abs(x) > alpha, 0.0, 0.5 / alpha * (1.0 + jnp.cos(jnp.pi * x / alpha)))


# -- measures (levelsetops.jl:27-33,139-149) ---------------------------------------


def volume(phi: MeshField) -> jnp.ndarray:
    """Measure of ``{phi <= 0}`` via ``integral of H(-phi)`` with the smoothed
    Heaviside of half-width ``min(h)``."""
    _check_scalar(phi)
    alpha = phi.grid.min_spacing
    return phi.grid.cell_volume * jnp.sum(smooth_heaviside(-phi.values, alpha))


def perimeter(phi: MeshField) -> jnp.ndarray:
    """Measure of ``{phi = 0}`` via ``integral of delta(phi) |grad(phi)|``; border
    contributions neglected. Supplies a linear-extrapolation BC when the field has
    none (``levelsetops.jl:142``)."""
    _check_scalar(phi)
    if not phi.has_bcs():
        phi = phi.with_bcs(LinearExtrapolation())
    alpha = phi.grid.min_spacing
    p = phi.pad(st.PAD_D0)
    gn = grad_norm_from_padded(p, phi.spacing, st.PAD_D0, phi.shape)
    return phi.grid.cell_volume * jnp.sum(smooth_delta(phi.values, alpha) * gn)


# -- differential geometry (levelsetops.jl:186-244) --------------------------------


def gradient_from_padded(p, spacing, g, shape) -> Tuple[jnp.ndarray, ...]:
    return tuple(st.d0(p, ax, h, g, shape) for ax, h in enumerate(spacing))


def grad_norm_from_padded(p, spacing, g, shape) -> jnp.ndarray:
    comps = gradient_from_padded(p, spacing, g, shape)
    sq = 0.0
    for c in comps:
        sq = sq + c * c
    # guarded sqrt: |grad phi| is exactly 0 at flat points, where the bare
    # sqrt's infinite derivative would poison gradients (see st.safe_sqrt)
    return st.safe_sqrt(sq)


def hessian_from_padded(p, spacing, g, shape):
    """Upper-triangular dict ``{(i, j): d2 phi / dx_i dx_j}`` (symmetric)."""
    n = len(spacing)
    H = {}
    for i in range(n):
        H[(i, i)] = st.d2c(p, i, spacing[i], g, shape)
        for j in range(i + 1, n):
            H[(i, j)] = st.d2_mixed(p, i, j, spacing[i], spacing[j], g, shape)
    return H


def curvature_from_padded(p, spacing, g, shape) -> jnp.ndarray:
    """Mean curvature ``kappa = (lap(phi) |grad|^2 - grad^T H grad) / |grad|^3``,
    zero where the gradient vanishes (``levelsetops.jl:197-205``)."""
    grad = gradient_from_padded(p, spacing, g, shape)
    H = hessian_from_padded(p, spacing, g, shape)
    n = len(spacing)
    nrmsq = 0.0
    for c in grad:
        nrmsq = nrmsq + c * c
    lap = 0.0
    quad = 0.0
    for i in range(n):
        lap = lap + H[(i, i)]
        quad = quad + grad[i] * grad[i] * H[(i, i)]
        for j in range(i + 1, n):
            quad = quad + 2.0 * grad[i] * grad[j] * H[(i, j)]
    eps = jnp.finfo(p.dtype).eps
    safe = nrmsq >= eps
    nrmsq_safe = jnp.where(safe, nrmsq, 1.0)
    kappa = (lap * nrmsq_safe - quad) / nrmsq_safe**1.5
    return jnp.where(safe, kappa, 0.0)


def _padded(phi: MeshField, width: int):
    _check_scalar(phi)
    return phi.pad(width)


def gradient(phi: MeshField) -> jnp.ndarray:
    """Centered-difference gradient, stacked on a leading component axis."""
    p = _padded(phi, st.PAD_D0)
    return jnp.stack(gradient_from_padded(p, phi.spacing, st.PAD_D0, phi.shape))


def grad_norm(phi: MeshField) -> jnp.ndarray:
    p = _padded(phi, st.PAD_D0)
    return grad_norm_from_padded(p, phi.spacing, st.PAD_D0, phi.shape)


def normal(phi: MeshField, min_norm: float = 0.0) -> jnp.ndarray:
    """Unit exterior normal ``grad(phi)/|grad(phi)|`` (leading component axis)."""
    g = gradient(phi)
    nrm = jnp.sqrt(jnp.sum(g * g, axis=0))
    if min_norm > 0:
        nrm = jnp.maximum(nrm, min_norm)
    return g / nrm


def hessian(phi: MeshField) -> jnp.ndarray:
    """Dense symmetric Hessian, shape ``(ndim, ndim, *grid.shape)``."""
    p = _padded(phi, st.PAD_D0)
    H = hessian_from_padded(p, phi.spacing, st.PAD_D0, phi.shape)
    n = phi.ndim
    rows = []
    for i in range(n):
        row = [H[(min(i, j), max(i, j))] for j in range(n)]
        rows.append(jnp.stack(row))
    return jnp.stack(rows)


def curvature(phi: MeshField) -> jnp.ndarray:
    p = _padded(phi, st.PAD_D0)
    return curvature_from_padded(p, phi.spacing, st.PAD_D0, phi.shape)


# -- CSG (levelsetops.jl:253-325) --------------------------------------------------


def union(phi1: MeshField, phi2: MeshField) -> MeshField:
    """Union of the enclosed domains: ``min(phi1, phi2)``."""
    return phi1.with_values(jnp.minimum(phi1.values, phi2.values))


def intersection(phi1: MeshField, phi2: MeshField) -> MeshField:
    """Intersection of the enclosed domains: ``max(phi1, phi2)``."""
    return phi1.with_values(jnp.maximum(phi1.values, phi2.values))


def complement(phi: MeshField) -> MeshField:
    """Complement of the enclosed domain: ``-phi``."""
    return phi.with_values(-phi.values)


def difference(phi1: MeshField, phi2: MeshField) -> MeshField:
    """Set difference: ``max(phi1, -phi2)``."""
    return phi1.with_values(jnp.maximum(phi1.values, -phi2.values))


def _check_scalar(phi: MeshField):
    if phi.is_vector:
        raise ValueError("operation only applies to real-valued (scalar) fields")
