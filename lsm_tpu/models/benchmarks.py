"""The five canonical benchmark configurations (driver ``BASELINE.json``).

Each builder returns a ready :class:`~lsm_tpu.equation.LevelSetEquation` (plus
exact-solution helpers where known), so the benchmark harness, the tests and
the docs all run the same configs:

1. :func:`config1_circle_advection`   — 2D circle, constant advection,
   1st-order upwind + forward Euler, 100^2.
2. :func:`config2_zalesak`            — Zalesak disk rotation, WENO5 + TVD-RK3,
   periodic BCs (area-loss check).
3. :func:`config3_vortex_spiral`      — single-vortex stretch with cosine time
   reversal; exact solution returns to the initial disk at ``t = period``.
4. :func:`config4_curvature_normal`   — mean-curvature + normal motion.
5. :func:`config5_shape_opt_3d`       — 3D narrow band + velocity extension +
   differentiable shape-optimization rollout (returns a loss/grad function).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.bc import Extrapolation, Periodic
from ..core.field import MeshField, sample
from ..core.grid import Grid
from ..core.narrowband import NarrowBandField
from ..equation import LevelSetEquation
from ..geometry.queries import volume
from ..integrators.explicit import RK3, ForwardEuler
from ..integrators.loop import rollout
from ..reinit.velocity_extension import extend_along_normals
from ..terms.terms import AdvectionTerm, CurvatureTerm, NormalMotionTerm
from . import shapes

__all__ = [
    "config1_circle_advection",
    "config2_zalesak",
    "config3_vortex_spiral",
    "config4_curvature_normal",
    "config5_shape_opt_3d",
]


def config1_circle_advection(n: int = 100, dtype=None) -> Tuple[LevelSetEquation, Callable]:
    """2D circle under constant advection u=(1,0); upwind + forward Euler."""
    grid = Grid((-2.0, -2.0), (2.0, 2.0), (n, n))
    phi = sample(shapes.circle((0.0, 0.0), 0.5), grid, dtype=dtype)
    u = lambda xs, t: (jnp.ones_like(xs[0] + xs[1]), jnp.zeros_like(xs[0] + xs[1]))
    eq = LevelSetEquation(
        terms=(AdvectionTerm(u, scheme="upwind"),),
        ic=phi, bc=Extrapolation(1), integrator=ForwardEuler(),
    )

    def exact(t):
        return sample(shapes.circle((t, 0.0), 0.5), grid, dtype=dtype)

    return eq, exact


def config2_zalesak(n: int = 128, dtype=None) -> LevelSetEquation:
    """Zalesak slotted-disk rigid rotation on [0,1]^2; one revolution at t=1."""
    grid = Grid((0.0, 0.0), (1.0, 1.0), (n, n))
    phi = sample(shapes.zalesak_disk(), grid, dtype=dtype)
    u = shapes.rigid_rotation_velocity((0.5, 0.5), 2.0 * jnp.pi)
    return LevelSetEquation(
        terms=(AdvectionTerm(u),), ic=phi, bc=Periodic(), integrator=RK3()
    )


def config3_vortex_spiral(n: int = 128, period: float = 4.0, dtype=None) -> LevelSetEquation:
    """Single-vortex spiral stretch with time reversal (exact return at t=period)."""
    grid = Grid((0.0, 0.0), (1.0, 1.0), (n, n))
    phi = sample(shapes.circle((0.5, 0.75), 0.15), grid, dtype=dtype)
    u = shapes.vortex_velocity(period=period)
    return LevelSetEquation(
        terms=(AdvectionTerm(u),), ic=phi, bc=Extrapolation(2), integrator=RK3()
    )


def config4_curvature_normal(n: int = 100, b: float = -0.05, v: float = 0.2, dtype=None):
    """Mean-curvature flow + outward normal motion of a star."""
    grid = Grid((-1.0, -1.0), (1.0, 1.0), (n, n))
    phi = sample(shapes.star(), grid, dtype=dtype)
    return LevelSetEquation(
        terms=(CurvatureTerm(b), NormalMotionTerm(v)),
        ic=phi, bc=Extrapolation(2), integrator=RK3(),
    )


def config5_shape_opt_3d(
    n: int = 64,
    nsteps: int = 8,
    target_volume: float = 0.3,
    nlayers: int = 3,
    dtype=jnp.float32,
):
    """Differentiable 3D shape optimization through a full rollout.

    Returns ``(loss_and_grad, phi0, speed0)``: the loss evolves the (banded)
    level set under a normal-motion speed that is first extended off the
    interface along normals, rolls out ``nsteps`` RK3 steps, and penalizes the
    volume mismatch — gradients flow to both the initial level set and the
    speed field through every timestep (the north-star differentiable path).
    """
    grid = Grid((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0), (n, n, n))
    phi0 = sample(shapes.sphere((0.0, 0.0, 0.0), 0.45), grid, Extrapolation(1), dtype=dtype)
    speed0 = jnp.full(grid.shape, 0.1, dtype=dtype)
    dt = dtype(0.4) * grid.min_spacing
    integrator = RK3()

    def loss_fn(phi_values, speed_values):
        phi = NarrowBandField(phi_values, grid, phi0.bcs, nlayers=nlayers, _normalized=True)
        speed = extend_along_normals(speed_values, MeshField(phi_values, grid, phi0.bcs, _normalized=True), nb_iters=10)
        term = NormalMotionTerm(MeshField(speed, grid, phi0.bcs, _normalized=True))
        out, _ = rollout(integrator, (term,), phi, 0.0, dt, nsteps)
        return (volume(out) - target_volume) ** 2

    return jax.value_and_grad(loss_fn, argnums=(0, 1)), phi0, speed0
