"""Level-set initial-condition library: signed-distance shapes and benchmark fields.

The reference builds these inline in docs/tests (Zalesak disk:
``/root/reference/docs/src/example-zalesak.md``; star / dumbbell / spiral:
``test/test-levelsetequation.jl:174-221``, ``docs/src/time-integrators.md``). Here
they are first-class: each returns a broadcastable-node-coordinate function suitable
for :func:`lsm_tpu.core.field.sample`, so shapes compose with CSG and sharding.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "circle",
    "sphere",
    "box",
    "plane",
    "torus",
    "star",
    "zalesak_disk",
    "zalesak_sphere",
    "dumbbell",
    "vortex_velocity",
    "rigid_rotation_velocity",
]


def circle(center=(0.0, 0.0), radius=0.5):
    """Exact SDF of a circle (2D) — also works for spheres given 3 coords."""

    def f(*xs):
        sq = sum((x - c) ** 2 for x, c in zip(xs, center))
        return jnp.sqrt(sq) - radius

    return f


sphere = circle


def plane(normal, offset=0.0):
    """Half-space ``{n . x <= offset}``: SDF ``(n . x - offset) / |n|``."""
    import math

    nrm = math.sqrt(sum(c * c for c in normal))

    def f(*xs):
        return (sum(n * x for n, x in zip(normal, xs)) - offset) / nrm

    return f


def box(lo, hi):
    """Exact SDF of an axis-aligned box ``[lo, hi]``."""

    def f(*xs):
        center = [(l + h) / 2.0 for l, h in zip(lo, hi)]
        half = [(h - l) / 2.0 for l, h in zip(lo, hi)]
        q = [jnp.abs(x - c) - s for x, c, s in zip(xs, center, half)]
        outside_sq = sum(jnp.maximum(qi, 0.0) ** 2 for qi in q)
        inside = q[0]
        for qi in q[1:]:
            inside = jnp.maximum(inside, qi)
        return jnp.sqrt(outside_sq) + jnp.minimum(inside, 0.0)

    return f


def torus(center=(0.0, 0.0, 0.0), major=0.5, minor=0.2):
    """Exact SDF of a torus around the z-axis through ``center`` (3D)."""

    def f(x, y, z):
        qx = jnp.sqrt((x - center[0]) ** 2 + (y - center[1]) ** 2) - major
        return jnp.sqrt(qx**2 + (z - center[2]) ** 2) - minor

    return f


def star(center=(0.0, 0.0), radius=0.5, amplitude=0.1, lobes=5, phase=-jnp.pi / 2):
    """Star-shaped curve ``r(theta) = radius + amplitude cos(lobes * theta)``
    (reference star rotation test, ``test/test-levelsetequation.jl:208-221``)."""

    def f(x, y):
        dx, dy = x - center[0], y - center[1]
        r = jnp.sqrt(dx * dx + dy * dy)
        theta = jnp.arctan2(dy, dx) + phase
        return r - (radius + amplitude * jnp.cos(lobes * theta))

    return f


def zalesak_disk(center=(0.5, 0.75), radius=0.15, slot_width=0.05, slot_depth=0.25):
    """Classic Zalesak slotted disk: disc minus a vertical slot opening downward.

    CSG: ``max(circle, -slot_box)`` (set difference), with the slot centered on the
    disc's vertical axis and reaching from below the disc up to
    ``center_y - radius + slot_depth``.
    """
    cx, cy = center
    slot = box(
        (cx - slot_width / 2.0, cy - radius - slot_depth),
        (cx + slot_width / 2.0, cy - radius + slot_depth),
    )
    disc = circle(center, radius)

    def f(x, y):
        return jnp.maximum(disc(x, y), -slot(x, y))

    return f


def zalesak_sphere(center=(0.5, 0.75, 0.5), radius=0.15, slot_width=0.05, slot_depth=0.25):
    """3D slotted sphere (reference ``docs/src/example-zalesak.md``)."""
    cx, cy, cz = center
    slot = box(
        (cx - slot_width / 2.0, cy - radius - slot_depth, cz - radius - slot_depth),
        (cx + slot_width / 2.0, cy - radius + slot_depth, cz + radius + slot_depth),
    )
    ball = sphere(center, radius)

    def f(x, y, z):
        return jnp.maximum(ball(x, y, z), -slot(x, y, z))

    return f


def dumbbell(c1=(-0.4, 0.0), c2=(0.4, 0.0), radius=0.3, bar_halfwidth=0.08):
    """Two discs joined by a bar (reference ``docs/src/time-integrators.md``)."""
    b1 = circle(c1, radius)
    b2 = circle(c2, radius)
    bar = box((c1[0], -bar_halfwidth), (c2[0], bar_halfwidth))

    def f(x, y):
        return jnp.minimum(jnp.minimum(b1(x, y), b2(x, y)), bar(x, y))

    return f


# -- canonical velocity fields -----------------------------------------------------


def rigid_rotation_velocity(center=(0.0, 0.0), omega=1.0):
    """Rigid-body rotation ``u = omega * (-(y - cy), x - cx)``."""

    def u(xs, t):
        x, y = xs[0], xs[1]
        return (-omega * (y - center[1]) + 0.0 * x, omega * (x - center[0]) + 0.0 * y)

    return u


def vortex_velocity(period=None):
    """Single-vortex (swirl) field on [0,1]^2 stretching an interface into a spiral;
    with ``period`` the flow reverses as ``cos(pi t / period)`` so the exact solution
    returns to the initial condition at ``t = period`` (vortex-spiral benchmark)."""

    def u(xs, t):
        x, y = xs[0], xs[1]
        sx = jnp.sin(jnp.pi * x)
        sy = jnp.sin(jnp.pi * y)
        ux = -(sx**2) * jnp.sin(2.0 * jnp.pi * y)
        uy = jnp.sin(2.0 * jnp.pi * x) * sy**2
        if period is not None:
            mod = jnp.cos(jnp.pi * t / period)
            ux, uy = ux * mod, uy * mod
        return (ux + 0.0 * y, uy + 0.0 * x)

    return u
