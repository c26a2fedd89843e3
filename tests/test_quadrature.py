"""Implicit-domain quadrature oracles (mirrors reference test/test-quadrature.jl)."""

import numpy as np
import jax.numpy as jnp
import pytest

from lsm_tpu import Extrapolation, Grid, InterpolatedField, NarrowBandField, sample
from lsm_tpu.geometry.quadrature import integrate, quadrature
from conftest import convergence_orders


def test_2d_circle():
    R = 0.5
    grid = Grid((-1.0, -1.0), (1.0, 1.0), (21, 21))
    phi = sample(lambda X, Y: X**2 + Y**2 - R**2, grid)
    area = integrate(None, quadrature(phi, quadrature_order=4, surface=False))
    assert abs(area - np.pi * R**2) < 1e-4
    per = integrate(None, quadrature(phi, quadrature_order=4, surface=True))
    assert abs(per - 2 * np.pi * R) < 1e-3


def test_interpolated_field_form_matches():
    R = 0.5
    grid = Grid((-1.0, -1.0), (1.0, 1.0), (21, 21))
    mf = sample(lambda X, Y: X**2 + Y**2 - R**2, grid)
    cf = InterpolatedField(mf, 3)
    a1 = integrate(None, quadrature(mf, interpolation_order=3, quadrature_order=4))
    a2 = integrate(None, quadrature(cf, quadrature_order=4))
    assert np.isclose(a1, a2, rtol=1e-12)


def test_2d_ellipse():
    a, b = 0.6, 0.3
    grid = Grid((-1.0, -1.0), (1.0, 1.0), (41, 41))
    phi = sample(lambda X, Y: (X / a) ** 2 + (Y / b) ** 2 - 1.0, grid)
    area = integrate(None, quadrature(phi, quadrature_order=4, surface=False))
    assert abs(area - np.pi * a * b) / (np.pi * a * b) < 1e-3
    h = ((a - b) / (a + b)) ** 2
    peri = np.pi * (a + b) * (1 + 3 * h / (10 + np.sqrt(4 - 3 * h)))
    per = integrate(None, quadrature(phi, quadrature_order=4, surface=True))
    assert abs(per - peri) / peri < 1e-3


def test_3d_sphere():
    R = 0.5
    grid = Grid((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0), (11, 11, 11))
    phi = sample(lambda X, Y, Z: X**2 + Y**2 + Z**2 - R**2, grid)
    vol = integrate(None, quadrature(phi, quadrature_order=2, surface=False))
    assert abs(vol - 4 * np.pi / 3 * R**3) < 1e-3
    surf = integrate(None, quadrature(phi, quadrature_order=2, surface=True))
    assert abs(surf - 4 * np.pi * R**2) < 1e-2


def test_3d_ellipsoid():
    a, b, c = 0.61, 0.37, 0.29
    grid = Grid((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0), (21, 21, 21))
    phi = sample(lambda X, Y, Z: (X / a) ** 2 + (Y / b) ** 2 + (Z / c) ** 2 - 1.0, grid)
    vol = integrate(None, quadrature(phi, quadrature_order=3, surface=False))
    exact = 4 / 3 * np.pi * a * b * c
    assert abs(vol - exact) / exact < 1e-3


def test_h_convergence_circle():
    # interp order k (odd), quad order k+1 => O(h^(k+1)) area and perimeter
    R = 0.5
    ns = [10, 20, 40]
    for k in (3,):
        area_errs, perim_errs = [], []
        for n in ns:
            grid = Grid((-1.0, -1.0), (1.0, 1.0), (n, n))
            phi = sample(lambda X, Y: jnp.sqrt(X**2 + Y**2) - R, grid)
            cf = InterpolatedField(phi, k)
            area_errs.append(
                abs(integrate(None, quadrature(cf, quadrature_order=k + 1)) - np.pi * R**2)
            )
            perim_errs.append(
                abs(
                    integrate(None, quadrature(cf, quadrature_order=k + 1, surface=True))
                    - 2 * np.pi * R
                )
            )
        assert min(convergence_orders(area_errs, ns)) >= k + 0.5, area_errs
        assert min(convergence_orders(perim_errs, ns)) >= k + 0.5, perim_errs


def test_narrow_band():
    R = 0.5
    grid = Grid((-1.0, -1.0), (1.0, 1.0), (41, 41))
    phi = sample(lambda X, Y: X**2 + Y**2 - R**2, grid, Extrapolation(2))
    nb = NarrowBandField.from_field(phi)
    with pytest.raises(ValueError):
        quadrature(nb, quadrature_order=4, surface=False)
    s_full = integrate(None, quadrature(phi, quadrature_order=4, surface=True))
    s_band = integrate(None, quadrature(nb, quadrature_order=4, surface=True))
    assert np.isclose(s_full, s_band, rtol=1e-10)


def test_weighted_integrand():
    # integral of x^2+y^2 over the disc of radius R = pi R^4 / 2
    R = 0.6
    grid = Grid((-1.0, -1.0), (1.0, 1.0), (31, 31))
    phi = sample(lambda X, Y: X**2 + Y**2 - R**2, grid)
    q = quadrature(phi, quadrature_order=5)
    val = integrate(lambda p: p[:, 0] ** 2 + p[:, 1] ** 2, q)
    assert abs(val - np.pi * R**4 / 2) < 1e-4
