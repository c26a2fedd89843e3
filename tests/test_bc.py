"""Boundary-condition ghost-padding tests.

Oracles: reference ``test/test-meshfield.jl`` BC testsets — periodic wrap indices,
degree-P polynomial exactness for extrapolation (including corner ghosts), and
symmetry reflection about the boundary node.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lsm_tpu import (
    Grid,
    MeshField,
    Periodic,
    Extrapolation,
    Neumann,
    LinearExtrapolation,
    Symmetry,
    normalize_bcs,
    sample,
)
from lsm_tpu.core.bc import pad_ghost


def _pad1d(vals, bc, width):
    return np.asarray(pad_ghost(jnp.asarray(vals), normalize_bcs(bc, 1), width))


def test_periodic_wrap():
    # reference: mf[1,0] == vals[1,4] (wrap dim 2, n=5); mf[11,5] == mf[2,5] (n=10)
    rng = np.random.default_rng(0)
    vals = rng.random((10, 5))
    grid = Grid((0.0, 0.0), (1.0, 1.0), (10, 5))
    mf = MeshField(jnp.asarray(vals), grid, Periodic())
    p = np.asarray(mf.pad(2))  # padded indices: interior i -> p[i+2]
    # ghost (0, -1) [julia (1,0)] == vals[0, 3] [julia vals[1,4]]
    assert np.isclose(p[0 + 2, -1 + 2], vals[0, 3])
    # ghost (10, 4) [julia (11,5)] == vals[1, 4] [julia mf[2,5]]
    assert np.isclose(p[10 + 2, 4 + 2], vals[1, 4])
    # left ghost distance k reads node n-1-k
    assert np.isclose(p[-1 + 2, 0 + 2], vals[10 - 2, 0])
    assert np.isclose(p[-2 + 2, 0 + 2], vals[10 - 3, 0])


def test_extrapolation_exact_on_polynomials_1d():
    a, b, n = -0.3, 1.7, 10
    grid = Grid((a,), (b,), (n,))
    h = grid.spacing[0]
    x = np.asarray(grid.axis_coords(0))
    for P in range(6):
        width = P + 1
        for k in range(P + 1):
            f = x**k
            p = _pad1d(f, Extrapolation(P), width)
            for j in range(1, width + 1):
                assert np.isclose(p[width - j], (a - j * h) ** k, atol=1e-10)
                assert np.isclose(p[width + n - 1 + j], (b + j * h) ** k, atol=1e-10)


def test_extrapolation_2d_corners():
    a1, a2, b1, b2 = -0.3, 0.5, 1.7, 2.1
    n1, n2 = 8, 6
    grid = Grid((a1, a2), (b1, b2), (n1, n2))
    h1, h2 = grid.spacing
    for P in range(1, 4):
        for j in range(P + 1):
            for k in range(P + 1):
                mf = sample(lambda X, Y: X**j * Y**k, grid, Extrapolation(P))
                p = np.asarray(mf.pad(1))
                y2 = float(grid.node((0, 2))[1])
                assert np.isclose(p[0, 2 + 1], (a1 - h1) ** j * y2**k, atol=1e-10)
                assert np.isclose(p[n1 + 1, 2 + 1], (b1 + h1) ** j * y2**k, atol=1e-10)
                # corner ghosts compose the per-dim extrapolations
                assert np.isclose(p[0, 0], (a1 - h1) ** j * (a2 - h2) ** k, atol=1e-10)
                assert np.isclose(p[-1, -1], (b1 + h1) ** j * (b2 + h2) ** k, atol=1e-10)


def test_symmetry_reflection():
    grid = Grid((0.0,), (4.0,), (5,))  # nodes at 0..4, f[i] = i
    f = np.arange(5.0)
    p = _pad1d(f, Symmetry(), 2)
    # ghost -1 mirrors node 1; ghost -2 mirrors node 2 (julia phi[0]==1, phi[-1]==2)
    assert p[1] == 1.0 and p[0] == 2.0
    # ghost n mirrors node n-2; ghost n+1 mirrors node n-3 (julia phi[6]==3, phi[7]==2)
    assert p[2 + 5] == 3.0 and p[2 + 6] == 2.0
    # differs from Neumann flat extension
    pn = _pad1d(f, Neumann(), 1)
    assert pn[0] == 0.0
    # exact for a field even about the boundary node at x = 0
    g = np.asarray(grid.axis_coords(0)) ** 2
    pe = _pad1d(g, Symmetry(), 2)
    assert np.isclose(pe[1], 1.0) and np.isclose(pe[0], 4.0)


def test_symmetry_corner_composes():
    grid = Grid((0.0, 0.0), (4.0, 4.0), (5, 5))
    mf = sample(lambda X, Y: X + 10 * Y, grid, Symmetry())
    p = np.asarray(mf.pad(1))
    # julia phi2[0,0] == phi2[2,2]  ->  ghost (-1,-1) == node (1,1)
    assert p[0, 0] == p[1 + 1, 1 + 1]


def test_normalize_bc_validation():
    with pytest.raises(ValueError):
        normalize_bcs((Periodic(),), 2)  # wrong count
    with pytest.raises(ValueError):
        normalize_bcs(((Periodic(), Neumann()),), 1)  # one-sided periodicity
    out = normalize_bcs(Periodic(), 3)
    assert len(out) == 3 and all(isinstance(b, Periodic) for pair in out for b in pair)
    out = normalize_bcs([(Neumann(), LinearExtrapolation()), Symmetry()], 2)
    assert out[0][1] == Extrapolation(1)
    assert isinstance(out[1][0], Symmetry)


def test_pad_requires_bcs():
    grid = Grid((0.0,), (1.0,), (5,))
    mf = MeshField(jnp.zeros(5), grid)
    with pytest.raises(ValueError):
        mf.pad(1)


def test_vector_field_pad():
    grid = Grid((0.0, 0.0), (1.0, 1.0), (6, 6))
    v = sample(lambda X, Y: (X + 0 * Y, 0 * X + Y), grid, Periodic(), vector=True)
    assert v.is_vector
    p = v.pad(2)
    assert p.shape == (2, 10, 10)
