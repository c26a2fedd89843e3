"""Grid geometry tests (oracle: reference test/test-meshes.jl semantics)."""

import numpy as np
import pytest

from lsm_tpu import Grid


def test_basic_geometry():
    g = Grid((0.0, 0.0), (1.0, 1.0), (10, 4))
    assert g.ndim == 2
    assert g.shape == (10, 4)
    h = g.spacing
    assert np.isclose(h[0], 1.0 / 9.0)
    assert np.isclose(h[1], 1.0 / 3.0)
    assert np.allclose(g.node((0, 0)), (0.0, 0.0))
    assert np.allclose(g.node((9, 3)), (1.0, 1.0))
    assert np.allclose(g.node((1, 2)), (1.0 / 9.0, 2.0 / 3.0))
    # unchecked ghost-node coordinates
    assert np.allclose(g.node((-1, 0)), (-1.0 / 9.0, 0.0))
    assert g.num_nodes == 40
    assert g.cells_shape == (9, 3)


def test_axis_coords():
    g = Grid((-1.0,), (1.0,), (5,))
    assert np.allclose(np.asarray(g.axis_coords(0)), [-1.0, -0.5, 0.0, 0.5, 1.0])


def test_from_meshsize_rounds_up():
    # reference: CartesianGrid((0,0),(1,1); meshsize=0.3) -> 5x5 nodes, h=0.25
    g = Grid.from_meshsize((0.0, 0.0), (1.0, 1.0), 0.3)
    assert g.shape == (5, 5)
    assert np.allclose(g.spacing, (0.25, 0.25))
    # exact divisor stays exact
    g2 = Grid.from_meshsize((0.0,), (1.0,), 0.25)
    assert g2.shape == (5,)


def test_validation():
    with pytest.raises(ValueError):
        Grid((0.0,), (1.0, 2.0), (5, 5))
    with pytest.raises(ValueError):
        Grid((0.0,), (0.0,), (5,))
    with pytest.raises(ValueError):
        Grid.from_meshsize((0.0,), (1.0,), -0.1)
    with pytest.raises(ValueError):
        Grid.from_meshsize((0.0,), (1.0,), (0.1, 0.1))


def test_locate_cell():
    import jax.numpy as jnp

    g = Grid((0.0, 0.0), (1.0, 1.0), (11, 11))  # h = 0.1, cells 0..9
    idx = g.locate_cell(jnp.asarray([0.05, 0.95]))
    assert tuple(np.asarray(idx)) == (0, 9)
    # clamped outside the grid
    idx = g.locate_cell(jnp.asarray([-0.5, 1.5]))
    assert tuple(np.asarray(idx)) == (0, 9)
