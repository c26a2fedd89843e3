"""Native surface extraction + mesh export tests (reference MMG ext analogues)."""

import numpy as np
import jax.numpy as jnp
import pytest

from lsm_tpu import Grid, sample
from lsm_tpu.models import shapes
from lsm_tpu.io import (
    export_surface_mesh,
    export_volume_mesh,
    marching_squares,
    marching_tetrahedra,
    weld_triangles,
    write_obj,
)


def _sphere(n=33, r=0.5):
    grid = Grid((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0), (n, n, n))
    return sample(shapes.sphere((0.0, 0.0, 0.0), r), grid)


def test_marching_tets_sphere_area_and_radius():
    phi = _sphere(41)
    tris = marching_tetrahedra(phi)
    assert tris.shape[0] > 100
    # all triangle vertices lie near the sphere
    radii = np.linalg.norm(tris.reshape(-1, 3), axis=1)
    assert np.abs(radii - 0.5).max() < 0.01
    # total area ~ 4 pi r^2
    a = tris[:, 1] - tris[:, 0]
    b = tris[:, 2] - tris[:, 0]
    area = 0.5 * np.linalg.norm(np.cross(a, b), axis=1).sum()
    assert abs(area - 4 * np.pi * 0.25) < 0.05, area


def test_marching_tets_watertight():
    # welded mesh of a closed surface: every edge shared by exactly 2 triangles
    phi = _sphere(25)
    verts, faces = weld_triangles(marching_tetrahedra(phi))
    edges = {}
    for tri in faces:
        for e in ((tri[0], tri[1]), (tri[1], tri[2]), (tri[2], tri[0])):
            key = (min(e), max(e))
            edges[key] = edges.get(key, 0) + 1
    counts = np.asarray(list(edges.values()))
    assert (counts == 2).all()


def test_marching_squares_circle():
    grid = Grid((-1.0, -1.0), (1.0, 1.0), (101, 101))
    phi = sample(shapes.circle((0.0, 0.0), 0.6), grid)
    segs = marching_squares(phi)
    assert segs.shape[0] > 50
    radii = np.linalg.norm(segs.reshape(-1, 2), axis=1)
    assert np.abs(radii - 0.6).max() < 0.005
    # total length ~ 2 pi r
    lengths = np.linalg.norm(segs[:, 1] - segs[:, 0], axis=1).sum()
    assert abs(lengths - 2 * np.pi * 0.6) < 0.05


def test_mesh_export(tmp_path):
    phi = _sphere(17)
    surf = export_surface_mesh(phi, tmp_path / "sphere")
    text = surf.read_text()
    assert "Triangles" in text and "Vertices" in text

    vol = export_volume_mesh(phi, tmp_path / "ball")
    text = vol.read_text()
    assert "Tetrahedra" in text
    sol = (tmp_path / "ball.sol").read_text()
    assert "SolAtVertices" in sol

    verts, faces = weld_triangles(marching_tetrahedra(phi))
    obj = write_obj(tmp_path / "sphere.obj", verts, faces)
    assert obj.read_text().startswith("v ")


def test_no_interface():
    grid = Grid((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0), (9, 9, 9))
    phi = sample(lambda X, Y, Z: 1.0 + 0 * (X + Y + Z), grid)
    assert marching_tetrahedra(phi).shape[0] == 0
    with pytest.raises(ValueError):
        export_surface_mesh(phi, "/tmp/nothing")


def test_plotting(tmp_path):
    from lsm_tpu import NarrowBandField, Extrapolation
    from lsm_tpu.io import save_plot

    grid = Grid((-1.0, -1.0), (1.0, 1.0), (64, 64))
    phi = sample(shapes.star(), grid, Extrapolation(2))
    p = save_plot(phi, tmp_path / "star.png")
    assert p.stat().st_size > 1000
    nb = NarrowBandField.from_field(phi)
    p2 = save_plot(nb, tmp_path / "band.png")
    assert p2.stat().st_size > 1000
    p3 = save_plot(_sphere(17), tmp_path / "sphere3d.png")
    assert p3.stat().st_size > 1000
