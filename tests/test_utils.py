"""Checkpoint/resume and monitoring tests (new aux surface, SURVEY.md sec. 5)."""

import numpy as np
import jax.numpy as jnp

from lsm_tpu import (
    AdvectionTerm, Extrapolation, Grid, LevelSetEquation, NarrowBandField,
    Periodic, sample,
)
from lsm_tpu.models import shapes
from lsm_tpu.utils import StepMonitor, load_checkpoint, save_checkpoint, timed


def test_checkpoint_roundtrip_dense(tmp_path):
    grid = Grid((-1.0, -1.0), (1.0, 1.0), (32, 32))
    phi = sample(shapes.circle(radius=0.4), grid, Periodic())
    p = save_checkpoint(tmp_path / "ck.npz", phi, t=0.75,
                        extra_arrays={"vel": np.ones((2, 32, 32))},
                        metadata={"run": "test"})
    phi2, t, extra, meta = load_checkpoint(p)
    assert t == 0.75 and meta == {"run": "test"}
    assert np.array_equal(np.asarray(phi2.values), np.asarray(phi.values))
    assert phi2.bcs == phi.bcs and phi2.grid == grid
    assert extra["vel"].shape == (2, 32, 32)


def test_checkpoint_roundtrip_band(tmp_path):
    grid = Grid((-1.0, -1.0), (1.0, 1.0), (48, 48))
    nb = NarrowBandField.from_field(sample(shapes.star(), grid, Extrapolation(2)))
    p = save_checkpoint(tmp_path / "nb.npz", nb, t=1.5)
    nb2, t, _, _ = load_checkpoint(p)
    assert isinstance(nb2, NarrowBandField)
    assert np.array_equal(np.asarray(nb2.mask), np.asarray(nb.mask))
    assert nb2.nlayers == nb.nlayers


def test_resume_equals_uninterrupted(tmp_path):
    grid = Grid((-1.0,), (1.0,), (64,))
    ic = sample(lambda X: jnp.sin(jnp.pi * X), grid)
    term = AdvectionTerm(lambda xs, t: (jnp.ones_like(xs[0]),))

    eq_full = LevelSetEquation(terms=(term,), ic=ic, bc=Periodic())
    eq_full.integrate(0.3)

    eq_a = LevelSetEquation(terms=(term,), ic=ic, bc=Periodic())
    eq_a.integrate(0.17)
    save_checkpoint(tmp_path / "mid.npz", eq_a.current_state, t=eq_a.current_time)
    phi_mid, t_mid, _, _ = load_checkpoint(tmp_path / "mid.npz")
    eq_b = LevelSetEquation(terms=(term,), ic=phi_mid, t=t_mid)
    eq_b.integrate(0.3)
    # resumed evolution lands on the same state (CFL steps re-align at tf;
    # intermediate dt differ so allow stencil-order slack)
    err = np.abs(
        np.asarray(eq_b.current_state.values) - np.asarray(eq_full.current_state.values)
    ).max()
    assert err < 1e-6, err


def test_step_monitor():
    grid = Grid((-1.0, -1.0), (1.0, 1.0), (32, 32))
    phi = sample(shapes.circle(radius=0.5), grid, Periodic())
    from lsm_tpu import volume

    eq = LevelSetEquation(
        terms=(AdvectionTerm(lambda xs, t: (jnp.ones_like(xs[0] + xs[1]),
                                            jnp.zeros_like(xs[0] + xs[1]))),),
        ic=phi, bc=Periodic(),
    )
    mon = StepMonitor(observables={"volume": lambda e: e.volume()})
    eq.integrate(0.1, posthook=mon)
    assert mon.nsteps > 0
    s = mon.summary()
    assert s["steps"] == mon.nsteps
    assert abs(s["volume_final"] - np.pi * 0.25) < 1e-2
    out = {}
    with timed("x", out=out):
        pass
    assert "x" in out
