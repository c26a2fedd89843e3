"""Round-3 probe pt4: where does the band step's time go?

BENCH_BAND at 256^3 measures 13.3 ms/step — slower than a dense step of the
same grid. The active-tile stage itself should cost ~4-8% of dense; the
suspects are the per-step re-tube (cut-cell detect + corner stamp + L1
dilations, all dense bool passes), the mask astype, and the dispatch-list
rebuild. Time each piece.
"""
from functools import partial
import time

import jax
import jax.numpy as jnp

from docs.axon_timing import slope_time
import lsm_tpu as lsm
from lsm_tpu.core.narrowband import (
    NarrowBandField, band_mask_from_values, box_dilate)
from lsm_tpu.integrators.band_fused import FusedBandStepper
from lsm_tpu.ops import band_pallas as bp

import os
N = int(os.environ.get("BAND_PROFILE_N", "256"))
grid = lsm.Grid((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0), (N, N, N))
phi = lsm.sample(lambda X, Y, Z: jnp.sqrt(X**2 + Y**2 + Z**2) - 0.5,
                 grid, lsm.Extrapolation(2), dtype=jnp.float32)
nb = NarrowBandField.from_field(phi)
term = lsm.AdvectionTerm(lambda xs, t: (
    -xs[1] + 0.0 * (xs[0] + xs[2]),
    xs[0] + 0.0 * (xs[1] + xs[2]),
    0.0 * (xs[0] + xs[1] + xs[2])))
stepper = FusedBandStepper((term,), nb, lsm.ForwardEuler())
state = stepper.pack(nb)
dt = jnp.float32(0.25 * grid.min_spacing)
shape = tuple(grid.shape)


def timeit(label, fn, *args):
    f = jax.jit(fn)
    o = jax.block_until_ready(f(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(20):
        o = f(*args)
    jax.block_until_ready(o)
    el = (time.perf_counter() - t0) / 20
    print(f"{label:46s} {el*1e3:8.3f} ms", flush=True)
    return el


Q = state.bufs[0]
cmask_f = state.cmask
mask = state.mask
ids = state.ids

timeit("band_stage only (FE, 1 stage)", lambda q, i, c: bp.band_stage(
    q, q + 0.0, i, c, stepper.specs, (0.0, 1.0, dt), 0.0, None,
    stepper.bcs, stepper.spacing, shape, stepper.lo, stepper.tiles), Q, ids, cmask_f)
timeit("refresh_band_ghosts_fast", lambda q: bp.refresh_band_ghosts_fast(
    q, stepper.bcs, shape), Q)
vals = bp.unpack_band_padded(Q, shape)
timeit("unpack (interior slice copy)", lambda q: bp.unpack_band_padded(q, shape), Q)
timeit("band_mask_from_values (cut+stamp+dilate3)",
       lambda v, m: band_mask_from_values(v, stepper.nlayers, m), vals, mask)
timeit("box_dilate(mask, 3) (compute mask)", lambda m: box_dilate(m, 3), mask)
timeit("cmask astype f32", lambda m: m.astype(jnp.float32), mask)
timeit("active_tile_ids", lambda c: bp.active_tile_ids(
    bp.unpack_band_padded(c, shape) != 0, stepper.tiles, stepper.capacity),
    cmask_f)
timeit("FULL step (jitted _step_impl)",
       lambda s: stepper._step_impl(s, jnp.float32(0.0), dt), state)
