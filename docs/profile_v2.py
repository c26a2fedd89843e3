"""Profile the v2 persistent-padded fused WENO5 stage on the real chip.

One forward-Euler stage per dispatch (pack once, donated padded buffer),
matching the bench methodology. Compares analytic vs streamed velocity and a
few tile shapes against the v1 kernel-based bench number (3.76 G cells/s r1).

Usage: python -m docs.profile_v2 [N] [mode]
  mode: all | analytic | streamed
"""
import sys
from functools import partial

import jax
import jax.numpy as jnp

import lsm_tpu as lsm
from lsm_tpu.models import shapes
from lsm_tpu.integrators.fused import FusedStepper
from docs.axon_timing import slope_time

N = int(sys.argv[1]) if len(sys.argv) > 1 else 512
MODE = sys.argv[2] if len(sys.argv) > 2 else "all"
dtype = jnp.float32
cells = N ** 3

grid = lsm.Grid((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), (N, N, N))
phi = lsm.sample(shapes.zalesak_sphere(), grid, lsm.Periodic(), dtype=dtype)
velf = lambda xs, t: (0.5 - xs[1] + 0.0 * (xs[0] + xs[2]),
                      xs[0] - 0.5 + 0.0 * (xs[1] + xs[2]),
                      0.0 * (xs[0] + xs[1] + xs[2]))
vel_field = lsm.sample(lambda X, Y, Z: velf((X, Y, Z), 0.0), grid, vector=True,
                       dtype=dtype)
dt = jnp.float32(0.25 * grid.min_spacing)
integ = lsm.ForwardEuler()


def run(term, tiles, label):
    try:
        stepper = FusedStepper((term,), phi, integ, tiles=tiles)
        P0 = stepper.pack(phi.values)

        def make_v0():
            return P0 + 0.0

        jstep = jax.jit(
            lambda P: stepper._step_impl(P, jnp.float32(0.0), dt),
            donate_argnums=(0,),
        )
        el = slope_time(jstep, make_v0)
        print(f"{label:44s} {el*1e3:8.2f} ms   {cells/el/1e9:7.2f} G cells/s",
              flush=True)
    except Exception as e:
        print(f"{label:44s} FAILED: {str(e).splitlines()[0][:100]}", flush=True)


TILESETS = [(16, 128), (8, 128), (32, 128), (16, 64), (16, 256), (32, 256)]
if MODE in ("all", "analytic"):
    for tiles in TILESETS:
        run(lsm.AdvectionTerm(velf), tiles, f"v2 analytic tiles={tiles}")
if MODE in ("all", "streamed"):
    for tiles in TILESETS[:3]:
        run(lsm.AdvectionTerm(vel_field), tiles, f"v2 streamed tiles={tiles}")
