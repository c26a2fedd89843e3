"""North-star benchmark: grid-cell updates/sec/chip for the 3D 512^3 WENO5 step.

Runs a WENO5 advection Hamiltonian + forward-Euler update (one Hamiltonian
evaluation per cell per step — the unit the reference's hot loop performs per
node, SURVEY.md section 3.2) and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "cell-updates/s", "vs_baseline": R}

By default BOTH the fused Pallas path and the plain XLA path are timed and the
BEST one is reported (each path's own number goes to stderr), so a regression
in either path can never silently ship as the headline number (VERDICT r2
weak #2).

``vs_baseline`` is measured against the speed-of-light estimate for the
*reference semantics* of this kernel on the local chip: the minimum HBM
traffic for a streamed-velocity WENO5 advection cell-update is read phi (4B)
+ read 3 velocity components (12B) + write phi (4B) = 20 B/cell-update, so
``roofline = HBM_BW / 20``. The reference publishes no benchmark numbers
(BASELINE.md), so the roofline ratio doubles as the per-chip efficiency
target. NOTE the step is in fact VPU-compute-bound on this chip, not
HBM-bound — see docs/perf-notes.md — but the ratio stays pinned to the fixed
HBM roofline so rounds remain comparable.

Env knobs: ``BENCH_N`` (grid edge, default 512), ``BENCH_STEPS`` (timed
steps, default 10), ``BENCH_PATH`` ("both" [default] / "fused" / "xla"),
``BENCH_TILES`` ("B0,B1" tile override for the fused kernel),
``BENCH_BAND=1`` (benchmark the active-tile narrow-band stepper instead:
sphere band at BENCH_N^3, reports band cell-updates/s).
"""

import json
import os
import sys
import time
import traceback

import jax
import jax.numpy as jnp

# HBM bandwidth (bytes/s) per chip by TPU generation; fallback is v5e.
_HBM_BW = {
    "v4": 1.2e12,
    "v5 lite": 8.19e11,
    "v5e": 8.19e11,
    "v5p": 2.765e12,
    "v6 lite": 1.64e12,
    "v6e": 1.64e12,
}


def _hbm_bw(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for key, bw in _HBM_BW.items():
        if key in kind:
            return bw
    return 8.19e11


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


# Rigid-rotation velocity about the domain center (the Zalesak flow field),
# as a coordinate callable: the fused kernel evaluates it in-kernel from
# program-offset iota coordinates instead of streaming 12 B/cell from HBM.
def _rotation_velocity(xs, t):
    x, y, z = xs
    zero = 0.0 * (x + y + z)
    return (0.5 - y + zero, x - 0.5 + zero, zero)


def _run_fused(lsm, phi, dt, steps, tiles):
    from lsm_tpu.integrators.fused import FusedStepper, supports_fused

    term = lsm.AdvectionTerm(_rotation_velocity)
    if not supports_fused((term,), phi):
        return None
    from functools import partial

    stepper = FusedStepper((term,), phi, lsm.ForwardEuler(), tiles=tiles)
    P = stepper.pack(phi.values)
    P.block_until_ready()

    # t rides along as a DEVICE scalar: fresh host scalars as jit arguments
    # cost a host->device transfer per call through the axon tunnel (~30 ms
    # each — this alone made BENCH_r02's fused number 4x slower than the
    # kernel; see docs/perf-notes.md)
    dt_d = jnp.asarray(dt, jnp.float32)

    @partial(jax.jit, donate_argnums=(0, 1))
    def one_step(P, t):
        return stepper._step_impl(P, t, dt_d), t + dt_d

    # warm-up / compile
    t = jnp.float32(0.0)
    P, t = one_step(P, t)
    P.block_until_ready()

    t0 = time.perf_counter()
    for k in range(steps):
        P, t = one_step(P, t)
    P.block_until_ready()
    elapsed = time.perf_counter() - t0
    # guard against silent divergence (would invalidate the timing claim)
    if not bool(jnp.isfinite(P[8, 8, 8])):
        raise RuntimeError("fused bench produced non-finite state")
    return elapsed


def _run_xla(lsm, phi, vel, dt, steps):
    from functools import partial

    # NOTE: the step loop is host-driven on purpose. jitted flat graphs execute as
    # one fused device call (dispatch ~0.03 ms), while lax.fori_loop bodies are
    # executed op-by-op by the axon runtime (~100x slower measured) — see
    # docs/perf-notes.md. The input buffer is donated so steps update in place.
    # Velocity is an explicit argument — closed-over arrays would be serialized
    # into the HLO as constants (GBs at 512^3, breaking remote compile).
    @partial(jax.jit, donate_argnums=(0,))
    def one_step(phi_values, vel_values):
        f = phi.with_values(phi_values)
        t = lsm.AdvectionTerm(vel.with_values(vel_values))
        return phi_values - dt * t.rhs(f, jnp.float32(0.0))

    v = one_step(phi.values, vel.values)
    v.block_until_ready()

    t0 = time.perf_counter()
    for _ in range(steps):
        v = one_step(v, vel.values)
    v.block_until_ready()
    return time.perf_counter() - t0


def _run_band(lsm, n, steps, dev):
    """Active-tile narrow-band stepper on a sphere band at n^3 (BENCH_BAND=1)."""
    from lsm_tpu.core.narrowband import NarrowBandField
    from lsm_tpu.integrators.band_fused import FusedBandStepper, supports_band_fused

    grid = lsm.Grid((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0), (n, n, n))
    phi = lsm.sample(
        lambda X, Y, Z: jnp.sqrt(X**2 + Y**2 + Z**2) - 0.5,
        grid, lsm.Extrapolation(2), dtype=jnp.float32,
    )
    # one compiled graph for the band construction: eagerly it is ~40 ops,
    # each a multi-second remote compile through the tunnel at 512^3
    from lsm_tpu.core.narrowband import band_mask_from_values, box_dilate

    @jax.jit
    def _masks(v):
        m = band_mask_from_values(v, 3)
        return m, box_dilate(m, NarrowBandField.COMPUTE_HALO)

    mask, cmask = _masks(phi.values)
    nb = NarrowBandField(phi.values, grid, phi.bcs, mask, 3,
                         _normalized=True, _cmask=cmask)
    term = lsm.AdvectionTerm(lambda xs, t: (
        -xs[1] + 0.0 * (xs[0] + xs[2]),
        xs[0] + 0.0 * (xs[1] + xs[2]),
        0.0 * (xs[0] + xs[1] + xs[2]),
    ))
    if not supports_band_fused((term,), nb):
        raise RuntimeError("band stepper does not support the bench config")
    from functools import partial

    retube_every = int(os.environ.get("BENCH_RETUBE_EVERY", "1"))
    stepper = FusedBandStepper((term,), nb, lsm.ForwardEuler(),
                               retube_every=retube_every)
    dt = jnp.float32(0.25 * grid.min_spacing)
    state = stepper.pack(nb)
    band_cells = int(jax.device_get(jnp.sum(state.cmask != 0)))

    from functools import partial as _p

    @_p(jax.jit, donate_argnums=(0, 1), static_argnums=(2,))
    def one_step(state, t, retube):
        return stepper._step_impl(state, t, dt, retube), t + dt

    t = jnp.float32(0.0)
    state, t = one_step(state, t, True)  # warm-up / compile
    if retube_every > 1:
        state, t = one_step(state, t, False)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for k in range(steps):
        state, t = one_step(state, t, (k + 1) % retube_every == 0)
    jax.block_until_ready(state)
    elapsed = time.perf_counter() - t0
    if stepper.overflowed(state):
        raise RuntimeError("band dispatch list overflowed during bench")
    rate = band_cells * steps / elapsed
    roofline = _hbm_bw(dev) / 20.0
    return {
        "metric": f"band cell updates/sec/chip ({n}^3 sphere narrow band, "
                  f"WENO5 advection, {dev.device_kind}, active-tile path, "
                  f"retube_every={retube_every})",
        "value": rate,
        "unit": "cell-updates/s",
        "vs_baseline": rate / roofline,
        "band_cells": band_cells,
        "step_ms": elapsed / steps * 1e3,
    }


def main():
    import lsm_tpu as lsm
    from lsm_tpu.models import shapes

    n = int(os.environ.get("BENCH_N", "512"))
    steps = int(os.environ.get("BENCH_STEPS", "30"))
    path = os.environ.get("BENCH_PATH", "both")
    tiles = None
    if os.environ.get("BENCH_TILES"):
        tiles = tuple(int(x) for x in os.environ["BENCH_TILES"].split(","))
    dtype = jnp.float32

    dev = jax.devices()[0]

    if os.environ.get("BENCH_BAND") == "1":
        print(json.dumps(_run_band(lsm, n, steps, dev)))
        return

    grid = lsm.Grid((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), (n, n, n))
    phi = lsm.sample(shapes.zalesak_sphere(), grid, lsm.Periodic(), dtype=dtype)
    dt = dtype(0.25 * grid.min_spacing)

    cells = float(grid.num_nodes) * steps
    results = {}  # path name -> rate
    if path in ("both", "fused") and dev.platform != "cpu":
        try:
            elapsed = _run_fused(lsm, phi, dt, steps, tiles)
            if elapsed is None:
                _log("bench: fused path unsupported for this config")
            else:
                results["fused"] = cells / elapsed
                _log(f"bench: fused path {results['fused']/1e9:.2f} G cells/s")
        except Exception:
            _log("bench: fused path FAILED:\n" + traceback.format_exc())
    if path in ("both", "xla") or not results:
        vel = lsm.sample(
            lambda X, Y, Z: (0.5 - Y + 0.0 * (X + Z),
                             X - 0.5 + 0.0 * (Y + Z),
                             0.0 * (X + Y + Z)),
            grid, vector=True, dtype=dtype,
        )
        results["xla"] = cells / _run_xla(lsm, phi, vel, dt, steps)
        _log(f"bench: xla path {results['xla']/1e9:.2f} G cells/s")

    used = max(results, key=results.get)
    rate = results[used]
    roofline = _hbm_bw(dev) / 20.0  # 20 B minimum HBM traffic per cell-update
    result = {
        "metric": f"grid-cell updates/sec/chip ({n}^3 WENO5 advection step, "
                  f"{dev.device_kind}, best of {sorted(results)}: {used})",
        "value": rate,
        "unit": "cell-updates/s",
        "vs_baseline": rate / roofline,
        "paths": {k: v for k, v in results.items()},
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
