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
sphere band at BENCH_N^3, reports band cell-updates/s),
``BENCH_VEL=stream`` (stream the velocity field from HBM — the full
20 B/cell configuration — instead of evaluating it in-kernel),
``BENCH_GRAD=1`` (time one ``jax.value_and_grad`` FE step — forward plus
the fused Pallas backward — and report grad-step cell-updates/s).
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


def _run_fused(lsm, phi, dt, steps, tiles, vel=None):
    from lsm_tpu.integrators.fused import FusedStepper, supports_fused

    # vel=None evaluates the rotation field in-kernel from iota coordinates;
    # a MeshField velocity streams 12 B/cell from HBM (BENCH_VEL=stream —
    # the full 20 B/cell configuration that config 5 actually runs)
    term = lsm.AdvectionTerm(_rotation_velocity if vel is None else vel)
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
    def one_step(P, t, *streams):
        return stepper._step_full(P, t, dt_d, streams), t + dt_d

    # warm-up / compile
    t = jnp.float32(0.0)
    P, t = one_step(P, t, *stepper._stream_args)
    P.block_until_ready()

    t0 = time.perf_counter()
    for k in range(steps):
        P, t = one_step(P, t, *stepper._stream_args)
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


def _run_grad(lsm, n, steps, dev, streamed):
    """value_and_grad of one fused FE step at n^3 (BENCH_GRAD=1): forward
    Pallas stage + the round-4 Pallas backward (tile-local VJP). The jnp
    backward cannot even compile at 512^3 (HBM OOM, ~16 GB of stencil
    residuals), so this number exists only on the fused path."""
    from functools import partial

    from lsm_tpu.integrators.fused import FusedStepper, supports_fused

    grid = lsm.Grid((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), (n, n, n))
    from lsm_tpu.models import shapes

    phi = lsm.sample(shapes.zalesak_sphere(), grid, lsm.Periodic(),
                     dtype=jnp.float32)
    if streamed:
        vel = lsm.sample(
            lambda X, Y, Z: (0.5 - Y + 0.0 * (X + Z), X - 0.5 + 0.0 * (Y + Z),
                             0.0 * (X + Y + Z)),
            grid, vector=True, dtype=jnp.float32,
        )
        term = lsm.AdvectionTerm(vel)
    else:
        term = lsm.AdvectionTerm(_rotation_velocity)
    if not supports_fused((term,), phi):
        raise RuntimeError("grad bench config not supported by the fused path")
    stepper = FusedStepper((term,), phi, lsm.ForwardEuler())
    dt = jnp.asarray(0.25 * grid.min_spacing, jnp.float32)

    # streamed coefficient arrays ride as explicit jit arguments — closed-over
    # MeshFields would be serialized into the HLO as constants (GBs at 512^3,
    # rejected by the remote compile service)
    from lsm_tpu.ops import weno_v2 as _v2

    spec_objs = tuple(s for s, _ in stepper.specs)
    stream_args = tuple(a for _, arrs in stepper.specs for a in arrs)

    def loss(values, t, *streams):
        it = iter(streams)
        sas = tuple(
            (s, tuple(next(it) for _ in arrs)) for s, arrs in stepper.specs
        )
        P = stepper.pack(values)
        P = _v2.fused_step_stage(
            P, sas, (0.0, 1.0, dt), t, None, stepper.bcs, stepper.spacing,
            stepper.shape, stepper.lo, tiles=stepper.tiles,
        )
        return jnp.sum(stepper.unpack(P) ** 2)

    vg = jax.jit(jax.value_and_grad(loss, argnums=(0,) + tuple(
        range(2, 2 + len(stream_args)))))
    t0_dev = jnp.float32(0.0)
    v, g = vg(phi.values, t0_dev, *stream_args)
    jax.block_until_ready((v, g))
    if not bool(jnp.isfinite(v)):
        raise RuntimeError("grad bench produced non-finite loss")
    t0 = time.perf_counter()
    for _ in range(steps):
        out = vg(phi.values, t0_dev, *stream_args)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - t0
    rate = float(grid.num_nodes) * steps / elapsed
    roofline = _hbm_bw(dev) / 20.0
    vmode = "streamed" if streamed else "analytic"
    return {
        "metric": f"grad-step cell updates/sec/chip ({n}^3 WENO5 advection "
                  f"value_and_grad FE step, {vmode} velocity, "
                  f"{dev.device_kind}, fused fwd+bwd)",
        "value": rate,
        "unit": "cell-updates/s",
        "vs_baseline": rate / roofline,
        "step_ms": elapsed / steps * 1e3,
    }


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

    # stepper.step composes the core jit on the host so untouched buffers
    # never pass through the jit boundary (pass-through donated inputs get
    # COPIED — measured ~8.8 ms/step of pure copies at 512^3); t rides as a
    # device scalar (host scalars cost ~30 ms/transfer through axon)
    t = jnp.float32(0.0)
    state = stepper.step(state, t, dt, True)  # warm-up / compile
    t = t + dt
    if retube_every > 1:
        state = stepper.step(state, t, dt, False)
        t = t + dt
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for k in range(steps):
        state = stepper.step(state, t, dt, (k + 1) % retube_every == 0)
        t = t + dt
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

    if os.environ.get("BENCH_GRAD") == "1":
        streamed = os.environ.get("BENCH_VEL") == "stream"
        print(json.dumps(_run_grad(lsm, n, steps, dev, streamed)))
        return

    grid = lsm.Grid((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), (n, n, n))
    phi = lsm.sample(shapes.zalesak_sphere(), grid, lsm.Periodic(), dtype=dtype)
    dt = dtype(0.25 * grid.min_spacing)

    cells = float(grid.num_nodes) * steps
    vel_stream = None
    vmode = ""
    if os.environ.get("BENCH_VEL") == "stream":
        vel_stream = lsm.sample(
            lambda X, Y, Z: (0.5 - Y + 0.0 * (X + Z), X - 0.5 + 0.0 * (Y + Z),
                             0.0 * (X + Y + Z)),
            grid, vector=True, dtype=dtype,
        )
        vmode = ", streamed velocity"
    results = {}  # path name -> rate
    if path in ("both", "fused") and dev.platform != "cpu":
        try:
            elapsed = _run_fused(lsm, phi, dt, steps, tiles, vel=vel_stream)
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
                  f"{dev.device_kind}{vmode}, best of {sorted(results)}: {used})",
        "value": rate,
        "unit": "cell-updates/s",
        "vs_baseline": rate / roofline,
        "paths": {k: v for k, v in results.items()},
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
