"""North-star benchmark: grid-cell updates/sec/chip for the 3D 512^3 WENO5 step.

Runs a WENO5 advection Hamiltonian + forward-Euler update (one Hamiltonian
evaluation per cell per step — the unit the reference's hot loop performs per
node, SURVEY.md section 3.2) and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "cell-updates/s", "vs_baseline": R,
     "extras": {...}}

The headline stays the best forward path (fused Pallas vs plain XLA, each
path's own number on stderr — a regression in either can never silently ship,
VERDICT r2 weak #2). Since round 5 the DEFAULT run also measures the rest of
the performance contract into ``extras`` (VERDICT r4 next #6): the
streamed-velocity forward, the ``value_and_grad`` FE grad step, the 512^3
narrow-band step, and a 768^3 band-vs-dense pair (the regime where the
interface-proportional band beats the volume-proportional dense step).

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
steps, default 30), ``BENCH_PATH`` ("both" [default] / "fused" / "xla"),
``BENCH_TILES`` ("B0,B1" tile override for the fused kernel),
``BENCH_FULL=0`` (headline forward only — skip the extras),
``BENCH_BAND=1`` (ONLY the active-tile narrow-band stepper: sphere band at
BENCH_N^3, reports band cell-updates/s; ``BENCH_RETUBE_EVERY`` cadence),
``BENCH_VEL=stream`` (stream the velocity field from HBM — the full
20 B/cell configuration — instead of evaluating it in-kernel),
``BENCH_GRAD=1`` (ONLY one ``jax.value_and_grad`` FE step — forward plus
the fused Pallas backward — grad-step cell-updates/s),
``BENCH_GRAD_ROLLOUT=1`` (ONLY a differentiable multi-step RK3 rollout at
BENCH_N^3 under step-level remat — ``BENCH_ROLLOUT_STEPS`` steps, default
20 — the BASELINE config-5 shape).
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
    Pallas stage + the round-5 systolic Pallas backward (tile-exact VJP,
    hand-derived WENO5 adjoint). The jnp backward cannot even compile at
    512^3 (HBM OOM, ~16 GB of stencil residuals), so this number exists
    only on the fused path."""
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
    # consuming pack + eager drop of construction-time buffers: the 768^3
    # band state is ~11 GB and the dense field + masks another ~2.6 GB —
    # donation is the difference between fitting HBM and OOM there
    state = stepper.pack_consuming(nb)
    del phi, nb, mask, cmask
    band_cells = int(jax.device_get(jnp.sum(state.band != 0)))

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


def _run_grad_rollout(lsm, n, nsteps, dev):
    """value_and_grad of an ``nsteps``-step RK3 rollout at n^3 under the
    round-5 step-level rematerialization (BENCH_GRAD_ROLLOUT=1) — the
    BASELINE config-5 differentiable shape-optimization shape. Without remat
    this OOMs at compile time past ~8 steps at 512^3 (16 GB of stage
    residuals); with it the residual set is one step-input buffer per step.

    ``unroll=nsteps`` flattens the scan: compiled loop bodies execute
    op-by-op through the axon tunnel (~100x; docs/perf-notes.md), so the
    rollout must be a single flat graph to time the device, not the relay."""
    grid = lsm.Grid((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), (n, n, n))
    from lsm_tpu.models import shapes

    phi = lsm.sample(shapes.zalesak_sphere(), grid, lsm.Periodic(),
                     dtype=jnp.float32)
    term = lsm.AdvectionTerm(_rotation_velocity)
    dt = float(0.25 * grid.min_spacing)

    def loss(values):
        out, _ = lsm.rollout(lsm.RK3(), (term,), phi.with_values(values),
                             0.0, dt, nsteps, unroll=nsteps, remat=True)
        return jnp.sum(out.values ** 2)

    vg = jax.jit(jax.value_and_grad(loss))
    t0 = time.perf_counter()
    v, g = vg(phi.values)
    jax.block_until_ready((v, g))
    compile_s = time.perf_counter() - t0
    if not bool(jnp.isfinite(v)) or not bool(jnp.isfinite(g[8, 8, 8])):
        raise RuntimeError("grad rollout produced non-finite output")
    t0 = time.perf_counter()
    out = vg(phi.values)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - t0
    rate = float(grid.num_nodes) * nsteps / elapsed
    roofline = _hbm_bw(dev) / 20.0
    return {
        "metric": f"grad-rollout cell updates/sec/chip ({n}^3 WENO5 RK3 "
                  f"value_and_grad {nsteps}-step rollout, remat, "
                  f"{dev.device_kind})",
        "value": rate,
        "unit": "cell-updates/s",
        "vs_baseline": rate / roofline,
        "nsteps": nsteps,
        "total_s": elapsed,
        "step_ms": elapsed / nsteps * 1e3,
        "compile_s": compile_s,
    }


def _run_forward(lsm, n, steps, dev, tiles, path, streamed):
    """Forward FE-step section: fused and/or XLA path at n^3; returns the
    headline-format dict."""
    from lsm_tpu.models import shapes

    dtype = jnp.float32
    grid = lsm.Grid((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), (n, n, n))
    phi = lsm.sample(shapes.zalesak_sphere(), grid, lsm.Periodic(), dtype=dtype)
    dt = dtype(0.25 * grid.min_spacing)
    cells = float(grid.num_nodes) * steps
    vel_stream = None
    vmode = ""
    if streamed:
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
                _log(f"bench: fused path ({n}^3{vmode}) "
                     f"{results['fused']/1e9:.2f} G cells/s")
        except Exception:
            _log("bench: fused path FAILED:\n" + traceback.format_exc())
    if path in ("both", "xla") or not results:
        vel = vel_stream if vel_stream is not None else lsm.sample(
            lambda X, Y, Z: (0.5 - Y + 0.0 * (X + Z),
                             X - 0.5 + 0.0 * (Y + Z),
                             0.0 * (X + Y + Z)),
            grid, vector=True, dtype=dtype,
        )
        results["xla"] = cells / _run_xla(lsm, phi, vel, dt, steps)
        _log(f"bench: xla path ({n}^3) {results['xla']/1e9:.2f} G cells/s")

    used = max(results, key=results.get)
    rate = results[used]
    roofline = _hbm_bw(dev) / 20.0  # 20 B minimum HBM traffic per cell-update
    return {
        "metric": f"grid-cell updates/sec/chip ({n}^3 WENO5 advection step, "
                  f"{dev.device_kind}{vmode}, best of {sorted(results)}: {used})",
        "value": rate,
        "unit": "cell-updates/s",
        "vs_baseline": rate / roofline,
        "step_ms": float(grid.num_nodes) / rate * 1e3,
        "paths": {k: v for k, v in results.items()},
    }


def main():
    import lsm_tpu as lsm

    n = int(os.environ.get("BENCH_N", "512"))
    steps = int(os.environ.get("BENCH_STEPS", "30"))
    path = os.environ.get("BENCH_PATH", "both")
    tiles = None
    if os.environ.get("BENCH_TILES"):
        tiles = tuple(int(x) for x in os.environ["BENCH_TILES"].split(","))

    dev = jax.devices()[0]

    if os.environ.get("BENCH_BAND") == "1":
        print(json.dumps(_run_band(lsm, n, steps, dev)))
        return

    if os.environ.get("BENCH_GRAD") == "1":
        streamed = os.environ.get("BENCH_VEL") == "stream"
        print(json.dumps(_run_grad(lsm, n, steps, dev, streamed)))
        return

    if os.environ.get("BENCH_GRAD_ROLLOUT") == "1":
        nsteps = int(os.environ.get("BENCH_ROLLOUT_STEPS", "20"))
        print(json.dumps(_run_grad_rollout(lsm, n, nsteps, dev)))
        return

    streamed = os.environ.get("BENCH_VEL") == "stream"
    result = _run_forward(lsm, n, steps, dev, tiles, path, streamed)

    # full perf contract (VERDICT r4 next #6): streamed forward, grad step,
    # band step, and the 768^3 band-vs-dense pair ride in "extras" on the
    # default run. Each section is independent — one failure logs to stderr
    # without losing the rest.
    full = os.environ.get("BENCH_FULL", "1") != "0" and not streamed \
        and dev.platform != "cpu"
    if full:
        extras = {}

        def section(name, fn, *args):
            try:
                extras[name] = fn(*args)
                v = extras[name]
                _log(f"bench[{name}]: {v['value']/1e9:.2f} G cell-updates/s "
                     f"({v.get('step_ms', float('nan')):.2f} ms/step)")
            except Exception:
                _log(f"bench[{name}] FAILED:\n" + traceback.format_exc())

        def section_subprocess(name, env_extra):
            """Run one section in a FRESH process: a 768^3 band state is
            ~9.3 GB of HBM, and this process's live buffers/compiled programs
            would tip it over the 16 GB chip (measured RESOURCE_EXHAUSTED);
            a clean process also releases everything on exit."""
            import subprocess

            try:
                env = dict(os.environ, **env_extra)
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__)],
                    env=env, capture_output=True, text=True, timeout=1200)
                if out.returncode != 0:
                    raise RuntimeError(out.stderr[-2000:])
                extras[name] = json.loads(out.stdout.strip().splitlines()[-1])
                v = extras[name]
                _log(f"bench[{name}]: {v['value']/1e9:.2f} G cell-updates/s "
                     f"({v.get('step_ms', float('nan')):.2f} ms/step)")
            except Exception:
                _log(f"bench[{name}] FAILED:\n" + traceback.format_exc())

        section("forward_streamed", _run_forward, lsm, n, steps, dev, tiles,
                "fused", True)
        section("grad_step", _run_grad, lsm, n,
                max(3, min(10, steps // 3)), dev, False)
        section("band", _run_band, lsm, n, steps, dev)
        if os.environ.get("BENCH_768", "1") != "0" and n == 512:
            # the band's winning regime: dense cost grows with volume, the
            # band stage stays on the interface (VERDICT r4 next #4b)
            section("dense_768", _run_forward, lsm, 768, max(5, steps // 3),
                    dev, tiles, "fused", False)
            section_subprocess("band_768", {
                "BENCH_BAND": "1", "BENCH_N": "768",
                "BENCH_STEPS": str(max(5, steps // 3)), "BENCH_FULL": "0"})
            if "dense_768" in extras and "band_768" in extras:
                extras["band_beats_dense_768"] = bool(
                    extras["band_768"]["step_ms"]
                    < extras["dense_768"]["step_ms"])
        result["extras"] = extras
    print(json.dumps(result))


if __name__ == "__main__":
    main()
