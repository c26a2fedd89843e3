"""North-star benchmark: grid-cell updates/sec/chip for the 3D 512^3 WENO5 step.

Runs a WENO5 advection Hamiltonian + forward-Euler update (one Hamiltonian
evaluation per cell per step — the unit the reference's hot loop performs per node,
SURVEY.md section 3.2) on the largest 3D grid that fits, and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "cell-updates/s", "vs_baseline": R}

``vs_baseline`` is measured against the speed-of-light estimate for the
*reference semantics* of this kernel on the local chip: the minimum HBM
traffic for a streamed-velocity WENO5 advection cell-update is read phi (4B)
+ read 3 velocity components (12B) + write phi (4B) = 20 B/cell-update, so
``roofline = HBM_BW / 20``. The reference publishes no benchmark numbers
(BASELINE.md), so the roofline ratio doubles as the per-chip efficiency target
(>= 0.8 per BASELINE.json). The fused v2 path evaluates the (analytic)
velocity in-kernel from coordinates, legally beating the 20 B/cell bound —
``vs_baseline`` is still reported against the same fixed roofline so rounds
stay comparable.

Env knobs: ``BENCH_N`` (grid edge, default 512), ``BENCH_STEPS`` (timed steps,
default 10), ``BENCH_PATH`` ("fused" [default] or "xla" for the round-1
unfused path), ``BENCH_TILES`` ("B0,B1" tile override for the fused kernel).
"""

import json
import os
import time

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


# Rigid-rotation velocity about the domain center (the Zalesak flow field),
# as a coordinate callable: the fused kernel evaluates it in-kernel from
# program-offset iota coordinates instead of streaming 12 B/cell from HBM.
def _rotation_velocity(xs, t):
    x, y, z = xs
    zero = 0.0 * (x + y + z)
    return (0.5 - y + zero, x - 0.5 + zero, zero)


def _run_fused(lsm, shapes, grid, phi, dt, steps, tiles):
    from lsm_tpu.integrators.fused import FusedStepper, supports_fused

    term = lsm.AdvectionTerm(_rotation_velocity)
    if not supports_fused((term,), phi):
        return None
    stepper = FusedStepper((term,), phi, lsm.ForwardEuler(), tiles=tiles)
    P = stepper.pack(phi.values)
    P.block_until_ready()

    # warm-up / compile
    P = stepper.step(P, jnp.float32(0.0), dt)
    P.block_until_ready()

    t0 = time.perf_counter()
    for k in range(steps):
        P = stepper.step(P, dt * (k + 1), dt)
    P.block_until_ready()
    elapsed = time.perf_counter() - t0
    # guard against silent divergence (would invalidate the timing claim)
    if not bool(jnp.isfinite(P[8, 8, 8])):
        raise RuntimeError("fused bench produced non-finite state")
    return elapsed


def _run_xla(lsm, grid, phi, vel, dt, steps):
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


def main():
    import lsm_tpu as lsm
    from lsm_tpu.models import shapes

    n = int(os.environ.get("BENCH_N", "512"))
    steps = int(os.environ.get("BENCH_STEPS", "10"))
    path = os.environ.get("BENCH_PATH", "fused")
    tiles = None
    if os.environ.get("BENCH_TILES"):
        tiles = tuple(int(x) for x in os.environ["BENCH_TILES"].split(","))
    dtype = jnp.float32

    dev = jax.devices()[0]
    grid = lsm.Grid((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), (n, n, n))
    phi = lsm.sample(shapes.zalesak_sphere(), grid, lsm.Periodic(), dtype=dtype)
    dt = dtype(0.25 * grid.min_spacing)

    elapsed = None
    used = path
    if path == "fused" and dev.platform != "cpu":
        try:
            elapsed = _run_fused(lsm, shapes, grid, phi, dt, steps, tiles)
        except Exception:
            elapsed = None
        if elapsed is None:
            used = "xla"
    if elapsed is None:
        vel = lsm.sample(
            lambda X, Y, Z: (0.5 - Y + 0.0 * (X + Z),
                             X - 0.5 + 0.0 * (Y + Z),
                             0.0 * (X + Y + Z)),
            grid, vector=True, dtype=dtype,
        )
        elapsed = _run_xla(lsm, grid, phi, vel, dt, steps)

    cells = float(grid.num_nodes) * steps
    rate = cells / elapsed
    roofline = _hbm_bw(dev) / 20.0  # 20 B minimum HBM traffic per cell-update
    result = {
        "metric": f"grid-cell updates/sec/chip ({n}^3 WENO5 advection step, "
                  f"{dev.device_kind}, {used} path)",
        "value": rate,
        "unit": "cell-updates/s",
        "vs_baseline": rate / roofline,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
