"""Resilient on-chip v2-kernel probe: sanity op -> 128^3 parity -> 512^3 timing.

Each phase runs in THIS process; a backend abort poisons the client, so the
wrapper shell script restarts the probe per phase. Phase selected by argv[1]:
  sanity | parity128 | time512 [B0 B1] | time512xla
"""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def sanity():
    t0 = time.time()
    d = jax.devices()
    log("devices:", d, f"{time.time()-t0:.1f}s")
    x = jnp.ones((256, 256, 256), jnp.float32)
    t0 = time.time()
    (x * 2).block_until_ready()
    log("sanity mul 256^3:", f"{time.time()-t0:.2f}s")


def _setup(N):
    import lsm_tpu as lsm
    from lsm_tpu.models import shapes
    from lsm_tpu.ops import weno_v2 as v2

    grid = lsm.Grid((0., 0., 0.), (1., 1., 1.), (N, N, N))
    phi = lsm.sample(shapes.zalesak_sphere(), grid, lsm.Periodic(),
                     dtype=jnp.float32)
    velf = lambda xs, t: (0.5 - xs[1] + 0.0 * (xs[0] + xs[2]),
                          xs[0] - 0.5 + 0.0 * (xs[1] + xs[2]),
                          0.0 * (xs[0] + xs[1] + xs[2]))
    spec = v2.TermSpec("advection", "analytic", velf, 0)
    return lsm, grid, phi, v2, spec, velf


def parity128():
    lsm, grid, phi, v2, spec, _ = _setup(128)
    dt = jnp.float32(1e-3)
    P0 = v2.pack_padded(phi.values, phi.bcs)
    P0.block_until_ready()
    log("packed", P0.shape)
    f = jax.jit(partial(
        v2.fused_stage, term_specs_and_streams=((spec, ()),),
        coeffs=(0.0, 1.0, dt), t=0.0, aux_padded=None, bcs=phi.bcs,
        spacing=grid.spacing, shape=grid.shape, lo=grid.lo, tiles=(8, 128)))
    t0 = time.time()
    out = f(P0)
    out.block_until_ready()
    log("128^3 (8,128) compile+run:", f"{time.time()-t0:.1f}s")
    ref = v2.stage_reference(P0, ((spec, ()),), (0.0, 1.0, dt), 0.0, None,
                             phi.bcs, grid.spacing, grid.shape, grid.lo)
    got = v2.unpack_padded(out, grid.shape)
    log("parity128 max diff:", float(jnp.abs(got - ref).max()))


def time512(B0=16, B1=128):
    from docs.axon_timing import slope_time

    lsm, grid, phi, v2, spec, _ = _setup(512)
    dt = jnp.float32(1e-3)
    P0 = v2.pack_padded(phi.values, phi.bcs)
    P0.block_until_ready()
    cells = 512 ** 3

    def stage(P):
        out = v2.fused_stage(
            P, ((spec, ()),), (0.0, 1.0, dt), 0.0, None, phi.bcs,
            grid.spacing, grid.shape, grid.lo, tiles=(B0, B1))
        return v2.refresh_ghosts(out, phi.bcs, grid.shape)

    t0 = time.time()
    f = jax.jit(stage, donate_argnums=(0,))
    out = f(P0 + 0.0)
    out.block_until_ready()
    log(f"512^3 ({B0},{B1}) compile+first-run:", f"{time.time()-t0:.1f}s")
    el = slope_time(f, lambda: P0 + 0.0)
    log(f"512^3 tiles=({B0},{B1}) stage+refresh: {el*1e3:.2f} ms "
        f"{cells/el/1e9:.2f} G cells/s")


def time512xla():
    """Round-1 unfused XLA baseline at 512^3 for comparison."""
    from docs.axon_timing import slope_time

    lsm, grid, phi, v2, spec, velf = _setup(512)
    vel = lsm.sample(
        lambda X, Y, Z: (0.5 - Y + 0.0 * (X + Z), X - 0.5 + 0.0 * (Y + Z),
                         0.0 * (X + Y + Z)), grid, vector=True,
        dtype=jnp.float32)
    dt = jnp.float32(1e-3)
    term = lsm.AdvectionTerm(vel)

    @partial(jax.jit, donate_argnums=(0,))
    def one(vals):
        f = phi.with_values(vals)
        return vals - dt * term.rhs(f, jnp.float32(0.0))

    el = slope_time(one, lambda: phi.values + 0.0)
    log(f"512^3 xla unfused step: {el*1e3:.2f} ms "
        f"{512**3/el/1e9:.2f} G cells/s")


if __name__ == "__main__":
    phase = sys.argv[1] if len(sys.argv) > 1 else "sanity"
    if phase == "sanity":
        sanity()
    elif phase == "parity128":
        parity128()
    elif phase == "time512":
        b0 = int(sys.argv[2]) if len(sys.argv) > 2 else 16
        b1 = int(sys.argv[3]) if len(sys.argv) > 3 else 128
        time512(b0, b1)
    elif phase == "time512xla":
        time512xla()
    else:
        raise SystemExit(f"unknown phase {phase}")
