"""Round-5 probe: band step component times at 512^3 vs 768^3.

Measures, per size: the active-tile stage kernel alone, the in-place ghost
refresh alone, and the incremental re-tube alone — to locate where the 768^3
band step loses interface-proportional scaling (VERDICT r4 next #4).

Run on the chip:  python docs/profile_r5_band.py [512 768]
"""

import sys
import time

import jax
import jax.numpy as jnp

import lsm_tpu as lsm
from lsm_tpu.core.narrowband import (NarrowBandField, band_mask_from_values,
                                     box_dilate)
from lsm_tpu.integrators.band_fused import FusedBandStepper
from lsm_tpu.ops import band_pallas as bp


def _time(fn, n=10):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def probe(n):
    grid = lsm.Grid((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0), (n, n, n))
    phi = lsm.sample(lambda X, Y, Z: jnp.sqrt(X**2 + Y**2 + Z**2) - 0.5,
                     grid, lsm.Extrapolation(2), dtype=jnp.float32)

    @jax.jit
    def _masks(v):
        m = band_mask_from_values(v, 3)
        return m, box_dilate(m, NarrowBandField.COMPUTE_HALO)

    mask, cmask = _masks(phi.values)
    nb = NarrowBandField(phi.values, grid, phi.bcs, mask, 3,
                         _normalized=True, _cmask=cmask)
    term = lsm.AdvectionTerm(lambda xs, t: (
        -xs[1] + 0.0 * (xs[0] + xs[2]), xs[0] + 0.0 * (xs[1] + xs[2]),
        0.0 * (xs[0] + xs[1] + xs[2])))
    st = FusedBandStepper((term,), nb, lsm.ForwardEuler())
    state = st.pack(nb)
    del phi, nb, mask, cmask
    dt = jnp.float32(0.25 * grid.min_spacing)
    t = jnp.float32(0.0)
    A, B, C = state.bufs
    print(f"n={n}: tiles={st.tiles} capacity={st.capacity} "
          f"count={int(state.count)} cand_cap={st.cand_capacity}")

    specs = st._specs_with(st._stream_args)

    # stage kernel alone (no ghost refresh, no custom-vjp wrapper)
    stage_only = jax.jit(lambda src, dst, ids, cm: bp.band_stage(
        src, dst, ids, cm, specs, (0.0, 1.0, dt), t, None, st.bcs,
        st.spacing, st.shape, st.lo, st.tiles))
    print(f"  stage kernel alone: "
          f"{_time(lambda: stage_only(A, B, state.ids, state.cmask)):6.2f} ms")

    # ghost refresh alone
    refresh = jax.jit(lambda q: bp.refresh_band_ghosts_fast(
        q, st.bcs, st.shape))
    print(f"  ghost refresh alone: {_time(lambda: refresh(B)):6.2f} ms")

    # full stage composite (stage + refresh via the custom-vjp fwd)
    comp = jax.jit(lambda src, dst, ids, cm: bp.band_step_stage(
        src, dst, ids, cm, specs, (0.0, 1.0, dt), t, None, st.bcs,
        st.spacing, st.shape, st.lo, st.tiles))
    print(f"  stage+refresh composite: "
          f"{_time(lambda: comp(A, B, state.ids, state.cmask)):6.2f} ms")

    # incremental re-tube alone
    def retube(cur, mask_p, cmask_p, act):
        out = st._retube_incremental(
            cur, cur, cur,
            state._replace(mask_p=mask_p, cmask=cmask_p, act=act))
        return out.mask_p, out.cmask, out.act, out.ids, out.count

    retube_j = jax.jit(retube)
    print(f"  incremental re-tube alone: "
          f"{_time(lambda: retube_j(A, state.mask_p, state.cmask, state.act)):6.2f} ms")


if __name__ == "__main__":
    sizes = [int(x) for x in sys.argv[1:]] or [512, 768]
    for n in sizes:
        probe(n)
