"""Round-5 probe: decompose the 512^3 value_and_grad FE step.

Times each piece of the differentiable fused step separately on chip:
the forward stage, the ghost-cotangent fold, the dP zero-init, and the
systolic backward kernel itself — so optimization effort lands on the
actual dominant term. Run over axon: ``python docs/profile_r5_bwd.py``.
"""

import time

import jax
import jax.numpy as jnp

import lsm_tpu as lsm
from lsm_tpu.integrators.fused import FusedStepper
from lsm_tpu.ops import weno_v2 as v2
from lsm_tpu.ops import weno_v2_bwd as bwd

N = 512
REPS = 8


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:36s} {dt:8.2f} ms")
    return out


def main():
    grid = lsm.Grid((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), (N, N, N))
    from lsm_tpu.models import shapes

    phi = lsm.sample(shapes.zalesak_sphere(), grid, lsm.Periodic(),
                     dtype=jnp.float32)

    def vel(xs, t):
        return (0.5 - xs[1] + 0.0 * (xs[0] + xs[2]),
                xs[0] - 0.5 + 0.0 * (xs[1] + xs[2]),
                0.0 * (xs[0] + xs[1] + xs[2]))

    term = lsm.AdvectionTerm(vel)
    stepper = FusedStepper((term,), phi, lsm.ForwardEuler())
    dt = jnp.asarray(0.25 * grid.min_spacing, jnp.float32)
    specs = tuple(s for s, _ in stepper.specs)
    counts = tuple(len(arrs) for _, arrs in stepper.specs)
    statics = (stepper.bcs, stepper.spacing, stepper.shape, stepper.lo)
    bcs, spacing, shape, lo = statics

    P = jax.jit(stepper.pack)(phi.values)
    g = P + 0.0  # a realistic padded cotangent

    coeffs = (jnp.float32(0.0), jnp.float32(1.0), dt)
    t0_ = jnp.float32(0.0)

    fwd = jax.jit(lambda p: v2.fused_step_stage(
        p, tuple((s, ()) for s in specs), coeffs, t0_, None, bcs, spacing,
        shape, lo, tiles=stepper.tiles))
    timeit("forward stage (fused)", fwd, P)

    fold = jax.jit(lambda gg: bwd.fold_ghost_cotangent_fast(gg, bcs, shape))
    timeit("ghost-cotangent fold", fold, g)

    zeros = jax.jit(lambda: jnp.zeros(v2.padded_shape(shape), jnp.float32))
    timeit("dP zero-init", zeros)

    full = jax.jit(lambda p, gg: bwd.stage_backward(
        p, (), coeffs, t0_, None, gg, specs, counts, bcs, spacing, shape,
        lo))
    timeit("stage_backward (fold+zero+kernel)", full, P, g)

    pre = jax.jit(lambda p, gg: bwd.stage_backward(
        p, (), coeffs, t0_, None, gg, specs, counts, bcs, spacing, shape,
        lo, prefolded=True))
    timeit("bwd kernel only (prefolded)", pre, P, g)


if __name__ == "__main__":
    main()
