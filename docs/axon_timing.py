"""Trustworthy step timing through the axon tunnel.

block_until_ready() and one-off wall clocks are unreliable over the relay
(trivial ops report impossible bandwidths; a scalar readback costs ~400 ms).
Slope method: run R1 and R2 chained (donated) iterations, each ended by the
same scalar readback; per-iteration time = (T(R2) - T(R1)) / (R2 - R1) — the
constant tunnel/readback overhead cancels.
"""
import time
import jax
import jax.numpy as jnp


def _run(step, v0, args, reps, sync):
    v = v0
    t0 = time.perf_counter()
    for _ in range(reps):
        v = step(v, *args)
    sync(v)
    return time.perf_counter() - t0


def slope_time(jstep, make_v0, args=(), r1=3, r2=13):
    """Per-iteration seconds of ``v = jstep(v, *args)`` via the slope method.

    ``jstep`` must be donated-jitted in arg 0; ``make_v0()`` returns a fresh
    starting buffer (each run donates its own chain).
    """
    fetch = jax.jit(lambda a: a.ravel()[0])

    def sync(v):
        return float(fetch(v))

    v = jstep(make_v0(), *args)  # compile warm-up
    sync(v)
    t_a = _run(jstep, make_v0(), args, r1, sync)
    t_b = _run(jstep, make_v0(), args, r2, sync)
    return (t_b - t_a) / (r2 - r1)


if __name__ == "__main__":
    from functools import partial

    N = 512
    x = jnp.zeros((N, N, N), jnp.float32)

    @partial(jax.jit, donate_argnums=(0,))
    def inc(v):
        return v + 1.0

    el = slope_time(inc, lambda: x + 0.0)
    print(f"v+1 512^3: {el*1e3:.3f} ms -> {2*x.nbytes/el/1e9:.0f} GB/s")

    y = jnp.ones((N, N, N), jnp.float32)
    z = jnp.ones((N, N, N), jnp.float32)
    w = jnp.ones((N, N, N), jnp.float32)

    @partial(jax.jit, donate_argnums=(0,))
    def fma4(v, a, b, c):
        return v + 0.5 * a + 0.25 * b + 0.125 * c

    el = slope_time(fma4, lambda: x + 0.0, args=(y, z, w))
    print(f"4in/1out 512^3: {el*1e3:.3f} ms -> {5*x.nbytes/el/1e9:.0f} GB/s")
