"""Device-side microbenchmark harness.

The role of the reference's `triton.testing.do_bench` usage
(reference: flute/tune.py:82-109) — but designed for remote-attached TPUs
where per-dispatch latency is large AND noisy (tunnel): the op under test
is iterated *inside* a single jitted fori_loop with a serializing data
dependency, and the per-iteration time is the SLOPE between two iteration
counts (min-of-repeats each), which cancels dispatch/sync overhead exactly
instead of assuming it is constant.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def bench_op(
    f: Callable[..., jnp.ndarray],
    *args,
    iters: int = 200,
    reps: int = 3,
    warmup: bool = True,
    min_window: float = 0.02,
) -> float:
    """Return seconds per execution of ``f(*args)`` measured device-side.

    ``f`` must return a single array. A scalar tap of each iteration's
    output is fed back into the first argument as a numerically-negligible
    perturbation, which serializes iterations and defeats loop-invariant
    hoisting without touching the measured op's memory traffic.
    """

    def loop(n, *a):
        x0 = a[0]

        def body(i, carry):
            x, tap = carry
            y = f(x, *a[1:])
            # tap: scalar data dependency; 1e-30 * tap vanishes in bf16/f32
            # addition but cannot be constant-folded.
            tap2 = y[(0,) * y.ndim].astype(jnp.float32)
            x2 = x + (tap2 * 1e-30).astype(x.dtype)
            return (x2, tap2)

        return jax.lax.fori_loop(0, n, body, (x0, jnp.float32(0)))[1]

    # n is a *traced* loop bound: one compilation serves every iteration
    # count, so compile time can never leak into the timed region.
    jloop = jax.jit(loop)
    if warmup:
        _ = jax.device_get(jloop(2, *args))

    def timed(n: int) -> float:
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = jax.device_get(jloop(n, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    n1 = max(2, iters // 5)
    n2 = iters
    t1 = timed(n1)
    t2 = timed(n2)
    # Tunnel RTT jitter is on the order of milliseconds; a slope window
    # below it produces garbage (observed: 0.0 us "winners" poisoning the
    # tuning registry, round 5). Grow the iteration count until the delta
    # dominates the jitter — the traced loop bound means no recompiles.
    grow = 0
    while t2 - t1 < min_window and grow < 7:
        n1, t1 = n2, t2
        n2 *= 4
        t2 = timed(n2)
        grow += 1
    return max(t2 - t1, 1e-12) / (n2 - n1)


def format_gemm_report(
    name: str,
    dt: float,
    m: int,
    n: int,
    k: int,
    num_bits: int,
    hbm_gbps: float,
    extra_bytes: int = 0,
) -> str:
    weight_bytes = k * n * num_bits / 8
    total = weight_bytes + extra_bytes
    bw = total / dt / 1e9
    pct = 100.0 * bw / hbm_gbps
    tflops = 2 * m * n * k / dt / 1e12
    return (
        f"{name}: {dt * 1e6:8.1f} us  {bw:7.1f} GB/s ({pct:5.1f}% roofline)"
        f"  {tflops:6.2f} TFLOP/s"
    )
