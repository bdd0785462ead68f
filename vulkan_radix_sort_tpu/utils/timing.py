"""Stage-level timing instrumentation.

TPU analog of the reference's 15 GPU timestamp queries per sort
(h.in:39-50: start, post-transfer, then upsweep/spine/downsweep per pass,
end; decoded in bench/vulkan_benchmark.cc:318-337). XLA gives no intra-program
timestamps, so stage timing runs each jitted stage separately with
block_until_ready; whole-sort timing runs the fused program.

On this environment the device tunnel adds a large fixed dispatch+sync
latency (~26 ms measured), so `time_fn` amortizes it by looping the function
K times inside one jitted program (functional chaining prevents DCE).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import jax
import numpy as np


@dataclass
class StageTimes:
    """Per-stage nanosecond totals, mirror of Results in bench/benchmark_base.h:10-28."""

    total_ns: float = 0.0
    cpu_ns: float = 0.0
    upsweep_ns: float = 0.0
    spine_ns: float = 0.0
    downsweep_ns: float = 0.0
    extra: dict = field(default_factory=dict)


def _sync(x):
    leaves = jax.tree.leaves(x)
    for leaf in leaves:
        jax.block_until_ready(leaf)
    # pull one element to the host to defeat async tunnels that ack early
    # (device-side slice first: transferring the full array would dominate).
    # For sharded arrays, slice one addressable shard — an eager slice of
    # the global array is a sharding-ambiguous gather.
    if leaves:
        leaf = leaves[0]
        shards = getattr(leaf, "addressable_shards", None)
        buf = shards[0].data if shards else leaf
        np.asarray(buf[:1] if buf.ndim else buf)


def time_fn(fn, *args, iters: int = 10, warmup: int = 1, loop_inside: int = 1):
    """Median wall-clock seconds per call of fn(*args).

    Mirrors the reference methodology: 1 warmup + `iters` timed runs, median
    (bench/bench.cc:15-16,97-101). `loop_inside` > 1 wraps fn in a
    lax.fori_loop inside one jit to amortize fixed dispatch latency.
    """
    if loop_inside > 1:
        inner = fn

        @jax.jit
        def looped(*a):
            def body(_, carry):
                return inner(*carry) if isinstance(carry, tuple) else inner(carry)

            if len(a) == 1:
                return jax.lax.fori_loop(0, loop_inside, body, a[0])
            return jax.lax.fori_loop(0, loop_inside, body, a)

        fn = looped

    for _ in range(max(warmup, 1)):
        _sync(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append((time.perf_counter() - t0) / loop_inside)
    return float(np.median(ts))


def marginal_time(fn, *args, k1: int = 1, k2: int = 4, iters: int = 5,
                  min_delta: float = 0.04, max_k: int = 512):
    """Seconds per fn application with dispatch overhead cancelled.

    Chains fn k times inside one jitted fori_loop (fn must map its args to a
    same-shaped result) and reports (T(k2) - T(k1)) / (k2 - k1). This is the
    robust way to time on this environment: the tunnel's fixed dispatch+sync
    latency (~26-65 ms, and it drifts) divides out exactly.

    The spread k2-k1 grows adaptively until the time delta clears
    `min_delta` seconds, so sub-millisecond sorts still resolve above the
    few-ms dispatch jitter.
    """

    _looped_cache: dict = {}

    def looped(k):
        # one jit wrapper per k, reused across timing samples — re-wrapping
        # per sample would force a fresh trace (and cache lookup) each time
        if k not in _looped_cache:

            @jax.jit
            def f(*a):
                if len(a) == 1:
                    return jax.lax.fori_loop(0, k, lambda _, c: fn(c), a[0])
                return jax.lax.fori_loop(0, k, lambda _, c: tuple(fn(*c)), a)

            _looped_cache[k] = f
        return _looped_cache[k]

    # use the MINIMUM over iters, not the median: the tunnel's dispatch
    # latency has multi-hundred-ms spikes and the minimum is the robust
    # estimator of the fixed-cost floor that the subtraction relies on
    def t_of(k, it):
        f = looped(k)
        return min(
            time_fn(f, *args, iters=1, warmup=0) for _ in range(it)
        )

    f1 = looped(k1)
    f1(*args)  # compile + warm
    t1 = t_of(k1, iters)
    t2 = t_of(k2, iters)
    if t2 - t1 < min_delta and k2 < max_k:
        # one refinement: pick the k that should clear min_delta (avoids a
        # doubling loop — every distinct k costs an outer-jit compile)
        est = max((t2 - t1) / (k2 - k1), 1e-5)
        k2 = min(max_k, k1 + max(k2 - k1, int(min_delta / est) + 1))
        t2 = t_of(k2, iters)
        t1 = min(t1, t_of(k1, iters))  # re-floor t1 against spikes
    return max((t2 - t1) / (k2 - k1), 1e-9)


def median_marginal_time(fn, *args, samples: int = 3, k1: int = 2,
                         k2: int = 8, iters: int = 4) -> float:
    """Median of `samples` independent marginal_time estimates.

    The probe scripts' standard timing discipline: one marginal estimate
    still carries the tunnel latency's residual drift (observed ±15%
    run-to-run), so headline numbers take the median of several.
    """
    return float(np.median([
        marginal_time(fn, *args, k1=k1, k2=k2, iters=iters)
        for _ in range(samples)
    ]))


def measure_overhead() -> float:
    """Fixed dispatch+sync latency of a trivial program (seconds)."""
    x = jax.numpy.zeros((8,), jax.numpy.uint32)
    f = jax.jit(lambda a: a + 1)
    return time_fn(f, x, iters=5)
