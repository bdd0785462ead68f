"""Driver benchmark: prints ONE JSON line with the headline metric.

Metric parity with the reference: 32-bit keys-only GItems/s at N=2^25,
uniform random keys, median of timed runs after warmup (reference
README.md:41,57: 12.07 GItems/s on RTX 5080; bench/bench.cc:15-20).
Correctness is verified against the NumPy oracle before timing, exactly like
the reference's pre-sweep check (bench/bench.cc:41-64,164-166).
"""

import json
import sys

import numpy as np

BASELINE_KEYS_GITEMS = 12.07  # reference README.md:57 (RTX 5080)


def main():
    import jax
    import jax.numpy as jnp

    from vulkan_radix_sort_tpu.config import SortConfig
    from vulkan_radix_sort_tpu.ops import radix, reference
    from vulkan_radix_sort_tpu.utils.timing import time_fn

    n = 1 << 25
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    kj = jnp.asarray(keys)

    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu:
        cfg = SortConfig()
        fn = jax.jit(lambda a: radix.sort_u32(a, config=cfg))
    else:
        fn = jax.jit(reference.sort_keys)

    # correctness gate (reference bench.cc:41-64)
    got = np.asarray(fn(kj))
    if not np.array_equal(got, np.sort(keys)):
        print(json.dumps({
            "metric": "keys_gitems_per_s", "value": 0.0, "unit": "GItems/s",
            "vs_baseline": 0.0, "error": "verification failed",
        }))
        return 1

    t = time_fn(fn, kj, iters=10, warmup=2)
    # subtract the measured fixed dispatch+sync latency of this environment
    from vulkan_radix_sort_tpu.utils.timing import measure_overhead
    overhead = measure_overhead()
    t_net = max(t - overhead, 1e-9)
    gitems = n / t_net / 1e9
    print(json.dumps({
        "metric": "keys_gitems_per_s",
        "value": round(gitems, 4),
        "unit": "GItems/s",
        "vs_baseline": round(gitems / BASELINE_KEYS_GITEMS, 4),
        "n": n,
        "raw_seconds": round(t, 6),
        "overhead_seconds": round(overhead, 6),
        "backend": "pallas" if on_tpu else "xla-cpu",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
