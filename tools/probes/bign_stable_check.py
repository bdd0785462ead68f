"""Chip-verify the big-n stable fallbacks ABOVE the packed threshold
(VERDICT r2 #4 tail): a stable key-value sort at n > 2^25 selects
MODE_STABLE (plain (key, idx, value) carry — bitonic.py mode table), which
CI exercises only at interpreted small n via VRS_MAX_PACKED_N. One
chip-verified run at the real threshold retires the remaining risk.

Compile-heavy on first run (new 2^26 size bucket); the persistent cache
amortizes reruns. Run on chip: python tools/probes/bign_stable_check.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from vulkan_radix_sort_tpu.config import enable_compilation_cache
    from vulkan_radix_sort_tpu.ops import bitonic
    from vulkan_radix_sort_tpu.utils.timing import marginal_time

    enable_compilation_cache()
    interpret = jax.devices()[0].platform != "tpu"
    print("devices:", jax.devices(), "interpret:", interpret)

    n = (1 << 25) + 4096  # just past MAX_PACKED_N -> MODE_STABLE
    assert n > bitonic.MAX_PACKED_N
    rng = np.random.default_rng(0)
    keys = (rng.integers(0, 2**32, n, dtype=np.uint64) % 1021).astype(
        np.uint32)  # heavy duplicates stress the index tiebreak
    vals = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    kj, vj = jnp.asarray(keys), jnp.asarray(vals)

    f = lambda a, b: bitonic.sort_pairs_u32(a, b, stable=True)  # noqa: E731
    gk, gv = f(kj, vj)
    order = np.argsort(keys, kind="stable")
    assert np.array_equal(np.asarray(gk), keys[order]), "big-n stable keys"
    assert np.array_equal(np.asarray(gv), vals[order]), "big-n stability"
    print("MODE_STABLE verified at n = 2^25 + 4096 (bitwise, stable)")
    t = float(np.median([
        marginal_time(f, kj, vj, k1=2, k2=6, iters=3) for _ in range(3)
    ]))
    print(json.dumps({
        "path": "kv_stable_bign", "n": n, "ms": round(t * 1e3, 2),
        "gitems_s": round(n / t / 1e9, 3),
    }))


if __name__ == "__main__":
    main()
