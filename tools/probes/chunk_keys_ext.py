"""Extend the keys-only chunk sweep upward (r5d_chunk_ab trend was
monotone improving through 2^17: 16.05 / 13.98 / 13.48 ms at 2^15/16/17).
Keys at 2^25 for chunk 2^17..2^19, each bitwise-verified before timing.
Carry paths are excluded on purpose — their optimum measured flat-to-worse
above 2^16 (kv 46.62 -> 47.19 at 2^17).

Run on chip: python tools/probes/chunk_keys_ext.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    import jax.numpy as jnp

    from vulkan_radix_sort_tpu.config import enable_compilation_cache
    from vulkan_radix_sort_tpu.ops import bitonic
    from vulkan_radix_sort_tpu.utils.timing import median_marginal_time

    enable_compilation_cache()
    n = 1 << 25
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    kj = jnp.asarray(keys)
    expect = np.sort(keys)

    t3 = median_marginal_time

    for lc in (17, 18, 19):
        chunk = 1 << lc
        f = lambda a: bitonic.sort_u32(a, chunk=chunk)  # noqa: E731
        assert np.array_equal(np.asarray(f(kj)), expect), lc
        tk = t3(f, kj)
        print(json.dumps({
            "chunk": chunk,
            "keys_ms": round(tk * 1e3, 2),
            "gitems_s": round(n / tk / 1e9, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
