"""Re-measure the adaptive degenerate fast paths after the nested-cond
identity fix (the first measurement's fast branch streamed a flip AND a
select even for sorted inputs), plus a u64 adaptive spot check on chip
(CI covers it in interpret mode only).

Run on chip: python tools/probes/adaptive_degenerate2.py [log2n]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from vulkan_radix_sort_tpu.config import SortConfig, enable_compilation_cache
    from vulkan_radix_sort_tpu.models.sorter import Sorter
    from vulkan_radix_sort_tpu.utils.datagen import generate_keys
    from vulkan_radix_sort_tpu.utils.timing import median_marginal_time as t3

    enable_compilation_cache()
    n = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 25)
    adaptive = Sorter(n, config=SortConfig(adaptive=True))

    for dist in ("sorted", "reverse", "constant"):
        keys = generate_keys(n, seed=3, distribution=dist)
        kj = jnp.asarray(keys)
        assert np.array_equal(np.asarray(adaptive.sort(kj)), np.sort(keys))
        print(json.dumps({
            "path": f"keys_{dist}",
            "adaptive_ms": round(t3(adaptive.sort, kj) * 1e3, 3),
        }), flush=True)

    # u64 spot check: sorted and reverse detection through the (hi, lo)
    # encode — pure XLA ops (u64 compares decompose to u32 pairs on TPU)
    with jax.enable_x64(True):
        lo = generate_keys(n >> 5, seed=8).astype(np.uint64)
        hi = generate_keys(n >> 5, seed=9).astype(np.uint64)
        keys = np.sort((hi << np.uint64(32)) | lo)
        s64 = Sorter(n >> 5, key_dtype=jnp.uint64,
                     config=SortConfig(adaptive=True))
        for name, arr in (("sorted", keys),
                          ("reverse", keys[::-1].copy())):
            out = np.asarray(s64.sort(jnp.asarray(arr)))
            assert np.array_equal(out, keys), name
            print(json.dumps({"path": f"u64_keys_{name}",
                              "verified": True}), flush=True)
    print("adaptive degenerate2 verified")


if __name__ == "__main__":
    main()
