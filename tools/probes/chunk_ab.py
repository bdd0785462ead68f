"""Re-sweep the chunk size under the round-5 defaults (T layout + indep
CE). The 2^16 optimum was established in round 1 on the pre-T engine
(docs/PERFORMANCE.md session-2 table); the T layout changed the stage-cost
mix (sublane-dominant, in-kernel tile transposes at chunk granularity), so
the optimum could have moved. Keys and stable kv at 2^25, each verified
bitwise before timing.

Run on chip: python tools/probes/chunk_ab.py
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
    vals = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    kj, vj = jnp.asarray(keys), jnp.asarray(vals)
    order = np.argsort(keys, kind="stable")

    t3 = median_marginal_time

    for lc in (15, 16, 17):
        chunk = 1 << lc
        f = lambda a: bitonic.sort_u32(a, chunk=chunk)  # noqa: E731
        assert np.array_equal(np.asarray(f(kj)), np.sort(keys)), lc
        tk = t3(f, kj)
        fkv = lambda a, b: bitonic.sort_pairs_u32(  # noqa: E731
            a, b, chunk=chunk, stable=True)
        gk, gv = fkv(kj, vj)
        assert np.array_equal(np.asarray(gk), keys[order]), lc
        assert np.array_equal(np.asarray(gv), vals[order]), lc
        tkv = t3(fkv, kj, vj)
        print(json.dumps({
            "chunk": chunk,
            "keys_ms": round(tk * 1e3, 2),
            "kv_ms": round(tkv * 1e3, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
