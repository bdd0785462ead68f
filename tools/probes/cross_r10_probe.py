"""Isolate the cross/local round-10 kernels at the np2=2^26 geometry
(bign_bisect: ALL modes fail there on chip; 2^21/nrounds=11 passes).

Builds the exact pre-round-10 network state — first 2^25 elements sorted
ascending, second 2^25 sorted descending (one bitonic sequence) — and runs
ONLY round 10 (cross r=10 + local r=10) with MODE_KEYS.  If the output is
not the fully sorted array, the round-10 kernels at G=1024 are the
culprit; otherwise the bug is upstream.

Usage: python tools/probes/cross_r10_probe.py [r] [log2C]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from vulkan_radix_sort_tpu.config import enable_compilation_cache
    from vulkan_radix_sort_tpu.ops import bitonic as B

    enable_compilation_cache()
    interpret = jax.devices()[0].platform not in ("tpu", "axon")
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    lc = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    C = 1 << lc
    np2 = C << r  # round r is the final round: np2 = C * 2^r
    print("devices:", jax.devices(), "r:", r, "C:", C, "np2:", np2,
          flush=True)

    rng = np.random.default_rng(0)
    keys = rng.integers(0, 2**32, np2, dtype=np.uint64).astype(np.uint32)
    half = np2 // 2
    pre = np.concatenate([np.sort(keys[:half]),
                          np.sort(keys[half:])[::-1]])
    k = jnp.asarray(pre).reshape(np2 // B.LANES, B.LANES)

    @jax.jit
    def round_r(a):
        arrs = B._run_cross([a], C, r, B.MODE_KEYS, interpret)
        arrs = B._run_local(arrs, C, r, B.MODE_KEYS, interpret)
        return arrs[0]

    got = np.asarray(round_r(k)).reshape(-1)
    want = np.sort(keys)
    bad = got != want
    n_bad = int(bad.sum())
    print("mismatches:", n_bad)
    if n_bad:
        idx = np.flatnonzero(bad)
        print("first:", int(idx[0]), "last:", int(idx[-1]),
              "rows(128):", np.unique(idx >> 7)[:16].tolist(),
              "blocks(C):", np.unique(idx >> lc)[:24].tolist())
        # cross-only check: after cross r, every C-block should contain
        # exactly the elements of its sorted-block counterpart
        cr = np.asarray(jax.jit(lambda a: B._run_cross(
            [a], C, r, B.MODE_KEYS, interpret)[0])(k)).reshape(-1)
        wb = want.reshape(-1, C)
        gb = np.sort(cr.reshape(-1, C), axis=1)
        # direction: block b of round-r output is ascending iff bit r of
        # b's group.. final round: all ascending after local; cross only
        # guarantees set-partition per block
        badb = [int(b) for b in range(wb.shape[0])
                if not np.array_equal(gb[b], wb[b])]
        print("cross-stage bad blocks:", badb[:24], "count:", len(badb))
    print("RESULT", "OK" if n_bad == 0 else "FAIL", flush=True)


if __name__ == "__main__":
    main()
