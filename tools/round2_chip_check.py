"""Round-2 chip validation + timing: run each new engine path on the real
TPU, verify bitwise against the oracle, and report marginal-timed ms.

Usage: python tools/round2_chip_check.py [keys|kv|kvns|u64kv|u64kvns|indirect|all]
Env:   VRS_TRANSPOSE=0 to compare the non-transposed engine.
"""

import json
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(which="all"):
    import jax
    import jax.numpy as jnp

    from vulkan_radix_sort_tpu.config import enable_compilation_cache
    from vulkan_radix_sort_tpu.ops import bitonic
    from vulkan_radix_sort_tpu.utils.timing import marginal_time

    enable_compilation_cache()
    print("devices:", jax.devices(), "transpose:", bitonic.TRANSPOSE_OPT)

    n = 1 << 25
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    vals = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    kj, vj = jnp.asarray(keys), jnp.asarray(vals)

    def report(name, t):
        print(json.dumps({
            "path": name, "ms": round(t * 1e3, 2),
            "gitems_s": round(n / t / 1e9, 3),
        }), flush=True)

    def t3(f, *args):
        return float(np.median([
            marginal_time(f, *args, k1=2, k2=8, iters=4) for _ in range(3)
        ]))

    if which in ("keys", "all"):
        f = lambda a: bitonic.sort_u32(a)  # noqa: E731
        got = np.asarray(f(kj))
        assert np.array_equal(got, np.sort(keys)), "keys mismatch"
        print("keys verified")
        report("keys", t3(f, kj))

    if which in ("kv", "all"):
        f = lambda a, b: bitonic.sort_pairs_u32(a, b, stable=True)  # noqa: E731
        gk, gv = f(kj, vj)
        order = np.argsort(keys, kind="stable")
        assert np.array_equal(np.asarray(gk), keys[order]), "kv keys mismatch"
        assert np.array_equal(np.asarray(gv), vals[order]), "kv vals mismatch"
        print("stable kv verified (packed-lazy carry)")
        report("kv_stable", t3(f, kj, vj))

    if which in ("kvns", "all"):
        f = lambda a, b: bitonic.sort_pairs_u32(a, b, stable=False)  # noqa: E731
        gk, gv = f(kj, vj)
        order = np.lexsort((vals, keys))
        assert np.array_equal(np.asarray(gk), keys[order]), "kvns keys"
        assert np.array_equal(np.asarray(gv), vals[order]), "kvns vals"
        print("kvns verified")
        report("kv_nonstable", t3(f, kj, vj))

    if which in ("u64kv", "u64kvns", "all"):
        k64 = rng.integers(0, 2**64, size=n, dtype=np.uint64)
        k64[rng.random(n) < 0.2] = np.uint64(0xDEAD00000000BEEF)
        hi = jnp.asarray((k64 >> 32).astype(np.uint32))
        lo = jnp.asarray((k64 & 0xFFFFFFFF).astype(np.uint32))

    if which in ("u64kv", "all"):
        f = lambda a, b, c: bitonic.sort_pairs_w64(a, b, c, stable=True)  # noqa: E731
        gh, gl, gv = f(hi, lo, vj)
        order = np.argsort(k64, kind="stable")
        got64 = (np.asarray(gh).astype(np.uint64) << 32) | np.asarray(gl)
        assert np.array_equal(got64, k64[order]), "u64 kv keys"
        assert np.array_equal(np.asarray(gv), vals[order]), "u64 kv vals"
        print("u64 stable kv verified")
        report("u64_kv_stable", t3(f, hi, lo, vj))

    if which in ("u64kvns", "all"):
        # MODE_W3 — the no-ride mode VRS_TRANSPOSE default-ON enables the
        # T layout for; chip-gate it like the other T modes (ADVICE r3)
        f = lambda a, b, c: bitonic.sort_pairs_w64(a, b, c, stable=False)  # noqa: E731
        gh, gl, gv = f(hi, lo, vj)
        order = np.lexsort((vals, k64))
        got64 = (np.asarray(gh).astype(np.uint64) << 32) | np.asarray(gl)
        assert np.array_equal(got64, k64[order]), "u64 kvns keys"
        assert np.array_equal(np.asarray(gv), vals[order]), "u64 kvns vals"
        print("u64 non-stable kv (w3) verified")
        report("u64_kv_nonstable", t3(f, hi, lo, vj))

    if which in ("indirect", "all"):
        from vulkan_radix_sort_tpu.models.sorter import create_sorter

        s = create_sorter(n, backend="network")
        for c in (n - 12345, n // 2, n // 8):
            f = lambda a, c=c: s._sort_count_fn(a, jnp.uint32(c))  # noqa: E731
            got = np.asarray(f(kj))
            assert np.array_equal(got[:c], np.sort(keys[:c])), "indirect prefix"
            assert np.array_equal(got[c:], keys[c:]), "indirect tail"
            print(f"indirect keys verified (count={c})")
            # prefix gating: expect time ~ c/n of the full sort
            report(f"keys_indirect_{c}", t3(f, kj))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "all")
