"""Bisect the chip-only bign_stable failure (VERDICT r3 #1).

bign_stable_check.py (MODE_STABLE, n = 2^25+4096, np2 = 2^26) failed
bitwise on the v5e while passing in interpret.  The 2^26 padded geometry
(10 merge rounds, cross r=10 at G=1024) had never run on chip for ANY
mode, so this probe isolates mode vs geometry: it sorts with an
explicitly chosen carry mode + chunk via the engine internals (skipping
the jitted public wrappers and their MAX_PACKED_N branch) and reports a
mismatch FINGERPRINT against the oracle — count, first/last index,
whether the output is itself sorted, whether it is a permutation — which
usually names the culprit kernel outright.

Usage: python tools/probes/bign_bisect.py <mode> <log2n_plus> <log2chunk>
  mode       keys | pairs | stable | packed
  log2n_plus n = 2^log2n + 4096 (so np2 = 2^(log2n+1))
  log2chunk  chunk C = 2^log2chunk
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import json

import numpy as np


def fingerprint(name, got, want):
    got = np.asarray(got)
    bad = got != want
    n_bad = int(bad.sum())
    out = {"array": name, "mismatches": n_bad}
    if n_bad:
        idx = np.flatnonzero(bad)
        out.update(
            first=int(idx[0]), last=int(idx[-1]),
            out_sorted=bool(np.all(np.diff(got.astype(np.int64)) >= 0)),
            permutation=bool(
                np.array_equal(np.sort(got), np.sort(want))
            ),
        )
        # which 2^k-aligned regions hold mismatches, k = 16..22 — localizes
        # the failure to a merge round's block/group granularity
        for k in (16, 18, 20, 22):
            out[f"regions_2^{k}"] = np.unique(idx >> k).tolist()[:12]
    return out


def main():
    import jax
    import jax.numpy as jnp

    from vulkan_radix_sort_tpu.config import enable_compilation_cache
    from vulkan_radix_sort_tpu.ops import bitonic as B

    enable_compilation_cache()
    interpret = jax.devices()[0].platform not in ("tpu", "axon")
    mode_name, log2n, log2c = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    n = (1 << log2n) + 4096
    chunk = 1 << log2c
    print("devices:", jax.devices(), "mode:", mode_name, "n:", n,
          "chunk:", chunk, "interpret:", interpret, flush=True)

    rng = np.random.default_rng(0)
    keys = (rng.integers(0, 2**32, n, dtype=np.uint64) % 1021).astype(
        np.uint32)
    vals = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    order = np.argsort(keys, kind="stable")

    np2, C = B._plan(n, chunk)
    rr = B._cdiv(n, B.LANES)
    k = B._pad_pow2(jnp.asarray(keys), np2, 0xFFFFFFFF)

    if mode_name == "keys":
        arrs, mode = [k], B.MODE_KEYS
    elif mode_name == "pairs":
        arrs = [k, B._pad_pow2(jnp.asarray(vals), np2, 0xFFFFFFFF)]
        mode = B.MODE_PAIRS
    elif mode_name == "stable":
        arrs = [k, B._stable_idx(n, np2), B._pad_pow2(jnp.asarray(vals), np2, 0)]
        mode = B.MODE_STABLE
    elif mode_name == "packed":
        assert n <= B.MAX_PACKED_N
        arrs = [k, B._packed_aux(n, np2), B._pad_pow2(jnp.asarray(vals), np2, 0)]
        mode = B.MODE_PACKED
    else:
        raise SystemExit(f"unknown mode {mode_name}")

    f = jax.jit(lambda *xs: B._sort_padded(
        list(xs), np2, C, mode, interpret, rr))
    out = [np.asarray(a).reshape(-1)[:n] for a in f(*arrs)]

    res = [fingerprint("keys", out[0], keys[order])]
    if mode.ride:
        res.append(fingerprint("values", out[-1], vals[order]))
    elif mode is B.MODE_PAIRS:
        want = np.sort(
            keys.astype(np.uint64) << 32 | vals.astype(np.uint64))
        res.append(fingerprint("values", out[1],
                               (want & 0xFFFFFFFF).astype(np.uint32)))
    for r in res:
        print(json.dumps(r), flush=True)
    ok = all(r["mismatches"] == 0 for r in res)
    print("RESULT", mode_name, "np2", np2, "C", C,
          "OK" if ok else "FAIL", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
