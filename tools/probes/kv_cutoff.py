"""Re-measure the auto-backend crossover sizes after the packed-lazy
carry (VERDICT round-1 item 7): network vs XLA for stable kv and kvns
(and keys for reference) across n = 2^16..2^22.

Each point is a fresh kernel set on first run (persistent cache after).
Run on chip: python tools/probes/kv_cutoff.py [kv|kvns|keys]
Writes bench_results/kv_cutoff_v5e.csv.
"""

import csv
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main(which="all"):
    import jax
    import jax.numpy as jnp

    from vulkan_radix_sort_tpu.config import enable_compilation_cache
    from vulkan_radix_sort_tpu.ops import bitonic, reference
    from vulkan_radix_sort_tpu.utils.timing import marginal_time

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    rows = []
    out_path = os.path.join(
        os.path.dirname(__file__), "..", "..", "bench_results",
        "kv_cutoff_v5e.csv",
    )

    def xla_kv(a, b):
        return jax.lax.sort((a, b), num_keys=1, is_stable=True)

    # keys fns are unary: marginal_time's chained carry must match the
    # function's signature (a binary fn returning one array explodes the
    # fori_loop carry)
    paths = {
        "keys": (
            lambda a: bitonic.sort_u32(a),
            lambda a: reference.sort_keys(a),
        ),
        "kv": (
            lambda a, b: bitonic.sort_pairs_u32(a, b, stable=True),
            xla_kv,
        ),
        "kvns": (
            lambda a, b: bitonic.sort_pairs_u32(a, b, stable=False),
            xla_kv,  # stable sort is a valid non-stable answer
        ),
    }
    sel = paths if which == "all" else {which: paths[which]}

    for lg in range(16, 23):
        n = 1 << lg
        keys = jnp.asarray(
            rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
        )
        vals = jnp.asarray(
            rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
        )
        for name, (net_fn, xla_fn) in sel.items():
            args = (keys,) if name == "keys" else (keys, vals)
            for backend, fn in (("network", net_fn), ("xla", xla_fn)):
                f = jax.jit(fn)
                t = float(np.median([
                    marginal_time(f, *args, k1=2, k2=16, iters=4,
                                  min_delta=0.02)
                    for _ in range(3)
                ]))
                row = {
                    "sort": name, "backend": backend, "n": n,
                    "ms": round(t * 1e3, 4),
                    "gitems_s": round(n / t / 1e9, 4),
                }
                rows.append(row)
                print(json.dumps(row), flush=True)

    with open(out_path, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print("wrote", out_path)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "all")
