"""Price the sender-side flip (round-5 follow-up).

The sender-side odd-slot reversal pays one `jnp.where(odd, jnp.flip(x), x)`
per array per device before the exchange. The receiver-side reversal it
replaced measured ~8x its 2-pass streaming model (r5_prearranged_ab:
3.32 ms over a 64 MB buffer vs ~0.4 ms modeled), so this probe prices the
XLA lowering of the sender flip at the v5e-16 shard size (m = 2^23), plus
candidate cheaper forms, so the exchange prologue can be re-lowered if XLA
reverse is the same pathology.

Run on chip: python tools/probes/flip_cost.py [log2_m]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main(log2_m=23):
    import jax
    import jax.numpy as jnp

    from vulkan_radix_sort_tpu.config import enable_compilation_cache
    from vulkan_radix_sort_tpu.utils.timing import median_marginal_time

    enable_compilation_cache()
    print("devices:", jax.devices())
    m = 1 << log2_m
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.integers(0, 2**32, size=m, dtype=np.uint64).astype(np.uint32)
    )
    flag = jnp.bool_(True)

    def t3(f, *args):
        return median_marginal_time(f, *args, k2=10, iters=5)

    out = {"m": m, "bytes": m * 4}

    # the exact op the exchange sites run (scalar predicate, flip taken)
    f_where = lambda a, fl: jnp.where(fl, jnp.flip(a), a)  # noqa: E731
    got = np.asarray(jax.jit(f_where)(x, flag))
    assert np.array_equal(got, np.asarray(x)[::-1]), "where-flip wrong"
    out["where_flip_ms"] = round(t3(f_where, x, flag) * 1e3, 3)

    # bare reverse
    f_flip = lambda a: jnp.flip(a)  # noqa: E731
    out["bare_flip_ms"] = round(t3(f_flip, x) * 1e3, 3)

    # 2-D row-reversal form (the shape the old receiver reversal used):
    # flip along the lane-major axis of a (rows, 16384) view
    f2 = lambda a: jnp.flip(a.reshape(-1, 16384), axis=1).reshape(-1)  # noqa: E731
    got = np.asarray(jax.jit(f2)(x))
    assert np.array_equal(
        got, np.asarray(x).reshape(-1, 16384)[:, ::-1].reshape(-1)
    ), "2d flip wrong"
    out["flip2d_rows_ms"] = round(t3(f2, x) * 1e3, 3)

    # streaming reference: plain copy (xor to defeat no-op elision)
    f_copy = lambda a: a ^ jnp.uint32(1)  # noqa: E731
    out["xor_copy_ms"] = round(t3(f_copy, x) * 1e3, 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 23)
