"""Single-chip validation of the slot-merge kernels (bitonic.merge_slots_*)
on real TPU hardware: the SMEM validity gate (pl.when + dynamic SMEM index
+ copy-through) is interpret-tested in CI but its Mosaic lowering has never
executed on chip, and the distributed pipeline AUTO-enables it — this probe
must pass before any multi-chip deployment window.

Also times the merged re-sort against a full sort of the same buffer, the
single-chip proxy for the distributed re-sort A/B (docs/SCALING_PROJECTION
.md: projected 2.1x at the v5e-16 geometry).

Run on chip: python tools/probes/merge_chip_check.py [log2_total]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main(log2_total=24):
    import jax
    import jax.numpy as jnp

    from vulkan_radix_sort_tpu.config import enable_compilation_cache
    from vulkan_radix_sort_tpu.ops import bitonic
    from vulkan_radix_sort_tpu.utils.timing import median_marginal_time

    enable_compilation_cache()
    interpret = jax.devices()[0].platform != "tpu"
    print("devices:", jax.devices(), "interpret:", interpret)

    n = 1 << log2_total
    n_slots = 16           # the v5e-16 slot count
    S = n // n_slots
    m = n // 2             # genuine volume at slack-2 slots
    rng = np.random.default_rng(0)
    # ragged genuine prefixes summing to m, a zero slot, a full slot
    sizes = rng.multinomial(m - S, np.ones(n_slots - 1) / (n_slots - 1))
    sizes = np.concatenate([[S], sizes]).astype(np.int64)
    sizes[3] = sizes[3] + sizes[5]
    sizes[5] = 0
    sizes = np.minimum(sizes, S)
    kbuf = np.full((n_slots, S), 0xFFFFFFFF, np.uint32)
    vbuf = np.zeros((n_slots, S), np.uint32)
    runs_k, runs_v, vc = [], [], 0
    for s in range(n_slots):
        g = np.sort(
            rng.integers(0, 2**32, sizes[s], dtype=np.uint64).astype(
                np.uint32)
        )
        v = np.arange(vc, vc + sizes[s], dtype=np.uint32)
        vc += int(sizes[s])
        kbuf[s, : sizes[s]] = g
        vbuf[s, : sizes[s]] = v
        runs_k.append(g)
        runs_v.append(v)
    allk, allv = np.concatenate(runs_k), np.concatenate(runs_v)
    perm = np.argsort(allk, kind="stable")
    kj = jnp.asarray(kbuf.reshape(-1))
    vj = jnp.asarray(vbuf.reshape(-1))
    sj = jnp.asarray(sizes.astype(np.int32))
    mg = len(allk)

    # keys: gated merge vs oracle
    f_gated = lambda k: bitonic.merge_slots_u32(  # noqa: E731
        k, sj, slot=S, interpret=interpret)
    got = np.asarray(f_gated(kj))
    assert np.array_equal(got[:mg], np.sort(allk)), "gated keys merge"
    print("keys merge (gated) verified")

    # pairs: stable, gated
    gk, gv = bitonic.merge_slots_pairs(kj, vj, sj, slot=S,
                                       interpret=interpret)
    assert np.array_equal(np.asarray(gk)[:mg], allk[perm]), "pairs keys"
    assert np.array_equal(np.asarray(gv)[:mg], allv[perm]), "pairs stability"
    print("pairs merge (gated) verified")

    t3 = median_marginal_time

    f_ungated = lambda k: bitonic.merge_slots_u32(  # noqa: E731
        k, slot=S, interpret=interpret)
    f_full = lambda k: bitonic.sort_u32(k, interpret=interpret)  # noqa: E731
    out = {
        "n_buffer": n, "genuine": mg, "slot": S,
        "merge_gated_ms": round(t3(f_gated, kj) * 1e3, 2),
        "merge_ungated_ms": round(t3(f_ungated, kj) * 1e3, 2),
        "full_sort_ms": round(t3(f_full, kj) * 1e3, 2),
    }
    out["speedup_vs_full"] = round(
        out["full_sort_ms"] / out["merge_gated_ms"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 24)
