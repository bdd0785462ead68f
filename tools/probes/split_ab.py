"""Chip A/B for the 'fewer effective passes' MSB-split design (VERDICT r3
#3, design (a)): 4-way MSB counting split via the existing merge machinery.

The design: chunk-sort all of 2^25 (same as the direct pipeline), split
each sorted chunk at 3 exact pivots (searchsorted — cheap), route each
chunk's bucket-b run into slot (b, chunk) of a slack-2 slot buffer, then
finish each bucket with merge rounds only (merge_slots_u32 with fill
skipping).  This probe times the two compute phases and counts the
placement as FREE (zero HBM traffic, zero kernel time) — i.e. it measures
a strict LOWER BOUND on the split design's cost:

    T_split_lb = T_chunk(2^25) + 4 x T_merge_slots(2^24 buffer,
                 512 slots of 2^15, genuine ~ Binomial(2^16, 1/4))

vs the direct pipeline T_direct = sort_u32(2^25).  If T_split_lb >=
T_direct, the design is refuted on chip even before paying for placement
(which needs >= 2 HBM passes plus ragged run copies — the wall-4 cost).

Stage arithmetic this probe validates: direct merge rounds are
sum_{r=1..9}(r+16) = 189 stage-passes over 2^25; the slotted bucket
merges are sum_{r=1..9}(r+15) = 180 over 4 x 2^24 with ~half the local
work fill-skipped — the slack-2 inflation cancels the skip, so the split
can only win if slots were exact (impossible without scatter) AND
placement were free.  Run on chip: python tools/probes/split_ab.py
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
    from vulkan_radix_sort_tpu.ops import bitonic as B
    from vulkan_radix_sort_tpu.utils.timing import median_marginal_time

    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)
    n = 1 << 25
    chunk = 1 << 16
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    kj = jnp.asarray(keys)

    t3 = median_marginal_time

    # direct pipeline
    f_direct = lambda a: B.sort_u32(a, chunk=chunk)  # noqa: E731
    assert np.array_equal(np.asarray(f_direct(kj)), np.sort(keys))
    t_direct = t3(f_direct, kj)
    print(json.dumps({"phase": "direct", "ms": round(t_direct * 1e3, 2)}),
          flush=True)

    # chunk phase only (shared by both designs)
    np2, C = B._plan(n, chunk)
    k2 = B._pad_pow2(kj, np2, 0xFFFFFFFF)
    f_chunk = jax.jit(lambda a: B._run_chunk(
        [a], C, B.MODE_KEYS, False, B._cdiv(n, B.LANES))[0])
    t_chunk = t3(f_chunk, k2)
    print(json.dumps({"phase": "chunk_only", "ms": round(t_chunk * 1e3, 2)}),
          flush=True)

    # one bucket's slotted merge: 512 slots of 2^15, genuine run lengths
    # from a REAL pivot split of the sorted chunks (pivots at key-space
    # quartiles — realistic occupancy incl. Binomial variance)
    slot = 1 << 15
    n_slots = np2 // C  # one run per chunk
    ck = np.sort(keys[: n_slots * C].reshape(n_slots, C), axis=1)
    pivots = np.array([1 << 30, 1 << 31, 3 << 30], np.uint32)
    lo = np.zeros(n_slots, np.int64)
    sizes_all = []
    for b in range(4):
        hi = (np.apply_along_axis(np.searchsorted, 1, ck, pivots[b])
              if b < 3 else np.full(n_slots, C))
        sizes_all.append((hi - lo).astype(np.int64))
        lo = hi
    osz = max(int(s.max()) for s in sizes_all)
    assert osz <= slot, f"slack-2 slot overflows: max run {osz}"
    t_buckets = 0.0
    for b in range(4):
        sizes = sizes_all[b]
        buf = np.full((n_slots, slot), 0xFFFFFFFF, np.uint32)
        st = np.zeros(n_slots, np.int64) if b == 0 else sum(
            sizes_all[i] for i in range(b))
        for s in range(n_slots):
            buf[s, : sizes[s]] = ck[s, st[s]: st[s] + sizes[s]]
        bj = jnp.asarray(buf.reshape(-1))
        sz = jnp.asarray(sizes.astype(np.int32))
        f_m = lambda a, z: B.merge_slots_u32(a, z, slot=slot, chunk=chunk)  # noqa: E731
        out = np.asarray(f_m(bj, sz))
        want = np.sort(np.concatenate(
            [ck[s, st[s]: st[s] + sizes[s]] for s in range(n_slots)]))
        assert np.array_equal(out[: want.size], want), f"bucket {b} merge"
        t_b = t3(f_m, bj, sz)
        t_buckets += t_b
        print(json.dumps({"phase": f"bucket{b}_merge",
                          "genuine": int(sizes.sum()),
                          "ms": round(t_b * 1e3, 2)}), flush=True)

    t_split_lb = t_chunk + t_buckets
    print(json.dumps({
        "design": "msb4_split_free_placement_lower_bound",
        "t_direct_ms": round(t_direct * 1e3, 2),
        "t_split_lb_ms": round(t_split_lb * 1e3, 2),
        "chunk_ms": round(t_chunk * 1e3, 2),
        "bucket_merges_ms": round(t_buckets * 1e3, 2),
        "verdict": "REFUTED on chip" if t_split_lb >= t_direct
        else f"candidate: {t_direct / t_split_lb:.2f}x before placement",
    }), flush=True)


if __name__ == "__main__":
    main()
