"""Chip A/B for the sender-side odd-slot reversal (round-5 lever #2).

The distributed merge re-sort used to pay a whole-buffer
_reverse_odd_slots pass per array before its merge rounds; with the
exchange now landing odd slots' runs DESCENDING in the slot suffix
(prearranged), the merge skips that pass. This probe times
bitonic.merge_slots_u32 / merge_slots_pairs on the SAME logical input in
both orientations at the v5e-16 slot geometry — the single-chip proxy for
the distributed re-sort saving — with both outputs verified bitwise first.

Run on chip: python tools/probes/prearranged_ab.py [log2_total]
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
    n_slots = 16  # the v5e-16 slot count
    S = n // n_slots
    m = n // 2  # genuine volume at slack-2 slots
    rng = np.random.default_rng(0)
    sizes = rng.multinomial(m - S, np.ones(n_slots - 1) / (n_slots - 1))
    sizes = np.concatenate([[S], sizes]).astype(np.int64)
    sizes = np.minimum(sizes, S)
    kbuf = np.full((n_slots, S), 0xFFFFFFFF, np.uint32)
    kpre = np.full((n_slots, S), 0xFFFFFFFF, np.uint32)
    vbuf = np.zeros((n_slots, S), np.uint32)
    vpre = np.zeros((n_slots, S), np.uint32)
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
        if s % 2 == 1:
            kpre[s, S - sizes[s]:] = g[::-1]
            vpre[s, S - sizes[s]:] = v[::-1]
        else:
            kpre[s, : sizes[s]] = g
            vpre[s, : sizes[s]] = v
        runs_k.append(g)
        runs_v.append(v)
    allk, allv = np.concatenate(runs_k), np.concatenate(runs_v)
    perm = np.argsort(allk, kind="stable")
    mg = len(allk)
    sj = jnp.asarray(sizes.astype(np.int32))
    kj, kjp = jnp.asarray(kbuf.reshape(-1)), jnp.asarray(kpre.reshape(-1))
    vj, vjp = jnp.asarray(vbuf.reshape(-1)), jnp.asarray(vpre.reshape(-1))

    t3 = median_marginal_time

    f_recv = lambda k: bitonic.merge_slots_u32(  # noqa: E731
        k, sj, slot=S, interpret=interpret)
    f_pre = lambda k: bitonic.merge_slots_u32(  # noqa: E731
        k, sj, slot=S, interpret=interpret, prearranged=True)
    want = np.sort(allk)
    assert np.array_equal(np.asarray(f_recv(kj))[:mg], want), "recv keys"
    assert np.array_equal(np.asarray(f_pre(kjp))[:mg], want), "pre keys"
    print("keys verified (both orientations)")

    fp_recv = lambda k, v: bitonic.merge_slots_pairs(  # noqa: E731
        k, v, sj, slot=S, interpret=interpret)
    fp_pre = lambda k, v: bitonic.merge_slots_pairs(  # noqa: E731
        k, v, sj, slot=S, interpret=interpret, prearranged=True)
    gk, gv = fp_recv(kj, vj)
    assert np.array_equal(np.asarray(gk)[:mg], allk[perm]), "recv pk"
    assert np.array_equal(np.asarray(gv)[:mg], allv[perm]), "recv pv"
    gk, gv = fp_pre(kjp, vjp)
    assert np.array_equal(np.asarray(gk)[:mg], allk[perm]), "pre pk"
    assert np.array_equal(np.asarray(gv)[:mg], allv[perm]), "pre pv"
    print("pairs verified (both orientations)")

    out = {
        "n_buffer": n, "genuine": mg, "slot": S,
        "keys_receiver_reversal_ms": round(t3(f_recv, kj) * 1e3, 2),
        "keys_prearranged_ms": round(t3(f_pre, kjp) * 1e3, 2),
        "pairs_receiver_reversal_ms": round(t3(fp_recv, kj, vj) * 1e3, 2),
        "pairs_prearranged_ms": round(t3(fp_pre, kjp, vjp) * 1e3, 2),
    }
    out["keys_saving_ms"] = round(
        out["keys_receiver_reversal_ms"] - out["keys_prearranged_ms"], 2)
    out["pairs_saving_ms"] = round(
        out["pairs_receiver_reversal_ms"] - out["pairs_prearranged_ms"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 24)
