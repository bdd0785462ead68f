"""Bitonic network engine tests (interpret mode on CPU).

Covers the reference's oracle-diff contract (bench/bench.cc:41-64) for the
network backend: exact equality with np.sort / stable argsort across sizes,
distributions, chunk geometries, and sentinel edge cases.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vulkan_radix_sort_tpu.ops import bitonic
from vulkan_radix_sort_tpu.utils import datagen

CHUNK = 1 << 12


@pytest.mark.parametrize(
    "n",
    [
        64,
        100,
        1 << 12,
        pytest.param(20000, marks=pytest.mark.slow),
        pytest.param((1 << 15) + 7, marks=pytest.mark.slow),
    ],
)
def test_keys_sizes(rng, n):
    keys = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    got = np.asarray(bitonic.sort_u32(jnp.asarray(keys), chunk=CHUNK, interpret=True))
    np.testing.assert_array_equal(got, np.sort(keys))


@pytest.mark.slow
@pytest.mark.parametrize("dist", list(datagen.DISTRIBUTIONS))
def test_keys_distributions(dist):
    n = 1 << 14
    keys = datagen.generate_keys(n, seed=3, distribution=dist)
    got = np.asarray(bitonic.sort_u32(jnp.asarray(keys), chunk=CHUNK, interpret=True))
    np.testing.assert_array_equal(got, np.sort(keys))


@pytest.mark.slow
@pytest.mark.parametrize("dist", ["uniform", "few", "constant", "sorted"])
def test_pairs_stable(dist):
    n = (1 << 14) + 311
    keys = datagen.generate_keys(n, seed=4, distribution=dist)
    vals = np.arange(n, dtype=np.uint32)
    k, v = bitonic.sort_pairs_u32(
        jnp.asarray(keys), jnp.asarray(vals), chunk=CHUNK, interpret=True
    )
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(k), keys[order])
    np.testing.assert_array_equal(np.asarray(v), vals[order])


@pytest.mark.parametrize("dist", ["uniform", "few"])
def test_pairs_stable_small(dist):
    """Fast-gate variant of test_pairs_stable (small n, multiple rounds)."""
    n = (1 << 11) + 311
    keys = datagen.generate_keys(n, seed=4, distribution=dist)
    vals = np.arange(n, dtype=np.uint32)
    k, v = bitonic.sort_pairs_u32(
        jnp.asarray(keys), jnp.asarray(vals), chunk=1 << 10, interpret=True
    )
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(k), keys[order])
    np.testing.assert_array_equal(np.asarray(v), vals[order])


def test_pairs_sentinel_keys(rng):
    """Genuine 0xffffffff keys must sort ahead of the pad sentinels."""
    n = 1500
    keys = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    keys[::3] = 0xFFFFFFFF
    vals = np.arange(n, dtype=np.uint32)
    k, v = bitonic.sort_pairs_u32(
        jnp.asarray(keys), jnp.asarray(vals), chunk=1 << 10, interpret=True
    )
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(k), keys[order])
    np.testing.assert_array_equal(np.asarray(v), vals[order])


def test_single_chunk_no_rounds(rng):
    """n <= chunk: only the chunk kernel runs."""
    n = 2000
    keys = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    got = np.asarray(
        bitonic.sort_u32(jnp.asarray(keys), chunk=1 << 14, interpret=True)
    )
    np.testing.assert_array_equal(got, np.sort(keys))


@pytest.mark.parametrize("dist", ["uniform", "few", "constant"])
@pytest.mark.parametrize(
    "n", [1 << 12, pytest.param((1 << 13) + 97, marks=pytest.mark.slow)]
)
def test_pairs_nonstable(dist, n):
    """stable=False: deterministic (key, value)-lexicographic order."""
    keys = datagen.generate_keys(n, seed=7, distribution=dist)
    vals = datagen.generate_keys(n, seed=8)  # full-range u32 values
    k, v = bitonic.sort_pairs_u32(
        jnp.asarray(keys), jnp.asarray(vals), chunk=CHUNK, interpret=True,
        stable=False,
    )
    order = np.lexsort((vals, keys))
    np.testing.assert_array_equal(np.asarray(k), keys[order])
    np.testing.assert_array_equal(np.asarray(v), vals[order])


@pytest.mark.slow  # default-on engine path since round 3 (chip-verified)
@pytest.mark.parametrize("t_impl", ["unrolled", "batched"])
def test_transposed_layout_chunk(rng, monkeypatch, t_impl):
    """chunk >= 2^14 engages the 128x128 tile-transpose layout that
    sublane-executes each run's bits 6..0 tail; single-chunk keys sort
    covering the T<->N switches per phase (incl. short-head phases that
    stay in T). Both tile-transpose lowerings are pinned (the default is
    unrolled; batched stays selectable via VRS_T_IMPL). (Forced on so the
    test stays meaningful under any VRS_TRANSPOSE env.)"""
    monkeypatch.setattr(bitonic, "TRANSPOSE_OPT", True)
    monkeypatch.setattr(bitonic, "T_IMPL", t_impl)
    n = 1 << 14
    keys = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    got = np.asarray(
        bitonic.sort_u32.__wrapped__(
            jnp.asarray(keys), chunk=1 << 14, interpret=True
        )
    )
    np.testing.assert_array_equal(got, np.sort(keys))


@pytest.mark.slow
def test_transposed_layout_rounds_and_pairs(rng, monkeypatch):
    """T layout across merge rounds (fused/local bodies) and the
    packed-lazy stable carry with per-layout value gathers (T_MODES=all:
    the default noride policy would exclude the riding-value carry)."""
    monkeypatch.setattr(bitonic, "TRANSPOSE_OPT", True)
    monkeypatch.setattr(bitonic, "T_MODES", "all")
    n = (1 << 15) + 311
    keys = rng.integers(0, 64, size=n, dtype=np.uint64).astype(np.uint32)
    vals = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    got = np.asarray(
        bitonic.sort_u32.__wrapped__(
            jnp.asarray(keys), chunk=1 << 14, interpret=True
        )
    )
    np.testing.assert_array_equal(got, np.sort(keys))
    gk, gv = bitonic.sort_pairs_u32.__wrapped__(
        jnp.asarray(keys), jnp.asarray(vals), chunk=1 << 14, interpret=True,
        stable=True,
    )
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(gk), keys[order])
    np.testing.assert_array_equal(np.asarray(gv), vals[order])


@pytest.mark.slow
def test_transposed_layout_w64(rng, monkeypatch):
    """T layout through the 64-bit word carry at a chunk size that
    engages it (chunk >= 2^14): MODE_W3 (stable=False — the no-ride mode
    the round-3 default flip turned on unverified, ADVICE r3; since
    chip-verified, chip_queue.log r4_w3_default). Duplicate-heavy hi
    words force lo-word comparisons through the layout switches. MODE_W4
    under T is covered on chip (r4_w4_all) — its 4-array interpret run
    is too slow for CI."""
    monkeypatch.setattr(bitonic, "TRANSPOSE_OPT", True)
    monkeypatch.setattr(bitonic, "T_MODES", "all")
    n = 1 << 14
    full = rng.integers(0, 7, size=n, dtype=np.uint64) << 32
    full |= rng.integers(0, 2**32, size=n, dtype=np.uint64)
    hi = (full >> 32).astype(np.uint32)
    lo = (full & 0xFFFFFFFF).astype(np.uint32)
    vals = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    h, l, v = bitonic.sort_pairs_w64.__wrapped__(
        jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(vals),
        chunk=1 << 14, interpret=True, stable=False,
    )
    got = (np.asarray(h).astype(np.uint64) << 32) | np.asarray(l)
    order = np.lexsort((vals, full))
    np.testing.assert_array_equal(got, full[order])
    np.testing.assert_array_equal(np.asarray(v), vals[order])


def test_pairs_nonstable_max_keys_and_values():
    """Genuine 0xffffffff keys/values must survive sentinel padding."""
    n = (1 << 11) + 5
    rng = np.random.default_rng(9)
    keys = rng.integers(0, 4, size=n).astype(np.uint32) + 0xFFFFFFFC
    vals = rng.integers(0, 4, size=n).astype(np.uint32) + 0xFFFFFFFC
    k, v = bitonic.sort_pairs_u32(
        jnp.asarray(keys), jnp.asarray(vals), chunk=CHUNK, interpret=True,
        stable=False,
    )
    order = np.lexsort((vals, keys))
    np.testing.assert_array_equal(np.asarray(k), keys[order])
    np.testing.assert_array_equal(np.asarray(v), vals[order])


def test_big_n_stable_fallback_mode(rng, monkeypatch):
    """MODE_STABLE — the n > MAX_PACKED_N stable-KV fallback (plain
    (key, idx, value) carry) — forced at small n via the overridable
    threshold. Duplicates + genuine max keys stress the _stable_idx
    tie-break against the stable oracle (bench/cpu_benchmark.cc:33-49)."""
    monkeypatch.setattr(bitonic, "MAX_PACKED_N", 1 << 9)
    n = (1 << 10) + 57
    keys = rng.integers(0, 17, size=n).astype(np.uint32)
    keys[rng.random(n) < 0.1] = 0xFFFFFFFF
    vals = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    k, v = bitonic.sort_pairs_u32.__wrapped__(
        jnp.asarray(keys), jnp.asarray(vals), chunk=1 << 9, interpret=True
    )
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(k), keys[order])
    np.testing.assert_array_equal(np.asarray(v), vals[order])


def test_big_n_w4_fallback_mode(rng, monkeypatch):
    """MODE_W4_BIG — the n > MAX_PACKED_N stable 64-bit-KV fallback
    ((hi, lo, idx, value) carry) — forced at small n."""
    monkeypatch.setattr(bitonic, "MAX_PACKED_N", 1 << 9)
    n = (1 << 10) + 13
    full = rng.integers(0, 5, size=n, dtype=np.uint64) << 32
    full |= rng.integers(0, 3, size=n, dtype=np.uint64)
    vals = np.arange(n, dtype=np.uint32)
    hi = (full >> 32).astype(np.uint32)
    lo = (full & 0xFFFFFFFF).astype(np.uint32)
    h, l, v = bitonic.sort_pairs_w64.__wrapped__(
        jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(vals),
        chunk=1 << 9, interpret=True
    )
    order = np.argsort(full, kind="stable")
    got = (np.asarray(h).astype(np.uint64) << 32) | np.asarray(l)
    np.testing.assert_array_equal(got, full[order])
    np.testing.assert_array_equal(np.asarray(v), vals[order])


def test_merge_slots_keys(rng):
    """merge_slots_u32: 2^k sorted ragged runs in aligned slots (incl. an
    empty and a full slot) finish with merge rounds only."""
    n_slots, S = 8, 512
    sizes = rng.integers(0, S + 1, n_slots)
    sizes[2], sizes[5] = 0, S
    buf = np.full((n_slots, S), 0xFFFFFFFF, np.uint32)
    runs = []
    for s in range(n_slots):
        g = np.sort(
            rng.integers(0, 2**32, sizes[s], dtype=np.uint64).astype(np.uint32)
        )
        buf[s, : sizes[s]] = g
        runs.append(g)
    allk = np.concatenate(runs)
    got = np.asarray(
        bitonic.merge_slots_u32.__wrapped__(
            jnp.asarray(buf.reshape(-1)), slot=S, chunk=1 << 10,
            interpret=True,
        )
    )
    np.testing.assert_array_equal(got[: len(allk)], np.sort(allk))


def test_merge_slots_pairs_stable(rng):
    """Stable slot merge: heavy duplicates + genuine 0xFFFFFFFF keys; the
    tiebreak is (slot, intra-slot position) — the distributed resort's
    (source rank, intra-source order) stability contract."""
    n_slots, S = 4, 512
    sizes = np.array([400, 0, 512, 137])
    kbuf = np.full((n_slots, S), 0xFFFFFFFF, np.uint32)
    vbuf = np.zeros((n_slots, S), np.uint32)
    runs_k, runs_v, vc = [], [], 0
    for s in range(n_slots):
        g = rng.integers(0, 7, sizes[s]).astype(np.uint32) * 0x20000000
        g[g == 0xC0000000] = 0xFFFFFFFF  # genuine max keys
        g = np.sort(g)
        v = np.arange(vc, vc + sizes[s], dtype=np.uint32)
        vc += sizes[s]
        kbuf[s, : sizes[s]] = g
        vbuf[s, : sizes[s]] = v
        runs_k.append(g)
        runs_v.append(v)
    allk, allv = np.concatenate(runs_k), np.concatenate(runs_v)
    perm = np.argsort(allk, kind="stable")
    gk, gv = bitonic.merge_slots_pairs.__wrapped__(
        jnp.asarray(kbuf.reshape(-1)), jnp.asarray(vbuf.reshape(-1)),
        jnp.asarray(sizes.astype(np.int32)), slot=S, chunk=1 << 10,
        interpret=True,
    )
    m = len(allk)
    np.testing.assert_array_equal(np.asarray(gk)[:m], allk[perm])
    np.testing.assert_array_equal(np.asarray(gv)[:m], allv[perm])


def test_merge_slots_pairs_big_n_mode(rng, monkeypatch):
    """Above MAX_PACKED_N the slot merge switches to the plain-index
    MODE_STABLE carry; force it at small n via the threshold."""
    monkeypatch.setattr(bitonic, "MAX_PACKED_N", 1 << 9)
    n_slots, S = 4, 512  # n = 2048 > threshold
    sizes = np.array([512, 300, 17, 444])
    kbuf = np.full((n_slots, S), 0xFFFFFFFF, np.uint32)
    vbuf = np.zeros((n_slots, S), np.uint32)
    runs_k, runs_v, vc = [], [], 0
    for s in range(n_slots):
        g = np.sort(rng.integers(0, 5, sizes[s]).astype(np.uint32))
        v = np.arange(vc, vc + sizes[s], dtype=np.uint32)
        vc += sizes[s]
        kbuf[s, : sizes[s]] = g
        vbuf[s, : sizes[s]] = v
        runs_k.append(g)
        runs_v.append(v)
    allk, allv = np.concatenate(runs_k), np.concatenate(runs_v)
    perm = np.argsort(allk, kind="stable")
    gk, gv = bitonic.merge_slots_pairs.__wrapped__(
        jnp.asarray(kbuf.reshape(-1)), jnp.asarray(vbuf.reshape(-1)),
        jnp.asarray(sizes.astype(np.int32)), slot=S, chunk=1 << 9,
        interpret=True,
    )
    m = len(allk)
    np.testing.assert_array_equal(np.asarray(gk)[:m], allk[perm])
    np.testing.assert_array_equal(np.asarray(gv)[:m], allv[perm])


def test_merge_slots_keys_gated(rng):
    """Keys merge with `sizes` supplied: pure-fill blocks are SMEM-gated
    to a copy. Genuine 0xFFFFFFFF keys stress the count model's tie case
    (blocks past the modeled genuine range are then constant, so the copy
    is still value-identical)."""
    n_slots, S = 8, 512
    sizes = rng.integers(0, S + 1, n_slots)
    sizes[1], sizes[6] = 0, S
    buf = np.full((n_slots, S), 0xFFFFFFFF, np.uint32)
    runs = []
    for s in range(n_slots):
        g = rng.integers(0, 2**32, sizes[s], dtype=np.uint64).astype(
            np.uint32)
        g[rng.random(sizes[s]) < 0.2] = 0xFFFFFFFF  # genuine max keys
        g = np.sort(g)
        buf[s, : sizes[s]] = g
        runs.append(g)
    allk = np.concatenate(runs)
    got = np.asarray(
        bitonic.merge_slots_u32.__wrapped__(
            jnp.asarray(buf.reshape(-1)),
            jnp.asarray(sizes.astype(np.int32)),
            slot=S, chunk=1 << 10, interpret=True,
        )
    )
    np.testing.assert_array_equal(got[: len(allk)], np.sort(allk))


def test_merge_slots_dma_gated(rng, monkeypatch):
    """VRS_DMA_GATE path: the manual-DMA kernel (HBM refs + VMEM scratch +
    per-array semaphores) must match the auto-pipelined gated kernel
    bitwise on the slot merge, including slots that are pure fill."""
    monkeypatch.setattr(bitonic, "DMA_GATE", True)
    n_slots, S = 8, 512
    sizes = rng.integers(0, S + 1, n_slots)
    sizes[2], sizes[5] = 0, S
    kbuf = np.full((n_slots, S), 0xFFFFFFFF, np.uint32)
    vbuf = np.zeros((n_slots, S), np.uint32)
    vc = 0
    for s in range(n_slots):
        g = np.sort(rng.integers(0, 97, sizes[s]).astype(np.uint32))
        kbuf[s, : sizes[s]] = g
        vbuf[s, : sizes[s]] = np.arange(vc, vc + sizes[s], dtype=np.uint32)
        vc += sizes[s]
    allk = np.concatenate([kbuf[s, : sizes[s]] for s in range(n_slots)])
    allv = np.concatenate([vbuf[s, : sizes[s]] for s in range(n_slots)])
    perm = np.argsort(allk, kind="stable")
    gk, gv = bitonic.merge_slots_pairs.__wrapped__(
        jnp.asarray(kbuf.reshape(-1)), jnp.asarray(vbuf.reshape(-1)),
        jnp.asarray(sizes.astype(np.int32)), slot=S, chunk=1 << 10,
        interpret=True,
    )
    m = len(allk)
    np.testing.assert_array_equal(np.asarray(gk)[:m], allk[perm])
    np.testing.assert_array_equal(np.asarray(gv)[:m], allv[perm])
    got = np.asarray(
        bitonic.merge_slots_u32.__wrapped__(
            jnp.asarray(kbuf.reshape(-1)),
            jnp.asarray(sizes.astype(np.int32)),
            slot=S, chunk=1 << 10, interpret=True,
        )
    )
    np.testing.assert_array_equal(got[:m], np.sort(allk))


def test_merge_slots_prearranged(rng):
    """prearranged=True: odd slots arrive already DESCENDING in the slot
    suffix (sender-side reversal at the exchange) and the merge must skip
    its own reversal pass yet produce the identical stable result,
    including the (source rank, intra-source order) tiebreak and gated
    pure-fill slots."""
    n_slots, S = 8, 512
    sizes = rng.integers(0, S + 1, n_slots)
    sizes[2], sizes[5] = 0, S
    kbuf = np.full((n_slots, S), 0xFFFFFFFF, np.uint32)
    vbuf = np.zeros((n_slots, S), np.uint32)
    vnbuf = np.full((n_slots, S), 0xFFFFFFFF, np.uint32)  # nonstable fill
    runs_k, runs_v, vc = [], [], 0
    for s in range(n_slots):
        g = np.sort(rng.integers(0, 97, sizes[s]).astype(np.uint32))
        v = np.arange(vc, vc + sizes[s], dtype=np.uint32)
        vc += int(sizes[s])
        if s % 2 == 1:  # odd slot: reversed run in the suffix
            kbuf[s, S - sizes[s]:] = g[::-1]
            vbuf[s, S - sizes[s]:] = v[::-1]
            vnbuf[s, S - sizes[s]:] = v[::-1]
        else:
            kbuf[s, : sizes[s]] = g
            vbuf[s, : sizes[s]] = v
            vnbuf[s, : sizes[s]] = v
        runs_k.append(g)
        runs_v.append(v)
    allk, allv = np.concatenate(runs_k), np.concatenate(runs_v)
    perm = np.argsort(allk, kind="stable")
    m = len(allk)
    sj = jnp.asarray(sizes.astype(np.int32))

    got = np.asarray(bitonic.merge_slots_u32.__wrapped__(
        jnp.asarray(kbuf.reshape(-1)), sj, slot=S, chunk=1 << 10,
        interpret=True, prearranged=True,
    ))
    np.testing.assert_array_equal(got[:m], np.sort(allk))

    gk, gv = bitonic.merge_slots_pairs.__wrapped__(
        jnp.asarray(kbuf.reshape(-1)), jnp.asarray(vbuf.reshape(-1)), sj,
        slot=S, chunk=1 << 10, interpret=True, prearranged=True,
    )
    np.testing.assert_array_equal(np.asarray(gk)[:m], allk[perm])
    np.testing.assert_array_equal(np.asarray(gv)[:m], allv[perm])

    gk, gv = bitonic.merge_slots_pairs.__wrapped__(
        jnp.asarray(kbuf.reshape(-1)), jnp.asarray(vnbuf.reshape(-1)), sj,
        slot=S, chunk=1 << 10, interpret=True, prearranged=True,
        stable=False,
    )
    # nonstable contract: output multiset of pairs matches; keys sorted
    np.testing.assert_array_equal(np.asarray(gk)[:m], allk[perm])
    got_pairs = np.stack([np.asarray(gk)[:m], np.asarray(gv)[:m]], axis=1)
    want_pairs = np.stack([allk, allv], axis=1)
    np.testing.assert_array_equal(
        got_pairs[np.lexsort(got_pairs.T[::-1])],
        want_pairs[np.lexsort(want_pairs.T[::-1])],
    )


@pytest.mark.parametrize(
    "n", [8193, 8193 + 511, 12289, 16383 - 1024 + 7]
)
def test_unfused_trailing_skip_escape(rng, monkeypatch, n):
    """Regression for the round-3 chip failure at np2=2^26 (bign_stable
    exit=1): in UNFUSED merge rounds, a descending group containing the
    genuine-data boundary moves genuine elements into its trailing blocks,
    which the per-block prefix clip then skipped in the local pass. Small
    shapes normally run fully fused (whole-group kernels, no escape), so
    fusion is disabled here to pin the unfused path in CI. The shapes put
    the boundary just past np2/2 where escape groups are descending."""
    monkeypatch.setattr(bitonic, "MAX_FUSED_ROWS", 1)  # no fused rounds
    chunk = 1 << 10
    keys = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    got = np.asarray(bitonic.sort_u32.__wrapped__(
        jnp.asarray(keys), chunk=chunk, interpret=True))
    np.testing.assert_array_equal(got, np.sort(keys))


def test_unfused_trailing_skip_escape_pairs(rng, monkeypatch):
    """Same escape regression through the stable-KV carry (the mode the
    chip failure was first observed in) and the count= gate."""
    monkeypatch.setattr(bitonic, "MAX_FUSED_ROWS", 1)
    chunk = 1 << 10
    n = 8193 + 300
    keys = (rng.integers(0, 2**32, size=n, dtype=np.uint64) % 1021).astype(
        np.uint32)
    vals = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    k, v = bitonic.sort_pairs_u32.__wrapped__(
        jnp.asarray(keys), jnp.asarray(vals), chunk=chunk, interpret=True
    )
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(k), keys[order])
    np.testing.assert_array_equal(np.asarray(v), vals[order])


def test_unfused_trailing_skip_escape_count(rng, monkeypatch):
    """count= (indirect) variant: the per-block prefix-valid gate had the
    same per-block granularity hole; the boundary group at count ~10.5
    blocks is descending at round 1."""
    monkeypatch.setattr(bitonic, "MAX_FUSED_ROWS", 1)
    chunk = 1 << 10
    n = 1 << 14
    count = 10 * chunk + 549
    keys = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    masked = keys.copy()
    masked[count:] = 0xFFFFFFFF
    got = np.asarray(bitonic.sort_u32.__wrapped__(
        jnp.asarray(masked), jnp.uint32(count), chunk=chunk, interpret=True))
    np.testing.assert_array_equal(got[:count], np.sort(keys[:count]))


@pytest.mark.parametrize("n,chunk", [(600, 256), (768, 256), (1543, 256)])
def test_trailing_skip_desc_group_shapes(rng, n, chunk):
    """Adversarial shapes for the trailing-sentinel block skip: the
    genuine region ends where a DESCENDING merge group pairs
    partial-genuine blocks with skipped all-sentinel blocks (genuine data
    transits the skipped region mid-network and must still come back
    sorted). Chip-verified at ragged 2^21; these pin the windows in CI."""
    keys = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    got = np.asarray(
        bitonic.sort_u32(jnp.asarray(keys), chunk=chunk, interpret=True)
    )
    np.testing.assert_array_equal(got, np.sort(keys))
