"""Unit tests for the Pallas kernels (interpret mode), against NumPy oracles.

Mirrors + extends the reference's oracle-diff strategy (bench/bench.cc:41-64):
exact element-wise equality, plus per-kernel invariants the reference never
unit-tested (SURVEY.md §4 calls this out as a gap to do better on).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vulkan_radix_sort_tpu.config import SortConfig
from vulkan_radix_sort_tpu.ops.block_sort import block_sort
from vulkan_radix_sort_tpu.ops.stream_place import stream_place
from vulkan_radix_sort_tpu.ops.radix import _pad2d, _spine

CFG = SortConfig(block=1024, flush_rows=4, interpret=True)
B = CFG.block


def _keys(rng, n, lo=0, hi=2**32):
    return rng.integers(lo, hi, size=n, dtype=np.uint64).astype(np.uint32)


@pytest.mark.parametrize("shift", [0, 4, 28])
def test_block_sort_matches_stable_digit_sort(rng, shift):
    n = B * 8
    keys = _keys(rng, n)
    y, hist = block_sort(
        _pad2d(jnp.asarray(keys), n, 0xFFFFFFFF),
        shift=shift, config=CFG, interpret=True,
    )
    y = np.asarray(y).reshape(-1)
    hist = np.asarray(hist)
    kb = keys.reshape(-1, B)
    d = (kb >> shift) & 15
    for b in range(n // B):
        order = np.argsort(d[b], kind="stable")
        np.testing.assert_array_equal(y[b * B : (b + 1) * B], kb[b][order])
        np.testing.assert_array_equal(
            hist[b, :16], np.bincount(d[b], minlength=16)
        )


def test_block_sort_key_value_permutes_values_alongside(rng):
    n = B * 8
    keys = _keys(rng, n)
    vals = np.arange(n, dtype=np.uint32)
    y, yv, hist = block_sort(
        _pad2d(jnp.asarray(keys), n, 0xFFFFFFFF),
        _pad2d(jnp.asarray(vals), n, 0),
        shift=0, config=CFG, key_value=True, interpret=True,
    )
    y, yv = np.asarray(y).reshape(-1), np.asarray(yv).reshape(-1)
    kb, vb = keys.reshape(-1, B), vals.reshape(-1, B)
    for b in range(n // B):
        order = np.argsort(kb[b] & 15, kind="stable")
        np.testing.assert_array_equal(y[b * B : (b + 1) * B], kb[b][order])
        np.testing.assert_array_equal(yv[b * B : (b + 1) * B], vb[b][order])


@pytest.mark.parametrize("dist_hi", [2**32, 16, 2])
def test_stream_place_roundtrip(rng, dist_hi):
    """One full pass (block_sort + spine + stream_place) == stable digit sort,
    including degenerate digit distributions (skew)."""
    n = B * 8
    keys = _keys(rng, n, hi=dist_hi)
    x = _pad2d(jnp.asarray(keys), n, 0xFFFFFFFF)
    y, hist = block_sort(x, shift=0, config=CFG, interpret=True)
    g = _spine(hist, CFG.radix)
    out = np.asarray(
        stream_place(y, hist, g, config=CFG, interpret=True)
    ).reshape(-1)
    expect = keys[np.argsort(keys & 15, kind="stable")]
    np.testing.assert_array_equal(out, expect)


def test_spine_exclusive_offsets(rng):
    hist = rng.integers(0, 100, size=(7, 128)).astype(np.int32)
    hist[:, 16:] = 0
    g = np.asarray(_spine(jnp.asarray(hist), 16))[0]
    tot = hist.sum(0)
    np.testing.assert_array_equal(g[:16], np.cumsum(tot)[:16] - tot[:16])
