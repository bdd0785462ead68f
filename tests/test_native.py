"""Native C++ engine tests (oracle parity with NumPy)."""

import numpy as np
import pytest

from vulkan_radix_sort_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain"
)


def test_sort_keys(rng):
    for n in (0, 1, 2, 1000, 1 << 16):
        k = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
        np.testing.assert_array_equal(native.sort_u32(k), np.sort(k))


def test_sort_pairs_stable(rng):
    n = 50000
    k = (rng.integers(0, 2**32, size=n, dtype=np.uint64) % 31).astype(np.uint32)
    v = np.arange(n, dtype=np.uint32)
    sk, sv = native.sort_pairs_u32(k, v)
    order = np.argsort(k, kind="stable")
    np.testing.assert_array_equal(sk, k[order])
    np.testing.assert_array_equal(sv, v[order])


def test_skewed_and_constant(rng):
    n = 10000
    for k in (
        np.zeros(n, np.uint32),
        np.full(n, 0xFFFFFFFF, np.uint32),
        np.sort(rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32))[::-1].copy(),
    ):
        np.testing.assert_array_equal(native.sort_u32(k), np.sort(k))


def test_generator_deterministic():
    a = native.generate_uniform(1000, seed=7)
    b = native.generate_uniform(1000, seed=7)
    np.testing.assert_array_equal(a, b)
    c = native.generate_uniform(1000, seed=8)
    assert not np.array_equal(a, c)
    d = native.generate_uniform(1000, seed=7, bits=8)
    assert d.max() < 256


def test_is_sorted(rng):
    k = rng.integers(0, 2**32, size=1000, dtype=np.uint64).astype(np.uint32)
    assert native.is_sorted_u32(np.sort(k))
    assert not native.is_sorted_u32(k) or native.is_sorted_u32(k) == bool(
        np.all(np.diff(k.astype(np.int64)) >= 0)
    )


def test_tile_parallel_path(rng, monkeypatch):
    """The tile-parallel LSD path (T>1), forced via VRS_NATIVE_THREADS so
    single-core CI boxes execute it: per-tile bases in (digit, tile) order
    must keep the scatter stable."""
    monkeypatch.setenv("VRS_NATIVE_THREADS", "4")
    n = (1 << 20) + 7  # above kParallelMinN
    k = (rng.integers(0, 2**32, size=n, dtype=np.uint64) % 97).astype(
        np.uint32
    )
    v = np.arange(n, dtype=np.uint32)
    sk, sv = native.sort_pairs_u32(k, v)
    order = np.argsort(k, kind="stable")
    np.testing.assert_array_equal(sk, k[order])
    np.testing.assert_array_equal(sv, v[order])
    ks = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    np.testing.assert_array_equal(native.sort_u32(ks), np.sort(ks))
