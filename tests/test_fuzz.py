"""Property/fuzz tests: random sizes, chunks, and distributions against the
NumPy oracle (the reference's correctness contract, bench/bench.cc:41-64,
broadened per SURVEY.md §4 to adversarial shapes)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vulkan_radix_sort_tpu.ops import bitonic
from vulkan_radix_sort_tpu.utils import datagen


def test_fuzz_small(rng):
    """Fast-gate fuzz: random small shapes/distributions, keys + stable
    pairs (both arrays asserted) against the NumPy oracle."""
    dists = list(datagen.DISTRIBUTIONS)
    for trial in range(2):
        n = int(rng.integers(1, 1 << 9))
        chunk = 1 << int(rng.integers(8, 10))
        dist = dists[trial % len(dists)]
        keys = datagen.generate_keys(n, seed=50 + trial, distribution=dist)
        got = np.asarray(
            bitonic.sort_u32(jnp.asarray(keys), chunk=chunk, interpret=True)
        )
        np.testing.assert_array_equal(got, np.sort(keys))
        vals = datagen.generate_keys(n, seed=60 + trial)
        gk, gv = bitonic.sort_pairs_u32(
            jnp.asarray(keys), jnp.asarray(vals), chunk=chunk, interpret=True
        )
        order = np.argsort(keys, kind="stable")
        np.testing.assert_array_equal(np.asarray(gk), keys[order])
        np.testing.assert_array_equal(np.asarray(gv), vals[order])


@pytest.mark.slow
def test_fuzz_keys_and_pairs(rng):
    dists = list(datagen.DISTRIBUTIONS)
    for trial in range(8):
        n = int(rng.integers(1, 1 << 14))
        chunk = 1 << int(rng.integers(8, 12))
        dist = dists[trial % len(dists)]
        keys = datagen.generate_keys(n, seed=trial, distribution=dist)
        got = np.asarray(
            bitonic.sort_u32(jnp.asarray(keys), chunk=chunk, interpret=True)
        )
        np.testing.assert_array_equal(
            got, np.sort(keys), err_msg=f"keys n={n} chunk={chunk} {dist}"
        )
        vals = np.arange(n, dtype=np.uint32)
        gk, gv = bitonic.sort_pairs_u32(
            jnp.asarray(keys), jnp.asarray(vals), chunk=chunk, interpret=True
        )
        order = np.argsort(keys, kind="stable")
        np.testing.assert_array_equal(
            np.asarray(gk), keys[order], err_msg=f"kv keys n={n} chunk={chunk} {dist}"
        )
        np.testing.assert_array_equal(
            np.asarray(gv), vals[order], err_msg=f"kv n={n} chunk={chunk} {dist}"
        )


def test_fuzz_reduced_bit_range(rng):
    """Reduced key ranges (the reference generator's `bits` param,
    data_generator.cc:12-15) stress duplicate-heavy stability. One shape
    for all bit widths so the interpret tracing cost is paid once."""
    for bits in (1, 12):
        n = 1800
        keys = datagen.generate_keys(n, seed=bits, bits=bits)
        vals = np.arange(n, dtype=np.uint32)
        gk, gv = bitonic.sort_pairs_u32(
            jnp.asarray(keys), jnp.asarray(vals), chunk=1 << 10, interpret=True
        )
        order = np.argsort(keys, kind="stable")
        np.testing.assert_array_equal(np.asarray(gk), keys[order])
        np.testing.assert_array_equal(np.asarray(gv), vals[order])


@pytest.mark.slow
def test_fuzz_nonstable_pairs(rng):
    """stable=False: (key, value)-lexicographic order on random shapes,
    including duplicate-heavy reduced bit ranges."""
    dists = list(datagen.DISTRIBUTIONS)
    for trial in range(6):
        n = int(rng.integers(1, 1 << 13))
        chunk = 1 << int(rng.integers(8, 12))
        dist = dists[trial % len(dists)]
        keys = datagen.generate_keys(n, seed=100 + trial, distribution=dist)
        vals = datagen.generate_keys(n, seed=200 + trial)
        gk, gv = bitonic.sort_pairs_u32(
            jnp.asarray(keys), jnp.asarray(vals), chunk=chunk,
            interpret=True, stable=False,
        )
        order = np.lexsort((vals, keys))
        np.testing.assert_array_equal(
            np.asarray(gk), keys[order],
            err_msg=f"kvns keys n={n} chunk={chunk} {dist}",
        )
        np.testing.assert_array_equal(
            np.asarray(gv), vals[order],
            err_msg=f"kvns vals n={n} chunk={chunk} {dist}",
        )
