"""Adaptive fast-path tests (SortConfig.adaptive).

The opt-in detection pass must (a) return bitwise-correct output on the
degenerate BASELINE configs it accelerates (pre-sorted, reverse-sorted,
constant) and (b) leave every other input on the normal engine path with
identical results. Reference contract being matched: exact equality with
the CPU oracle (bench/bench.cc:41-64); stability on key-value
(cpu_benchmark.cc:33-49).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vulkan_radix_sort_tpu.config import SortConfig
from vulkan_radix_sort_tpu.models.sorter import Sorter
from vulkan_radix_sort_tpu.utils.datagen import generate_keys, generate_values

N = 4096
CFG = SortConfig(backend="network", interpret=True, adaptive=True)


@pytest.mark.parametrize(
    "dist", ["sorted", "reverse", "constant", "uniform", "few"]
)
def test_adaptive_keys(dist):
    keys = generate_keys(N, seed=3, distribution=dist)
    out = np.asarray(Sorter(N, config=CFG).sort(jnp.asarray(keys)))
    assert np.array_equal(out, np.sort(keys)), dist


@pytest.mark.parametrize("dist", ["sorted", "uniform", "few"])
def test_adaptive_kv_stable(dist):
    keys = generate_keys(N, seed=4, distribution=dist)
    if dist == "sorted":
        # force duplicate keys so the identity path's stability is load-
        # bearing, not vacuous
        keys = np.sort(keys >> np.uint32(20))
    vals = generate_values(N, seed=5)
    gk, gv = Sorter(N, config=CFG).sort_key_value(
        jnp.asarray(keys), jnp.asarray(vals)
    )
    order = np.argsort(keys, kind="stable")
    assert np.array_equal(np.asarray(gk), keys[order]), dist
    assert np.array_equal(np.asarray(gv), vals[order]), dist


def test_adaptive_kv_reverse_not_flipped():
    # reverse-sorted keys with duplicates: the pairs path must NOT take a
    # flip shortcut (it would reverse equal-key ties) — output must still
    # be the exact stable answer via the engine
    keys = np.sort(generate_keys(N, seed=6) >> np.uint32(20))[::-1].copy()
    vals = generate_values(N, seed=7)
    gk, gv = Sorter(N, config=CFG).sort_key_value(
        jnp.asarray(keys), jnp.asarray(vals)
    )
    order = np.argsort(keys, kind="stable")
    assert np.array_equal(np.asarray(gk), keys[order])
    assert np.array_equal(np.asarray(gv), vals[order])


@pytest.mark.parametrize("dist", ["sorted", "reverse", "uniform"])
def test_adaptive_keys_u64(dist):
    with jax.enable_x64(True):
        lo = generate_keys(N, seed=8, distribution=dist).astype(np.uint64)
        hi = generate_keys(N, seed=9, distribution=dist).astype(np.uint64)
        keys = (hi << np.uint64(32)) | lo
        if dist == "sorted":
            keys = np.sort(keys)
        elif dist == "reverse":
            keys = np.sort(keys)[::-1].copy()
        out = np.asarray(
            Sorter(N, key_dtype=jnp.uint64, config=CFG).sort(
                jnp.asarray(keys)
            )
        )
        assert np.array_equal(out, np.sort(keys)), dist


def test_adaptive_float_sorted():
    # order-preserving encode: non-decreasing floats (incl. negatives) must
    # be detected as sorted in encoded space
    f = np.sort(
        np.float32(
            np.random.default_rng(0).standard_normal(N).astype(np.float32)
        )
    )
    out = np.asarray(
        Sorter(N, key_dtype=jnp.float32, config=CFG).sort(jnp.asarray(f))
    )
    assert np.array_equal(out, np.sort(f))


def test_adaptive_off_unchanged():
    # adaptive=False must be byte-identical to the engine on a sorted input
    keys = np.sort(generate_keys(N, seed=10))
    cfg = SortConfig(backend="network", interpret=True, adaptive=False)
    out = np.asarray(Sorter(N, config=cfg).sort(jnp.asarray(keys)))
    assert np.array_equal(out, keys)
