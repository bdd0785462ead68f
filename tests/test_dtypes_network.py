"""Key-dtype families through the network backend (interpret mode).

The reference sorts uint32 only (include/vk_radix_sort.h:52-81); the
framework widens to int32/float32 via order-preserving encodings
(ops/bitops.py). These tests pin the encoding + network composition.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import vulkan_radix_sort_tpu as vrs
from vulkan_radix_sort_tpu.config import SortConfig

CFG = SortConfig(backend="network", chunk=1 << 10, interpret=True)


def test_float32_key_value_network():
    """KV with float32 keys rides the order-preserving encoding through
    the packed-lazy stable carry (negative/positive/inf boundaries)."""
    import vulkan_radix_sort_tpu as vrs

    n = 1500
    rng = np.random.default_rng(31)
    keys = rng.standard_normal(n).astype(np.float32)
    # no -0.0 here: the total-order encoding ranks -0.0 < 0.0 strictly,
    # while NumPy's stable argsort treats them as equal — a documented
    # semantic difference, not a bug to assert against
    keys[:5] = [0.0, np.inf, -np.inf, 1.5, -1.5]
    keys[rng.random(n) < 0.2] = 2.25  # duplicates exercise stability
    vals = np.arange(n, dtype=np.uint32)
    s = vrs.create_sorter(n, key_dtype=np.float32, config=CFG)
    gk, gv = s.sort_key_value(jnp.asarray(keys), jnp.asarray(vals))
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(gk), keys[order])
    np.testing.assert_array_equal(np.asarray(gv), vals[order])


def test_int32_keys(rng):
    n = 2000
    keys = rng.integers(-(2**31), 2**31, size=n).astype(np.int32)
    s = vrs.Sorter(n, key_dtype=np.int32, config=CFG)
    got = np.asarray(s.sort(jnp.asarray(keys)))
    np.testing.assert_array_equal(got, np.sort(keys))


def test_float32_keys_special_values(rng):
    n = 1600
    keys = rng.standard_normal(n).astype(np.float32)
    keys[:8] = [0.0, -0.0, np.inf, -np.inf, 1e-38, -1e-38, 3.4e38, -3.4e38]
    s = vrs.Sorter(n, key_dtype=np.float32, config=CFG)
    got = np.asarray(s.sort(jnp.asarray(keys)))
    np.testing.assert_array_equal(got, np.sort(keys))


def test_uint32_kv_stable_network(rng):
    n = 1500
    keys = (rng.integers(0, 2**32, size=n, dtype=np.uint64) % 5).astype(np.uint32)
    vals = np.arange(n, dtype=np.uint32)
    s = vrs.Sorter(n, config=CFG)
    k, v = s.sort_key_value(jnp.asarray(keys), jnp.asarray(vals))
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(k), keys[order])
    np.testing.assert_array_equal(np.asarray(v), vals[order])


def test_indirect_count_network(rng):
    n, m = 2048, 700
    keys = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    s = vrs.Sorter(n, config=CFG)
    got = np.asarray(s.sort(jnp.asarray(keys), count=m))
    np.testing.assert_array_equal(got[:m], np.sort(keys[:m]))
    np.testing.assert_array_equal(got[m:], keys[m:])


def test_indirect_count_network_sentinel_keys(rng):
    """count= on the network path with genuine 0xffffffff keys in both the
    prefix and the tail: the masked keys-only design makes real max keys
    bitwise interchangeable with the padding sentinels, which is only
    sound if exactly n-count sentinels land past position count-1."""
    n, m = 2048, 700
    keys = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    keys[rng.random(n) < 0.15] = 0xFFFFFFFF
    s = vrs.Sorter(n, config=CFG)
    got = np.asarray(s.sort(jnp.asarray(keys), count=m))
    np.testing.assert_array_equal(got[:m], np.sort(keys[:m]))
    np.testing.assert_array_equal(got[m:], keys[m:])


@pytest.mark.parametrize("backend", ["network", "xla"])
def test_one_shot_api(rng, backend):
    n = 2048
    cfg = SortConfig(backend=backend, chunk=1 << 11, interpret=True)
    keys = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    got = np.asarray(vrs.sort(jnp.asarray(keys), config=cfg))
    np.testing.assert_array_equal(got, np.sort(keys))


def test_float32_keys_nonstable_pairs():
    """stable=False through the Sorter with float32 keys (bit-encoded)."""
    import numpy as np
    import jax.numpy as jnp
    import pytest

    import vulkan_radix_sort_tpu as vrs

    n = (1 << 11) + 11
    rng = np.random.default_rng(21)
    keys = rng.standard_normal(n).astype(np.float32)
    keys[:16] = np.float32(1.5)  # forced ties
    vals = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    s = vrs.create_sorter(
        max_n=n, key_dtype=jnp.float32, backend="network", interpret=True
    )
    k, v = s.sort_key_value(jnp.asarray(keys), jnp.asarray(vals), stable=False)
    kn, vn = np.asarray(k), np.asarray(v)
    assert np.array_equal(kn, np.sort(keys))
    # per-key value multisets preserved; ties value-ascending
    order = np.argsort(keys, kind="stable")
    ks = keys[order]
    start = 0
    for i in range(1, n + 1):
        if i == n or ks[i] != ks[start]:
            got = np.sort(vn[start:i])
            want = np.sort(vals[order][start:i])
            assert np.array_equal(got, want)
            assert np.array_equal(vn[start:i], np.sort(vn[start:i]))
            start = i


def test_indirect_count_gating_small_prefix(rng):
    """The count gate (indirect early-exit analog, upsweep.slang:20-22)
    with a SMALL live prefix: most grid steps are gated to copies and the
    output must still match the masked-sort contract bitwise."""
    n = 4096
    keys = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    s = vrs.Sorter(n, config=CFG)
    for m in (0, 1, 129, 1025):
        got = np.asarray(s.sort(jnp.asarray(keys), count=m))
        np.testing.assert_array_equal(got[:m], np.sort(keys[:m]))
        np.testing.assert_array_equal(got[m:], keys[m:])


def test_indirect_kv_count_gating(rng):
    """Stable KV count gate: masked entries take the sentinel tiebreak
    (constant blocks, skippable); genuine prefix stability must hold and
    both tails are restored."""
    n = 2048
    keys = (rng.integers(0, 2**32, size=n, dtype=np.uint64) % 9).astype(
        np.uint32)
    vals = np.arange(n, dtype=np.uint32)
    s = vrs.Sorter(n, config=CFG)
    m = 900
    k, v = s.sort_key_value(jnp.asarray(keys), jnp.asarray(vals), count=m)
    order = np.argsort(keys[:m], kind="stable")
    np.testing.assert_array_equal(np.asarray(k)[:m], keys[:m][order])
    np.testing.assert_array_equal(np.asarray(v)[:m], vals[:m][order])
    np.testing.assert_array_equal(np.asarray(k)[m:], keys[m:])
    np.testing.assert_array_equal(np.asarray(v)[m:], vals[m:])
