"""64-bit key sorting (extension beyond the reference's uint32-only API):
uint64/int64/float64 keys sorted as (hi, lo) uint32 word pairs through the
non-stable 2-array network path."""

import numpy as np
import pytest

import jax


@pytest.fixture(autouse=True)
def x64():
    with jax.enable_x64():
        yield


def _sorter(n, dtype):
    import jax.numpy as jnp

    import vulkan_radix_sort_tpu as vrs

    return vrs.create_sorter(
        max_n=n, key_dtype=dtype, backend="network", interpret=True
    )


@pytest.mark.parametrize(
    "n", [(1 << 10) + 7, pytest.param((1 << 12) + 7, marks=pytest.mark.slow)]
)
def test_u64_keys(n):
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    # full 64-bit range incl. duplicates in the hi word and max values
    keys = rng.integers(0, 2**64, size=n, dtype=np.uint64)
    keys[: n // 8] = (keys[: n // 8] & np.uint64(0xFFFFFFFF)) | np.uint64(
        0xDEADBEEF00000000
    )  # forced hi-word ties
    keys[0] = np.uint64(0xFFFFFFFFFFFFFFFF)
    s = _sorter(n, jnp.uint64)
    got = np.asarray(s.sort(jnp.asarray(keys)))
    np.testing.assert_array_equal(got, np.sort(keys))


def test_i64_keys():
    import jax.numpy as jnp

    n = 1201
    rng = np.random.default_rng(2)
    keys = rng.integers(-(2**63), 2**63, size=n, dtype=np.int64)
    keys[:3] = [np.iinfo(np.int64).min, -1, np.iinfo(np.int64).max]
    s = _sorter(n, jnp.int64)
    got = np.asarray(s.sort(jnp.asarray(keys)))
    np.testing.assert_array_equal(got, np.sort(keys))


def test_f64_keys():
    import jax.numpy as jnp

    if jax.devices()[0].platform == "tpu":
        pytest.skip("float64 keys unsupported on TPU (no f64 bitcast)")

    n = 1100
    rng = np.random.default_rng(3)
    keys = rng.standard_normal(n) * 1e300
    keys[:4] = [0.0, -0.0, np.inf, -np.inf]
    s = _sorter(n, jnp.float64)
    got = np.asarray(s.sort(jnp.asarray(keys)))
    np.testing.assert_array_equal(np.sort(keys), got)


def test_u64_count_path():
    import jax.numpy as jnp

    n, m = 1024, 500
    rng = np.random.default_rng(4)
    keys = rng.integers(0, 2**64, size=n, dtype=np.uint64)
    s = _sorter(n, jnp.uint64)
    got = np.asarray(s.sort(jnp.asarray(keys), count=m))
    np.testing.assert_array_equal(got[:m], np.sort(keys[:m]))
    np.testing.assert_array_equal(got[m:], keys[m:])  # tail untouched


def test_u64_requires_x64():
    import jax.numpy as jnp

    import vulkan_radix_sort_tpu as vrs

    # outside the enable_x64 context the constructor must refuse
    with jax.enable_x64(False):
        with pytest.raises(ValueError, match="x64"):
            vrs.create_sorter(max_n=64, key_dtype=jnp.uint64)


def test_wide_guards():
    """Call-time x64 re-check and radix-backend rejection."""
    import jax.numpy as jnp

    import vulkan_radix_sort_tpu as vrs

    n = 128
    keys = np.arange(n, dtype=np.uint64)
    s = _sorter(n, jnp.uint64)
    with jax.enable_x64(False):
        with pytest.raises(ValueError, match="x64"):
            s.sort(keys)
    with pytest.raises(NotImplementedError, match="radix"):
        vrs.create_sorter(max_n=n, key_dtype=jnp.uint64, backend="radix")
    assert s.storage_requirements() > 8 * n  # wide estimator counts words


def test_u64_key_value_stable():
    """64-bit key-value: stable order vs the NumPy stable-argsort oracle,
    with forced hi-word ties and duplicate full keys."""
    import jax.numpy as jnp

    n = 900
    rng = np.random.default_rng(5)
    keys = rng.integers(0, 2**64, size=n, dtype=np.uint64)
    keys[rng.random(n) < 0.4] = np.uint64(0xDEADBEEF00001234)
    vals = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    s = _sorter(n, jnp.uint64)
    gk, gv = s.sort_key_value(jnp.asarray(keys), jnp.asarray(vals))
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(gk), keys[order])
    np.testing.assert_array_equal(np.asarray(gv), vals[order])


def test_u64_key_value_nonstable():
    """stable=False: (key, value)-lexicographic, deterministic."""
    import jax.numpy as jnp

    n = 800
    rng = np.random.default_rng(6)
    keys = rng.integers(0, 4, size=n, dtype=np.uint64) + np.uint64(
        0xFFFFFFFFFFFFFFFC
    )  # max-range keys stress the sentinel contract
    vals = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    s = _sorter(n, jnp.uint64)
    gk, gv = s.sort_key_value(jnp.asarray(keys), jnp.asarray(vals), stable=False)
    order = np.lexsort((vals, keys))
    np.testing.assert_array_equal(np.asarray(gk), keys[order])
    np.testing.assert_array_equal(np.asarray(gv), vals[order])


@pytest.mark.parametrize(
    "stable", [True, pytest.param(False, marks=pytest.mark.slow)]
)
def test_u64_kv_count_path(stable):
    """Indirect (count=) 64-bit key-value: prefix sorted, tail untouched."""
    import jax.numpy as jnp

    n, m = 512, 300
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 2**64, size=n, dtype=np.uint64)
    keys[rng.random(n) < 0.3] = np.uint64(0xFFFFFFFFFFFFFFFF)
    vals = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    s = _sorter(n, jnp.uint64)
    gk, gv = s.sort_key_value(
        jnp.asarray(keys), jnp.asarray(vals), count=m, stable=stable
    )
    if stable:
        order = np.argsort(keys[:m], kind="stable")
    else:
        order = np.lexsort((vals[:m], keys[:m]))
    np.testing.assert_array_equal(np.asarray(gk)[:m], keys[:m][order])
    np.testing.assert_array_equal(np.asarray(gv)[:m], vals[:m][order])
    np.testing.assert_array_equal(np.asarray(gk)[m:], keys[m:])
    np.testing.assert_array_equal(np.asarray(gv)[m:], vals[m:])


def test_i64_key_value():
    """Signed 64-bit keys carry values through the encode/decode."""
    import jax.numpy as jnp

    n = 800
    rng = np.random.default_rng(8)
    keys = rng.integers(-(2**63), 2**63, size=n, dtype=np.int64)
    keys[: n // 4] = -7  # duplicates across the sign boundary
    vals = np.arange(n, dtype=np.uint32)
    s = _sorter(n, jnp.int64)
    gk, gv = s.sort_key_value(jnp.asarray(keys), jnp.asarray(vals))
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(gk), keys[order])
    np.testing.assert_array_equal(np.asarray(gv), vals[order])
