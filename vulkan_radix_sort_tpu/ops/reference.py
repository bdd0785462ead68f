"""XLA reference backend: stable sorts expressed with `jax.lax.sort`.

This is the framework's on-device oracle and fallback backend. It plays the
same role the CPU backend plays in the reference benchmark harness
(reference: bench/cpu_benchmark.cc — `std::sort` for keys,
`std::stable_sort` of an index array for key-value): the numeric contract for
every other backend is exact element-wise equality with these functions
(reference: bench/bench.cc:41-64).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def sort_keys(keys: jax.Array) -> jax.Array:
    """Ascending sort of 32-bit keys. Output unique => stability irrelevant."""
    return jnp.sort(keys)


def sort_pairs(keys: jax.Array, values: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Stable ascending key-value sort.

    Matches the reference CPU oracle: `std::stable_sort` of indices by key,
    then gather of values (bench/cpu_benchmark.cc:33-49). Keys and values are
    kept as two separate 32-bit buffers, the reference library's signature
    design choice (README.md:60).
    """
    k, v = lax.sort((keys, values), num_keys=1, is_stable=True)
    return k, v


def sort_keys_count(keys: jax.Array, count: jax.Array) -> jax.Array:
    """Sort only the first `count` keys; the tail stays untouched.

    TPU-native analog of the reference's *indirect* path
    (vrdxCmdSortIndirect, h.in:321-331) where the element count lives in GPU
    memory: `count` is a traced scalar, shapes stay static, out-of-range
    keys are replaced by the sentinel 0xffffffff (upsweep.slang:32) and the
    tail is restored afterwards (masked writes, downsweep.slang:199).
    """
    n = keys.shape[0]
    idx = jnp.arange(n, dtype=jnp.uint32)
    in_range = idx < count
    masked = jnp.where(in_range, keys, jnp.uint32(0xFFFFFFFF))
    # Tag with the original index so genuine 0xffffffff keys inside the range
    # stay in front of the sentinels (stable order among equals).
    k, _ = lax.sort((masked, idx), num_keys=2, is_stable=False)
    return jnp.where(in_range, k, keys)


def sort_pairs_count(
    keys: jax.Array, values: jax.Array, count: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Stable key-value sort of the first `count` pairs; tails untouched."""
    n = keys.shape[0]
    idx = jnp.arange(n, dtype=jnp.uint32)
    in_range = idx < count
    masked = jnp.where(in_range, keys, jnp.uint32(0xFFFFFFFF))
    k, _, v = lax.sort((masked, idx, values), num_keys=2, is_stable=False)
    return jnp.where(in_range, k, keys), jnp.where(in_range, v, values)
