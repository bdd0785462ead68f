"""Order-preserving bijections from other key dtypes onto uint32.

The reference sorts uint32 only (include/vk_radix_sort.h:52-81). We widen the
family of supported key dtypes the idiomatic radix-sort way: map each dtype
monotonically onto uint32, sort, map back. All maps are cheap elementwise VPU
ops that XLA fuses into the surrounding program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SIGN32 = jnp.uint32(0x80000000)


def encode_i32(x: jax.Array) -> jax.Array:
    """int32 -> uint32, order preserving (flip sign bit)."""
    return x.astype(jnp.uint32) ^ SIGN32


def decode_i32(u: jax.Array) -> jax.Array:
    return (u ^ SIGN32).astype(jnp.int32)


def encode_f32(x: jax.Array) -> jax.Array:
    """float32 -> uint32, order preserving (IEEE-754 total order trick).

    Negative floats get all bits flipped, non-negative get the sign bit set.
    NaNs land above +inf (payload-dependent) — same contract as a<b on
    totally-ordered bits.
    """
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    mask = jnp.where(u >> 31 == 1, jnp.uint32(0xFFFFFFFF), SIGN32)
    return u ^ mask


def decode_f32(u: jax.Array) -> jax.Array:
    mask = jnp.where(u >> 31 == 0, jnp.uint32(0xFFFFFFFF), SIGN32)
    return jax.lax.bitcast_convert_type(u ^ mask, jnp.float32)


def encode_u32(x: jax.Array) -> jax.Array:
    return x.astype(jnp.uint32)


def decode_u32(u: jax.Array) -> jax.Array:
    return u


ENCODERS = {
    jnp.dtype(jnp.uint32): (encode_u32, decode_u32),
    jnp.dtype(jnp.int32): (encode_i32, decode_i32),
    jnp.dtype(jnp.float32): (encode_f32, decode_f32),
}


def descending(u: jax.Array) -> jax.Array:
    """Complement: ascending sort of ~u == descending sort of u."""
    return ~u
