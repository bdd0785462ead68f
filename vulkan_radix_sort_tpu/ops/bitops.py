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


# ---------------------------------------------------------------------------
# 64-bit keys (extension beyond the reference's uint32-only API): map onto
# uint64, split into (hi, lo) uint32 words, and sort the words
# lexicographically with the 2-array network path. Requires jax x64 mode
# for the user-facing uint64/int64/float64 arrays.
# ---------------------------------------------------------------------------

SIGN64 = 0x8000000000000000


def encode_u64(x: jax.Array) -> jax.Array:
    return x.astype(jnp.uint64)


def decode_u64(u: jax.Array) -> jax.Array:
    return u


def encode_i64(x: jax.Array) -> jax.Array:
    """int64 -> uint64, order preserving (flip sign bit)."""
    return x.astype(jnp.uint64) ^ jnp.uint64(SIGN64)


def decode_i64(u: jax.Array) -> jax.Array:
    return (u ^ jnp.uint64(SIGN64)).astype(jnp.int64)


def encode_f64(x: jax.Array) -> jax.Array:
    """float64 -> uint64, order preserving (IEEE-754 total order trick)."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint64)
    mask = jnp.where(
        u >> 63 == 1, jnp.uint64(0xFFFFFFFFFFFFFFFF), jnp.uint64(SIGN64)
    )
    return u ^ mask


def decode_f64(u: jax.Array) -> jax.Array:
    mask = jnp.where(
        u >> 63 == 0, jnp.uint64(0xFFFFFFFFFFFFFFFF), jnp.uint64(SIGN64)
    )
    return jax.lax.bitcast_convert_type(u ^ mask, jnp.float64)


ENCODERS64 = {
    jnp.dtype(jnp.uint64): (encode_u64, decode_u64),
    jnp.dtype(jnp.int64): (encode_i64, decode_i64),
    jnp.dtype(jnp.float64): (encode_f64, decode_f64),
}


def split_u64(u: jax.Array) -> tuple[jax.Array, jax.Array]:
    """uint64 -> (hi, lo) uint32 words; (hi, lo) lexicographic == u64 order.

    Arithmetic (not bitcast) split so the result is endianness-independent.
    """
    hi = (u >> jnp.uint64(32)).astype(jnp.uint32)
    lo = (u & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    return hi, lo


def merge_u64(hi: jax.Array, lo: jax.Array) -> jax.Array:
    return (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64)


def descending(u: jax.Array) -> jax.Array:
    """Complement: ascending sort of ~u == descending sort of u."""
    return ~u
