"""Single-chip LSD radix sort pipeline (Pallas backend).

Orchestration analog of the reference's gpuSort (h.in:344-507): where the
reference records `for pass in 0..3: upsweep -> barrier -> spine -> barrier ->
downsweep -> barrier` into a command buffer with ping-pong buffers
(h.in:400-502), here each pass is `block_sort` (upsweep + local rank/permute)
-> a trivial jnp spine -> `stream_place` (global placement), chained inside
one jitted XLA program. XLA provides the dependency ordering the Vulkan
memory barriers hand-coded, and buffer ping-ponging falls out of SSA.

Pass structure: NUM_PASSES passes over DIGIT_BITS-bit digits, LSB->MSB.
Dynamic element counts are handled by padding with the sentinel 0xffffffff
(the reference's own trick, upsweep.slang:32) — sentinels sort to the end of
every pass and are sliced off at the end.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import LANES, SortConfig, default_config, round_up
from . import reference
from .block_sort import block_sort
from .stream_place import stream_place

# below this size the fixed per-kernel overheads beat the Pallas path;
# lax.sort wins. Analog of nothing in the reference (GPU dispatch is cheap).
_MIN_PALLAS_N = 1 << 14


def _spine(hist: jax.Array, radix: int) -> jax.Array:
    """Exclusive global bucket offsets from per-block histogram rows.

    Analog of spine.slang:62-83 (exclusive scan of the global histogram); the
    per-partition column scan (spine.slang:32-60) is unnecessary because
    stream_place visits blocks sequentially and accumulates positions itself.
    """
    tot = hist.sum(axis=0, dtype=jnp.int32)  # (128,), lanes >= radix are zero
    excl = jnp.cumsum(tot) - tot
    return excl[None, :]  # (1, 128)


def _pad2d(x: jax.Array, n_padded: int, fill) -> jax.Array:
    n = x.shape[0]
    fill = jnp.asarray(fill, dtype=x.dtype)
    x = jnp.pad(x, (0, n_padded - n), constant_values=fill)
    return x.reshape(n_padded // LANES, LANES)


@functools.partial(jax.jit, static_argnames=("config",))
def sort_u32(keys: jax.Array, *, config: SortConfig | None = None) -> jax.Array:
    """Ascending sort of uint32 keys via the Pallas radix pipeline."""
    config = config or default_config()
    n = keys.shape[0]
    if n < _MIN_PALLAS_N:
        return reference.sort_keys(keys)
    np_ = round_up(n, config.block * 8)
    x = _pad2d(keys, np_, 0xFFFFFFFF)
    for p in range(config.num_passes):
        y, hist = block_sort(
            x, shift=p * config.digit_bits, config=config,
            interpret=config.interpret,
        )
        g = _spine(hist, config.radix)
        x = stream_place(y, hist, g, config=config, interpret=config.interpret)
    return x.reshape(-1)[:n]


@functools.partial(jax.jit, static_argnames=("config",))
def sort_pairs_u32(
    keys: jax.Array, values: jax.Array, *, config: SortConfig | None = None
) -> tuple[jax.Array, jax.Array]:
    """Stable key-value sort; values ride as a separate 32-bit buffer per pass
    (the reference's differentiator vs packed 64-bit keyvals, README.md:60)."""
    config = config or default_config()
    n = keys.shape[0]
    if n < _MIN_PALLAS_N:
        return reference.sort_pairs(keys, values)
    np_ = round_up(n, config.block * 8)
    x = _pad2d(keys, np_, 0xFFFFFFFF)
    v = _pad2d(values, np_, 0)
    for p in range(config.num_passes):
        y, yv, hist = block_sort(
            x, v, shift=p * config.digit_bits, config=config,
            key_value=True, interpret=config.interpret,
        )
        g = _spine(hist, config.radix)
        x, v = stream_place(
            y, hist, g, yv, config=config, key_value=True,
            interpret=config.interpret,
        )
    return x.reshape(-1)[:n], v.reshape(-1)[:n]


def stage_times(keys: jax.Array, config: SortConfig, iters: int = 10) -> dict:
    """Per-stage seconds for one pass — the 15-timestamp analog (h.in:39-50)."""
    from ..utils.timing import time_fn

    n = keys.shape[0]
    np_ = round_up(max(n, config.block), config.block * 8)
    x = _pad2d(keys, np_, 0xFFFFFFFF)

    up = jax.jit(
        lambda a: block_sort(a, shift=0, config=config, interpret=config.interpret)
    )
    y, hist = up(x)
    t_up = time_fn(up, x, iters=iters)

    sp = jax.jit(lambda h: _spine(h, config.radix))
    g = sp(hist)
    t_sp = time_fn(sp, hist, iters=iters)

    down = jax.jit(
        lambda a, h, gg: stream_place(a, h, gg, config=config, interpret=config.interpret)
    )
    t_down = time_fn(down, y, hist, g, iters=iters)

    npass = config.num_passes
    return {
        "upsweep": t_up * npass,
        "spine": t_sp * npass,
        "downsweep": t_down * npass,
        "per_pass": {"upsweep": t_up, "spine": t_sp, "downsweep": t_down},
    }
