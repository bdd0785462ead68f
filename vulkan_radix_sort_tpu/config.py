"""Tuning constants and sort configuration.

TPU-native analog of the reference's compiled-in tuning constants
(reference: src/shader/constants.slang:1-5 — RADIX=256, WORKGROUP_SIZE=512,
PARTITION_DIVISION=8, PARTITION_SIZE=4096). On TPU the tile geometry is set
by the VPU (8x128) and MXU (128x128), so the constants differ, but they play
the same role: one place that host orchestration and kernels both read.
"""

from __future__ import annotations

import dataclasses
import functools

# ---------------------------------------------------------------------------
# Kernel geometry (Pallas backend).
# ---------------------------------------------------------------------------

# Lanes per VPU row. Fixed by TPU hardware.
LANES = 128

# Sublanes per 32-bit VPU tile. Fixed by TPU hardware.
SUBLANES = 8

# Bits consumed per local sub-pass inside the block-sort kernel.
# 4 bits -> 16 buckets; keeps the one-hot rank matrices narrow enough that
# the VPU cost per key stays low while the MXU does the heavy lifting.
DIGIT_BITS = 4

# Number of buckets per pass (analog of the reference's RADIX=256,
# constants.slang:1).  We use a smaller radix because TPU has no shared-memory
# atomics; ranks come from matmul cumsums whose cost scales with the radix.
RADIX = 1 << DIGIT_BITS

# Number of global passes over the 32-bit key: 32 / DIGIT_BITS.
NUM_PASSES = 32 // DIGIT_BITS

# Keys per block processed by the block-sort (upsweep) kernel. Analog of
# PARTITION_SIZE=4096 (constants.slang:4). Must be a multiple of LANES*SUBLANES.
BLOCK = 2048

# Rows of LANES lanes per block.
BLOCK_ROWS = BLOCK // LANES

# Staging tile rows flushed per DMA by the downsweep streaming writer
# (analog of the reference's shared-memory staging scatter,
# downsweep.slang:186-192: stage locally, write near-sequentially).
FLUSH_ROWS = 16  # 16 rows * 128 lanes * 4B = 8 KiB per flush

# Sentinel used to pad the tail of the key buffer up to a block multiple.
# The reference uses the same trick: out-of-range keys read as 0xffffffff
# (upsweep.slang:32) and writes are masked (downsweep.slang:199).
KEY_SENTINEL = 0xFFFFFFFF

# Default VMEM chunk sizes of the bitonic network backend, per path kind.
# Chip sweep under the round-5 defaults (T layout + indep keys CE,
# bench_results/chip_queue.log r5d_chunk_ab, keys/kv at 2^25):
#   chunk 2^15: keys 16.05 ms            kv 46.67 ms
#   chunk 2^16: keys 13.98 ms            kv 46.62 ms
#   chunk 2^17: keys 13.48 ms (fastest)  kv 47.19 ms
# Keys-only sorts take the bigger chunk (fewer merge rounds beat the extra
# in-chunk stages once the T layout made sublane stages cheap); carry paths
# (kv / kvns / u64) keep 2^16 — their per-stage cost is array-count-bound,
# so extra in-chunk stages cost more than the saved merge rounds.
CHUNK_KEYS = 1 << 17
CHUNK_CARRY = 1 << 16


@dataclasses.dataclass(frozen=True)
class SortConfig:
    """Configuration of one compiled sorter pipeline."""

    block: int = BLOCK
    digit_bits: int = DIGIT_BITS
    flush_rows: int = FLUSH_ROWS
    # VMEM-resident chunk size of the bitonic network backend (keys per
    # chunk kernel invocation); must be a power of two >= 256. None (the
    # default) resolves per path kind: CHUNK_KEYS for keys-only sorts,
    # CHUNK_CARRY for carry paths (kv / kvns / u64) — see the sweep table
    # above those constants. An explicit value applies to every path.
    chunk: int | None = None
    # 'network' (bitonic CE engine, the TPU hot path) | 'radix' (Pallas LSD
    # radix pipeline) | 'xla' (lax.sort) | 'auto' (network on TPU, xla off)
    backend: str = "auto"
    # run Pallas kernels in interpreter mode (debugging / CPU testing);
    # analog of the reference's opt-in validation layers (bench.cc:120).
    interpret: bool = False
    # adaptive fast paths (opt-in): one in-graph detection pass per sort
    # spots already-sorted / reverse-sorted / constant inputs and skips the
    # network entirely (identity / reverse copy) via lax.cond. Degenerate
    # inputs sort at detect+copy speed (1.2-1.8 ms vs 13.6/46.6 full at
    # 2^25); on unsorted inputs the detection reduce measures within the
    # run-to-run noise (<1%, chip_queue.log r5g_adaptive_ab perturbed
    # rows). Still off by default: benchmark fidelity (chained timing
    # loops feed sorted outputs back in and would measure the fast path)
    # and reference parity. No reference analog (the
    # reference always runs all 4 passes). Reverse inputs take the fast
    # path only where a flip is order-correct: keys-only sorts (equal keys
    # are interchangeable); stable and non-stable KV keep only the
    # sorted-input identity path (a flip would reverse equal-key ties,
    # breaking the stable contract and kvns's value-ascending promise).
    adaptive: bool = False

    @property
    def chunk_keys(self) -> int:
        """Resolved chunk for keys-only network sorts."""
        return CHUNK_KEYS if self.chunk is None else self.chunk

    @property
    def chunk_carry(self) -> int:
        """Resolved chunk for carry-path network sorts (kv/kvns/u64)."""
        return CHUNK_CARRY if self.chunk is None else self.chunk

    @property
    def radix(self) -> int:
        return 1 << self.digit_bits

    @property
    def num_passes(self) -> int:
        return -(-32 // self.digit_bits)

    @property
    def block_rows(self) -> int:
        return self.block // LANES


@functools.cache
def default_config() -> SortConfig:
    import os

    return SortConfig(adaptive=os.environ.get("VRS_ADAPTIVE", "0") == "1")


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(a: int, b: int) -> int:
    return cdiv(a, b) * b


def enable_compilation_cache(path: str | None = None) -> str:
    """Turn on JAX's persistent compilation cache for the sort kernels.

    The big unrolled network kernels compile in 20 s - minutes (Mosaic emit
    time is superlinear in ops x block rows); the persistent cache makes
    that a one-time cost per kernel shape (measured 19.8 s -> 0.6 s on the
    second process). The reference gets the same property by committing the
    pre-compiled SPIR-V blobs into its generated header
    (reference: tools/generate_header.py, README.md:198-200) — one import,
    no recompilation.

    Called automatically by the benchmark entry points; safe to call more
    than once. VRS_CACHE_DIR overrides the location.
    """
    import os

    import jax

    path = path or os.environ.get("VRS_CACHE_DIR") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # older jax without these flags: cache is best-effort
        pass
    return path
