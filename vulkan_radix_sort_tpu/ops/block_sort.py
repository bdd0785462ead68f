"""Block-sort kernel: the upsweep analog, plus the local half of downsweep.

Reference mapping: the reference's upsweep builds a per-partition 256-bin
histogram with shared-memory atomics (upsweep.slang:24-44) and its downsweep
computes per-key local ranks with wave ballots (downsweep.slang:88-176). TPU
has neither atomics-in-SRAM nor ballots, so this kernel does both jobs the
MXU way for one block of `BLOCK` keys:

  1. digit d = (key >> shift) & (RADIX-1)                     (VPU)
  2. one-hot matrix OH[(b,r), l] = [d[r,l] == b]              (VPU)
  3. lane-inclusive rank cumsum  C = OH @ U  (U upper-tri)    (MXU, exact f32)
  4. row/bucket exclusive bases: cumsum over the 16*R totals  (VPU, tiny)
  5. dst[i] = bucket_base + rank[i]  — a permutation of 0..B-1
  6. permute the block via one-hot matmuls on 8-bit byte planes
     (bf16 is exact for 0..255 one-term sums)                 (MXU)
  7. emit the locally-sorted block + its 16-bin histogram

The histogram row output is the analog of partitionHistogram
(upsweep.slang:38-41); there is no global atomic — the spine sums rows
instead (h.in:381-382 zero-fill + atomic-add becomes a plain reduction).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import LANES, SortConfig


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _cumsum_rows_incl(x):
    """Inclusive cumsum along axis 0 via static log-shift rolls (no lax.cumsum
    dependency inside Mosaic)."""
    n = x.shape[0]
    s = 1
    while s < n:
        shifted = pltpu.roll(x, s, axis=0)
        rows = _iota(x.shape, 0)
        x = x + jnp.where(rows >= s, shifted, jnp.zeros_like(x))
        s *= 2
    return x


def _to_lanes(col, radix):
    """(radix, 1) f32 column -> (1, 128) f32 row with col[i] in lane i,
    zeros elsewhere, via MXU (robust relayout, no transpose primitive)."""
    b = col * jnp.ones((1, LANES), jnp.float32)  # (radix, 128) broadcast
    eye = (_iota((radix, LANES), 0) == _iota((radix, LANES), 1)).astype(jnp.float32)
    return jax.lax.dot_general(
        jnp.ones((1, radix), jnp.float32),
        b * eye,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _block_sort_body(shift, radix, key_value, refs):
    if key_value:
        keys_ref, vals_ref, out_ref, outv_ref, hist_ref, hist_tmp, sem = refs
    else:
        keys_ref, out_ref, hist_ref, hist_tmp, sem = refs
        vals_ref = outv_ref = None

    R = keys_ref.shape[0]  # rows per block
    B = R * LANES

    k = keys_ref[:]
    d = jax.lax.shift_right_logical(k, jnp.uint32(shift)).astype(jnp.int32) & (radix - 1)

    # --- one-hot, bucket-major rows: OH[(b, r), l] = [d[r, l] == b] ---------
    d3 = jnp.broadcast_to(d[None], (radix, R, LANES)).reshape(radix * R, LANES)
    bucket = _iota((radix * R, LANES), 0) // R
    oh = (d3 == bucket).astype(jnp.bfloat16)

    # --- lane-inclusive cumsum via upper-triangular matmul ------------------
    upper = (_iota((LANES, LANES), 0) <= _iota((LANES, LANES), 1)).astype(jnp.bfloat16)
    csum = jax.lax.dot_general(
        oh, upper, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (radix*R, LANES), exact integers

    # --- exclusive base per (bucket, row) over flattened (b, r) order -------
    tails = csum[:, LANES - 1 :]  # (radix*R, 1) per-(b,r) totals
    base_incl = _cumsum_rows_incl(tails)
    base = base_incl - tails  # exclusive

    # --- destination index: bucket base + stable local rank -----------------
    contrib = oh.astype(jnp.float32) * (csum + (base - 1.0))
    dst_f = contrib.reshape(radix, R, LANES).sum(axis=0)
    dst = dst_f.astype(jnp.int32)  # (R, LANES), a permutation of 0..B-1

    # --- histogram row (first `radix` lanes used) ----------------------------
    # tot[b] = sum of tails[b*R : (b+1)*R]  — done as a selection matmul;
    # a (radix*R, 1) -> (radix, R) reshape miscompiles on Mosaic for R=64.
    sel = (_iota((radix, radix * R), 1) // R == _iota((radix, radix * R), 0)).astype(
        jnp.bfloat16
    )
    tot = jax.lax.dot_general(
        sel, tails.astype(jnp.bfloat16),  # tails <= 128, exact in bf16
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (radix, 1)
    # MXU demotes f32 matmul inputs to bf16 (exact only to 255), so relayout
    # tot in two 8-bit planes; tot <= BLOCK < 2^16.
    tot_hi = jnp.floor(tot / 256.0)
    tot_lo = tot - tot_hi * 256.0
    hist_f = _to_lanes(tot_hi, radix) * 256.0 + _to_lanes(tot_lo, radix)
    hist_tmp[:] = hist_f.astype(jnp.int32)  # (1, 128)
    cp = pltpu.make_async_copy(
        hist_tmp, hist_ref.at[pl.ds(pl.program_id(0), 1), :], sem
    )
    cp.start()
    cp.wait()

    # --- permutation via one-hot matmuls -------------------------------------
    dstrow = dst // LANES  # (R, LANES) in [0, R)
    dstlane = dst % LANES

    rowoh = (dstrow[None] == _iota((R, R, LANES), 0)).astype(jnp.bfloat16)
    laneoh = (dstlane[:, :, None] == _iota((R, LANES, LANES), 2)).astype(jnp.bfloat16)
    rhs = laneoh.reshape(R * LANES, LANES)

    def permute_u32(x):
        planes = []
        for p in range(4):
            byte = (
                jax.lax.shift_right_logical(x, jnp.uint32(8 * p)).astype(jnp.int32)
                & 255
            ).astype(jnp.bfloat16)
            lhs = (rowoh * byte[None]).reshape(R, R * LANES)
            outp = jax.lax.dot_general(
                lhs, rhs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (R, LANES), exact 0..255
            # f32 -> uint32 must hop through int32 (Mosaic cast support)
            planes.append(outp.astype(jnp.int32).astype(jnp.uint32) << (8 * p))
        return planes[0] | planes[1] | planes[2] | planes[3]

    out_ref[:] = permute_u32(k)
    if key_value:
        outv_ref[:] = permute_u32(vals_ref[:])


@functools.partial(
    jax.jit, static_argnames=("shift", "config", "key_value", "interpret")
)
def block_sort(
    keys2d: jax.Array,
    values2d: jax.Array | None = None,
    *,
    shift: int,
    config: SortConfig,
    key_value: bool = False,
    interpret: bool = False,
):
    """Locally sort each BLOCK-key block by the digit at `shift`.

    keys2d: (rows, 128) uint32, rows a multiple of config.block_rows.
    Returns (sorted_blocks, histogram) or (sorted_keys, sorted_vals, histogram).
    """
    rows, lanes = keys2d.shape
    assert lanes == LANES
    R = config.block_rows
    assert rows % R == 0, (rows, R)
    nblocks = rows // R
    radix = config.radix

    kernel = functools.partial(
        _block_sort_body, shift, radix, key_value
    )

    def wrapped(*refs):
        kernel(refs)

    block_spec = pl.BlockSpec((R, LANES), lambda p: (p, 0), memory_space=pltpu.VMEM)
    hist_spec = pl.BlockSpec(memory_space=pl.ANY)

    in_specs = [block_spec]
    args = [keys2d]
    out_shape = [jax.ShapeDtypeStruct((rows, LANES), jnp.uint32)]
    out_specs = [block_spec]
    if key_value:
        in_specs.append(block_spec)
        args.append(values2d)
        out_shape.append(jax.ShapeDtypeStruct((rows, LANES), jnp.uint32))
        out_specs.append(block_spec)
    out_shape.append(jax.ShapeDtypeStruct((nblocks, LANES), jnp.int32))
    out_specs.append(hist_spec)

    return pl.pallas_call(
        wrapped,
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((1, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
        ),
        interpret=interpret,
    )(*args)
