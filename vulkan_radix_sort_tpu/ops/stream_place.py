"""Streaming placement kernel: the global half of the downsweep.

Reference mapping: the reference downsweep computes each key's destination
`globalBase + partitionBase + localRank` and scatters, staging through shared
memory so global writes are near-sequential per digit run
(downsweep.slang:179-201). TPU has no per-lane scatter at all, so we lean on
the run structure instead: after block_sort, every (block p, bucket b) is one
*contiguous* run in the block, and the output region of bucket b is the
concatenation of runs (0,b), (1,b), ... (P-1,b).

This kernel walks blocks in order (the TPU grid is sequential on a core) and
maintains RADIX append-streams in VMEM — one per bucket. Each block's runs
are appended to their streams with dynamic lane rotations; whenever a stream
accumulates FLUSH_ROWS full 128-lane rows, they are DMA'd to HBM at the
stream's running output offset. Rows shared by two buckets (a bucket's first
row) are merged read-modify-write; everything else is a pure aligned write.
Stability: blocks are visited in order and runs are appended in order, so the
LSD stability contract is preserved.

Layout invariant: stream b's staging row r always corresponds to output row
`outrow[b] + r`, i.e. staging positions are congruent to global positions
mod 128, so flushes never need re-alignment.
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


def _extract128(rows2, olane):
    """128 contiguous elements starting at flat lane `olane` of a (2,128) pair."""
    rot = pltpu.roll(rows2, LANES - olane, axis=1)
    lane = _iota((1, LANES), 1)
    return jnp.where(lane < LANES - olane, rot[0:1], rot[1:2])  # (1, 128)


def _place_mask(plane, take):
    """(2,128) mask of staging positions [plane, plane+take)."""
    q = _iota((2, LANES), 0) * LANES + _iota((2, LANES), 1) - plane
    return (q >= 0) & (q < take)


def _stream_place_body(cfg: SortConfig, key_value, nrows_out, refs):
    radix = cfg.radix
    R = cfg.block_rows
    FLUSH = cfg.flush_rows
    CAP = FLUSH + 2

    if key_value:
        (y_ref, yv_ref, hist_ref, g_ref, out_ref, outv_ref,
         stage, stagev, ext, extv, tmp, tmpv, pos, outrow, flushed, sem) = refs
    else:
        (y_ref, hist_ref, g_ref, out_ref,
         stage, ext, tmp, pos, outrow, flushed, sem) = refs
        yv_ref = outv_ref = stagev = extv = tmpv = None

    p = pl.program_id(0)
    nblocks = pl.num_programs(0)

    # ---- init stream state at first block --------------------------------
    @pl.when(p == 0)
    def _():
        for b in range(radix):
            g = g_ref[0, b]
            outrow[b] = g // LANES
            pos[b] = g % LANES
            flushed[b] = 0

    # ---- copy block into extended scratch (guards ds(orow, 2) overrun) ----
    ext[0:R] = y_ref[:]
    if key_value:
        extv[0:R] = yv_ref[:]

    def flush(b):
        """Flush FLUSH full rows of stream b to HBM, shift leftovers down."""
        row0 = outrow[b]

        @pl.when(flushed[b] == 0)
        def _():
            # first flush: head lanes of row 0 belong to the previous bucket;
            # read-modify-write to preserve them.
            head = g_ref[0, b] % LANES
            cp = pltpu.make_async_copy(
                out_ref.at[pl.ds(row0, 1), :], tmp, sem
            )
            cp.start()
            cp.wait()
            lane = _iota((1, LANES), 1)
            stage[b, 0:1] = jnp.where(lane >= head, stage[b, 0:1], tmp[:])
            if key_value:
                cpv = pltpu.make_async_copy(
                    outv_ref.at[pl.ds(row0, 1), :], tmpv, sem
                )
                cpv.start()
                cpv.wait()
                stagev[b, 0:1] = jnp.where(lane >= head, stagev[b, 0:1], tmpv[:])

        cp = pltpu.make_async_copy(
            stage.at[b, pl.ds(0, FLUSH), :],
            out_ref.at[pl.ds(row0, FLUSH), :],
            sem,
        )
        cp.start()
        cp.wait()
        if key_value:
            cpv = pltpu.make_async_copy(
                stagev.at[b, pl.ds(0, FLUSH), :],
                outv_ref.at[pl.ds(row0, FLUSH), :],
                sem,
            )
            cpv.start()
            cpv.wait()
        # shift leftover rows [FLUSH, FLUSH+2) down to [0, 2)
        stage[b, 0:2] = stage[b, FLUSH : FLUSH + 2]
        if key_value:
            stagev[b, 0:2] = stagev[b, FLUSH : FLUSH + 2]
        outrow[b] = row0 + FLUSH
        pos[b] = pos[b] - FLUSH * LANES
        flushed[b] = 1

    def append_piece(b, src_flat, length):
        """Append ext[src_flat : src_flat+length) (flat) to stream b."""

        def cond(c):
            return c < length

        def body(c):
            @pl.when(pos[b] >= FLUSH * LANES)
            def _():
                flush(b)

            take = jnp.minimum(length - c, LANES)
            s = src_flat + c
            orow = s // LANES
            olane = s % LANES
            pb = pos[b]
            prow = pb // LANES
            plane = pb % LANES
            mask = _place_mask(plane, take)

            w = _extract128(ext[pl.ds(orow, 2), :], olane)
            rot = pltpu.roll(w, plane, axis=1)
            stacked = jnp.concatenate([rot, rot], axis=0)
            cur = stage[b, pl.ds(prow, 2), :]
            stage[b, pl.ds(prow, 2), :] = jnp.where(mask, stacked, cur)
            if key_value:
                wv = _extract128(extv[pl.ds(orow, 2), :], olane)
                rotv = pltpu.roll(wv, plane, axis=1)
                stackedv = jnp.concatenate([rotv, rotv], axis=0)
                curv = stagev[b, pl.ds(prow, 2), :]
                stagev[b, pl.ds(prow, 2), :] = jnp.where(mask, stackedv, curv)

            pos[b] = pb + take
            return c + take

        jax.lax.while_loop(cond, body, jnp.int32(0))

    # ---- append this block's runs ------------------------------------------
    # hist rows are fetched in (8, 128) SMEM tiles; our row is p % 8.
    hrow = p % 8
    off = jnp.int32(0)
    for b in range(radix):
        ln = hist_ref[hrow, b]
        append_piece(b, off, ln)
        off = off + ln

    # ---- drain at the last block --------------------------------------------
    @pl.when(p == nblocks - 1)
    def _():
        for b in range(radix):
            head = jnp.where(flushed[b] == 0, g_ref[0, b] % LANES, 0)
            nrows = (pos[b] + LANES - 1) // LANES

            def drain_row(r, _):
                @pl.when(r < nrows)
                def _():
                    row = outrow[b] + r
                    cp = pltpu.make_async_copy(
                        out_ref.at[pl.ds(row, 1), :], tmp, sem
                    )
                    cp.start()
                    cp.wait()
                    lane = _iota((1, LANES), 1)
                    q = r * LANES + lane
                    valid = (q >= jnp.where(r == 0, head, 0)) & (q < pos[b])
                    merged = jnp.where(valid, stage[b, pl.ds(r, 1), :], tmp[:])
                    tmp[:] = merged
                    cpo = pltpu.make_async_copy(
                        tmp, out_ref.at[pl.ds(row, 1), :], sem
                    )
                    cpo.start()
                    cpo.wait()
                    if key_value:
                        cpv = pltpu.make_async_copy(
                            outv_ref.at[pl.ds(row, 1), :], tmpv, sem
                        )
                        cpv.start()
                        cpv.wait()
                        mergedv = jnp.where(
                            valid, stagev[b, pl.ds(r, 1), :], tmpv[:]
                        )
                        tmpv[:] = mergedv
                        cpvo = pltpu.make_async_copy(
                            tmpv, outv_ref.at[pl.ds(row, 1), :], sem
                        )
                        cpvo.start()
                        cpvo.wait()

                return 0

            jax.lax.fori_loop(0, CAP, drain_row, 0)


@functools.partial(
    jax.jit, static_argnames=("config", "key_value", "interpret")
)
def stream_place(
    y2d: jax.Array,
    hist: jax.Array,
    g_row: jax.Array,
    values2d: jax.Array | None = None,
    *,
    config: SortConfig,
    key_value: bool = False,
    interpret: bool = False,
):
    """Globally place locally-sorted blocks into bucket order.

    y2d: (rows, 128) uint32 block-sorted keys; hist: (nblocks, 128) int32 with
    per-bucket counts in lanes [0, radix); g_row: (1, 128) int32 exclusive
    global bucket offsets in lanes [0, radix).
    """
    rows, lanes = y2d.shape
    assert lanes == LANES
    R = config.block_rows
    nblocks = rows // R
    radix = config.radix
    CAP = config.flush_rows + 2

    body = functools.partial(_stream_place_body, config, key_value, rows)

    def wrapped(*refs):
        body(refs)

    assert nblocks % 8 == 0, "pad input to 8-block multiples (SMEM tile rule)"
    block_spec = pl.BlockSpec((R, LANES), lambda p: (p, 0), memory_space=pltpu.VMEM)
    hist_spec = pl.BlockSpec((8, LANES), lambda p: (p // 8, 0), memory_space=pltpu.SMEM)
    g_spec = pl.BlockSpec((1, LANES), lambda p: (0, 0), memory_space=pltpu.SMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)

    in_specs = [block_spec]
    args = [y2d]
    if key_value:
        in_specs.append(block_spec)
        args.append(values2d)
    in_specs += [hist_spec, g_spec]
    args += [hist, g_row]

    out_shape = [jax.ShapeDtypeStruct((rows, LANES), jnp.uint32)]
    out_specs = [any_spec]
    if key_value:
        out_shape.append(jax.ShapeDtypeStruct((rows, LANES), jnp.uint32))
        out_specs.append(any_spec)

    scratch = [
        pltpu.VMEM((radix, CAP, LANES), jnp.uint32),  # stage
    ]
    if key_value:
        scratch.append(pltpu.VMEM((radix, CAP, LANES), jnp.uint32))  # stagev
    scratch.append(pltpu.VMEM((R + 1, LANES), jnp.uint32))  # ext
    if key_value:
        scratch.append(pltpu.VMEM((R + 1, LANES), jnp.uint32))  # extv
    scratch.append(pltpu.VMEM((1, LANES), jnp.uint32))  # tmp
    if key_value:
        scratch.append(pltpu.VMEM((1, LANES), jnp.uint32))  # tmpv
    scratch += [
        pltpu.SMEM((radix,), jnp.int32),  # pos
        pltpu.SMEM((radix,), jnp.int32),  # outrow
        pltpu.SMEM((radix,), jnp.int32),  # flushed
        pltpu.SemaphoreType.DMA(()),
    ]

    out = pl.pallas_call(
        wrapped,
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
        ),
        interpret=interpret,
    )(*args)
    return out if key_value else out[0]
