"""Bitonic sort-network engine: the TPU-native hot path.

Why a sorting network and not a literal radix translation: the reference's
downsweep scatters keys through shared memory with per-lane atomics and
ballots (reference: src/shader/downsweep.slang:88-201) — TPU has neither
scatter nor ballots, and microbenchmarks (tools/microbench.py) measured
one-hot-matmul radix ranking at ~1.5 ns/key/subsort while a full
compare-exchange stage over VMEM tiles costs ~2.2 ps/element. On this
hardware the fastest exact sort is a network of roll+min/max+select stages:
the VPU runs one full CE stage over 33M keys in ~75 us.

Structure (all under one jit):
  1. chunk network — sorts C-element chunks entirely in VMEM with the full
     bitonic network (phases k=2..C); the final phase direction alternates
     per chunk (ascending/descending) so chunks form bitonic pairs.
  2. per merge round r (runs of C*2^r):
     a. cross kernel — all stage distances >= C, processed on groups of 2^r
        blocks sliced along the chunk dimension (distances >= C only connect
        equal offsets, so slicing is sound).
     b. local kernel — stage distances < C inside each block in VMEM.
Direction masks follow the classic XOR-network form: during phase k an
element descends iff bit log2(k) of its global flat index is set; for
k >= C that bit is a scalar per block/group and is derived from program_id.

Compile-time discipline: every stage is emitted with *static* roll shifts
(dynamic tpu.dynamic_rotate and lax.fori_loop carries both measured 2-4x
slower per stage), but Mosaic compile time grows superlinearly with ops per
kernel (a single 171-stage key-value kernel stalls it for >25 minutes), so
the chunk network is split into several pallas_call's of at most
~MAX_GROUP_STAGES stages each. The extra HBM round trips per split cost
~0.8 ms each at 2^25 — noise next to the compile-time cliff.

Stability / key-value: the KV path carries (key, value, original index) and
compares (key, index) lexicographically — a total order, which makes the
network's output exactly the stable-by-key permutation the reference
verifies against std::stable_sort (reference: bench/cpu_benchmark.cc:33-49,
bench/bench.cc:41-64). Values ride as a separate 32-bit buffer, the
reference library's signature design (reference: README.md:60).

uint32 keys are compared as int32 with the sign bit flipped (Mosaic has no
unsigned vector min/max); the flip is undone on store.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ROW_BITS = 7  # log2(LANES)
SIGN = np.int32(-0x80000000)  # plain scalar: jnp module-level arrays would
# be captured as pallas constants

# stage budget per emitted kernel (keys-only; key-value kernels carry ~2.5x
# the ops per stage so they get a proportionally smaller budget). Compile
# time per kernel grows superlinearly with the budget, but with the
# persistent compilation cache (config.enable_compilation_cache) that cost
# is paid once per kernel shape, so the budgets are env-tunable.
import os as _os

MAX_GROUP_STAGES = int(_os.environ.get("VRS_MAX_GROUP_STAGES", 96))
MAX_GROUP_STAGES_KV = int(_os.environ.get("VRS_MAX_GROUP_STAGES_KV", 40))
MAX_GROUP_STAGES_PAIRS = int(_os.environ.get("VRS_MAX_GROUP_STAGES_PAIRS", 64))


def _budget(na: int) -> int:
    return {1: MAX_GROUP_STAGES, 2: MAX_GROUP_STAGES_PAIRS,
            3: MAX_GROUP_STAGES_KV}[na]

# scoped-VMEM ceiling per kernel: the Mosaic default (16 MB) is far below
# the chip's physical VMEM (128 MB on v5e) and the unrolled network keeps
# several live block-sized temporaries
VMEM_LIMIT = 100 * 1024 * 1024


def _log2(n: int) -> int:
    b = n.bit_length() - 1
    assert 1 << b == n, f"{n} not a power of two"
    return b


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _flip(u32):
    return jax.lax.bitcast_convert_type(u32, jnp.int32) ^ SIGN


def _unflip(i32):
    return jax.lax.bitcast_convert_type(i32 ^ SIGN, jnp.uint32)


def _roll(x, shift, axis):
    """pltpu.roll modulo the axis size (it requires 0 <= shift < size).

    Under jax x64 mode (used when tracing the 64-bit key path) a bare
    Python int shift is weak-typed to an i64 constant, which Mosaic's
    rotate lowering rejects — coerce to int32 there. Outside x64 the int
    passes through untouched so the compiled programs (and the persistent
    cache keys) stay identical.
    """
    shift = shift % x.shape[axis]
    if jax.config.jax_enable_x64:
        shift = jnp.int32(shift)
    return pltpu.roll(x, shift, axis=axis)


def _stage_ce(arrs, axis, sh, up):
    """One ASCENDING compare-exchange at roll distance sh along axis.

    Directions are handled outside via the negation trick: descending
    regions run with bitwise-NOTed keys (and index tiebreaks), so every
    stage is a plain ascending min/max — two ops cheaper per stage than
    per-stage direction selects.
    """
    if len(arrs) == 1:
        (x,) = arrs
        pm = _roll(x, -sh, axis=axis)  # partner for 'up' slots: x[i+j]
        mn = jnp.minimum(x, pm)
        mx = jnp.maximum(x, pm)
        return (jnp.where(up, mn, _roll(mx, sh, axis=axis)),)

    # Multi-array case: (key, tiebreak) compared lexicographically, every
    # array moved by the same exchange decision.
    #   2 arrays — non-stable pairs (key, value): the value IS the
    #     tiebreak, so equal keys emerge value-ascending (deterministic)
    #     and padding sentinels (0xffffffff, 0xffffffff) are
    #     interchangeable with any bit-identical genuine pair.
    #   3 arrays — stable (key, value, index): the original index breaks
    #     ties, giving the reference's std::stable_sort order
    #     (bench/cpu_benchmark.cc:33-49).
    k = arrs[0]
    tb = arrs[1] if len(arrs) == 2 else arrs[2]
    partners = tuple(_roll(a, -sh, axis=axis) for a in arrs)
    pk = partners[0]
    ptb = partners[1] if len(arrs) == 2 else partners[2]
    # int32, not bool: Mosaic cannot rotate i1 vectors
    lt = jnp.where(
        (pk < k) | ((pk == k) & (ptb < tb)), jnp.int32(1), jnp.int32(0)
    )  # partner-before-mine
    # take(i): up slot takes partner iff partner sorts first (asc);
    # down slot i takes partner iff partner-of-up-slot(i-j) sorted first
    take = jnp.where(up, lt, _roll(lt, sh, axis=axis)) > 0

    def pick(arr, parr):
        p = jnp.where(up, parr, _roll(arr, sh, axis=axis))
        return jnp.where(take, p, arr)

    return tuple(pick(a, p) for a, p in zip(arrs, partners))


def _stage(arrs, j):
    """Ascending CE stage at distance j over the row-major flat index."""
    axis, sh = (1, j) if j < LANES else (0, j // LANES)
    up = (_iota(arrs[0].shape, axis) & sh) == 0
    return _stage_ce(arrs, axis, sh, up)


def _desc_m32(shape, k):
    """int32 mask: -1 where bit log2(k) of the flat index is set, else 0.

    Computed with two shifts (no compare/select): broadcast bit t of the
    axis iota arithmetically to all 32 bits.
    """
    t = _log2(k)
    if k < LANES:
        i = _iota(shape, 1)
    else:
        i = _iota(shape, 0)
        t -= ROW_BITS
    # int32 >> is arithmetic: broadcast bit t to all 32 bits
    return (i << (31 - t)) >> 31


def _negate(arrs, m32):
    """XOR the compared arrays with a -1/0 mask: descending regions sort
    ascending on NOTed values. Non-compared payload is untouched."""
    if len(arrs) == 1:
        return (arrs[0] ^ m32,)
    if len(arrs) == 2:  # non-stable pairs: (key, value) both compared
        k, v = arrs
        return (k ^ m32, v ^ m32)
    k, v, ix = arrs
    return (k ^ m32, v, ix ^ m32)


def _load(refs, na):
    """na = number of carried arrays: 1 keys, 2 non-stable pairs, 3 stable
    (key, value, index)."""
    if na == 3:
        k_ref, v_ref, ix_ref = refs[:3]
        return (
            _flip(k_ref[:]),
            v_ref[:],
            jax.lax.bitcast_convert_type(ix_ref[:], jnp.int32),
        )
    if na == 2:
        # values are compared (lexicographic tiebreak) so they get the
        # same unsigned->signed flip as keys
        return (_flip(refs[0][:]), _flip(refs[1][:]))
    return (_flip(refs[0][:]),)


def _store(refs, arrs, na):
    if na == 3:
        ko_ref, vo_ref, ixo_ref = refs[-3:]
        ko_ref[:] = _unflip(arrs[0])
        vo_ref[:] = arrs[1]
        ixo_ref[:] = jax.lax.bitcast_convert_type(arrs[2], jnp.uint32)
    elif na == 2:
        ko_ref, vo_ref = refs[-2:]
        ko_ref[:] = _unflip(arrs[0])
        vo_ref[:] = _unflip(arrs[1])
    else:
        refs[-1][:] = _unflip(arrs[0])


# --------------------------------------------------------------------------
# chunk network: phases pk_lo..pk_hi of the bitonic sort of one chunk
# --------------------------------------------------------------------------


def _chunk_phases_body(C, pk_lo, pk_hi, kv, refs):
    arrs = _load(refs, kv)
    shape = arrs[0].shape
    lc = _log2(C)
    m_prev = jnp.int32(0)
    for pk in range(pk_lo, pk_hi + 1):
        if pk == lc:
            # final phase: direction is bit log2(C) of the global index,
            # i.e. chunk parity — even chunks ascend, odd descend.
            m = jnp.where(
                (pl.program_id(0) & 1) == 1, jnp.int32(-1), jnp.int32(0)
            )
        else:
            m = _desc_m32(shape, 1 << pk)
        # enter this phase's negation (XOR transitions compose)
        arrs = _negate(arrs, m ^ m_prev)
        for pj in range(pk - 1, -1, -1):
            arrs = _stage(arrs, 1 << pj)
        m_prev = m
    arrs = _negate(arrs, m_prev)  # restore
    _store(refs, arrs, kv)


def _phase_groups(lc: int, budget: int):
    """Partition phases 1..lc into groups of <= budget stages (phase pk has
    pk stages); a phase never splits across kernels."""
    groups, cur, cost = [], [], 0
    for pk in range(1, lc + 1):
        if cur and cost + pk > budget:
            groups.append(cur)
            cur, cost = [], 0
        cur.append(pk)
        cost += pk
    if cur:
        groups.append(cur)
    return groups


# --------------------------------------------------------------------------
# cross kernel: distances >= C for merge round r, grouped blocks
# --------------------------------------------------------------------------


def _scalar_m32(pred):
    return jnp.where(pred, jnp.int32(-1), jnp.int32(0))


def _cross_kernel_body(r, kv, refs):
    """refs blocks are (G=2^r, SR, 128); stage distances are along dim 0."""
    arrs = _load(refs, kv)
    G = arrs[0].shape[0]
    assert G == 1 << r
    # bit log2(C)+r of the global index = group parity, scalar
    m = _scalar_m32((pl.program_id(0) & 1) == 1)
    arrs = _negate(arrs, m)
    shape = arrs[0].shape
    for t in range(r - 1, -1, -1):
        d = 1 << t
        up = (_iota(shape, 0) & d) == 0
        arrs = _stage_ce(arrs, 0, d, up)
    arrs = _negate(arrs, m)
    _store(refs, arrs, kv)


# --------------------------------------------------------------------------
# local kernel: distances < C for merge round r (per-block cleanup)
# --------------------------------------------------------------------------


def _local_kernel_body(C, r, kv, refs):
    arrs = _load(refs, kv)
    # bit log2(C)+r of the global index, scalar per block
    m = _scalar_m32(((pl.program_id(0) >> r) & 1) == 1)
    arrs = _negate(arrs, m)
    for pj in range(_log2(C) - 1, -1, -1):
        arrs = _stage(arrs, 1 << pj)
    arrs = _negate(arrs, m)
    _store(refs, arrs, kv)


# --------------------------------------------------------------------------
# fused round kernel: cross + local in one pass when the whole 2^r-block
# group fits VMEM — halves the round's HBM traffic
# --------------------------------------------------------------------------


def _fused_rounds_body(C, r_lo, r_hi, kv, refs):
    """Merge rounds r_lo..r_hi in one pass over a 2^r_hi-block group.

    A group of 2^g aligned blocks contains every pair interaction of rounds
    r <= g, so all of those rounds' cross AND local stages run back-to-back
    on the VMEM-resident group — one HBM round trip for g rounds instead of
    up to 2g.
    """
    arrs = _load(refs, kv)  # (G*rc, LANES), one whole group
    G = 1 << r_hi
    rows = arrs[0].shape[0]
    rc = rows // G
    lrc = _log2(rc)
    shape = arrs[0].shape

    m_prev = jnp.int32(0)
    for r in range(r_lo, r_hi + 1):
        # direction of round r = bit log2(C)+r of the global index. Block
        # B = g*2^r_hi + b: for r < r_hi that is bit r of b (varies within
        # the group, a row mask); for r = r_hi it is the group parity.
        if r == r_hi:
            m = _scalar_m32((pl.program_id(0) & 1) == 1)
        else:
            # bit (lrc + r) of the flat row index, broadcast to 32 bits
            m = (_iota(shape, 0) << (31 - (lrc + r))) >> 31
        arrs = _negate(arrs, m ^ m_prev)

        # cross stages of round r: block distances 2^(r-1)..1
        arrs3 = tuple(a.reshape(G, rc, LANES) for a in arrs)
        shape3 = arrs3[0].shape
        for t in range(r - 1, -1, -1):
            d = 1 << t
            up = (_iota(shape3, 0) & d) == 0
            arrs3 = _stage_ce(arrs3, 0, d, up)
        arrs = tuple(a.reshape(rows, LANES) for a in arrs3)

        # local stages: distance masks depend only on (index mod C),
        # identical across the C-aligned sub-blocks of the group
        for pj in range(_log2(C) - 1, -1, -1):
            arrs = _stage(arrs, 1 << pj)
        m_prev = m

    arrs = _negate(arrs, m_prev)
    _store(refs, arrs, kv)


# rows-per-array ceiling for a fused group (VMEM holds in+out double
# buffers plus a few live network temporaries per array)
MAX_FUSED_ROWS = int(_os.environ.get("VRS_MAX_FUSED_ROWS", 16384))

# Mosaic emits per-vreg instructions, so kernel compile time scales with
# (stages x block rows); cap that product or multi-round fused kernels take
# 5-10 minutes to compile for a ~1% runtime gain (one-time with the
# persistent cache)
FUSE_COST_CAP = int(_os.environ.get("VRS_FUSE_COST_CAP", 48 * 1024))


def _fused_round_plan(C, nrounds, n_arrays, budget):
    """Group consecutive rounds into fused kernels under VMEM, stage, and
    compile-cost budgets; returns [(r_lo, r_hi)] and the first unfused
    round."""
    rc = C // LANES
    lc = _log2(C)
    plan = []
    r = 1
    while r <= nrounds and (1 << r) * rc * n_arrays <= MAX_FUSED_ROWS:
        # extend r_hi while VMEM, stage and compile budgets all allow
        r_hi = r
        stages = r + lc
        while True:
            nxt = r_hi + 1
            rows_nxt = (1 << nxt) * rc
            if (
                nxt > nrounds
                or rows_nxt * n_arrays > MAX_FUSED_ROWS
                or stages + (nxt + lc) > budget
                or (stages + nxt + lc) * rows_nxt > FUSE_COST_CAP
            ):
                break
            r_hi = nxt
            stages += nxt + lc
        plan.append((r, r_hi))
        r = r_hi + 1
    return plan, r


def _run_fused_rounds(arrs, C, r_lo, r_hi, kv, interpret, real_rows=None):
    body = functools.partial(_fused_rounds_body, C, r_lo, r_hi, kv)
    rc_super = (1 << r_hi) * (C // LANES)
    return _block_call(
        lambda *refs: body(refs), arrs, rc_super, interpret, real_rows
    )


# --------------------------------------------------------------------------
# driver
# --------------------------------------------------------------------------


def _out_shapes(n_arrays, shape):
    return [jax.ShapeDtypeStruct(shape, jnp.uint32)] * n_arrays


def _cdiv(a, b):
    return -(-a // b)


def _block_call(body, arrs, rc, interpret, real_rows=None):
    """Per-block kernel over the leading `real_rows` only.

    Inputs are aliased to outputs, so blocks past the real-data prefix (pure
    sentinel padding, which every network stage maps to itself) skip both
    compute and HBM traffic — non-power-of-two sizes stop paying for their
    padding.
    """
    rows_total = arrs[0].shape[0]
    nblocks = rows_total // rc
    if real_rows is not None:
        nblocks = min(nblocks, _cdiv(real_rows, rc))
    spec = pl.BlockSpec((rc, LANES), lambda p: (p, 0), memory_space=pltpu.VMEM)
    n = len(arrs)
    return pl.pallas_call(
        body,
        grid=(nblocks,),
        in_specs=[spec] * n,
        out_specs=[spec] * n,
        out_shape=_out_shapes(n, arrs[0].shape),
        input_output_aliases={i: i for i in range(n)},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=VMEM_LIMIT,
        ),
        interpret=interpret,
    )(*arrs)


def _run_chunk(arrs, C, kv, interpret, real_rows=None):
    rc = C // LANES
    budget = _budget(len(arrs))
    for group in _phase_groups(_log2(C), budget):
        body = functools.partial(
            _chunk_phases_body, C, group[0], group[-1], kv
        )
        arrs = _block_call(
            lambda *refs: body(refs), arrs, rc, interpret, real_rows
        )
    return arrs


def _run_cross(arrs, C, r, kv, interpret, real_rows=None):
    rows_total = arrs[0].shape[0]
    rc = C // LANES
    nblocks = rows_total // rc
    ngroups = nblocks >> r
    if real_rows is not None:
        ngroups = min(ngroups, _cdiv(real_rows, rc << r))
    G = 1 << r
    # power-of-two slice rows >= 8 (Mosaic sublane tiling), sized to a VMEM
    # budget; a full-rc slice is fine when the chunk itself is tiny
    if rc <= 8:
        sr = rc
    else:
        budget_rows = max(8, 4096 // (G * len(arrs)))
        sr = max(8, min(rc, 1 << (budget_rows.bit_length() - 1)))
    arrs3 = [a.reshape(nblocks, rc, LANES) for a in arrs]
    spec = pl.BlockSpec(
        (G, sr, LANES), lambda g, s: (g, s, 0), memory_space=pltpu.VMEM
    )
    n = len(arrs)
    out = pl.pallas_call(
        lambda *refs: _cross_kernel_body(r, kv, refs),
        grid=(ngroups, rc // sr),
        in_specs=[spec] * n,
        out_specs=[spec] * n,
        out_shape=_out_shapes(n, (nblocks, rc, LANES)),
        input_output_aliases={i: i for i in range(n)},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT,
        ),
        interpret=interpret,
    )(*arrs3)
    out = out if isinstance(out, (list, tuple)) else [out]
    return [o.reshape(rows_total, LANES) for o in out]


def _run_local(arrs, C, r, kv, interpret, real_rows=None):
    body = functools.partial(_local_kernel_body, C, r, kv)
    return _block_call(
        lambda *refs: body(refs), arrs, C // LANES, interpret, real_rows
    )


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def _pad_pow2(x, n_padded, fill):
    n = x.shape[0]
    fill = jnp.asarray(fill, dtype=x.dtype)
    if n_padded > n:
        x = jnp.pad(x, (0, n_padded - n), constant_values=fill)
    return x.reshape(n_padded // LANES, LANES)


def _plan(n: int, chunk: int):
    """Padded size and chunk size for an n-element sort."""
    assert chunk >= 2 * LANES and chunk == _next_pow2(chunk), chunk
    np2 = _next_pow2(max(n, 2 * LANES))
    C = min(chunk, np2)
    return np2, C


def _sort_padded(arrs, np2, C, kv, interpret, real_rows=None):
    arrs = _run_chunk(arrs, C, kv, interpret, real_rows)
    nrounds = _log2(np2 // C)
    budget = _budget(len(arrs))
    plan, r_next = _fused_round_plan(C, nrounds, len(arrs), budget)
    for r_lo, r_hi in plan:
        arrs = _run_fused_rounds(arrs, C, r_lo, r_hi, kv, interpret, real_rows)
    for r in range(r_next, nrounds + 1):
        arrs = _run_cross(arrs, C, r, kv, interpret, real_rows)
        arrs = _run_local(arrs, C, r, kv, interpret, real_rows)
    return arrs


def stage_times(keys, chunk: int = 1 << 16, iters: int = 10,
                interpret: bool = False) -> dict:
    """Per-stage seconds — the 15-timestamp analog (reference h.in:39-50).

    The network's stages are chunk (VMEM chunk sort), cross (inter-block
    distances) and local (per-block cleanup); cross+local repeat once per
    merge round. Each stage is timed with the chained-iteration marginal
    method so the environment's fixed dispatch latency (which would dwarf
    sub-ms stages) divides out; the first call per stage compiles a
    chained program (cached persistently thereafter).
    """
    from ..utils.timing import marginal_time

    def time_fn(f, x, iters=iters):
        return marginal_time(f, x, k1=2, k2=12, iters=max(3, iters // 3),
                             min_delta=0.02)

    n = keys.shape[0]
    np2, C = _plan(n, chunk)
    arrs0 = [_pad_pow2(jnp.asarray(keys, jnp.uint32), np2, 0xFFFFFFFF)]
    nrounds = _log2(np2 // C)
    lc = _log2(C)
    # mirror the real pipeline: skip pure-sentinel padding blocks
    rr = _cdiv(n, LANES)

    f_chunk = jax.jit(lambda a: _run_chunk([a], C, 1, interpret, rr)[0])
    t_chunk = time_fn(f_chunk, arrs0[0], iters=iters)
    a = f_chunk(arrs0[0])

    t_cross = t_local = 0.0
    plan, r_next = _fused_round_plan(C, nrounds, 1, MAX_GROUP_STAGES)
    for r_lo, r_hi in plan:
        f_f = jax.jit(
            lambda x, a_=r_lo, b_=r_hi: _run_fused_rounds(
                [x], C, a_, b_, 1, interpret, rr
            )[0]
        )
        t = time_fn(f_f, a, iters=iters)
        # a fused kernel runs both the cross and the local stages of rounds
        # r_lo..r_hi back to back; attribute its time by stage count so the
        # reported split matches what the unfused path would book
        cross_stages = sum(range(r_lo, r_hi + 1))
        local_stages = (r_hi - r_lo + 1) * lc
        t_cross += t * cross_stages / (cross_stages + local_stages)
        t_local += t * local_stages / (cross_stages + local_stages)
        a = f_f(a)
    for r in range(r_next, nrounds + 1):
        f_cross = jax.jit(
            lambda x, r=r: _run_cross([x], C, r, 1, interpret, rr)[0]
        )
        t_cross += time_fn(f_cross, a, iters=iters)
        a = f_cross(a)
        f_local = jax.jit(
            lambda x, r=r: _run_local([x], C, r, 1, interpret, rr)[0]
        )
        t_local += time_fn(f_local, a, iters=iters)
        a = f_local(a)

    return {
        "chunk": t_chunk,
        "cross": t_cross,
        "local": t_local,
        "rounds": nrounds,
    }


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def sort_u32(keys, *, chunk: int = 1 << 16, interpret: bool = False):
    """Ascending sort of uint32 keys via the bitonic network engine."""
    n = keys.shape[0]
    np2, C = _plan(n, chunk)
    arrs = [_pad_pow2(jnp.asarray(keys, jnp.uint32), np2, 0xFFFFFFFF)]
    arrs = _sort_padded(arrs, np2, C, 1, interpret, _cdiv(n, LANES))
    return arrs[0].reshape(-1)[:n]


@functools.partial(
    jax.jit, static_argnames=("chunk", "interpret", "stable")
)
def sort_pairs_u32(keys, values, *, chunk: int = 1 << 16,
                   interpret: bool = False, stable: bool = True):
    """Key-value sort (values ride as a separate 32-bit buffer).

    stable=True (default) matches the reference contract: output equals the
    CPU std::stable_sort-by-key oracle (reference bench/cpu_benchmark.cc:33-49)
    by carrying (key, value, original index) and tie-breaking on index.

    stable=False carries only (key, value) and compares them
    lexicographically — ~1.4x faster (two arrays through every CE stage
    instead of three). The order among equal keys is by ascending value
    (deterministic), not input order. Padding sentinels are the pair
    (0xffffffff, 0xffffffff), the lexicographic maximum, so they sort
    behind every genuine pair and are sliced off.
    """
    n = keys.shape[0]
    np2, C = _plan(n, chunk)
    if not stable:
        arrs = [
            _pad_pow2(jnp.asarray(keys, jnp.uint32), np2, 0xFFFFFFFF),
            _pad_pow2(jnp.asarray(values, jnp.uint32), np2, 0xFFFFFFFF),
        ]
        arrs = _sort_padded(arrs, np2, C, 2, interpret, _cdiv(n, LANES))
        return arrs[0].reshape(-1)[:n], arrs[1].reshape(-1)[:n]
    # pad index entries are a CONSTANT 0x7fffffff: bigger than any real
    # index (so genuine 0xffffffff keys sort ahead of the pad sentinels)
    # and mutually equal, which makes every network stage map pure-sentinel
    # regions to themselves — the skipped-block aliasing relies on that.
    iot = jax.lax.iota(jnp.uint32, np2)
    idx = jnp.where(iot < n, iot, jnp.uint32(0x7FFFFFFF)).reshape(
        np2 // LANES, LANES
    )
    arrs = [
        _pad_pow2(jnp.asarray(keys, jnp.uint32), np2, 0xFFFFFFFF),
        _pad_pow2(jnp.asarray(values, jnp.uint32), np2, 0),
        idx,
    ]
    arrs = _sort_padded(arrs, np2, C, 3, interpret, _cdiv(n, LANES))
    k = arrs[0].reshape(-1)[:n]
    v = arrs[1].reshape(-1)[:n]
    return k, v
