"""Bitonic sort-network engine: the TPU-native hot path.

Why a sorting network and not a literal radix translation: the reference's
downsweep scatters keys through shared memory with per-lane atomics and
ballots (reference: src/shader/downsweep.slang:88-201) — TPU has neither
scatter nor ballots, and microbenchmarks (tools/microbench.py) measured
one-hot-matmul radix ranking at ~1.5 ns/key/subsort while a full
compare-exchange stage over VMEM tiles costs ~2 ps/element. On this
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

Carry modes — what moves through the network, and how (the _Mode tuple):
  keys        (k,)            1 array, min/max stages
  pairs       (k, v)          2 arrays, (k, v) lexicographic — non-stable KV
                              (equal keys emerge value-ascending) and the
                              64-bit-keys (hi, lo) word path
  stable      (k, tie, v)     (k, tie) compared, v rides every stage — the
                              fallback stable KV for n > 2^25
  packed      (k, aux, v)     aux = idx<<7 | lane-origin. (k, aux) compared;
                              the value array sits IDLE through runs of
                              lane-axis stages (elements only move within a
                              128-lane row there) and is realigned by ONE
                              jnp.take_along_axis lane gather per run using
                              the origin bits — stable key-value at close to
                              2-array cost instead of carrying a third array
                              through every stage. Requires n <= 2^25 so
                              (idx, origin) packs into 32 bits.
  w3 / w4     (hi, lo, v[, aux])  the 64-bit key-value variants.

Stability: a lexicographic (key, original-index) total order makes the
network's output exactly the stable-by-key permutation the reference
verifies against std::stable_sort (reference: bench/cpu_benchmark.cc:33-49,
bench/bench.cc:41-64). In packed mode the index occupies aux bits 7..31;
the low 7 origin bits never decide a comparison between genuine elements
(indices are unique), so patching them in-kernel is sound. Values ride as a
separate 32-bit buffer, the reference library's signature design
(reference: README.md:60).

Compile-time discipline: every stage is emitted with *static* roll shifts
(dynamic tpu.dynamic_rotate and lax.fori_loop carries both measured 2-4x
slower per stage), but Mosaic compile time grows superlinearly with ops per
kernel (a single 171-stage key-value kernel stalls it for >25 minutes), so
the chunk network is split into several pallas_call's of at most
~MAX_GROUP_STAGES stages each. The extra HBM round trips per split cost
~0.8 ms each at 2^25 — noise next to the compile-time cliff.

uint32 keys are compared as int32 with the sign bit flipped (Mosaic has no
unsigned vector min/max); the flip is undone on store.
"""

from __future__ import annotations

import functools
import os as _os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ROW_BITS = 7  # log2(LANES)
SIGN = np.int32(-0x80000000)  # plain scalar: jnp module-level arrays would
# be captured as pallas constants
ORIGIN_MASK = np.int32(LANES - 1)
IDX_MASK = np.int32(~(LANES - 1))

# largest n for which (original index << 7 | lane origin) fits 32 bits with
# padding sentinels (0xffffffff) still strictly above every genuine aux:
# at n == 2^25 exactly the padded size equals n, so no sentinels exist and
# the top aux value is free to be used by the last element.
# VRS_MAX_PACKED_N lowers the threshold so the big-n fallback modes
# (MODE_STABLE / MODE_W4_BIG) can be exercised at small n in tests; tests
# may also monkeypatch the module global (use a unique (n, chunk) pair —
# the jit cache is keyed on shapes + static args, not on this global).
# clamped: above 2^25 the aux packing overflows uint32 (idx<<7 wraps and
# can collide with the sentinel), silently corrupting stable KV sorts
MAX_PACKED_N = min(int(_os.environ.get("VRS_MAX_PACKED_N", 1 << 25)),
                   1 << 25)

# stage budget per emitted kernel, by carried-array count (multi-array
# kernels cost ~2-4x the ops per stage so they get proportionally smaller
# budgets). Compile time per kernel grows superlinearly with the budget, but
# with the persistent compilation cache (config.enable_compilation_cache)
# that cost is paid once per kernel shape, so the budgets are env-tunable.
MAX_GROUP_STAGES = int(_os.environ.get("VRS_MAX_GROUP_STAGES", 96))
MAX_GROUP_STAGES_KV = int(_os.environ.get("VRS_MAX_GROUP_STAGES_KV", 40))
MAX_GROUP_STAGES_PAIRS = int(_os.environ.get("VRS_MAX_GROUP_STAGES_PAIRS", 64))
MAX_GROUP_STAGES_W4 = int(_os.environ.get("VRS_MAX_GROUP_STAGES_W4", 30))

# Transposed-layout optimization: stages on flat-index bits 0..6 are
# lane-axis exchanges in the natural (rows, 128) layout, and the CE-chain
# floor probe (tools/probes/ce_floor.py) measured lane stages at 3.76
# ps/elem vs 1.76 for sublane (row-distance) stages. A 128x128 tile
# transpose swaps lane bits 0-6 with row bits 7-13, so executing each
# run's bits 6..0 tail in the T layout turns those 154-of-325 stages into
# cheap sublane exchanges, at the price of two in-kernel tile transposes
# per run. (An earlier experiment converted in the OPPOSITE direction —
# bits 7..13 to lane — on inverted stage-cost measurements and regressed
# keys 24.7 -> 38.4 ms; tools/probes/probe_transpose_slope.py prices the
# in-kernel transpose itself.) Requires blocks of >= 128 rows (C >= 2^14).
# Default ON since the round-3 chip window: keys 24.18 -> 14.53 ms and
# kvns 49.7 -> 32.3 ms at 2^25 with the unrolled lowering, bitwise
# verified (bench_results/chip_queue.log, docs/PERFORMANCE.md round 3).
TRANSPOSE_OPT = _os.environ.get("VRS_TRANSPOSE", "1") == "1"
# phases whose head (bits >= 7) is at most this many stages skip the
# round-trip to N and lane-execute the head in T: two tile transposes
# cost more than that few +2 ps/stage lane penalties
T_STAY = int(_os.environ.get("VRS_T_STAY", 1))
# which carry families the T layout applies to: "all" (default) includes
# the riding-value modes, "noride" excludes them. The packed-lazy carry
# profits from LANE stages (the value idles through them and pays one
# gather per run), so all-sublane execution looked like a keys-shaped
# trade — but the chip A/B says the cheap sublane value moves win:
# stable kv at 2^25 is 46.8 ms under "all" vs 60.4 under "noride", both
# bitwise-verified (bench_results/chip_queue.log r4_kv_all / round 3
# t_kv_unrolled). Non-lazy ride carries (MODE_STABLE / MODE_W4_BIG) move
# the value on every stage either way, so T is a pure win there.
T_MODES = _os.environ.get("VRS_T_MODES", "all")
# tile-transpose lowering: "batched" = one (G,128,128) jnp.transpose,
# "unrolled" = G static per-tile 2D transposes + concatenate. Mosaic
# lowers these very differently (the batched form measured ~17x worse
# than a single-tile transpose in the round-2 HBM-pass probe geometry);
# pick per tools/probes/probe_transpose_slope.py on the target chip
# generation. Default unrolled: the lowering behind the measured
# round-3 keys/kvns wins (in-kernel slopes 0.84 vs 0.83 ps/elem are a
# wash, but only unrolled was A/B'd end-to-end on chip).
T_IMPL = _os.environ.get("VRS_T_IMPL", "unrolled")
# single-array (keys) CE formulation: "dep" rolls the pair-max back by +sh
# after the min/max (one roll on the stage's critical tail), "indep" uses
# the identity max(x[i], x[i-sh]) == max(x, roll(x,+sh))[i] so both rolls
# are independent of the min/max and can overlap (tools/probes/
# ce_variants.py prices the two on the target chip). Same op count either
# way; multi-word carries keep "dep" — "indep" would need the i1 lex
# decision vector at both +sh and -sh alignments (a second full compare).
# Default "indep": wins on BOTH axes in the per-stage probes (lane 3.29
# vs 3.49, sublane 1.31 vs 1.46 ps/elem) and end-to-end under the T
# layout on chip — keys 14.03 vs 14.70 ms at 2^25, bitwise-verified
# (bench_results/chip_queue.log r5_keys_ce_indep vs r5_bench_defaults).
CE_IMPL = _os.environ.get("VRS_CE_IMPL", "indep")
# multi-word-carry CE formulation. "dep" (round-1 form) rolls each array's
# lex-high back by +sh after the shared compare decides it — na rolls on
# the stage's critical tail. "indep" computes the lex decision at BOTH
# alignments (partners p = roll(a,-sh) for the up slots, q = roll(a,+sh)
# for the down slots; roll(lt,+sh) == lt2 by construction, but i1 vectors
# can't be rolled cheaply so lt2 is a second compare chain) — one extra
# (2*ncmp-1)-op chain per stage buys every roll off the critical path,
# the same trade the keys probe priced at 1.31 vs 1.46 ps/elem/stage.
# Chip-REFUTED for multi-word carries (chip_queue.log r5d_ce_multi_*,
# 2^25, all bitwise-verified): kv 46.7->50.5 ms, kvns 32.3->34.8,
# u64kv 66.8->74.3 — the second compare chain costs more than the rolls
# it hides once ncmp>1 (the keys win came from ncmp=1, where min/max
# replaces BOTH selects and there is no second chain). "dep" stays.
CE_MULTI = _os.environ.get("VRS_CE_MULTI", "dep")


def _budget(na: int) -> int:
    return {1: MAX_GROUP_STAGES, 2: MAX_GROUP_STAGES_PAIRS,
            3: MAX_GROUP_STAGES_KV, 4: MAX_GROUP_STAGES_W4}[na]

# scoped-VMEM ceiling per kernel: the Mosaic default (16 MB) is far below
# the chip's physical VMEM (128 MB on v5e) and the unrolled network keeps
# several live block-sized temporaries
VMEM_LIMIT = 100 * 1024 * 1024


class _Mode(NamedTuple):
    """Static description of a carry: `words` lexicographically-compared
    arrays (most significant first), optionally one riding (non-compared)
    value array, optionally lazy (value idles through lane-stage runs,
    realigned by a lane gather via origin bits in words[-1] & 127)."""

    words: int
    ride: bool
    lazy: bool

    @property
    def n_arrays(self) -> int:
        return self.words + (1 if self.ride else 0)


MODE_KEYS = _Mode(1, False, False)
MODE_PAIRS = _Mode(2, False, False)     # non-stable kv / u64 keys
MODE_STABLE = _Mode(2, True, False)     # (k, idx, v) — fallback stable kv
MODE_PACKED = _Mode(2, True, True)      # (k, aux, v) — fast stable kv
MODE_W3 = _Mode(3, False, False)        # (hi, lo, v) — non-stable u64 kv
MODE_W4 = _Mode(3, True, True)          # (hi, lo, aux, v) — stable u64 kv
MODE_W4_BIG = _Mode(3, True, False)     # (hi, lo, idx, v) — n > 2^25

MODE_NAMES = {
    MODE_KEYS: "keys",
    MODE_PAIRS: "pairs",
    MODE_STABLE: "stable",
    MODE_PACKED: "packed",
    MODE_W3: "w3",
    MODE_W4: "w4",
    MODE_W4_BIG: "w4_big",
}


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


def _ce(arrs, ncmp, axis, sh, up):
    """One ASCENDING compare-exchange at roll distance sh along axis.

    The first `ncmp` arrays are compared lexicographically; all arrays move
    by the shared decision. Directions are handled outside via the negation
    trick: descending regions run with bitwise-NOTed compared words, so
    every stage is a plain ascending exchange — cheaper than per-stage
    direction selects.
    """
    if len(arrs) == 1:
        (x,) = arrs
        if CE_IMPL == "indep":
            # both rolls independent of the min/max — the VPU can overlap
            # them (variant B, tools/probes/ce_variants.py)
            lo = jnp.minimum(x, _roll(x, -sh, axis=axis))
            hi = jnp.maximum(x, _roll(x, sh, axis=axis))
            return (jnp.where(up, lo, hi),)
        pm = _roll(x, -sh, axis=axis)  # partner for 'up' slots: x[i+j]
        mn = jnp.minimum(x, pm)
        mx = jnp.maximum(x, pm)
        return (jnp.where(up, mn, _roll(mx, sh, axis=axis)),)

    partners = [_roll(a, -sh, axis=axis) for a in arrs]
    # partner-sorts-first, built least-significant word up; stays a bool
    # vector (i1) throughout — it is selected with, never rolled
    lt = partners[ncmp - 1] < arrs[ncmp - 1]
    for i in range(ncmp - 2, -1, -1):
        lt = (partners[i] < arrs[i]) | ((partners[i] == arrs[i]) & lt)

    if CE_MULTI == "indep":
        # down slot j pairs with a[j-sh] = q[j]; its decision is
        # roll(lt, +sh)[j] == (a[j] <lex a[j-sh]), recomputed as a second
        # chain (lt2) so no roll ever waits on a compare
        qs = [_roll(a, sh, axis=axis) for a in arrs]
        lt2 = arrs[ncmp - 1] < qs[ncmp - 1]
        for i in range(ncmp - 2, -1, -1):
            lt2 = (arrs[i] < qs[i]) | ((arrs[i] == qs[i]) & lt2)
        out = []
        for i, (a, p, q) in enumerate(zip(arrs, partners, qs)):
            if i == 0:
                lo = jnp.minimum(a, p)
                hi = jnp.maximum(a, q)
            else:
                lo = jnp.where(lt, p, a)
                hi = jnp.where(lt2, q, a)
            out.append(jnp.where(up, lo, hi))
        return tuple(out)

    out = []
    for i, (a, p) in enumerate(zip(arrs, partners)):
        if i == 0:
            # the most significant word's pair-min/max are plain min/max
            # (ties make lo == hi == a == p, so the lex decision is moot)
            lo = jnp.minimum(a, p)
            hi = jnp.maximum(a, p)
        else:
            lo = jnp.where(lt, p, a)
            hi = jnp.where(lt, a, p)
        # up slot i keeps the pair's lex-low; down slot i+sh gets the high
        out.append(jnp.where(up, lo, _roll(hi, sh, axis=axis)))
    return tuple(out)


def _tile_T(x):
    """128x128 tile transpose of a (R, 128) array (R a multiple of 128):
    swaps flat-index bits 0-6 (lanes) with bits 7-13 (low row bits).
    Lowering selected by VRS_T_IMPL (see probe_transpose_slope.py)."""
    R = x.shape[0]
    if T_IMPL == "unrolled":
        parts = [x[t * LANES:(t + 1) * LANES, :].T for t in range(R // LANES)]
        return jnp.concatenate(parts, axis=0)
    return jnp.transpose(
        x.reshape(R // LANES, LANES, LANES), (0, 2, 1)
    ).reshape(R, LANES)


class _Carry:
    """In-kernel array carrier implementing a mode's compare/motion rules.

    Owns the flipped compared words and the riding value (if any), tracks
    whether the value is lazily deferred, and emits the origin-tag
    bookkeeping (refresh on entering a lane run, lane gather on leaving it)
    for packed modes.

    Layout: 'N' is the natural (rows, 128) layout; 'T' is the 128x128
    tile-transposed layout where flat-index bits 7..13 live on the lane
    axis (and bits 0..6 on the low row bits) — stage_bit() maps any flat
    bit to the right (axis, distance) for the current layout, so the
    bodies just declare which layout each run should execute in.
    """

    def __init__(self, mode: _Mode, refs):
        self.mode = mode
        self.words = [_flip(refs[i][:]) for i in range(mode.words)]
        self.ride = (
            jax.lax.bitcast_convert_type(refs[mode.words][:], jnp.int32)
            if mode.ride
            else None
        )
        self.lazy_active = False
        self.layout = "N"

    # -- layouts -----------------------------------------------------------

    def can_transpose(self) -> bool:
        shape = self.words[0].shape
        return (
            TRANSPOSE_OPT
            and (T_MODES == "all" or not self.mode.ride)
            and len(shape) == 2
            and shape[0] % LANES == 0
            and shape[1] == LANES
        )

    def ensure_layout(self, layout: str):
        if layout == self.layout:
            return
        self.sync()  # origin tags are layout-relative
        self.words = [_tile_T(w) for w in self.words]
        if self.mode.ride:
            self.ride = _tile_T(self.ride)
        self.layout = layout

    def _bit_axis(self, b: int):
        """(axis, distance-along-axis, iota-dim) for a flat-index bit in
        the current layout."""
        if self.layout == "N":
            if b < ROW_BITS:
                return 1, 1 << b
            return 0, 1 << (b - ROW_BITS)
        if ROW_BITS <= b < 2 * ROW_BITS:
            return 1, 1 << (b - ROW_BITS)
        if b < ROW_BITS:
            return 0, 1 << b
        return 0, 1 << (b - ROW_BITS)

    def bit_m32(self, b: int):
        """int32 mask: -1 where flat-index bit b is set (current layout),
        built with two shifts (arithmetic broadcast of the bit)."""
        shape = self.words[0].shape
        axis, d = self._bit_axis(b)
        t = _log2(d)
        i = _iota(shape, axis)
        return (i << (31 - t)) >> 31

    # -- negation (direction regions) ------------------------------------

    def negate(self, m32):
        """XOR the compared words with a -1/0 int32 mask (array or scalar).

        In lazy modes the tiebreak word's low 7 bits hold the origin tag,
        which must survive negation untouched; masking them out of the
        negation is sound because those bits never decide a comparison
        between genuine elements (indices are unique in bits 7..31).
        """
        ws = self.words
        for i in range(len(ws)):
            if self.mode.lazy and i == len(ws) - 1:
                ws[i] = ws[i] ^ (m32 & IDX_MASK)
            else:
                ws[i] = ws[i] ^ m32

    # -- lazy-value bookkeeping ------------------------------------------

    def _go_lazy(self):
        if self.lazy_active or not (self.mode.lazy and self.mode.ride):
            return
        shape = self.words[0].shape
        iota = _iota(shape, len(shape) - 1)
        self.words[-1] = (self.words[-1] & IDX_MASK) | iota
        self.lazy_active = True

    def sync(self):
        """Realign the riding value with the elements: one 128-lane gather
        using the origin tags accumulated since the last refresh."""
        if not self.lazy_active:
            return
        origin = self.words[-1] & ORIGIN_MASK
        self.ride = jnp.take_along_axis(self.ride, origin, axis=-1)
        self.lazy_active = False

    def _active(self, with_ride: bool):
        if self.mode.ride and with_ride:
            return self.words + [self.ride]
        return list(self.words)

    def _put(self, arrs, with_ride: bool):
        self.words = list(arrs[: self.mode.words])
        if self.mode.ride and with_ride:
            self.ride = arrs[-1]

    # -- stages -----------------------------------------------------------

    def stage_bit(self, b: int):
        """Ascending CE stage pairing flat indices differing in bit b, in
        whatever layout is current."""
        axis, d = self._bit_axis(b)
        if axis == 1:
            self.stage_lane(d)
        else:
            self.stage_rows(d)

    def stage(self, j: int):
        """Ascending CE stage at distance j over the row-major flat index
        of a (rows, LANES) layout (natural-layout callers)."""
        assert self.layout == "N"
        if j < LANES:
            self.stage_lane(j)
        else:
            self.stage_rows(j // LANES)

    def stage_lane(self, sh: int):
        lazy = self.mode.lazy and self.mode.ride
        if lazy:
            self._go_lazy()
        arrs = self._active(with_ride=not lazy)
        shape = arrs[0].shape
        up = (_iota(shape, len(shape) - 1) & sh) == 0
        out = _ce(arrs, self.mode.words, len(shape) - 1, sh, up)
        self._put(out, with_ride=not lazy)

    def stage_rows(self, d: int):
        """Exchange at distance d along the leading (row or block) axis —
        elements change rows, so the riding value must move along."""
        self.sync()
        arrs = self._active(with_ride=True)
        shape = arrs[0].shape
        up = (_iota(shape, 0) & d) == 0
        out = _ce(arrs, self.mode.words, 0, d, up)
        self._put(out, with_ride=True)

    def cross_run(self, G: int, rc: int, r: int):
        """All cross stages of merge round r (block distances 2^(r-1)..1)
        on the (G*rc, LANES) arrays viewed as (G, rc, LANES)."""
        self.ensure_layout("N")
        self.sync()
        arrs = [a.reshape(G, rc, LANES) for a in self._active(True)]
        shape = arrs[0].shape
        for t in range(r - 1, -1, -1):
            d = 1 << t
            up = (_iota(shape, 0) & d) == 0
            arrs = list(_ce(arrs, self.mode.words, 0, d, up))
        self._put([a.reshape(G * rc, LANES) for a in arrs], True)

    # -- load/store --------------------------------------------------------

    def store(self, refs):
        self.ensure_layout("N")
        self.sync()
        na = self.mode.n_arrays
        outs = refs[-na:]
        for i, w in enumerate(self.words):
            outs[i][:] = _unflip(w)
        if self.mode.ride:
            outs[na - 1][:] = jax.lax.bitcast_convert_type(
                self.ride, jnp.uint32
            )


# --------------------------------------------------------------------------
# chunk network: phases pk_lo..pk_hi of the bitonic sort of one chunk
# --------------------------------------------------------------------------


def _chunk_phases_body(C, pk_lo, pk_hi, mode, refs, pid=None):
    c = _Carry(mode, refs)
    if pid is None:
        pid = pl.program_id(0)
    lc = _log2(C)

    def mask_of(spec):
        # direction-mask specs are rebuilt in the *current* layout at
        # negate time (a stored mask array from another layout would be
        # misplaced); scalars are layout-independent
        if spec is None:
            return jnp.int32(0)
        kind, v = spec
        return v if kind == "scalar" else c.bit_m32(v)

    prev = None
    for pk in range(pk_lo, pk_hi + 1):
        if pk == lc:
            # final phase: direction is bit log2(C) of the global index,
            # i.e. chunk parity — even chunks ascend, odd descend.
            cur = ("scalar", _scalar_m32((pid & 1) == 1))
        else:
            cur = ("bit", pk)
        use_t = c.can_transpose()
        if use_t:
            # bits >= ROW_BITS are sublane in N, bits < ROW_BITS are
            # sublane in T; a short head lane-executes in T instead of
            # paying a transpose round trip to N
            head = max(0, pk - ROW_BITS)
            c.ensure_layout("N" if head > T_STAY else "T")
        # enter this phase's negation (XOR transitions compose)
        c.negate(mask_of(cur) ^ mask_of(prev))
        for pj in range(pk - 1, -1, -1):
            if use_t and pj == ROW_BITS - 1 and c.layout == "N":
                c.ensure_layout("T")
            c.stage_bit(pj)
        prev = cur
    c.ensure_layout("N")
    c.negate(mask_of(prev))  # restore
    c.store(refs)


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


def _cross_kernel_body(r, mode, refs, pid=None):
    """refs blocks are (G=2^r, SR, 128); stage distances are along dim 0.

    `pid` lets the validity gate (_gate_body) hoist program_id out of its
    pl.when branch — the interpret lowering has no program_id rule inside
    control flow."""
    c = _Carry(mode, refs)
    G = c.words[0].shape[0]
    assert G == 1 << r
    if pid is None:
        pid = pl.program_id(0)
    # bit log2(C)+r of the global index = group parity, scalar
    m = _scalar_m32((pid & 1) == 1)
    c.negate(m)
    for t in range(r - 1, -1, -1):
        c.stage_rows(1 << t)
    c.negate(m)
    c.store(refs)


# --------------------------------------------------------------------------
# local kernel: distances < C for merge round r (per-block cleanup)
# --------------------------------------------------------------------------


def _local_kernel_body(C, r, mode, refs, pid=None):
    c = _Carry(mode, refs)
    if pid is None:
        pid = pl.program_id(0)
    # bit log2(C)+r of the global index, scalar per block
    m = _scalar_m32(((pid >> r) & 1) == 1)
    lc = _log2(C)
    use_t = c.can_transpose()
    c.negate(m)  # scalar masks are layout-independent
    for pj in range(lc - 1, -1, -1):
        if use_t and pj == ROW_BITS - 1 and c.layout == "N":
            c.ensure_layout("T")
        c.stage_bit(pj)
    c.ensure_layout("N")
    c.negate(m)
    c.store(refs)


# --------------------------------------------------------------------------
# fused round kernel: cross + local in one pass when the whole 2^r-block
# group fits VMEM — halves the round's HBM traffic
# --------------------------------------------------------------------------


def _fused_rounds_body(C, r_lo, r_hi, mode, refs, pid=None):
    """Merge rounds r_lo..r_hi in one pass over a 2^r_hi-block group.

    A group of 2^g aligned blocks contains every pair interaction of rounds
    r <= g, so all of those rounds' cross AND local stages run back-to-back
    on the VMEM-resident group — one HBM round trip for g rounds instead of
    up to 2g.
    """
    c = _Carry(mode, refs)  # (G*rc, LANES), one whole group
    if pid is None:
        pid = pl.program_id(0)
    G = 1 << r_hi
    rows = c.words[0].shape[0]
    rc = rows // G
    lc = _log2(C)
    use_t = c.can_transpose()

    def mask_of(spec):
        if spec is None:
            return jnp.int32(0)
        kind, v = spec
        return v if kind == "scalar" else c.bit_m32(v)

    prev = None
    for r in range(r_lo, r_hi + 1):
        # direction of round r = bit log2(C)+r of the global index. Block
        # B = g*2^r_hi + b: for r < r_hi that is bit r of b (varies within
        # the group, a row mask); for r = r_hi it is the group parity.
        if r == r_hi:
            cur = ("scalar", _scalar_m32((pid & 1) == 1))
        else:
            cur = ("bit", lc + r)  # group-flat bit, layout-aware
        # masks are (re)built in the N layout: each round is forced there
        # (the previous round's low-bit run ends in T; cross_run needs N)
        c.ensure_layout("N")
        c.negate(mask_of(cur) ^ mask_of(prev))

        # cross stages of round r: block distances 2^(r-1)..1
        c.cross_run(G, rc, r)

        # local stages: distance masks depend only on (index mod C),
        # identical across the C-aligned sub-blocks of the group
        for pj in range(lc - 1, -1, -1):
            if use_t and pj == ROW_BITS - 1 and c.layout == "N":
                c.ensure_layout("T")
            c.stage_bit(pj)
        prev = cur

    c.ensure_layout("N")
    c.negate(mask_of(prev))
    c.store(refs)


# rows-per-array ceiling for a fused group (VMEM holds in+out double
# buffers plus a few live network temporaries per array; 12288 leaves
# headroom for the lo/hi CE formulation's extra live temps — 16384
# overflowed the 100M scoped-VMEM budget on the 2-array fused kernel)
MAX_FUSED_ROWS = int(_os.environ.get("VRS_MAX_FUSED_ROWS", 12288))

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


def _run_fused_rounds(arrs, C, r_lo, r_hi, mode, interpret, real_rows=None,
                      valid=None):
    body = functools.partial(_fused_rounds_body, C, r_lo, r_hi, mode)
    rc_super = (1 << r_hi) * (C // LANES)
    return _block_call(
        lambda *refs, pid=None: body(refs, pid), arrs, rc_super, interpret,
        real_rows, valid,
    )


# --------------------------------------------------------------------------
# driver
# --------------------------------------------------------------------------


def _out_shapes(n_arrays, shape):
    return [jax.ShapeDtypeStruct(shape, jnp.uint32)] * n_arrays


def _cdiv(a, b):
    return -(-a // b)


def _gate_body(body, n):
    """Wrap a kernel body with an SMEM validity gate: grid steps whose
    region is pure fill (valid[p] == 0) copy in->out instead of running
    the CE network. Sound because every network stage maps an all-equal
    region to itself — fill tuples are the lexicographic maximum and the
    multi-word compare separates them exactly from genuine elements, so
    a zero-count region really is all-fill (for keys, genuine 0xFFFFFFFF
    elements may stand in for fills, but then the region is constant and
    the copy is still value-identical)."""

    def wrapped(*refs):
        ins, vref, outs = refs[:n], refs[n], refs[n + 1:]
        # program_id is hoisted OUT of the pl.when branches (the interpret
        # lowering lacks a program_id rule inside control flow) and passed
        # into the body as a value
        pid = pl.program_id(0)
        v = vref[pid] != 0

        @pl.when(v)
        def _():
            body(*ins, *outs, pid=pid)

        @pl.when(jnp.logical_not(v))
        def _():
            for i, o in zip(ins, outs):
                o[:] = i[:]

    return wrapped


# Manual-DMA gating for valid-gated per-block kernels: skip the HBM round
# trip of gated blocks entirely (the BlockSpec auto-pipeline always DMAs
# every grid step; with in->out aliasing a gated block is already correct
# in place, so the only way to not pay its bandwidth is to own the DMAs).
# Round 4 measured the SERIAL manual variant slower than the auto-pipeline
# (5.67 vs 5.37 ms — skipped fill bandwidth < lost copy/compute overlap);
# this is the round-5 double-buffered rewrite: two VMEM slots per array,
# block p+1's input DMA is issued before block p's compute, so live-block
# copies overlap compute again while gated blocks still move zero bytes.
# Default ON since the chip A/B at the v5e-16 slot geometry: slot merge
# 5.22 ms vs 5.49 with the BlockSpec auto-pipeline, keys+pairs bitwise-
# verified (bench_results/chip_queue.log r5_merge_dmagate2 vs
# r5_merge_base). Only slot-merge kernels route here (valid mask, no
# real_rows prefix), so the single-chip sort paths are unaffected.
DMA_GATE = _os.environ.get("VRS_DMA_GATE", "1") == "1"


def _block_call_dma_gated(body, arrs, rc, interpret, valid, real_rows=None):
    """Valid-gated per-block kernel that skips BOTH the stage network and
    the HBM round trip for gated blocks.

    Inputs/outputs live in ANY (HBM) memory space, aliased in->out; each
    live grid step DMAs its block into VMEM scratch, runs the network on
    the scratch refs (read-before-write, so passing the same refs as in
    and out is sound), and DMAs it back. Gated blocks move zero bytes —
    the distributed slot-merge's fill blocks (~half the buffer at slack
    2) stop costing bandwidth, which is the binding resource there
    (docs/SCALING_PROJECTION.md round-4 note)."""
    if real_rows is not None:
        # Enforced here, not only at _block_call's routing guard (ADVICE
        # r4): this kernel runs every block the valid mask allows and has
        # no prefix clip — a caller passing real_rows would silently get
        # full coverage instead of the clipped grid it asked for.
        raise NotImplementedError(
            "_block_call_dma_gated does not support real_rows; use the "
            "BlockSpec path (_block_call with DMA_GATE off)")
    rows_total = arrs[0].shape[0]
    nblocks = rows_total // rc
    n = len(arrs)

    def kernel(vref, *refs):
        ins, outs = refs[:n], refs[n: 2 * n]
        scratch = refs[2 * n: 3 * n]         # n x VMEM (2, rc, LANES)
        in_sems, out_sems = refs[3 * n], refs[3 * n + 1]  # DMA (2, n)
        p = pl.program_id(0)

        def in_copy(idx, i):
            # slot = block-index parity; each slot has at most one
            # outstanding copy per direction (see the step schedule below)
            return pltpu.make_async_copy(
                ins[i].at[pl.ds(idx * rc, rc)],
                scratch[i].at[idx % 2],
                in_sems.at[idx % 2, i],
            )

        def out_copy(idx, i):
            return pltpu.make_async_copy(
                scratch[i].at[idx % 2],
                outs[i].at[pl.ds(idx * rc, rc)],
                out_sems.at[idx % 2, i],
            )

        def live(idx):
            # clamped SMEM read so idx = -1 / nblocks probes stay in
            # bounds; callers AND the result with the range check
            return vref[jnp.clip(idx, 0, nblocks - 1)] != 0

        # Step schedule (double-buffered): in(p) was started at step p-1
        # (or in the p==0 preamble); out(p) is drained at step p+1, which
        # frees slot (p+1) % 2 == (p-1) % 2 BEFORE in(p+1) refills it.
        @pl.when((p == 0) & live(p))
        def _():
            for i in range(n):
                in_copy(p, i).start()

        @pl.when((p > 0) & live(p - 1))
        def _():
            for i in range(n):
                out_copy(p - 1, i).wait()

        @pl.when((p + 1 < nblocks) & live(p + 1))
        def _():
            for i in range(n):
                in_copy(p + 1, i).start()

        @pl.when(live(p))
        def _():
            for i in range(n):
                in_copy(p, i).wait()
            slot = p % 2
            cur = [scratch[i].at[slot] for i in range(n)]
            body(*cur, *cur, pid=p)
            for i in range(n):
                out_copy(p, i).start()

        @pl.when((p == nblocks - 1) & live(p))
        def _():
            for i in range(n):
                out_copy(p, i).wait()

    return pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * n,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n,
        out_shape=_out_shapes(n, arrs[0].shape),
        input_output_aliases={i + 1: i for i in range(n)},
        scratch_shapes=[pltpu.VMEM((2, rc, LANES), jnp.uint32)] * n
        + [pltpu.SemaphoreType.DMA((2, n))] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=VMEM_LIMIT,
        ),
        interpret=interpret,
    )(valid.astype(jnp.int32), *arrs)


def _block_call(body, arrs, rc, interpret, real_rows=None, valid=None):
    """Per-block kernel over the leading `real_rows` only.

    Inputs are aliased to outputs, so blocks past the real-data prefix (pure
    sentinel padding, which every network stage maps to itself) skip both
    compute and HBM traffic — non-power-of-two sizes stop paying for their
    padding. `valid` ((nblocks,) int32) additionally gates INTERSPERSED
    fill blocks (the slot-merge path) to a cheap VMEM copy — they still
    pay the HBM round trip, but not the stage network (unless VRS_DMA_GATE
    routes them through the manual-DMA kernel, which skips both).
    """
    if valid is not None and real_rows is None and DMA_GATE:
        return _block_call_dma_gated(body, arrs, rc, interpret, valid)
    rows_total = arrs[0].shape[0]
    nblocks = rows_total // rc
    if real_rows is not None:
        nblocks = min(nblocks, _cdiv(real_rows, rc))
    spec = pl.BlockSpec((rc, LANES), lambda p: (p, 0), memory_space=pltpu.VMEM)
    n = len(arrs)
    in_specs = [spec] * n
    call_args = list(arrs)
    if valid is not None:
        in_specs = in_specs + [pl.BlockSpec(memory_space=pltpu.SMEM)]
        call_args.append(valid.astype(jnp.int32))
        body = _gate_body(body, n)
    return pl.pallas_call(
        body,
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=[spec] * n,
        out_shape=_out_shapes(n, arrs[0].shape),
        input_output_aliases={i: i for i in range(n)},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=VMEM_LIMIT,
        ),
        interpret=interpret,
    )(*call_args)


def _run_chunk(arrs, C, mode, interpret, real_rows=None, valid=None):
    rc = C // LANES
    budget = _budget(mode.n_arrays)
    for group in _phase_groups(_log2(C), budget):
        body = functools.partial(
            _chunk_phases_body, C, group[0], group[-1], mode
        )
        arrs = _block_call(
            lambda *refs, pid=None: body(refs, pid), arrs, rc, interpret,
            real_rows, valid,
        )
    return arrs


def _run_cross(arrs, C, r, mode, interpret, real_rows=None, valid=None):
    rows_total = arrs[0].shape[0]
    rc = C // LANES
    nblocks = rows_total // rc
    ngroups = nblocks >> r
    if real_rows is not None:
        ngroups = min(ngroups, _cdiv(real_rows, rc << r))
    G = 1 << r
    # power-of-two slice rows >= 8 (Mosaic sublane tiling), sized to a VMEM
    # budget; a full-rc slice is fine when the chunk itself is tiny
    n = len(arrs)
    if rc <= 8:
        sr = rc
    else:
        budget_rows = max(8, 4096 // (G * n))
        sr = max(8, min(rc, 1 << (budget_rows.bit_length() - 1)))
    arrs3 = [a.reshape(nblocks, rc, LANES) for a in arrs]
    spec = pl.BlockSpec(
        (G, sr, LANES), lambda g, s: (g, s, 0), memory_space=pltpu.VMEM
    )
    body = (lambda *refs, pid=None:
            _cross_kernel_body(r, mode, refs, pid))  # noqa: E731
    in_specs = [spec] * n
    call_args = list(arrs3)
    if valid is not None:  # (ngroups,) group validity, SMEM-gated
        in_specs = in_specs + [pl.BlockSpec(memory_space=pltpu.SMEM)]
        call_args.append(valid.astype(jnp.int32))
        body = _gate_body(body, n)
    out = pl.pallas_call(
        body,
        grid=(ngroups, rc // sr),
        in_specs=in_specs,
        out_specs=[spec] * n,
        out_shape=_out_shapes(n, (nblocks, rc, LANES)),
        input_output_aliases={i: i for i in range(n)},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT,
        ),
        interpret=interpret,
    )(*call_args)
    out = out if isinstance(out, (list, tuple)) else [out]
    return [o.reshape(rows_total, LANES) for o in out]


def _run_local(arrs, C, r, mode, interpret, real_rows=None, valid=None):
    body = functools.partial(_local_kernel_body, C, r, mode)
    return _block_call(
        lambda *refs, pid=None: body(refs, pid), arrs, C // LANES,
        interpret, real_rows, valid,
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


def _sort_padded(arrs, np2, C, mode, interpret, real_rows=None, count=None):
    """Full network over the padded arrays. `count` (traced scalar) gates
    grid steps whose whole region lies past the live prefix — the analog
    of the reference's indirect-dispatch early exit (upsweep.slang:20-22):
    entries >= count are constant (max key, max tiebreak), every stage
    maps an all-tied region to itself (the lex CE resolves ties to the
    identity exchange even when riding values differ), so those steps
    copy through instead of running the stage network.

    Skip granularity invariant (the round-3 chip bug at np2=2^26): once
    merge round r's CROSS stages run on the group containing the genuine
    boundary, a DESCENDING boundary group moves genuine elements to its
    TRAILING blocks — past the naive per-block prefix clip. Every skip
    decision after the chunk phase must therefore be made at the round's
    GROUP granularity (2^r blocks), never per block: genuine data is
    confined to [0, group-ceil(boundary)) at all times (cross moves data
    only within groups, and the boundary group of round r+1 contains the
    boundary group of round r), so group-ceiled local coverage restores
    bitwise equality with the unskipped network. Fused kernels already
    work at 2^r_hi-group granularity. Validated by exhaustive shape sweep
    (group-ceil: 0/168 ragged-shape failures vs 136/168 for the per-block
    clip) and on-chip at n = 2^25 + 4096."""

    def prefix_valid(unit):
        if count is None:
            return None
        k = np2 // unit
        starts = jnp.arange(k, dtype=jnp.uint32) * jnp.uint32(unit)
        return (starts < jnp.asarray(count, jnp.uint32)).astype(jnp.int32)

    def group_valid(r):
        # per-C-block validity at 2^r-group granularity: a block is live
        # iff its round-r group starts before the live prefix
        if count is None:
            return None
        k = np2 // C
        gstart = ((jnp.arange(k, dtype=jnp.uint32) >> r) << r) * jnp.uint32(C)
        return (gstart < jnp.asarray(count, jnp.uint32)).astype(jnp.int32)

    def group_rows(r):
        # real_rows rounded up to the round's group granularity
        if real_rows is None:
            return None
        unit = (C << r) // LANES
        return _cdiv(real_rows, unit) * unit

    arrs = _run_chunk(arrs, C, mode, interpret, real_rows, prefix_valid(C))
    nrounds = _log2(np2 // C)
    budget = _budget(mode.n_arrays)
    plan, r_next = _fused_round_plan(C, nrounds, mode.n_arrays, budget)
    for r_lo, r_hi in plan:
        arrs = _run_fused_rounds(arrs, C, r_lo, r_hi, mode, interpret,
                                 real_rows, prefix_valid(C << r_hi))
    for r in range(r_next, nrounds + 1):
        arrs = _run_cross(arrs, C, r, mode, interpret, real_rows,
                          prefix_valid(C << r))
        arrs = _run_local(arrs, C, r, mode, interpret, group_rows(r),
                          group_valid(r))
    return arrs


def _packed_aux(n, np2, count=None):
    """aux = original index << 7 (origin field 0), sentinel 0xffffffff.

    Genuine aux tops out below 0xffffff80 for n < 2^25 and no padding
    exists at n == 2^25, so sentinels always sort strictly last. With a
    (traced) count, entries past the live prefix also take the sentinel
    aux — making count-masked regions CONSTANT so the prefix gate can
    skip them (their output order is irrelevant: the caller restores the
    tail from the input)."""
    iot = jax.lax.iota(jnp.uint32, np2)
    live = jnp.uint32(n) if count is None else jnp.minimum(
        jnp.asarray(count, jnp.uint32), jnp.uint32(n)
    )
    aux = jnp.where(
        iot < live, iot << ROW_BITS, jnp.uint32(0xFFFFFFFF)
    )
    return aux.reshape(np2 // LANES, LANES)


def _stable_idx(n, np2, count=None):
    """Fallback tiebreak for n > 2^25: the plain original index. Pad
    entries are a CONSTANT 0x7fffffff: bigger than any real index (so
    genuine 0xffffffff keys sort ahead of the pad sentinels) and mutually
    equal, which makes every network stage map pure-sentinel regions to
    themselves — the skipped-block aliasing relies on that. count= as in
    _packed_aux."""
    iot = jax.lax.iota(jnp.uint32, np2)
    live = jnp.uint32(n) if count is None else jnp.minimum(
        jnp.asarray(count, jnp.uint32), jnp.uint32(n)
    )
    idx = jnp.where(iot < live, iot, jnp.uint32(0x7FFFFFFF))
    return idx.reshape(np2 // LANES, LANES)


def _stage_times_impl(arrs, mode, n, np2, C, iters, interpret) -> dict:
    """Mode-generic per-kernel timing core shared by stage_times*."""
    from ..utils.timing import marginal_time

    def time_fn(f, xs):
        return marginal_time(f, *xs, k1=2, k2=12, iters=max(3, iters // 3),
                             min_delta=0.02)

    def _untuple(res):
        # marginal_time chains fn through a fori_loop carry: a single-array
        # stage must return the bare array, multi-array stages a tuple
        return res[0] if len(res) == 1 else tuple(res)

    nrounds = _log2(np2 // C)
    lc = _log2(C)
    na = mode.n_arrays
    budget = _budget(na)
    # mirror the real pipeline: skip pure-sentinel padding blocks
    rr = _cdiv(n, LANES)

    # `kernels` records each emitted pallas_call (the dispatch unit — the
    # honest analog of the reference's per-dispatch timestamps,
    # h.in:39-50) with its own measured time, no attribution guesswork.
    kernels = []

    t_chunk = 0.0
    for group in _phase_groups(lc, budget):
        f_g = jax.jit(
            lambda *xs, a_=group[0], b_=group[-1]: _untuple(_block_call(
                lambda *refs: _chunk_phases_body(C, a_, b_, mode, refs),
                list(xs), C // LANES, interpret, rr,
            ))
        )
        t = time_fn(f_g, arrs)
        kernels.append((f"chunk[p{group[0]}-{group[-1]}]", t))
        t_chunk += t
        arrs = jax.tree.leaves(f_g(*arrs))

    t_cross = t_local = 0.0
    plan, r_next = _fused_round_plan(C, nrounds, na, budget)
    for r_lo, r_hi in plan:
        f_f = jax.jit(
            lambda *xs, a_=r_lo, b_=r_hi: _untuple(_run_fused_rounds(
                list(xs), C, a_, b_, mode, interpret, rr
            ))
        )
        t = time_fn(f_f, arrs)
        kernels.append((f"fused[r{r_lo}-{r_hi}]", t))
        # a fused kernel runs both the cross and the local stages of rounds
        # r_lo..r_hi back to back; the 3-bucket summary attributes its time
        # by stage count (documented estimate; `kernels` has the exact
        # per-dispatch measurement)
        cross_stages = sum(range(r_lo, r_hi + 1))
        local_stages = (r_hi - r_lo + 1) * lc
        t_cross += t * cross_stages / (cross_stages + local_stages)
        t_local += t * local_stages / (cross_stages + local_stages)
        arrs = jax.tree.leaves(f_f(*arrs))
    for r in range(r_next, nrounds + 1):
        f_cross = jax.jit(
            lambda *xs, r=r: _untuple(_run_cross(list(xs), C, r, mode,
                                                 interpret, rr))
        )
        t = time_fn(f_cross, arrs)
        kernels.append((f"cross[r{r}]", t))
        t_cross += t
        arrs = jax.tree.leaves(f_cross(*arrs))
        # local coverage at group granularity, mirroring _sort_padded's
        # skip invariant (see its docstring)
        rr_g = _cdiv(rr, (C << r) // LANES) * ((C << r) // LANES)
        f_local = jax.jit(
            lambda *xs, r=r, rr_g=rr_g: _untuple(
                _run_local(list(xs), C, r, mode, interpret, rr_g))
        )
        t = time_fn(f_local, arrs)
        kernels.append((f"local[r{r}]", t))
        t_local += t
        arrs = jax.tree.leaves(f_local(*arrs))

    return {
        "chunk": t_chunk,
        "cross": t_cross,
        "local": t_local,
        "rounds": nrounds,
        "mode": MODE_NAMES[mode],
        "kernels": kernels,
    }


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
    n = keys.shape[0]
    np2, C = _plan(n, chunk)
    arrs = [_pad_pow2(jnp.asarray(keys, jnp.uint32), np2, 0xFFFFFFFF)]
    return _stage_times_impl(arrs, MODE_KEYS, n, np2, C, iters, interpret)


def stage_times_pairs(keys, values, chunk: int = 1 << 16, iters: int = 10,
                      stable: bool = True, interpret: bool = False) -> dict:
    """stage_times for the key-value modes (the reference's -DKEY_VALUE
    pipeline, downsweep.slang:203-224): MODE_PACKED (packed-lazy carry,
    n <= MAX_PACKED_N), MODE_STABLE (plain index carry above), or
    MODE_PAIRS (stable=False two-array lexicographic)."""
    n = keys.shape[0]
    np2, C = _plan(n, chunk)
    k = _pad_pow2(jnp.asarray(keys, jnp.uint32), np2, 0xFFFFFFFF)
    if not stable:
        v = _pad_pow2(jnp.asarray(values, jnp.uint32), np2, 0xFFFFFFFF)
        return _stage_times_impl([k, v], MODE_PAIRS, n, np2, C, iters,
                                 interpret)
    v = _pad_pow2(jnp.asarray(values, jnp.uint32), np2, 0)
    if n <= MAX_PACKED_N:
        arrs, mode = [k, _packed_aux(n, np2), v], MODE_PACKED
    else:
        arrs, mode = [k, _stable_idx(n, np2), v], MODE_STABLE
    return _stage_times_impl(arrs, mode, n, np2, C, iters, interpret)


def stage_times_w64(hi, lo, values=None, chunk: int = 1 << 16,
                    iters: int = 10, stable: bool = True,
                    interpret: bool = False) -> dict:
    """stage_times for the 64-bit (hi, lo) word-plane modes: MODE_PAIRS
    (values=None — the shipped wide keys-only pipeline is the 2-array
    (hi, lo) lexicographic sort, not a 3-array carry), MODE_W3
    (stable=False key-value), MODE_W4 (packed stable carry), or
    MODE_W4_BIG (plain index carry above MAX_PACKED_N)."""
    n = hi.shape[0]
    np2, C = _plan(n, chunk)
    h = _pad_pow2(jnp.asarray(hi, jnp.uint32), np2, 0xFFFFFFFF)
    l = _pad_pow2(jnp.asarray(lo, jnp.uint32), np2, 0xFFFFFFFF)
    if values is None:
        return _stage_times_impl([h, l], MODE_PAIRS, n, np2, C, iters,
                                 interpret)
    if not stable:
        v = _pad_pow2(jnp.asarray(values, jnp.uint32), np2, 0xFFFFFFFF)
        return _stage_times_impl([h, l, v], MODE_W3, n, np2, C, iters,
                                 interpret)
    v = _pad_pow2(jnp.asarray(values, jnp.uint32), np2, 0)
    if n <= MAX_PACKED_N:
        arrs, mode = [h, l, _packed_aux(n, np2), v], MODE_W4
    else:
        arrs, mode = [h, l, _stable_idx(n, np2), v], MODE_W4_BIG
    return _stage_times_impl(arrs, mode, n, np2, C, iters, interpret)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def sort_u32(keys, count=None, *, chunk: int = 1 << 16,
             interpret: bool = False):
    """Ascending sort of uint32 keys via the bitonic network engine.

    count= (traced scalar) gates grid steps wholly past the live prefix
    to a copy — the indirect early-exit analog (upsweep.slang:20-22).
    The caller must have masked keys[count:] to 0xFFFFFFFF already (the
    sorter's indirect path does); the gate only skips compute."""
    n = keys.shape[0]
    np2, C = _plan(n, chunk)
    arrs = [_pad_pow2(jnp.asarray(keys, jnp.uint32), np2, 0xFFFFFFFF)]
    arrs = _sort_padded(arrs, np2, C, MODE_KEYS, interpret, _cdiv(n, LANES),
                        count=count)
    return arrs[0].reshape(-1)[:n]


@functools.partial(
    jax.jit, static_argnames=("chunk", "interpret", "stable")
)
def sort_pairs_u32(keys, values, count=None, *, chunk: int = 1 << 16,
                   interpret: bool = False, stable: bool = True):
    """Key-value sort (values ride as a separate 32-bit buffer).

    stable=True (default) matches the reference contract: output equals the
    CPU std::stable_sort-by-key oracle (reference bench/cpu_benchmark.cc:33-49)
    by tie-breaking on the original index. For n <= 2^25 this uses the
    packed-lazy carry (see module docstring): (key, idx<<7|origin) drive
    the comparisons while the value array idles through lane-stage runs and
    is realigned by one lane gather per run — measurably cheaper than
    carrying a third array through every stage. Larger n falls back to the
    plain (key, idx, value) carry.

    stable=False carries only (key, value) and compares them
    lexicographically — faster (two arrays through every CE stage instead
    of three). The order among equal keys is by ascending value
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
        arrs = _sort_padded(arrs, np2, C, MODE_PAIRS, interpret,
                            _cdiv(n, LANES), count=count)
        return arrs[0].reshape(-1)[:n], arrs[1].reshape(-1)[:n]

    k = _pad_pow2(jnp.asarray(keys, jnp.uint32), np2, 0xFFFFFFFF)
    v = _pad_pow2(jnp.asarray(values, jnp.uint32), np2, 0)
    if n <= MAX_PACKED_N:
        arrs = [k, _packed_aux(n, np2, count), v]
        mode = MODE_PACKED
    else:
        arrs = [k, _stable_idx(n, np2, count), v]
        mode = MODE_STABLE
    arrs = _sort_padded(arrs, np2, C, mode, interpret, _cdiv(n, LANES),
                        count=count)
    return arrs[0].reshape(-1)[:n], arrs[2].reshape(-1)[:n]


# --------------------------------------------------------------------------
# slot merge: finish a sort whose input is already 2^k sorted runs
# --------------------------------------------------------------------------


def _merge_rounds(arrs, np2, C, r_start, mode, interpret, slot=None,
                  sizes=None):
    """Merge rounds r_start..log2(np2/C): the tail of _sort_padded for
    inputs whose 2^(r_start-1)*C blocks are already sorted in alternating
    directions (even block index ascending). real_rows skipping does not
    apply (slot fills are interspersed, not a trailing prefix) — instead,
    when per-slot genuine `sizes` are known, per-block genuine COUNTS are
    tracked through the rounds and pure-fill regions are SMEM-gated to a
    VMEM copy (_gate_body):

    - initially, an ascending slot's genuine elements are its prefix and a
      reversed (descending) slot's are its suffix;
    - after round r's cross stages, the half-cleaner separation property
      puts each 2^r-block group's elements in block order (up to the
      group's direction), so fills — the lexicographic maximum — occupy
      the trailing (ascending) or leading (descending) blocks, and the
      per-block counts are a clip of the conserved group count.

    With slack-2 slots roughly half the local-stage compute is skipped.
    """
    nrounds = _log2(np2 // C)
    counts = None
    if sizes is not None and slot is not None:
        nblocks = np2 // C
        bps = slot // C  # C-blocks per slot
        b = jnp.arange(nblocks, dtype=jnp.int32)
        off = (b % bps) * C
        g = sizes[b // bps].astype(jnp.int32)
        odd_slot = ((b // bps) & 1) == 1
        counts = jnp.where(
            odd_slot,
            jnp.clip(off + C - (slot - g), 0, C),
            jnp.clip(g - off, 0, C),
        )
    for r in range(r_start, nrounds + 1):
        if counts is None:
            arrs = _run_cross(arrs, C, r, mode, interpret)
            arrs = _run_local(arrs, C, r, mode, interpret)
            continue
        Gb = 1 << r  # blocks per group this round
        gcnt = counts.reshape(-1, Gb).sum(axis=1)  # conserved per group
        arrs = _run_cross(arrs, C, r, mode, interpret,
                          valid=(gcnt > 0).astype(jnp.int32))
        nblocks = counts.shape[0]
        b = jnp.arange(nblocks, dtype=jnp.int32)
        pos = b % Gb
        grep = jnp.repeat(gcnt, Gb)
        g_odd = ((b // Gb) & 1) == 1  # round direction = group parity
        counts = jnp.where(
            g_odd,
            jnp.clip(grep - (Gb - 1 - pos) * C, 0, C),
            jnp.clip(grep - pos * C, 0, C),
        )
        arrs = _run_local(arrs, C, r, mode, interpret,
                          valid=(counts > 0).astype(jnp.int32))
    return arrs


def _reverse_odd_slots(x2):
    """Flip the odd rows of a (n_slots, slot) array — converts all-ascending
    sorted slots into the alternating-direction convention the merge rounds
    expect. XLA fuses the reverse+select into one pass; no Pallas needed."""
    odd = (jnp.arange(x2.shape[0]) & 1) == 1
    return jnp.where(odd[:, None], jnp.flip(x2, axis=1), x2)


def _slot_geometry(n, slot, chunk):
    n_slots = n // slot
    assert n == n_slots * slot and n_slots == _next_pow2(n_slots), (n, slot)
    assert slot == _next_pow2(slot) and slot >= 2 * LANES, slot
    C = min(slot, chunk)
    return n_slots, C, _log2(slot // C) + 1


@functools.partial(
    jax.jit, static_argnames=("slot", "chunk", "interpret", "prearranged")
)
def merge_slots_u32(keys, sizes=None, *, slot: int, chunk: int = 1 << 16,
                    interpret: bool = False, prearranged: bool = False):
    """Sort a (n_slots * slot,) array whose aligned `slot`-sized segments
    are each sorted ascending with 0xFFFFFFFF fill tails, using only the
    network's merge rounds — log2(n_slots) rounds instead of the full
    log2(n)*(log2(n)+1)/2 stage network.

    This is the distributed re-sort fast path: after the bucket exchange
    each chip holds one sorted run per source (the reference's single-GPU
    analog is the already-sorted staging re-read, downsweep.slang:186-192
    — here the structure survives the collective and is exploited rather
    than re-derived). Fills sort to the global tail (they are the key
    maximum); callers slice the genuine prefix. Optional `sizes`
    ((n_slots,) int32 genuine prefix lengths) turns on pure-fill block
    skipping (see _merge_rounds).

    prearranged=True promises odd slots already hold their run DESCENDING
    in the slot suffix (sender-side reversal at the exchange — the source
    sends a mirrored segment of its flipped shard and targets the slot
    end), skipping the _reverse_odd_slots pass over the whole buffer.
    """
    n = keys.shape[0]
    n_slots, C, r_start = _slot_geometry(n, slot, chunk)
    k2 = jnp.asarray(keys, jnp.uint32).reshape(n_slots, slot)
    if not prearranged:
        k2 = _reverse_odd_slots(k2)
    arrs = [k2.reshape(n // LANES, LANES)]
    arrs = _merge_rounds(arrs, n, C, r_start, MODE_KEYS, interpret,
                         slot=slot, sizes=sizes)
    return arrs[0].reshape(-1)


@functools.partial(
    jax.jit,
    static_argnames=("slot", "chunk", "interpret", "stable", "prearranged"),
)
def merge_slots_pairs(keys, values, sizes, *, slot: int,
                      chunk: int = 1 << 16, interpret: bool = False,
                      stable: bool = True, prearranged: bool = False):
    """Key-value slot merge. `sizes` ((n_slots,) int32) gives each slot's
    genuine prefix length; the rest is fill.

    stable=True tie-breaks equal keys by slot-major flat position — i.e.
    (slot index, position within slot) — which for the distributed resort
    is exactly (source rank, intra-source order), the global stability
    contract. Fill tiebreaks are the maximum (0xFFFFFFFF packed /
    0x7FFFFFFF plain, matching _packed_aux/_stable_idx), so fills sort
    strictly after every genuine pair including genuine 0xFFFFFFFF keys.
    stable=False expects value fills of 0xFFFFFFFF (the lex-pair maximum).

    prearranged=True: see merge_slots_u32 — odd slots arrive descending in
    the slot suffix, no reversal pass. The stability aux is built directly
    in that orientation (an odd slot's buffer position j holds intra-
    source position slot-1-j), so the tiebreak stays (source rank,
    intra-source order) exactly.
    """
    n = keys.shape[0]
    n_slots, C, r_start = _slot_geometry(n, slot, chunk)
    k2 = jnp.asarray(keys, jnp.uint32).reshape(n_slots, slot)
    v2 = jnp.asarray(values, jnp.uint32).reshape(n_slots, slot)

    def arrange(a):
        return a if prearranged else _reverse_odd_slots(a)

    if not stable:
        arrs = [
            arrange(k2).reshape(-1, LANES),
            arrange(v2).reshape(-1, LANES),
        ]
        arrs = _merge_rounds(arrs, n, C, r_start, MODE_PAIRS, interpret,
                             slot=slot, sizes=sizes)
        return arrs[0].reshape(-1), arrs[1].reshape(-1)
    pos = jnp.arange(slot, dtype=jnp.uint32)[None, :]
    if prearranged:
        # build the aux already in buffer orientation: odd slots hold
        # intra-source position slot-1-j at buffer position j
        odd = ((jnp.arange(n_slots) & 1) == 1)[:, None]
        pos = jnp.where(odd, jnp.uint32(slot - 1) - pos, pos)
    genuine = pos < sizes[:, None].astype(jnp.uint32)
    flat = jnp.arange(n_slots, dtype=jnp.uint32)[:, None] * slot + pos
    # STRICT here (vs <= in sort_pairs_u32): slot buffers always contain
    # fills, and at n == 2^25 exactly the last genuine aux (n-1)<<7|127
    # would collide with the 0xFFFFFFFF fill sentinel
    if n < MAX_PACKED_N:
        aux2 = jnp.where(genuine, flat << ROW_BITS, jnp.uint32(0xFFFFFFFF))
        mode = MODE_PACKED
    else:
        aux2 = jnp.where(genuine, flat, jnp.uint32(0x7FFFFFFF))
        mode = MODE_STABLE
    arrs = [
        arrange(a).reshape(-1, LANES)
        for a in (k2, aux2, v2)
    ]
    arrs = _merge_rounds(arrs, n, C, r_start, mode, interpret,
                         slot=slot, sizes=sizes)
    return arrs[0].reshape(-1), arrs[2].reshape(-1)


@functools.partial(
    jax.jit, static_argnames=("chunk", "interpret", "stable")
)
def sort_pairs_w64(hi, lo, values, count=None, *, chunk: int = 1 << 16,
                   interpret: bool = False, stable: bool = True):
    """64-bit-key key-value sort on (hi, lo) uint32 word planes.

    The key order is lexicographic over (hi, lo) == unsigned 64-bit order;
    the caller applies any order-preserving dtype encoding before the
    split. stable=True tie-breaks on the original index (packed-lazy for
    n <= 2^25, plain index carry above); stable=False compares
    (hi, lo, value) — equal keys emerge value-ascending.

    Extension beyond the reference (its API is uint32-only,
    include/vk_radix_sort.h:52-81), closing the 64-bit key-value gap.
    """
    n = hi.shape[0]
    np2, C = _plan(n, chunk)
    h = _pad_pow2(jnp.asarray(hi, jnp.uint32), np2, 0xFFFFFFFF)
    l = _pad_pow2(jnp.asarray(lo, jnp.uint32), np2, 0xFFFFFFFF)
    if not stable:
        v = _pad_pow2(jnp.asarray(values, jnp.uint32), np2, 0xFFFFFFFF)
        arrs = _sort_padded([h, l, v], np2, C, MODE_W3, interpret,
                            _cdiv(n, LANES), count=count)
        return tuple(a.reshape(-1)[:n] for a in arrs)
    v = _pad_pow2(jnp.asarray(values, jnp.uint32), np2, 0)
    if n <= MAX_PACKED_N:
        arrs = [h, l, _packed_aux(n, np2, count), v]
        mode = MODE_W4
    else:
        arrs = [h, l, _stable_idx(n, np2, count), v]
        mode = MODE_W4_BIG
    arrs = _sort_padded(arrs, np2, C, mode, interpret, _cdiv(n, LANES),
                        count=count)
    return (
        arrs[0].reshape(-1)[:n],
        arrs[1].reshape(-1)[:n],
        arrs[3].reshape(-1)[:n],
    )
