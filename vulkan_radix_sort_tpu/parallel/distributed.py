"""Distributed sort over a jax.sharding.Mesh.

New scope relative to the reference (which is single-GPU, single queue —
SURVEY.md §2.6): scale element count N beyond one chip's HBM by sharding keys
over a 1-D device mesh and exchanging digit/range buckets over ICI.

Algorithm (exact, stable, skew-proof):
  1. every device stable-sorts its local shard (single-chip engine),
  2. exact global splitter keys are found with 4 rounds of byte-wise
     refinement over psum'd histograms — the distributed analog of the
     reference's global digit histogram (upsweep.slang:42-44), generalized
     from one 256-bin pass to a 4-level radix search so degenerate (Zipfian /
     few-distinct / constant) distributions still split evenly,
  3. keys equal to a splitter are divided between the two sides *by count,
     in (device, local position) order* — this is what keeps the sort stable
     and the output shard sizes exactly N/D even when every key is identical,
  4. one ragged_all_to_all moves each contiguous local range to its owner
     (values ride in a second ragged_all_to_all, mirroring the reference's
     separate 32-bit value buffer, README.md:60),
  5. each device stable-sorts its received range; concatenation over the mesh
     is then globally sorted.

Arbitrary N (the reference handles any element count on its single device,
h.in:353): the global array is padded with 0xffffffff sentinels to a mesh
multiple; sentinels sort to the global tail and are sliced off. The
indirect path (count=, vrdxCmdSortIndirect analog) masks the global suffix
beyond `count` the same way the single-chip path does — masked entries form
a global suffix in (device, position) order, so the stable pipeline keeps
them behind every genuine key of equal value.

Overlapping the exchange with compute (keys): `overlap=True` splits the
bucket exchange by source half into two ragged collectives; each received
half is sorted independently and the halves are combined with a single
bitonic merge (a bitonic-sequence cleanup, log2 stages instead of a full
re-sort). The two collectives and the first half-sort are independent
programs, which is exactly the shape XLA's async scheduler overlaps on TPU.
The trade is NOT free: each half-buffer is a full m slots (ragged receive
sizes are dynamic, so the half-sorts cannot be statically shortened, and
the second half's data sits at the tail where the sentinel-block prefix
skip cannot help), so local re-sort compute roughly doubles vs the
non-overlap path. overlap=True wins when the exchange time it hides
exceeds the added sort time — i.e. when the collective dominates
(cross-host meshes, large D); `parallel.scaling.phase_report` measures
the realized collective/compute fractions so that trade can be read off
per deployment rather than assumed.

Collectives ride ICI via XLA (psum / all_gather / ragged_all_to_all inside
shard_map); no NCCL-style code is translated from anywhere.

Multi-host (DCN) tier: a 2-D mesh ("dcn", "ici") routes the bucket
exchange hierarchically. The exact flat plan is unchanged (splitters over
the whole mesh, one global range per device in dcn-major rank order), but
the exchange runs in two hops: hop A consolidates, per source chip, the C
per-chip ranges of each destination host into ONE contiguous DCN message
to its ici-peer on that host (H-1 messages per chip instead of D-1 — the
slow-tier message count drops by the host width), and hop B fans the
staged data out to its final chips over ICI (H cheap intra-host
collectives, one per source host so the receive buffers stay in flat
source-rank order and stability is positional). The hop-A staging buffer
is `dcn_slack` x the shard size; the shipped program also reports whether
the plan overflowed the staging buffer, and the host wrapper retries with
a doubled slack (bounded by min(H, C), which always suffices) — exactness
is never traded for the fast path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import SortConfig
from ..ops import bitonic, reference

AXIS = "x"
DCN_AXIS, ICI_AXIS = "dcn", "ici"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D sort mesh. On a pod slice the axis maps onto ICI rings."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return jax.make_mesh((len(devices),), (AXIS,), devices=np.asarray(devices))


def make_mesh_2d(n_hosts: int, chips_per_host: int | None = None,
                 devices=None) -> Mesh:
    """2-D ("dcn", "ici") sort mesh: the leading axis crosses hosts (DCN),
    the trailing axis stays within a host (ICI). jax.devices() enumerates
    process-major, so a row-major reshape puts each host's chips on one
    "ici" row."""
    if devices is None:
        devices = jax.devices()
    if chips_per_host is None:
        chips_per_host = len(devices) // n_hosts
    devices = np.asarray(devices[: n_hosts * chips_per_host]).reshape(
        n_hosts, chips_per_host
    )
    return Mesh(devices, (DCN_AXIS, ICI_AXIS))


def _mesh_axis(mesh: Mesh):
    """(collective axis name(s), flat device count) for a sort mesh."""
    if mesh.axis_names == (DCN_AXIS, ICI_AXIS):
        return (DCN_AXIS, ICI_AXIS), mesh.shape[DCN_AXIS] * mesh.shape[ICI_AXIS]
    return AXIS, mesh.shape[AXIS]


def _default_use_pallas(config: SortConfig | None) -> bool:
    return (
        jax.devices()[0].platform == "tpu"
        and (config is None or config.backend != "xla")
    )


def _resolved_chunks(config: SortConfig | None):
    """(keys_chunk, carry_chunk) for the local network engines — per-kind
    defaults resolve exactly as in the single-chip Sorter (config.py)."""
    cfg = config if config is not None else SortConfig()
    return cfg.chunk_keys, cfg.chunk_carry


def _local_sort(keys, values=None, config: SortConfig | None = None,
                use_pallas=False):
    chunk_k, chunk_c = _resolved_chunks(config)
    interpret = bool(config is not None and config.interpret)
    if values is None:
        if use_pallas:
            return bitonic.sort_u32(keys, chunk=chunk_k, interpret=interpret)
        return reference.sort_keys(keys)
    if use_pallas:
        return bitonic.sort_pairs_u32(
            keys, values, chunk=chunk_c, interpret=interpret
        )
    return reference.sort_pairs(keys, values)


def _find_splitters(ks, targets, n_dev, axis=AXIS):
    """Exact global splitter keys: value of the sorted-order element at each
    global position in `targets`. 4 rounds of 8-bit refinement; each round
    psums 256 candidate counts per boundary (cheap: (D-1, 256) ints)."""
    nb = targets.shape[0]
    prefix = jnp.zeros((nb, 1), jnp.uint32)
    for r in (24, 16, 8, 0):
        bytes_ = jnp.arange(256, dtype=jnp.uint32)[None, :]  # (1, 256)
        low_ones = jnp.uint32((1 << r) - 1)
        # upper bound of candidate range: prefix | b<<r | low-ones
        cand_hi = prefix | (bytes_ << r) | low_ones  # (nb, 256)
        local_le = jnp.searchsorted(ks, cand_hi.reshape(-1), side="right")
        global_le = jax.lax.psum(local_le, axis).reshape(nb, 256)
        # smallest byte whose cumulative count exceeds the target position
        take = global_le > targets[:, None]  # (nb, 256) monotone in byte
        byte = jnp.argmax(take, axis=1).astype(jnp.uint32)  # first True
        prefix = prefix | (byte[:, None] << r)
    return prefix[:, 0]  # (nb,) exact splitter keys


def _cut_positions(ks, splitters, targets, n_dev, axis=AXIS):
    """Local cut positions so that global range d = [targets[d-1], targets[d]).

    Keys equal to a splitter are split by count in (device, local) order —
    the stability + even-shard guarantee for degenerate distributions.
    """
    my = jax.lax.axis_index(axis)
    n_less = jnp.searchsorted(ks, splitters, side="left")  # (nb,)
    n_eq = jnp.searchsorted(ks, splitters, side="right") - n_less
    less_tot = jax.lax.psum(n_less, axis)
    eq_all = jax.lax.all_gather(n_eq, axis)  # (D, nb)
    dev_ids = jnp.arange(n_dev)[:, None]
    eq_before = jnp.sum(jnp.where(dev_ids < my, eq_all, 0), axis=0)  # (nb,)
    remain = targets - less_tot  # equals to absorb on the left side
    take_eq = jnp.clip(remain - eq_before, 0, n_eq)
    return n_less + take_eq  # (nb,) ascending cut positions in my shard


def _ragged_a2a(operand, out, input_offsets, send_sizes, output_offsets,
                recv_sizes, n_dev, axis=AXIS):
    """ragged_all_to_all, with a dense emulation on platforms whose XLA
    backend lacks the HLO (XLA:CPU) — used by the CPU-mesh test path.

    The emulation exploits that the send ranges partition the receiver's
    buffer: each source contributes (value & in-range) rows of a dense
    (D, m) all_to_all and the receiver combines. Unfilled destination slots
    keep `out`'s fill value (sentinels for the overlap path).
    """
    if jax.devices()[0].platform == "tpu":
        return jax.lax.ragged_all_to_all(
            operand, out, input_offsets, send_sizes, output_offsets,
            recv_sizes, axis_name=axis,
        )
    m = out.shape[0]
    j = jnp.arange(m)[None, :]  # (1, m) position in dest buffer
    rel = j - output_offsets[:, None]  # (D, m)
    valid = (rel >= 0) & (rel < send_sizes[:, None])
    idx = jnp.clip(input_offsets[:, None] + rel, 0, operand.shape[0] - 1)
    send_mat = jnp.where(valid, jnp.take(operand, idx), jnp.zeros_like(operand[0]))
    vmat = valid.astype(jnp.int32)
    recv_mat = jax.lax.all_to_all(
        send_mat[:, None, :], axis, split_axis=0, concat_axis=0
    )[:, 0, :]
    vrecv = jax.lax.all_to_all(
        vmat[:, None, :], axis, split_axis=0, concat_axis=0
    )[:, 0, :]
    filled = vrecv.sum(axis=0) > 0
    got = recv_mat.sum(axis=0).astype(operand.dtype)
    return jnp.where(filled, got, out)


def _exchange_plan(ks, targets, m, n_dev, axis=AXIS):
    """Splitters -> (input_offsets, send_sizes, output_offsets, recv_sizes,
    sizes_all) for the ragged bucket exchange; the first four (D,) int32,
    in source rank order on the receiver so stability is positional;
    sizes_all is the fully replicated (D src, D dst) size matrix (the
    hierarchical router plans both hops from it)."""
    splitters = _find_splitters(ks, targets, n_dev, axis)
    cuts = _cut_positions(ks, splitters, targets, n_dev, axis)
    bounds = jnp.concatenate(
        [jnp.zeros(1, cuts.dtype), cuts, jnp.full((1,), m, cuts.dtype)]
    )
    send_sizes = (bounds[1:] - bounds[:-1]).astype(jnp.int32)  # (D,)
    input_offsets = bounds[:-1].astype(jnp.int32)  # (D,)

    # receiver-side placement: my chunk lands after chunks of lower ranks
    sizes_all = jax.lax.all_gather(send_sizes, axis)  # (D src, D dst)
    my = jax.lax.axis_index(axis)
    dev_ids = jnp.arange(n_dev)[:, None]
    output_offsets = jnp.sum(
        jnp.where(dev_ids < my, sizes_all, 0), axis=0
    ).astype(jnp.int32)  # (D,) offset in each dst's buffer for my data
    recv_sizes = sizes_all[:, my].astype(jnp.int32)  # from each source
    return input_offsets, send_sizes, output_offsets, recv_sizes, sizes_all


def _staged_exchange(arrs, sizes_all, in_off, H, C, m, slack, fills,
                     slot=None):
    """Two-hop hierarchical exchange on a ("dcn", "ici") mesh.

    Moves each of `arrs` (local sorted (m,) shards) to its flat-plan owner
    through a per-host staging hop: hop A sends ONE contiguous block per
    destination host over DCN (to my ici-peer there), hop B fans staged
    blocks out to their final chips over ICI in H rounds (one per source
    host, so the final (m,) buffers are in flat source-rank order —
    positional stability). All routing is planned from the replicated
    (D, D) `sizes_all`; no extra collectives beyond the data hops.

    slot=S switches hop B's final placement from packed to per-flat-source
    slots of S (final buffers next_pow2(D) * S), so the receiver holds
    aligned sorted runs ready for the merge-rounds-only re-sort
    (bitonic.merge_slots_*); the fit check then also requires every
    single (src, dst) transfer <= S. Slotted mode also applies the
    sender-side odd-slot reversal (see the 1-D merge_resort site): an
    odd-flat-rank source ships its whole plan out of its FLIPPED shard
    (hop A mirrors the block offsets; hop B reads the reversed within-
    block segment layout and targets each slot's suffix), so the final
    buffers are prearranged and the merge skips _reverse_odd_slots.

    Returns (outs, ok). ok is a replicated scalar, False when ANY chip's
    hop-A staging buffer (slack * m) would overflow; in that case the hops
    run with zeroed sizes (an in-bounds no-op — a ragged_all_to_all must
    never see offsets/sizes past its buffers), `outs` are the fill arrays,
    and the caller must retry with more slack (a slack of min(H, C)
    always suffices: a staging chip receives at most min(H*m, C*m)
    elements).
    """
    D = H * C
    my_h = jax.lax.axis_index(DCN_AXIS)
    my_i = jax.lax.axis_index(ICI_AXIS)
    s4 = sizes_all.reshape(H, C, H, C)  # [src_h, src_i, dst_h, dst_j]

    # ---- global staging-fit check (BEFORE any collective) ----
    # staging chip (h', i) receives sum over h, j of s4[h, i, h', j]; the
    # size matrix is replicated, so every chip reaches the same verdict.
    # On overflow the hops below run with zeroed sizes (an in-bounds
    # no-op) and the caller retries with more slack — the TPU
    # ragged_all_to_all must never be launched with offsets/sizes past
    # the staging buffer (an out-of-bounds DMA is undefined behavior,
    # and the "overflow never corrupts" contract would otherwise rest
    # on it).
    recv_staging = s4.sum(axis=3).sum(axis=0)  # (C ici, H dst_host)
    ok = recv_staging.max() <= slack * m
    if slot is not None:
        ok = ok & (sizes_all.max() <= slot)
    z = ok.astype(jnp.int32)

    # ---- hop A plan (my DCN group = chips with ici index my_i) ----
    # A[h, h'] = bytes src (h, my_i) sends to its peer (h', my_i)
    A = jnp.take(s4, my_i, axis=1).sum(axis=-1)  # (H src, H dst)
    sendA = jnp.take(A, my_h, axis=0).astype(jnp.int32) * z  # (H,) my row
    hh = jnp.arange(H)[:, None]
    out_offA = (
        jnp.sum(jnp.where(hh < my_h, A, 0), axis=0).astype(jnp.int32) * z
    )
    recvA = jnp.take(A, my_h, axis=1).astype(jnp.int32) * z  # (H,) column
    # my ranges for one dst host are contiguous (flat dsts h'*C..h'*C+C-1)
    in_offA = in_off.reshape(H, C)[:, 0]
    if slot is not None:
        # sender-side reversal: odd flat-rank sources ship out of their
        # flipped shard, so mirror my block offsets there
        my_odd = ((my_h * C + my_i).astype(jnp.int32) & 1) == 1
        in_offA = jnp.where(
            my_odd,
            jnp.clip(jnp.int32(m) - in_offA - sendA, 0, m - 1).astype(
                jnp.int32),
            in_offA,
        )
    blockA_off = (jnp.cumsum(recvA) - recvA).astype(jnp.int32)  # exclusive

    # ---- hop B plan pieces shared across rounds ----
    # dst columns of my host: (D src, C dst chips)
    dstcols = jax.lax.dynamic_slice(sizes_all, (0, my_h * C), (D, C))
    src_flat = jnp.arange(D)[:, None]

    n_slots = 1 if slot is None else bitonic._next_pow2(D)
    outs = []
    for arr, fill in zip(arrs, fills):
        if slot is not None:
            # odd flat-rank sources ship their whole plan out of the
            # flipped shard (offsets already mirrored above)
            arr = jnp.where(my_odd, jnp.flip(arr), arr)
        bufA = jnp.full((slack * m,), fill, arr.dtype)
        bufA = _ragged_a2a(arr, bufA, in_offA, sendA, out_offA, recvA, H,
                           axis=DCN_AXIS)
        final = jnp.full((m if slot is None else n_slots * slot,), fill,
                         arr.dtype)
        for h in range(H):
            rows = dstcols[h * C:(h + 1) * C]  # (C src chips of host h, C)
            # my staged block from src (h, my_i): segment j goes to chip j
            sB = jnp.take(rows, my_i, axis=0).astype(jnp.int32) * z  # (C,)
            in_offB = blockA_off[h] + (jnp.cumsum(sB) - sB)
            if slot is None:
                # packed: after every flat source rank < h*C + my_i
                before = src_flat < (h * C + my_i)
                out_offB = jnp.sum(
                    jnp.where(before, dstcols, 0), axis=0
                ).astype(jnp.int32) * z  # (C,)
            else:
                # slotted: this round I forward source (h, my_i)'s data,
                # which owns slot h*C + my_i in every destination's buffer
                src_slot = jnp.int32(h * C) + my_i.astype(jnp.int32)
                # a reversed source's staged block holds its C segments
                # in reverse chip order, each internally reversed:
                # segment j at block_end - cumsum(sB)[j]; it lands at the
                # slot SUFFIX so the merge runs prearranged
                src_odd = ((src_slot & 1) == 1)
                in_offB = jnp.where(
                    src_odd,
                    blockA_off[h] + recvA[h] - jnp.cumsum(sB),
                    in_offB,
                )
                suffix = jnp.where(
                    src_odd & (sB > 0), jnp.int32(slot) - sB, 0
                )
                out_offB = (
                    src_slot * jnp.int32(slot) + suffix
                ).astype(jnp.int32) * z
            recvB = (
                jnp.take(rows, my_i, axis=1).astype(jnp.int32) * z
            )  # (C,)
            final = _ragged_a2a(bufA, final, in_offB, sB, out_offB, recvB,
                                C, axis=ICI_AXIS)
        outs.append(final)
    return outs, ok


def _masked_half_plan(sizes_all, in_off, src_mask, my, n_dev):
    """Exchange-plan vectors for the source-half sub-exchange.

    `src_mask` ((D,) 0/1) selects the sending sources; receiver offsets are
    COMPACTED over the masked sources (exclusive cumsum in source-rank
    order), so each half's arrivals form a contiguous genuine prefix —
    the property the stable overlap merge relies on (fill can then never
    precede a genuine element through a stable local sort)."""
    masked = sizes_all * src_mask[:, None]  # (D src, D dst)
    dev_ids = jnp.arange(n_dev)[:, None]
    out_off = jnp.sum(
        jnp.where(dev_ids < my, masked, 0), axis=0
    ).astype(jnp.int32)  # (D,) my placement at each dst
    send = jnp.take(masked, my, axis=0).astype(jnp.int32)  # (D,) my sends
    recv = masked[:, my].astype(jnp.int32)  # (D,) per-source into me
    return in_off, send, out_off, recv


def _stable_merge_valid(kA, vA, rA, kB, vB, key_value):
    """Stable merge of two sorted shards whose genuine elements are the
    first rA / (m - rA) entries (the rest is sentinel fill), A before B on
    equal keys. Returns the m genuine elements in stable sorted order.

    Positions are the classic merge ranks — for genuine A[i]:
    i + |genuine B < A[i]|; for genuine B[j]: j + |genuine A <= B[j]|.
    Fill keys are 0xFFFFFFFF so searchsorted(side='left') never counts
    them; the side='right' count is clamped to rA, which is exact (only
    key 0xFFFFFFFF can reach past the genuine prefix, and all rA genuine
    keys are <= it). Fill entries scatter to the dump slot m (never read).
    """
    m = kA.shape[0]
    rB = m - rA
    i = jnp.arange(m)
    posA = i + jnp.searchsorted(kB, kA, side="left").astype(i.dtype)
    posA = jnp.where(i < rA, posA, m)
    a_leq = jnp.minimum(
        jnp.searchsorted(kA, kB, side="right").astype(i.dtype), rA
    )
    posB = jnp.where(i < rB, i + a_leq, m)
    ko = jnp.full((m + 1,), 0xFFFFFFFF, kA.dtype)
    ko = ko.at[posA].set(kA).at[posB].set(kB)[:m]
    if not key_value:
        return ko, None
    vo = jnp.zeros((m + 1,), vA.dtype)
    vo = vo.at[posA].set(vA).at[posB].set(vB)[:m]
    return ko, vo


def _bitonic_merge_halves(sA, sB, config, interpret):
    """Merge two ascending-with-sentinel-tail arrays with one bitonic
    cleanup: [A asc | pad | flip(B)] is bitonic (sentinels are the maximum,
    so padding at the peak preserves bitonicity), and a cleanup is stage
    distances len/2 .. 1 — exactly the cross + local stages of the top
    merge round with all-ascending directions."""
    m = sA.shape[0]
    # merge-rounds-only network: keep the chip-measured merge chunk (the
    # keys 2^17 optimum applies to full sorts, not bare cross+local rounds)
    _, chunk = _resolved_chunks(config)
    np2 = bitonic._next_pow2(2 * m)
    pad = np2 - 2 * m
    parts = [sA]
    if pad:
        parts.append(jnp.full((pad,), 0xFFFFFFFF, jnp.uint32))
    parts.append(jnp.flip(sB))
    arr = jnp.concatenate(parts)
    C = min(chunk, np2)
    arrs = [arr.reshape(np2 // bitonic.LANES, bitonic.LANES)]
    r = bitonic._log2(np2 // C)
    mode = bitonic.MODE_KEYS
    if r > 0:
        arrs = bitonic._run_cross(arrs, C, r, mode, interpret)
    arrs = bitonic._run_local(arrs, C, r, mode, interpret)
    return arrs[0].reshape(-1)[:m]


def _sort_sharded_impl(keys, values, *, mesh, config, key_value, use_pallas,
                       overlap=False, dcn_slack=1, merge_resort=False):
    axis, n_dev = _mesh_axis(mesh)
    hier = axis != AXIS and min(mesh.shape[DCN_AXIS], mesh.shape[ICI_AXIS]) > 1
    n = keys.shape[0]
    assert n % n_dev == 0  # the entry point pads to a mesh multiple
    m = n // n_dev
    targets = (jnp.arange(1, n_dev) * m).astype(jnp.int32)
    half = n_dev // 2
    assert not (merge_resort and not use_pallas)
    assert not (merge_resort and overlap and hier)  # 2-D overlap: no merge
    # slot geometry for the merge re-sort (shared by 1-D and 2-D paths)
    n_slots = bitonic._next_pow2(n_dev)
    S = max(2 * bitonic.LANES, bitonic._next_pow2(-(-2 * m // n_dev)))

    def shard_fn(ks, vs):
        # 1. local stable sort
        if key_value:
            ks, vs = _local_sort(ks, vs, config, use_pallas)
        else:
            ks = _local_sort(ks, None, config, use_pallas)

        # 2-3. exact balanced cuts -> exchange plan
        in_off, send, out_off, recv, sizes_all = _exchange_plan(
            ks, targets, m, n_dev, axis
        )
        ok = jnp.ones((1,), jnp.int32)

        interpret = bool(config is not None and config.interpret)
        # slot merges run at the carry chunk for BOTH kinds: every chip A/B
        # that set the merge defaults (r5_merge_dmagate2, r5_prearranged_ab,
        # r5b_prearranged_dmagate) measured merge_slots_* at C=2^16, and the
        # keys 2^17 optimum was established for full sorts only — the local
        # full sorts above already resolve per kind inside _local_sort.
        _, chunk = _resolved_chunks(config)

        def merge_finish(ks2, vs2, recv_z, ok, prearranged=False):
            """Merge-rounds-only re-sort of slotted arrivals (slot i =
            flat source rank i's sorted run, genuine prefix recv_z[i] —
            or, prearranged, the run reversed into the slot SUFFIX for
            odd i); the sizes also drive pure-fill block skipping in the
            merge kernels."""
            sizes_slots = jnp.zeros((n_slots,), jnp.int32).at[
                :n_dev].set(recv_z)
            if key_value:
                ko, vo = bitonic.merge_slots_pairs(
                    ks2, vs2, sizes_slots, slot=S, chunk=chunk,
                    interpret=interpret, prearranged=prearranged,
                )
                return ko[:m], vo[:m], ok
            ko = bitonic.merge_slots_u32(ks2, sizes_slots, slot=S,
                                         chunk=chunk, interpret=interpret,
                                         prearranged=prearranged)
            return ko[:m], jnp.zeros((0,), jnp.uint32), ok

        def merge_keys_halves(sA, sB):
            # both halves are ascending with sentinel tails; one bitonic
            # merge cleanup yields the m smallest = all real keys (the two
            # halves hold exactly m real keys total)
            if use_pallas and 2 * m >= 1024:
                return _bitonic_merge_halves(sA, sB, config, interpret)
            return jnp.sort(jnp.concatenate([sA, jnp.flip(sB)]))[:m]

        if hier:
            # 4''. two-hop DCN-consolidated exchange (module docstring)
            H, C = mesh.shape[DCN_AXIS], mesh.shape[ICI_AXIS]
            arrs = [ks, vs] if key_value else [ks]
            fills = [0xFFFFFFFF, 0][: len(arrs)]
            if overlap and H >= 2:
                # 4'''. source-split by host half: the second half's DCN
                # hop is independent of the first half's ICI fan-out and
                # local sort, so the async scheduler can overlap them.
                # Masked size matrices compact each half's arrivals
                # (all plan offsets derive from sizes_all), giving the
                # genuine-prefix property the stable merge needs.
                hl = H // 2
                src_h = jnp.arange(n_dev) // C
                mlo = (src_h < hl).astype(sizes_all.dtype)[:, None]
                outsA, okA = _staged_exchange(
                    arrs, sizes_all * mlo, in_off, H, C, m, dcn_slack, fills
                )
                outsB, okB = _staged_exchange(
                    arrs, sizes_all * (1 - mlo), in_off, H, C, m,
                    dcn_slack, fills
                )
                ok = jax.lax.pmin(
                    (okA & okB).astype(jnp.int32), axis
                ).reshape(1)
                my_flat = (jax.lax.axis_index(DCN_AXIS) * C
                           + jax.lax.axis_index(ICI_AXIS))
                if key_value:
                    kA, vA = _local_sort(outsA[0], outsA[1], config,
                                         use_pallas)
                    kB, vB = _local_sort(outsB[0], outsB[1], config,
                                         use_pallas)
                    rA = (sizes_all * mlo)[:, my_flat].sum().astype(
                        jnp.int32)
                    ko, vo = _stable_merge_valid(kA, vA, rA, kB, vB, True)
                    return ko, vo, ok
                sA = _local_sort(outsA[0], None, config, use_pallas)
                sB = _local_sort(outsB[0], None, config, use_pallas)
                return (merge_keys_halves(sA, sB),
                        jnp.zeros((0,), jnp.uint32), ok)
            if merge_resort:
                # 4''*. slotted hop-B placement + merge-rounds re-sort.
                # ok carries TWO flags — [combined, staging-only] — so the
                # host retry can tell slot overflow (drop the merge; no
                # slack helps) from hop-A staging overflow (grow slack,
                # KEEP the merge).
                outs, okd = _staged_exchange(
                    arrs, sizes_all, in_off, H, C, m, dcn_slack, fills,
                    slot=S,
                )
                s4f = sizes_all.reshape(H, C, H, C)
                staging_ok = (
                    s4f.sum(axis=3).sum(axis=0).max() <= dcn_slack * m
                )
                ok = jnp.stack([
                    jax.lax.pmin(okd.astype(jnp.int32), axis),
                    jax.lax.pmin(staging_ok.astype(jnp.int32), axis),
                ])
                my_flat = (jax.lax.axis_index(DCN_AXIS) * C
                           + jax.lax.axis_index(ICI_AXIS))
                recv_z = sizes_all[:, my_flat].astype(jnp.int32) * (
                    okd.astype(jnp.int32)
                )
                return merge_finish(outs[0], outs[1] if key_value else None,
                                    recv_z, ok, prearranged=True)
            outs, okd = _staged_exchange(
                arrs, sizes_all, in_off, H, C, m, dcn_slack, fills
            )
            ok = jax.lax.pmin(okd.astype(jnp.int32), axis).reshape(1)
            if key_value:
                ks3, vs3 = _local_sort(outs[0], outs[1], config, use_pallas)
                return ks3, vs3, ok
            ks3 = _local_sort(outs[0], None, config, use_pallas)
            return ks3, jnp.zeros((0,), jnp.uint32), ok

        if overlap and half >= 1 and merge_resort:
            # 4'*. overlap composed with the merge re-sort: two slotted
            # half-exchanges (slots compacted per half: source base+i owns
            # slot i), each finished with merge rounds only, combined by
            # the usual half merge. This keeps the overlap's independent-
            # collective structure WITHOUT the packed overlap path's
            # doubled full re-sorts — the projection's "merge+overlap"
            # row (docs/SCALING_PROJECTION.md).
            my = jax.lax.axis_index(axis)
            okm = sizes_all.max() <= S  # covers both halves (masked <=)
            z = okm.astype(jnp.int32)
            ok = okm.astype(jnp.int32).reshape(1)
            def half_slotted(base, cnt):
                n_sl = bitonic._next_pow2(cnt)
                mask = (
                    (jnp.arange(n_dev) >= base)
                    & (jnp.arange(n_dev) < base + cnt)
                ).astype(sizes_all.dtype)
                masked = sizes_all * mask[:, None]
                send_h = jnp.take(masked, my, axis=0).astype(
                    jnp.int32) * z
                recv_h = masked[:, my].astype(jnp.int32) * z
                slot_i = jnp.clip(my.astype(jnp.int32) - base, 0,
                                  n_sl - 1)
                # sender-side odd-slot reversal (see the 1-D merge_resort
                # site): odd slot owners send runs descending into the
                # slot suffix so the half merges run prearranged
                odd = (slot_i & 1) == 1
                # clip: a zero-size send at in_off 0 would mirror to m
                in_off_r = jnp.clip(
                    jnp.int32(m) - in_off - send_h, 0, m - 1
                ).astype(jnp.int32)
                in_off_h = jnp.where(odd, in_off_r, in_off)
                suffix = jnp.where(
                    (send_h > 0) & odd, jnp.int32(S) - send_h, 0
                )
                off_h = (slot_i * jnp.int32(S) + suffix) * z
                ks_send = jnp.where(odd, jnp.flip(ks), ks)
                kbuf = jnp.full((n_sl * S,), 0xFFFFFFFF, jnp.uint32)
                kh = _ragged_a2a(ks_send, kbuf, in_off_h, send_h, off_h,
                                 recv_h, n_dev, axis)

                def pad_m(x, fill):
                    if x.shape[0] >= m:
                        return x[:m]
                    # cast the fill: a bare 0xFFFFFFFF overflows the
                    # weak-typed int32 argument parse (non-pow2 meshes
                    # where the half slot buffer is smaller than m)
                    return jnp.pad(x, (0, m - x.shape[0]),
                                   constant_values=jnp.asarray(
                                       fill, x.dtype))

                r_h = recv_h.sum().astype(jnp.int32)
                sizes_sl = jnp.zeros((n_sl,), jnp.int32).at[:cnt].set(
                    jax.lax.dynamic_slice(recv_h, (base,), (cnt,))
                )
                if not key_value:
                    kh = bitonic.merge_slots_u32(
                        kh, sizes_sl, slot=S, chunk=chunk,
                        interpret=interpret, prearranged=True,
                    )
                    return pad_m(kh, 0xFFFFFFFF), None, r_h
                vs_send = jnp.where(odd, jnp.flip(vs), vs)
                vbuf = jnp.zeros((n_sl * S,), vs.dtype)
                vh = _ragged_a2a(vs_send, vbuf, in_off_h, send_h, off_h,
                                 recv_h, n_dev, axis)
                kh, vh = bitonic.merge_slots_pairs(
                    kh, vh, sizes_sl, slot=S, chunk=chunk,
                    interpret=interpret, prearranged=True,
                )
                return pad_m(kh, 0xFFFFFFFF), pad_m(vh, 0), r_h

            kA, vA, rA = half_slotted(0, half)
            kB, vB, _ = half_slotted(half, n_dev - half)
            if key_value:
                ko, vo = _stable_merge_valid(kA, vA, rA, kB, vB, True)
                return ko, vo, ok
            return (merge_keys_halves(kA, kB),
                    jnp.zeros((0,), jnp.uint32), ok)

        if overlap and half >= 1:
            # 4'. source-split exchange: sources [0, half) first, the rest
            # second; the second collective is independent of the first
            # half's local sort, so XLA's async scheduler can overlap them.
            my = jax.lax.axis_index(axis)
            mlo = (jnp.arange(n_dev) < half).astype(sizes_all.dtype)
            planA = _masked_half_plan(sizes_all, in_off, mlo, my, n_dev)
            planB = _masked_half_plan(sizes_all, in_off, 1 - mlo, my, n_dev)
            sent = jnp.full((m,), 0xFFFFFFFF, jnp.uint32)
            kA = _ragged_a2a(ks, sent, *planA, n_dev, axis)
            kB = _ragged_a2a(ks, sent, *planB, n_dev, axis)
            if key_value:
                zv = jnp.zeros((m,), vs.dtype)
                vA = _ragged_a2a(vs, zv, *planA, n_dev, axis)
                vB = _ragged_a2a(vs, zv, *planB, n_dev, axis)
                kA, vA = _local_sort(kA, vA, config, use_pallas)
                kB, vB = _local_sort(kB, vB, config, use_pallas)
                rA = (sizes_all * mlo[:, None])[:, my].sum().astype(
                    jnp.int32)
                ko, vo = _stable_merge_valid(kA, vA, rA, kB, vB, True)
                return ko, vo, ok
            sA = _local_sort(kA, None, config, use_pallas)
            sB = _local_sort(kB, None, config, use_pallas)
            return (merge_keys_halves(sA, sB),
                    jnp.zeros((0,), jnp.uint32), ok)

        if merge_resort:
            # 4*. slotted exchange + merge-rounds-only re-sort: source d's
            # data lands in slot d of a (n_slots * S) buffer, so arrivals
            # are 2^k aligned sorted runs and the re-sort needs only the
            # network's log2(n_slots) merge rounds instead of the full
            # stage triangle (bitonic.merge_slots_* docstring). Slot size
            # S ~ 2m/D (slack 2, replicated fit check like the DCN
            # staging); on overflow the collective no-ops in-bounds and
            # the host wrapper falls back to the packed full re-sort.
            okm = sizes_all.max() <= S  # replicated -> same verdict
            z = okm.astype(jnp.int32)
            my = jax.lax.axis_index(axis)
            # sender-side odd-slot reversal: I own slot `my` in every
            # destination, so if `my` is odd I send each run DESCENDING
            # into the slot SUFFIX — the merge then skips its whole-
            # buffer _reverse_odd_slots pass (prearranged=True). The
            # reversed segment [a, b) of ks is the segment [m-b, m-a) of
            # flip(ks) (mirrored in_off); offsets stay in-bounds for
            # zero sizes via the send > 0 clamp.
            odd = (my.astype(jnp.int32) & 1) == 1
            # clip: a zero-size send at in_off 0 would mirror to m
            in_off_r = jnp.clip(
                jnp.int32(m) - in_off - send, 0, m - 1
            ).astype(jnp.int32)
            in_off_s = jnp.where(odd, in_off_r, in_off)
            suffix = jnp.where((send > 0) & odd, jnp.int32(S) - send, 0)
            out_off_s = (
                my.astype(jnp.int32) * jnp.int32(S) + suffix
            ).astype(jnp.int32) * z
            send_z, recv_z = send * z, recv * z
            ks_send = jnp.where(odd, jnp.flip(ks), ks)
            kbuf = jnp.full((n_slots * S,), 0xFFFFFFFF, jnp.uint32)
            ks2 = _ragged_a2a(ks_send, kbuf, in_off_s, send_z, out_off_s,
                              recv_z, n_dev, axis)
            vs2 = None
            if key_value:
                vs_send = jnp.where(odd, jnp.flip(vs), vs)
                vbuf = jnp.zeros((n_slots * S,), vs.dtype)
                vs2 = _ragged_a2a(vs_send, vbuf, in_off_s, send_z,
                                  out_off_s, recv_z, n_dev, axis)
            return merge_finish(ks2, vs2, recv_z,
                                okm.astype(jnp.int32).reshape(1),
                                prearranged=True)

        # 4. ragged bucket exchange over ICI
        out = jnp.zeros((m,), ks.dtype)
        ks2 = _ragged_a2a(ks, out, in_off, send, out_off, recv, n_dev, axis)
        if key_value:
            vout = jnp.zeros((m,), vs.dtype)
            vs2 = _ragged_a2a(vs, vout, in_off, send, out_off, recv, n_dev,
                              axis)
            # 5. local stable re-sort; source chunks arrive in rank order so
            # a stable sort preserves global stability.
            ks3, vs3 = _local_sort(ks2, vs2, config, use_pallas)
            return ks3, vs3, ok
        ks3 = _local_sort(ks2, None, config, use_pallas)
        return ks3, jnp.zeros((0,), jnp.uint32), ok

    spec = P(axis)
    fn = jax.shard_map(
        shard_fn, mesh=mesh, in_specs=(spec, spec),
        out_specs=(spec, spec, P()), check_vma=False,
    )
    if values is None:
        values = jnp.zeros((n,), jnp.uint32)
    return fn(keys, values)


def _pad_to_mesh(x, n_dev, fill):
    n = x.shape[0]
    n_pad = -(-n // n_dev) * n_dev
    if n_pad > n:
        x = jnp.pad(x, (0, n_pad - n), constant_values=jnp.asarray(fill, x.dtype))
    return x


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "config", "key_value", "use_pallas", "overlap", "has_count",
        "dcn_slack", "merge_resort",
    ),
)
def _sort_entry(keys, values, count, *, mesh, config, key_value, use_pallas,
                overlap, has_count, dcn_slack=1, merge_resort=False):
    """One jitted program: mask (indirect), pad to a mesh multiple, run the
    sharded pipeline, slice back, restore tails. Keeping the ragged slice
    and the where-restores inside the jit lets GSPMD resolve the uneven
    output sharding (an eager slice of a sharded array is ambiguous).

    The third return is the hierarchical router's staging-fit flag (always
    1 on 1-D meshes); on 0 the caller must retry with more dcn_slack."""
    n = keys.shape[0]
    _, n_dev = _mesh_axis(mesh)
    if has_count:
        in_range = jnp.arange(n, dtype=jnp.uint32) < count
        mk = jnp.where(in_range, keys, jnp.uint32(0xFFFFFFFF))
    else:
        mk = keys
    pk = _pad_to_mesh(mk, n_dev, 0xFFFFFFFF)
    pv = _pad_to_mesh(values, n_dev, 0) if key_value else None
    k, v, ok = _sort_sharded_impl(
        pk, pv, mesh=mesh, config=config, key_value=key_value,
        use_pallas=use_pallas, overlap=overlap, dcn_slack=dcn_slack,
        merge_resort=merge_resort,
    )

    def unpad(x):
        if x.shape[0] == n:
            return x  # mesh-multiple N: stays evenly sharded, zero copies
        # ragged N: an uneven sharded slice is unsupported (GSPMD types),
        # so replicate then slice — correct for any N; large-scale callers
        # should prefer mesh-multiple N to stay on the sharded fast path
        x = jax.sharding.reshard(x, jax.sharding.NamedSharding(mesh, P()))
        return x[:n]

    k = unpad(k)
    if has_count:
        k = jnp.where(in_range, k, keys)
    if key_value:
        v = unpad(v)
        if has_count:
            v = jnp.where(in_range, v, values)
        return k, v, ok
    return k, jnp.zeros((0,), jnp.uint32), ok


def _run_with_slack(keys, values, count, *, mesh, config, key_value,
                    use_pallas, overlap, has_count, dcn_slack,
                    merge_resort=None):
    """Run _sort_entry; on a 2-D mesh, pick/grow the hop-A staging slack.

    dcn_slack=None starts at min(2, min(H, C)) and doubles on overflow
    (each retry recompiles, cached per slack; min(H, C) always fits).
    An explicit dcn_slack is respected but overflow raises rather than
    returning a corrupt sort.

    merge_resort=None auto-enables the slotted-exchange merge re-sort on
    eager Pallas runs, 1-D and hierarchical (the slack-2 slot fit has a
    concrete flag there; on overflow — a heavily skewed source ->
    destination matrix — it falls back to the packed exchange + full
    re-sort). Explicit True raises on overflow or an unsupported shape
    (overlap, traced operands) instead of silently degrading.
    """
    axis, n_dev = _mesh_axis(mesh)
    hier = axis != AXIS and min(mesh.shape[DCN_AXIS], mesh.shape[ICI_AXIS]) > 1
    traced = any(
        isinstance(x, jax.core.Tracer) for x in (keys, values, count)
    )
    if merge_resort and not use_pallas:
        raise ValueError(
            "merge_resort=True requires the Pallas engine (use_pallas)"
        )
    if merge_resort and overlap and hier:
        raise ValueError(
            "merge_resort=True with overlap=True is supported on 1-D "
            "meshes only (the hierarchical overlap keeps the packed "
            "half-exchange)"
        )
    if merge_resort and traced:
        raise ValueError(
            "merge_resort=True under an outer jit cannot verify the "
            "slot fit; call eagerly or pass merge_resort=False"
        )
    if not hier:
        use_merge = bool(merge_resort) or (
            merge_resort is None and use_pallas
            and not traced and n_dev > 1
        )
        k, v, ok = _sort_entry(
            keys, values, count, mesh=mesh, config=config,
            key_value=key_value, use_pallas=use_pallas, overlap=overlap,
            has_count=has_count, merge_resort=use_merge,
        )
        if use_merge and not traced and not bool(np.asarray(ok)[0]):
            if merge_resort:
                raise ValueError(
                    "merge_resort slot staging (2x even-share) overflowed "
                    "for this key distribution; pass merge_resort=None "
                    "(auto fallback) or False"
                )
            k, v, _ = _sort_entry(
                keys, values, count, mesh=mesh, config=config,
                key_value=key_value, use_pallas=use_pallas,
                overlap=overlap, has_count=has_count, merge_resort=False,
            )
        return k, v
    cap = min(mesh.shape[DCN_AXIS], mesh.shape[ICI_AXIS])
    fixed = dcn_slack is not None
    if any(
        isinstance(x, jax.core.Tracer) for x in (keys, values, count)
    ):
        # under an outer jit (ANY traced operand — keys, values, or a
        # traced count=) the staging-fit flag is a tracer and cannot
        # drive a retry; only the provably safe slack is usable
        if fixed and dcn_slack < cap:
            raise ValueError(
                f"sort_sharded under jit on a 2-D mesh cannot verify "
                f"dcn_slack={dcn_slack}; pass dcn_slack=None (uses the "
                f"safe bound min(H, C)={cap}) or >= {cap}"
            )
        k, v, _ = _sort_entry(
            keys, values, count, mesh=mesh, config=config,
            key_value=key_value, use_pallas=use_pallas, overlap=overlap,
            has_count=has_count, dcn_slack=dcn_slack if fixed else cap,
        )
        return k, v
    slack = dcn_slack if fixed else min(2, cap)
    assert not isinstance(keys, jax.core.Tracer)
    want_merge = bool(merge_resort) or (
        merge_resort is None and use_pallas and not overlap
    )
    while True:
        k, v, ok = _sort_entry(
            keys, values, count, mesh=mesh, config=config,
            key_value=key_value, use_pallas=use_pallas, overlap=overlap,
            has_count=has_count, dcn_slack=slack, merge_resort=want_merge,
        )
        ok_arr = np.asarray(ok)
        if bool(ok_arr[0]):
            return k, v
        if want_merge:
            staging_fine = ok_arr.shape[0] > 1 and bool(ok_arr[1])
            if staging_fine:
                # slot overflow only — no slack heals it; drop the merge
                if merge_resort:
                    raise ValueError(
                        "merge_resort slot staging (2x even-share) "
                        "overflowed for this key distribution; pass "
                        "merge_resort=None (auto fallback) or False"
                    )
                want_merge = False
                continue
            # hop-A staging overflow: grow slack, KEEP the merge (at the
            # slack where staging fits, a slot-only failure then drops it)
            if not fixed and slack < cap:
                slack = min(cap, slack * 2)
                continue
            if merge_resort and not fixed:
                raise AssertionError("hierarchical staging overflow at cap")
        if fixed:
            raise ValueError(
                f"dcn_slack={slack} staging buffer overflowed for this key "
                f"distribution; pass dcn_slack=None (adaptive) or a larger "
                f"value (min(H, C)={cap} always suffices)"
            )
        if slack >= cap:  # unreachable: cap always fits; defensive
            raise AssertionError("hierarchical staging overflow at cap")
        slack = min(cap, slack * 2)


def sort_sharded(keys, mesh: Mesh, config: SortConfig | None = None,
                 count=None, use_pallas: bool | None = None,
                 overlap: bool = False, dcn_slack: int | None = None,
                 merge_resort: bool | None = None):
    """Sort a 1-D uint32 array of any length sharded (or shardable) over
    `mesh`; returns the globally sorted array (same length).

    count= sorts only the global prefix (traced scalar ok), leaving the
    suffix untouched — the distributed analog of vrdxCmdSortIndirect.
    overlap=True uses the source-split exchange (see module docstring).

    A 2-D ("dcn", "ici") mesh (make_mesh_2d) routes the exchange
    hierarchically: one consolidated DCN message per destination host,
    fan-out over ICI; dcn_slack sizes the staging hop (None = adaptive).
    On 2-D meshes overlap=True source-splits by host half, so the second
    half's DCN hop can hide behind the first half's fan-out + local sort.

    merge_resort (None = auto on eager Pallas runs, 1-D and 2-D) receives the
    exchange into per-source slots and re-sorts with the network's merge
    rounds only — ~log2(D)/log2(m) of the full re-sort's stages — falling
    back to the packed exchange + full re-sort when the slack-2 slot
    staging would overflow (heavily skewed exchanges).
    """
    if use_pallas is None:
        use_pallas = _default_use_pallas(config)
    c = jnp.uint32(0) if count is None else jnp.uint32(count)
    # zero-length placeholder: a keys-only sort must not commit a full
    # global-n dummy value buffer on the default device (4 GiB at the
    # 2^30-key target); the in-jit dummy that the shard_map signature
    # needs is created inside _sort_sharded_impl where XLA can DCE it
    k, _ = _run_with_slack(
        keys, jnp.zeros((0,), jnp.uint32), c, mesh=mesh,
        config=config, key_value=False, use_pallas=use_pallas,
        overlap=overlap, has_count=count is not None, dcn_slack=dcn_slack,
        merge_resort=merge_resort,
    )
    return k


def sort_pairs_sharded(keys, values, mesh: Mesh,
                       config: SortConfig | None = None, count=None,
                       use_pallas: bool | None = None,
                       overlap: bool = False,
                       dcn_slack: int | None = None,
                       merge_resort: bool | None = None):
    """Stable distributed key-value sort of any length; values ride a second
    ragged exchange as a separate 32-bit buffer (reference README.md:60).

    count= sorts only the global prefix of pairs; both tails untouched.
    Masked entries form a global suffix in (device, position) order, so the
    stable pipeline keeps them behind every genuine equal key.

    On a 2-D ("dcn", "ici") mesh both buffers ride the hierarchical
    two-hop exchange; hop-B rounds keep flat source-rank order, so the
    final stable re-sort preserves global stability exactly as on 1-D.

    overlap=True source-splits the exchange (by device half on 1-D meshes,
    by host half on 2-D) so the second half's collective can hide behind
    the first half's local sort. Stability holds: each half's arrivals are
    compacted (genuine elements form a contiguous prefix that a stable
    local sort preserves, fill keys being the maximum), and the final
    merge places lower-ranked sources first on equal keys.

    merge_resort (None = auto on eager Pallas runs) applies here too: the
    stable tiebreak becomes (slot, intra-slot position) == (source rank,
    intra-source order), so the merge-rounds-only re-sort preserves the
    exact same stable contract; skewed exchanges fall back to the packed
    full re-sort.
    """
    if use_pallas is None:
        use_pallas = _default_use_pallas(config)
    c = jnp.uint32(0) if count is None else jnp.uint32(count)
    return _run_with_slack(
        keys, values, c, mesh=mesh, config=config, key_value=True,
        use_pallas=use_pallas, overlap=overlap, has_count=count is not None,
        dcn_slack=dcn_slack, merge_resort=merge_resort,
    )
