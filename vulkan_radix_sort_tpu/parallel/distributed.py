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
programs, which is exactly the shape XLA's async scheduler overlaps on TPU;
`parallel.scaling.phase_report` measures the realized collective/compute
fractions.

Collectives ride ICI via XLA (psum / all_gather / ragged_all_to_all inside
shard_map); no NCCL-style code is translated from anywhere.
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


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D sort mesh. On a pod slice the axis maps onto ICI rings."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return jax.make_mesh((len(devices),), (AXIS,), devices=np.asarray(devices))


def _default_use_pallas(config: SortConfig | None) -> bool:
    return (
        jax.devices()[0].platform == "tpu"
        and (config is None or config.backend != "xla")
    )


def _local_sort(keys, values=None, config: SortConfig | None = None,
                use_pallas=False):
    chunk = config.chunk if config is not None else 1 << 16
    interpret = bool(config is not None and config.interpret)
    if values is None:
        if use_pallas:
            return bitonic.sort_u32(keys, chunk=chunk, interpret=interpret)
        return reference.sort_keys(keys)
    if use_pallas:
        return bitonic.sort_pairs_u32(
            keys, values, chunk=chunk, interpret=interpret
        )
    return reference.sort_pairs(keys, values)


def _find_splitters(ks, targets, n_dev):
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
        global_le = jax.lax.psum(local_le, AXIS).reshape(nb, 256)
        # smallest byte whose cumulative count exceeds the target position
        take = global_le > targets[:, None]  # (nb, 256) monotone in byte
        byte = jnp.argmax(take, axis=1).astype(jnp.uint32)  # first True
        prefix = prefix | (byte[:, None] << r)
    return prefix[:, 0]  # (nb,) exact splitter keys


def _cut_positions(ks, splitters, targets, n_dev):
    """Local cut positions so that global range d = [targets[d-1], targets[d]).

    Keys equal to a splitter are split by count in (device, local) order —
    the stability + even-shard guarantee for degenerate distributions.
    """
    my = jax.lax.axis_index(AXIS)
    n_less = jnp.searchsorted(ks, splitters, side="left")  # (nb,)
    n_eq = jnp.searchsorted(ks, splitters, side="right") - n_less
    less_tot = jax.lax.psum(n_less, AXIS)
    eq_all = jax.lax.all_gather(n_eq, AXIS)  # (D, nb)
    dev_ids = jnp.arange(n_dev)[:, None]
    eq_before = jnp.sum(jnp.where(dev_ids < my, eq_all, 0), axis=0)  # (nb,)
    remain = targets - less_tot  # equals to absorb on the left side
    take_eq = jnp.clip(remain - eq_before, 0, n_eq)
    return n_less + take_eq  # (nb,) ascending cut positions in my shard


def _ragged_a2a(operand, out, input_offsets, send_sizes, output_offsets,
                recv_sizes, n_dev):
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
            recv_sizes, axis_name=AXIS,
        )
    m = out.shape[0]
    j = jnp.arange(m)[None, :]  # (1, m) position in dest buffer
    rel = j - output_offsets[:, None]  # (D, m)
    valid = (rel >= 0) & (rel < send_sizes[:, None])
    idx = jnp.clip(input_offsets[:, None] + rel, 0, operand.shape[0] - 1)
    send_mat = jnp.where(valid, jnp.take(operand, idx), jnp.zeros_like(operand[0]))
    vmat = valid.astype(jnp.int32)
    recv_mat = jax.lax.all_to_all(
        send_mat[:, None, :], AXIS, split_axis=0, concat_axis=0
    )[:, 0, :]
    vrecv = jax.lax.all_to_all(
        vmat[:, None, :], AXIS, split_axis=0, concat_axis=0
    )[:, 0, :]
    filled = vrecv.sum(axis=0) > 0
    got = recv_mat.sum(axis=0).astype(operand.dtype)
    return jnp.where(filled, got, out)


def _exchange_plan(ks, targets, m, n_dev):
    """Splitters -> (input_offsets, send_sizes, output_offsets, recv_sizes)
    for the ragged bucket exchange; all (D,) int32, in source rank order on
    the receiver so stability is positional."""
    splitters = _find_splitters(ks, targets, n_dev)
    cuts = _cut_positions(ks, splitters, targets, n_dev)
    bounds = jnp.concatenate(
        [jnp.zeros(1, cuts.dtype), cuts, jnp.full((1,), m, cuts.dtype)]
    )
    send_sizes = (bounds[1:] - bounds[:-1]).astype(jnp.int32)  # (D,)
    input_offsets = bounds[:-1].astype(jnp.int32)  # (D,)

    # receiver-side placement: my chunk lands after chunks of lower ranks
    sizes_all = jax.lax.all_gather(send_sizes, AXIS)  # (D src, D dst)
    my = jax.lax.axis_index(AXIS)
    dev_ids = jnp.arange(n_dev)[:, None]
    output_offsets = jnp.sum(
        jnp.where(dev_ids < my, sizes_all, 0), axis=0
    ).astype(jnp.int32)  # (D,) offset in each dst's buffer for my data
    recv_sizes = sizes_all[:, my].astype(jnp.int32)  # from each source
    return input_offsets, send_sizes, output_offsets, recv_sizes


def _bitonic_merge_halves(sA, sB, config, interpret):
    """Merge two ascending-with-sentinel-tail arrays with one bitonic
    cleanup: [A asc | pad | flip(B)] is bitonic (sentinels are the maximum,
    so padding at the peak preserves bitonicity), and a cleanup is stage
    distances len/2 .. 1 — exactly the cross + local stages of the top
    merge round with all-ascending directions."""
    m = sA.shape[0]
    chunk = config.chunk if config is not None else 1 << 16
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
                       overlap=False):
    n_dev = mesh.shape[AXIS]
    n = keys.shape[0]
    assert n % n_dev == 0  # the entry point pads to a mesh multiple
    m = n // n_dev
    targets = (jnp.arange(1, n_dev) * m).astype(jnp.int32)
    half = n_dev // 2

    def shard_fn(ks, vs):
        # 1. local stable sort
        if key_value:
            ks, vs = _local_sort(ks, vs, config, use_pallas)
        else:
            ks = _local_sort(ks, None, config, use_pallas)

        # 2-3. exact balanced cuts -> exchange plan
        in_off, send, out_off, recv = _exchange_plan(ks, targets, m, n_dev)

        if overlap and not key_value and half >= 1:
            # 4'. source-split exchange: sources [0, half) first, the rest
            # second; the second collective is independent of the first
            # half's local sort, so XLA's async scheduler can overlap them.
            src = jnp.arange(n_dev)
            lo_mask = (src < half).astype(jnp.int32)
            my = jax.lax.axis_index(AXIS)
            amL = jnp.where(my < half, 1, 0)
            amH = 1 - amL
            sent = jnp.full((m,), 0xFFFFFFFF, jnp.uint32)
            # offsets of my received-low block: low sources precede high
            # ones in out_off construction, so low lands at out_off as-is
            kA = _ragged_a2a(ks, sent, in_off, send * amL, out_off,
                             recv * lo_mask, n_dev)
            kB = _ragged_a2a(ks, sent, in_off, send * amH, out_off,
                             recv * (1 - lo_mask), n_dev)
            sA = _local_sort(kA, None, config, use_pallas)
            sB = _local_sort(kB, None, config, use_pallas)
            # both halves are ascending with sentinel tails; one bitonic
            # merge cleanup yields the m smallest = all real keys (the two
            # halves hold exactly m real keys total)
            interpret = bool(config is not None and config.interpret)
            if use_pallas and 2 * m >= 1024:
                merged = _bitonic_merge_halves(sA, sB, config, interpret)
            else:
                merged = jnp.sort(jnp.concatenate([sA, jnp.flip(sB)]))[:m]
            return merged, jnp.zeros((0,), jnp.uint32)

        # 4. ragged bucket exchange over ICI
        out = jnp.zeros((m,), ks.dtype)
        ks2 = _ragged_a2a(ks, out, in_off, send, out_off, recv, n_dev)
        if key_value:
            vout = jnp.zeros((m,), vs.dtype)
            vs2 = _ragged_a2a(vs, vout, in_off, send, out_off, recv, n_dev)
            # 5. local stable re-sort; source chunks arrive in rank order so
            # a stable sort preserves global stability.
            ks3, vs3 = _local_sort(ks2, vs2, config, use_pallas)
            return ks3, vs3
        ks3 = _local_sort(ks2, None, config, use_pallas)
        return ks3, jnp.zeros((0,), jnp.uint32)

    spec = P(AXIS)
    fn = jax.shard_map(
        shard_fn, mesh=mesh, in_specs=(spec, spec), out_specs=(spec, spec),
        check_vma=False,
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
        "mesh", "config", "key_value", "use_pallas", "overlap", "has_count"
    ),
)
def _sort_entry(keys, values, count, *, mesh, config, key_value, use_pallas,
                overlap, has_count):
    """One jitted program: mask (indirect), pad to a mesh multiple, run the
    sharded pipeline, slice back, restore tails. Keeping the ragged slice
    and the where-restores inside the jit lets GSPMD resolve the uneven
    output sharding (an eager slice of a sharded array is ambiguous)."""
    n = keys.shape[0]
    n_dev = mesh.shape[AXIS]
    if has_count:
        in_range = jnp.arange(n, dtype=jnp.uint32) < count
        mk = jnp.where(in_range, keys, jnp.uint32(0xFFFFFFFF))
    else:
        mk = keys
    pk = _pad_to_mesh(mk, n_dev, 0xFFFFFFFF)
    pv = _pad_to_mesh(values, n_dev, 0) if key_value else None
    k, v = _sort_sharded_impl(
        pk, pv, mesh=mesh, config=config, key_value=key_value,
        use_pallas=use_pallas, overlap=overlap,
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
        return k, v
    return k, jnp.zeros((0,), jnp.uint32)


def sort_sharded(keys, mesh: Mesh, config: SortConfig | None = None,
                 count=None, use_pallas: bool | None = None,
                 overlap: bool = False):
    """Sort a 1-D uint32 array of any length sharded (or shardable) over
    `mesh`; returns the globally sorted array (same length).

    count= sorts only the global prefix (traced scalar ok), leaving the
    suffix untouched — the distributed analog of vrdxCmdSortIndirect.
    overlap=True uses the source-split exchange (see module docstring).
    """
    if use_pallas is None:
        use_pallas = _default_use_pallas(config)
    c = jnp.uint32(0) if count is None else jnp.uint32(count)
    k, _ = _sort_entry(
        keys, jnp.zeros((keys.shape[0],), jnp.uint32), c, mesh=mesh,
        config=config, key_value=False, use_pallas=use_pallas,
        overlap=overlap, has_count=count is not None,
    )
    return k


def sort_pairs_sharded(keys, values, mesh: Mesh,
                       config: SortConfig | None = None, count=None,
                       use_pallas: bool | None = None):
    """Stable distributed key-value sort of any length; values ride a second
    ragged exchange as a separate 32-bit buffer (reference README.md:60).

    count= sorts only the global prefix of pairs; both tails untouched.
    Masked entries form a global suffix in (device, position) order, so the
    stable pipeline keeps them behind every genuine equal key.
    """
    if use_pallas is None:
        use_pallas = _default_use_pallas(config)
    c = jnp.uint32(0) if count is None else jnp.uint32(count)
    return _sort_entry(
        keys, values, c, mesh=mesh, config=config, key_value=True,
        use_pallas=use_pallas, overlap=False, has_count=count is not None,
    )
