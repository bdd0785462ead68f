"""Scaling and overlap measurement for the distributed sort.

The reference has no distributed layer to compare against (SURVEY.md §2.6);
this harness exists so the framework's own north-star targets (scaling
efficiency across a pod, exchange/compute overlap) are *measured*, not
assumed — on the CPU mesh as a correctness-shaped proxy, and on real TPU
meshes for true numbers.

Reported phases (the distributed analog of the reference's per-stage
timestamps, h.in:39-50):
  local_sort — per-shard sort of the input shard
  exchange   — splitter search + ragged bucket all_to_all (the collective)
  resort     — per-shard sort of the received buckets
  full       — the fused production pipeline (one jit)
`overlap_hidden_s` = (sum of isolated phases) - full: the wall-clock the
fused program hides by overlapping collective and compute (>=0 up to
min(exchange, compute) in the ideal schedule; negative values mean fusion
overhead dominated, e.g. on the CPU-mesh proxy).

All times use the chained-iteration marginal method (utils.timing) so the
environment's fixed dispatch latency divides out.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SortConfig
from ..utils.timing import marginal_time
from . import distributed as D


def _stage_fns(mesh, config, use_pallas, overlap, m):
    """Chainable (same shape in/out) jitted stage programs plus the fused
    pipeline, all over `mesh`.

    The exchange is timed as (exchange -> local re-sort) chained on a
    SORTED input: that composition maps sorted shards to sorted shards,
    so every iteration of marginal_time's fori_loop chain satisfies the
    exchange plan's searchsorted precondition (chaining the bare exchange
    would feed it its own unsorted output on iteration 2+ — non-monotone
    cuts, negative ragged sizes). The caller subtracts the separately
    chained re-sort time; the local sort is a distribution-oblivious
    network, so its cost is identical either way. (phase_report guards
    against 2-D meshes before calling here.)"""
    n_dev = mesh.shape[D.AXIS]
    spec = jax.sharding.PartitionSpec(D.AXIS)
    targets = (jnp.arange(1, n_dev) * m).astype(jnp.int32)

    def local_sort_shard(ks):
        return D._local_sort(ks, None, config, use_pallas)

    def exchange_shard(ks):
        in_off, send, out_off, recv, _ = D._exchange_plan(ks, targets, m, n_dev)
        out = jnp.full((m,), 0xFFFFFFFF, jnp.uint32)
        return D._ragged_a2a(ks, out, in_off, send, out_off, recv, n_dev)

    def smap(f):
        return jax.jit(jax.shard_map(
            f, mesh=mesh, in_specs=(spec,), out_specs=spec, check_vma=False,
        ))

    full = jax.jit(
        lambda k: D.sort_sharded(
            k, mesh, config, use_pallas=use_pallas, overlap=overlap
        )
    )
    return (
        smap(local_sort_shard),
        smap(exchange_shard),
        smap(lambda ks: local_sort_shard(exchange_shard(ks))),
        smap(local_sort_shard),
        full,
    )


def phase_report(mesh, n: int, config: SortConfig | None = None,
                 use_pallas: bool | None = None, overlap: bool = False,
                 seed: int = 0, iters: int = 3) -> dict:
    """Measure per-phase device time of the distributed sort on `mesh`."""
    from ..utils import datagen

    if use_pallas is None:
        use_pallas = D._default_use_pallas(config)
    if D.AXIS not in mesh.shape:
        raise ValueError(
            "phase_report measures 1-D ('x') meshes; use dcn_report for a "
            f"hierarchical ('dcn', 'ici') mesh (got axes {mesh.axis_names})"
        )
    n_dev = mesh.shape[D.AXIS]
    assert n % n_dev == 0, "use a mesh-multiple n for the phase report"
    m = n // n_dev
    keys = jnp.asarray(datagen.generate_keys(n, seed=seed))
    keys = jax.device_put(
        keys, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(D.AXIS))
    )
    f_local, f_exch, f_exch_sort, f_resort, f_full = _stage_fns(
        mesh, config, use_pallas, overlap, m
    )

    t_local = marginal_time(f_local, keys, iters=iters)
    sorted_keys = f_local(keys)
    exchanged = f_exch(sorted_keys)  # one application for the resort input
    t_resort = marginal_time(f_resort, exchanged, iters=iters)
    # exchange timed via the sorted-to-sorted composition (see _stage_fns)
    t_both = marginal_time(f_exch_sort, sorted_keys, iters=iters)
    t_exch = max(t_both - t_resort, 0.0)
    t_full = marginal_time(f_full, keys, iters=iters)

    parts = t_local + t_exch + t_resort
    rep = {
        "n": n,
        "devices": n_dev,
        "local_sort_s": t_local,
        "exchange_s": t_exch,
        "resort_s": t_resort,
        "full_s": t_full,
        "overlap_hidden_s": parts - t_full,
        "exchange_fraction": t_exch / parts if parts > 0 else 0.0,
        "overlap_mode": overlap,
        "use_pallas": use_pallas,
    }
    if use_pallas and n_dev > 1 and not overlap:
        # A/B the slotted-exchange merge re-sort against the full-re-sort
        # pipeline above: one eager run yields the concrete slot-fit flag
        # (the timing jit can't drive the auto fallback), then the fixed
        # merge program is chain-timed like the others.
        zv = jnp.zeros((0,), jnp.uint32)

        def _merge_entry(k):
            return D._sort_entry(
                k, zv, jnp.uint32(0), mesh=mesh, config=config,
                key_value=False, use_pallas=use_pallas, overlap=False,
                has_count=False, merge_resort=True,
            )

        ok = np.asarray(jax.jit(lambda k: _merge_entry(k)[2])(keys))
        if bool(ok[0]):
            f_merge = jax.jit(lambda k: _merge_entry(k)[0])
            rep["full_merge_s"] = marginal_time(f_merge, keys, iters=iters)
    return rep


def dcn_report(mesh2d, n: int, config: SortConfig | None = None,
               use_pallas: bool | None = None, dcn_slack: int = 2,
               seed: int = 0, iters: int = 3) -> dict:
    """Phase times + per-tier traffic accounting for the hierarchical
    exchange on a ("dcn", "ici") mesh.

    Byte volumes are exact (from the run's own exchange plan): hop A's
    cross-host bytes equal the flat plan's cross-host bytes — the
    consolidation changes the slow-tier MESSAGE count (H-1 per chip vs
    D-1), not the byte count — and hop B adds an intra-host forwarding
    pass of everything staged. Message counts are the static fan-outs.
    """
    from ..utils import datagen

    if use_pallas is None:
        use_pallas = D._default_use_pallas(config)
    H, C = mesh2d.shape[D.DCN_AXIS], mesh2d.shape[D.ICI_AXIS]
    n_dev = H * C
    axis = (D.DCN_AXIS, D.ICI_AXIS)
    assert n % n_dev == 0, "use a mesh-multiple n for the dcn report"
    m = n // n_dev
    spec = jax.sharding.PartitionSpec(axis)
    targets = (jnp.arange(1, n_dev) * m).astype(jnp.int32)

    def local_sort_shard(ks):
        return D._local_sort(ks, None, config, use_pallas)

    def staged_exchange_shard(ks):
        in_off, _, _, _, sizes_all = D._exchange_plan(
            ks, targets, m, n_dev, axis
        )
        (out,), _ = D._staged_exchange(
            [ks], sizes_all, in_off, H, C, m, dcn_slack, [0xFFFFFFFF]
        )
        return out

    def exch_sort_shard(ks):
        # sorted-to-sorted composition for chain timing (see _stage_fns):
        # the bare exchange fed its own output would violate the plan's
        # searchsorted precondition on chain iteration 2+
        return local_sort_shard(staged_exchange_shard(ks))

    def traffic_shard(ks):
        _, _, _, _, sizes_all = D._exchange_plan(ks, targets, m, n_dev, axis)
        s4 = sizes_all.reshape(H, C, H, C)
        hh = jnp.arange(H)
        cross = (hh[:, None] != hh[None, :])  # (src_h, dst_h)
        dcn_elems = jnp.sum(
            jnp.where(cross[:, None, :, None], s4, 0)
        ).reshape(1)
        total_elems = jnp.sum(s4).reshape(1)
        return jnp.concatenate([dcn_elems, total_elems])

    def smap(f, out_specs=spec):
        return jax.jit(jax.shard_map(
            f, mesh=mesh2d, in_specs=(spec,), out_specs=out_specs,
            check_vma=False,
        ))

    keys = jnp.asarray(datagen.generate_keys(n, seed=seed))
    keys = jax.device_put(keys, jax.sharding.NamedSharding(mesh2d, spec))
    f_local = smap(local_sort_shard)
    f_exch = smap(staged_exchange_shard)
    f_exch_sort = smap(exch_sort_shard)
    # time the internal fixed-slack entry: the public wrapper's adaptive
    # retry needs a concrete fit flag, which a timing jit cannot provide —
    # so run the program once first and check the flag ourselves; timing a
    # staging-overflowed pipeline would measure zeroed no-op hops.
    def _entry(k):
        return D._sort_entry(
            k, jnp.zeros_like(k), jnp.uint32(0), mesh=mesh2d, config=config,
            key_value=False, use_pallas=use_pallas, overlap=False,
            has_count=False, dcn_slack=dcn_slack,
        )

    full = jax.jit(lambda k: _entry(k)[0])

    ok = jax.jit(lambda k: _entry(k)[2])(keys)
    if not bool(np.asarray(ok)[0]):
        raise ValueError(
            f"dcn_slack={dcn_slack} staging overflows for this distribution;"
            " rerun dcn_report with a larger dcn_slack (timing the"
            " overflowed program would measure zeroed no-op hops)"
        )
    t_local = marginal_time(f_local, keys, iters=iters)
    sorted_keys = f_local(keys)
    exchanged = f_exch(sorted_keys)  # one application for the resort input
    t_resort = marginal_time(f_local, exchanged, iters=iters)
    t_both = marginal_time(f_exch_sort, sorted_keys, iters=iters)
    t_exch = max(t_both - t_resort, 0.0)
    t_full = marginal_time(full, keys, iters=iters)

    t_full_merge = None
    if use_pallas:
        # A/B the slotted hop-B + merge re-sort (same eager fit-check
        # discipline as the packed pipeline above)
        def _mentry(k):
            return D._sort_entry(
                k, jnp.zeros_like(k), jnp.uint32(0), mesh=mesh2d,
                config=config, key_value=False, use_pallas=use_pallas,
                overlap=False, has_count=False, dcn_slack=dcn_slack,
                merge_resort=True,
            )

        okm = jax.jit(lambda k: _mentry(k)[2])(keys)
        if bool(np.asarray(okm)[0]):
            t_full_merge = marginal_time(
                jax.jit(lambda k: _mentry(k)[0]), keys, iters=iters
            )
    traffic = jax.shard_map(
        traffic_shard, mesh=mesh2d, in_specs=(spec,),
        out_specs=jax.sharding.PartitionSpec(), check_vma=False,
    )(sorted_keys)
    dcn_bytes = int(traffic[0]) * 4
    total_bytes = int(traffic[1]) * 4

    parts = t_local + t_exch + t_resort
    rep = {
        "n": n,
        "mesh": (H, C),
        "local_sort_s": t_local,
        "exchange_s": t_exch,
        "resort_s": t_resort,
        "full_s": t_full,
        "exchange_fraction": t_exch / parts if parts > 0 else 0.0,
        "dcn_bytes": dcn_bytes,
        "hop_b_ici_bytes": total_bytes,
        "dcn_messages_per_chip": H - 1,
        "flat_dcn_messages_per_chip": (H - 1) * C,
        "dcn_slack": dcn_slack,
        "use_pallas": use_pallas,
    }
    if t_full_merge is not None:
        rep["full_merge_s"] = t_full_merge
    return rep


def scaling_report(m_per_device: int, device_counts=None,
                   config: SortConfig | None = None,
                   use_pallas: bool | None = None, iters: int = 3) -> list:
    """Weak-scaling sweep: fixed per-device m, growing mesh; efficiency is
    t(1)/t(D) (1.0 = perfect weak scaling). The BASELINE target is >=80%
    on a v5e-16; on the CPU mesh this is a trend proxy only."""
    avail = len(jax.devices())
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16) if d <= avail]
    rows = []
    t1 = None
    for d in device_counts:
        mesh = D.make_mesh(d)
        rep = phase_report(mesh, m_per_device * d, config=config,
                           use_pallas=use_pallas, iters=iters)
        if t1 is None:
            t1 = rep["full_s"]
        rep["weak_efficiency"] = t1 / rep["full_s"] if rep["full_s"] > 0 else 0.0
        rows.append(rep)
    return rows
