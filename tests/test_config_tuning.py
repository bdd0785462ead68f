"""Kernel-split planning and compile-cache configuration tests."""

import os

import pytest

from vulkan_radix_sort_tpu import config
from vulkan_radix_sort_tpu.ops import bitonic


def test_phase_groups_respect_budget():
    for budget in (24, 40, 64, 96, 200):
        groups = bitonic._phase_groups(16, budget)
        # every phase exactly once, in order
        assert [p for g in groups for p in g] == list(range(1, 17))
        for g in groups:
            cost = sum(g)
            # a group only exceeds the budget when it is a single
            # unsplittable phase
            assert cost <= budget or len(g) == 1


def test_fused_round_plan_budgets():
    C = 1 << 16
    rc = C // 128
    for n_arrays in (1, 3):
        plan, r_next = bitonic._fused_round_plan(C, 9, n_arrays, 96)
        covered = [r for lo, hi in plan for r in range(lo, hi + 1)]
        assert covered == list(range(1, r_next))
        for lo, hi in plan:
            assert (1 << hi) * rc * n_arrays <= bitonic.MAX_FUSED_ROWS
            stages = sum(r + 16 for r in range(lo, hi + 1))
            assert stages <= 96 or lo == hi


def test_enable_compilation_cache(tmp_path):
    import jax

    p = config.enable_compilation_cache(str(tmp_path / "cache"))
    assert p.endswith("cache")
    assert jax.config.jax_compilation_cache_dir == p
    # idempotent
    assert config.enable_compilation_cache(p) == p


def test_auto_backend_cutoffs():
    """Pins the measured auto-backend crossovers (VERDICT r3 #4): keys from
    the round-1 sentinel-skip re-measure, kv/kvns from the round-3 chip
    sweep bench_results/kv_cutoff_v5e.csv (kv crosses at 2^17: network
    0.119 vs xla 0.133 ms; kvns already at 2^16: 0.023 vs 0.059 ms)."""
    from vulkan_radix_sort_tpu.models import sorter

    assert sorter.AUTO_NETWORK_MIN_KEYS == 1 << 18
    assert sorter.AUTO_NETWORK_MIN_KV == 1 << 17
    assert sorter.AUTO_NETWORK_MIN_KVNS == 1 << 16
    cfg = config.SortConfig(backend="auto")
    # kind routing: every kind resolves (the lookup precedes the platform
    # check, so this is live on CPU CI too); unknown kinds raise
    for kind, cut in (("keys", 1 << 18), ("kv", 1 << 17), ("kvns", 1 << 16)):
        got = sorter._pick_backend(cfg, cut - 1, kind=kind)
        assert got == "xla"  # below the cutoff on TPU; always xla elsewhere
        if sorter._platform() == "tpu":
            assert sorter._pick_backend(cfg, cut, kind=kind) == "network"
    with pytest.raises(KeyError):
        sorter._pick_backend(cfg, 1 << 20, kind="bogus")


def test_chunk_per_kind_defaults():
    """Pins the per-kind chunk optima from the round-5 chip re-sweep
    (bench_results/chip_queue.log r5d_chunk_ab: keys 13.48 ms at 2^17 vs
    13.98 at 2^16; stable kv 46.62 at 2^16 vs 47.19 at 2^17). An explicit
    chunk= overrides both kinds (the pre-round-5 behavior)."""
    assert config.CHUNK_KEYS == 1 << 17
    assert config.CHUNK_CARRY == 1 << 16
    cfg = config.SortConfig()
    assert cfg.chunk is None
    assert cfg.chunk_keys == 1 << 17
    assert cfg.chunk_carry == 1 << 16
    forced = config.SortConfig(chunk=1 << 12)
    assert forced.chunk_keys == forced.chunk_carry == 1 << 12


def test_budget_env_overrides():
    # the module reads env at import; just assert the values are ints > 0
    assert bitonic.MAX_GROUP_STAGES > 0
    assert bitonic.MAX_GROUP_STAGES_KV > 0
    assert bitonic.MAX_FUSED_ROWS >= 1024
    assert bitonic.FUSE_COST_CAP >= 1024
