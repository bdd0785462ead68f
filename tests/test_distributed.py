"""Distributed sort tests on a forced 8-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8) — SURVEY.md §4's prescription for
testing the shard_map path without a pod."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vulkan_radix_sort_tpu.parallel import distributed
from vulkan_radix_sort_tpu.utils import datagen


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return distributed.make_mesh(8)


@pytest.mark.parametrize("dist", ["uniform", "zipf", "sorted", "few", "constant"])
def test_sort_sharded_all_distributions(mesh, dist):
    n = 8 * 4096
    keys = datagen.generate_keys(n, seed=11, distribution=dist)
    got = np.asarray(distributed.sort_sharded(jnp.asarray(keys), mesh))
    np.testing.assert_array_equal(got, np.sort(keys))


def test_sort_sharded_shardings_even(mesh):
    n = 8 * 1024
    keys = datagen.generate_keys(n, seed=3)
    out = distributed.sort_sharded(jnp.asarray(keys), mesh)
    assert out.shape == (n,)
    # output is evenly sharded over the mesh
    assert len(out.sharding.device_set) == 8


@pytest.mark.parametrize("dist", ["uniform", "constant", "few"])
def test_sort_pairs_sharded_stable(mesh, dist):
    n = 8 * 2048
    keys = datagen.generate_keys(n, seed=13, distribution=dist)
    vals = np.arange(n, dtype=np.uint32)
    k, v = distributed.sort_pairs_sharded(jnp.asarray(keys), jnp.asarray(vals), mesh)
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(k), keys[order])
    np.testing.assert_array_equal(np.asarray(v), vals[order])


def test_presharded_input(mesh):
    n = 8 * 1024
    keys = datagen.generate_keys(n, seed=5)
    sharded = jax.device_put(
        jnp.asarray(keys),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("x")),
    )
    got = np.asarray(distributed.sort_sharded(sharded, mesh))
    np.testing.assert_array_equal(got, np.sort(keys))


@pytest.mark.parametrize("n", [8 * 1024 - 3, 1000, 8 * 512 + 1])
def test_ragged_global_n(mesh, n):
    """Global N need not divide the mesh (reference handles any N on its
    device, h.in:353): sentinel padding absorbs the remainder."""
    keys = datagen.generate_keys(n, seed=21)
    got = np.asarray(distributed.sort_sharded(jnp.asarray(keys), mesh))
    np.testing.assert_array_equal(got, np.sort(keys))


def test_ragged_pairs_with_max_keys(mesh):
    """Ragged N pairs incl. genuine 0xffffffff keys vs pad sentinels."""
    n = 8 * 700 + 5
    rng = np.random.default_rng(22)
    keys = datagen.generate_keys(n, seed=23, distribution="few")
    keys[rng.random(n) < 0.1] = 0xFFFFFFFF
    vals = np.arange(n, dtype=np.uint32)
    k, v = distributed.sort_pairs_sharded(
        jnp.asarray(keys), jnp.asarray(vals), mesh
    )
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(k), keys[order])
    np.testing.assert_array_equal(np.asarray(v), vals[order])


def test_sharded_count_path(mesh):
    """Distributed indirect sort: global prefix sorted, suffix untouched."""
    n, c = 8 * 1024, 3000
    keys = datagen.generate_keys(n, seed=24)
    got = np.asarray(distributed.sort_sharded(jnp.asarray(keys), mesh, count=c))
    np.testing.assert_array_equal(got[:c], np.sort(keys[:c]))
    np.testing.assert_array_equal(got[c:], keys[c:])


def test_sharded_pairs_count_path(mesh):
    n, c = 8 * 512, 2000
    keys = datagen.generate_keys(n, seed=25, distribution="few")
    vals = np.arange(n, dtype=np.uint32)
    k, v = distributed.sort_pairs_sharded(
        jnp.asarray(keys), jnp.asarray(vals), mesh, count=c
    )
    order = np.argsort(keys[:c], kind="stable")
    np.testing.assert_array_equal(np.asarray(k)[:c], keys[:c][order])
    np.testing.assert_array_equal(np.asarray(v)[:c], vals[:c][order])
    np.testing.assert_array_equal(np.asarray(k)[c:], keys[c:])
    np.testing.assert_array_equal(np.asarray(v)[c:], vals[c:])


@pytest.mark.parametrize("dist", ["uniform", "constant"])
def test_overlap_exchange(mesh, dist):
    """Source-split exchange + bitonic-merge combine (overlap=True)."""
    n = 8 * 2048
    keys = datagen.generate_keys(n, seed=26, distribution=dist)
    got = np.asarray(
        distributed.sort_sharded(jnp.asarray(keys), mesh, overlap=True)
    )
    np.testing.assert_array_equal(got, np.sort(keys))


@pytest.mark.parametrize("dist", ["uniform", "constant", "few"])
def test_overlap_pairs_stable(mesh, dist):
    """Stable KV sort through the source-split exchange: compacted
    arrivals + validity-clamped merge must preserve global stability."""
    n = 8 * 2048
    keys = datagen.generate_keys(n, seed=30, distribution=dist)
    vals = np.arange(n, dtype=np.uint32)
    k, v = distributed.sort_pairs_sharded(
        jnp.asarray(keys), jnp.asarray(vals), mesh, overlap=True
    )
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(k), keys[order])
    np.testing.assert_array_equal(np.asarray(v), vals[order])


def test_overlap_pairs_with_max_keys(mesh):
    """Genuine 0xFFFFFFFF keys are indistinguishable from exchange fill by
    key alone; the overlap merge must keep their values via the
    genuine-prefix validity argument, never the key sentinel."""
    n = 8 * 1024
    rng = np.random.default_rng(31)
    keys = rng.integers(0, 50, n).astype(np.uint32)
    keys[rng.random(n) < 0.3] = 0xFFFFFFFF
    vals = np.arange(n, dtype=np.uint32)
    k, v = distributed.sort_pairs_sharded(
        jnp.asarray(keys), jnp.asarray(vals), mesh, overlap=True
    )
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(k), keys[order])
    np.testing.assert_array_equal(np.asarray(v), vals[order])


def test_overlap_pairs_count(mesh):
    """overlap=True composed with the indirect (count=) path."""
    n = 8 * 1024
    c = 3000
    keys = datagen.generate_keys(n, seed=32, distribution="few")
    vals = np.arange(n, dtype=np.uint32)
    k, v = distributed.sort_pairs_sharded(
        jnp.asarray(keys), jnp.asarray(vals), mesh, count=c, overlap=True
    )
    order = np.argsort(keys[:c], kind="stable")
    np.testing.assert_array_equal(np.asarray(k)[:c], keys[:c][order])
    np.testing.assert_array_equal(np.asarray(v)[:c], vals[:c][order])
    np.testing.assert_array_equal(np.asarray(k)[c:], keys[c:])
    np.testing.assert_array_equal(np.asarray(v)[c:], vals[c:])


def test_pallas_engine_under_shard_map(mesh):
    """The production Pallas kernels running inside shard_map (interpret
    mode on the CPU mesh) — the combination the real pod executes."""
    from vulkan_radix_sort_tpu.config import SortConfig

    n = 8 * 1024 + 17
    cfg = SortConfig(chunk=1 << 10, interpret=True)
    keys = datagen.generate_keys(n, seed=27, distribution="zipf")
    got = np.asarray(
        distributed.sort_sharded(
            jnp.asarray(keys), mesh, config=cfg, use_pallas=True
        )
    )
    np.testing.assert_array_equal(got, np.sort(keys))


@pytest.mark.slow
def test_pallas_pairs_under_shard_map(mesh):
    from vulkan_radix_sort_tpu.config import SortConfig

    n = 8 * 1024
    cfg = SortConfig(chunk=1 << 10, interpret=True)
    keys = datagen.generate_keys(n, seed=28, distribution="few")
    vals = np.arange(n, dtype=np.uint32)
    k, v = distributed.sort_pairs_sharded(
        jnp.asarray(keys), jnp.asarray(vals), mesh, config=cfg,
        use_pallas=True,
    )
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(k), keys[order])
    np.testing.assert_array_equal(np.asarray(v), vals[order])


@pytest.mark.slow
def test_pallas_overlap_under_shard_map(mesh):
    """overlap=True with the real merge kernels (interpret) under shard_map."""
    from vulkan_radix_sort_tpu.config import SortConfig

    n = 8 * 2048  # m=2048 >= 1024 so the bitonic merge path engages
    cfg = SortConfig(chunk=1 << 10, interpret=True)
    keys = datagen.generate_keys(n, seed=29)
    got = np.asarray(
        distributed.sort_sharded(
            jnp.asarray(keys), mesh, config=cfg, use_pallas=True,
            overlap=True,
        )
    )
    np.testing.assert_array_equal(got, np.sort(keys))


# ---- hierarchical ("dcn", "ici") tier ----------------------------------


@pytest.fixture(scope="module", params=[(2, 4), (4, 2)])
def mesh2d(request):
    assert len(jax.devices()) >= 8
    return distributed.make_mesh_2d(*request.param)


@pytest.mark.parametrize("dist", ["uniform", "zipf", "constant"])
def test_2d_sort_sharded(mesh2d, dist):
    n = 8 * 2048
    keys = datagen.generate_keys(n, seed=41, distribution=dist)
    got = np.asarray(distributed.sort_sharded(jnp.asarray(keys), mesh2d))
    np.testing.assert_array_equal(got, np.sort(keys))


def test_2d_pairs_stable(mesh2d):
    """Stability across the two-hop exchange: the H hop-B rounds must land
    received blocks in flat source-rank order."""
    n = 8 * 2048
    keys = (datagen.generate_keys(n, seed=42) % 7).astype(np.uint32)
    vals = np.arange(n, dtype=np.uint32)
    k, v = distributed.sort_pairs_sharded(
        jnp.asarray(keys), jnp.asarray(vals), mesh2d
    )
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(k), keys[order])
    np.testing.assert_array_equal(np.asarray(v), vals[order])


@pytest.mark.parametrize("dist", ["uniform", "constant"])
def test_2d_overlap_keys(mesh2d, dist):
    """Host-half source-split staged exchange (overlap=True on 2-D)."""
    n = 8 * 2048
    keys = datagen.generate_keys(n, seed=45, distribution=dist)
    got = np.asarray(
        distributed.sort_sharded(jnp.asarray(keys), mesh2d, overlap=True)
    )
    np.testing.assert_array_equal(got, np.sort(keys))


def test_2d_overlap_pairs_stable(mesh2d):
    """Stable KV through two masked staged exchanges + validity merge,
    with genuine max keys mixed in (the fill-ambiguity case)."""
    n = 8 * 2048
    rng = np.random.default_rng(46)
    keys = (rng.integers(0, 9, n)).astype(np.uint32)
    keys[rng.random(n) < 0.25] = 0xFFFFFFFF
    vals = np.arange(n, dtype=np.uint32)
    k, v = distributed.sort_pairs_sharded(
        jnp.asarray(keys), jnp.asarray(vals), mesh2d, overlap=True
    )
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(k), keys[order])
    np.testing.assert_array_equal(np.asarray(v), vals[order])


def test_2d_overlap_overflow_adapts():
    """The masked half staged-exchange inherits the staging-fit contract:
    a skewed distribution that overflows slack=1 must adapt, not corrupt."""
    mesh = distributed.make_mesh_2d(2, 4)
    n = 8 * 1024
    m = n // 8
    rng = np.random.default_rng(47)
    keys = np.full(n, 0xF0000000, np.uint32)
    keys[0 * m:1 * m] = rng.integers(0, 1000, m).astype(np.uint32)
    keys[4 * m:5 * m] = rng.integers(0, 1000, m).astype(np.uint32)
    got = np.asarray(
        distributed.sort_sharded(jnp.asarray(keys), mesh, overlap=True)
    )
    np.testing.assert_array_equal(got, np.sort(keys))


def test_2d_ragged_and_count(mesh2d):
    n = 8 * 1024 - 133
    keys = datagen.generate_keys(n, seed=43)
    got = np.asarray(
        distributed.sort_sharded(jnp.asarray(keys), mesh2d, count=997)
    )
    np.testing.assert_array_equal(got[:997], np.sort(keys[:997]))
    np.testing.assert_array_equal(got[997:], keys[997:])


def test_2d_staging_overflow_raises_and_adapts():
    """All data destined for one host concentrated on ici-index-0 source
    chips: hop-A staging at a (0, 0)-peer needs 2x the shard size. A fixed
    dcn_slack=1 must refuse (never silently corrupt); adaptive slack must
    retry and return the exact sort."""
    mesh = distributed.make_mesh_2d(2, 4)
    n = 8 * 1024
    m = n // 8
    rng = np.random.default_rng(44)
    keys = np.full(n, 0xF0000000, np.uint32)
    keys[0 * m:1 * m] = rng.integers(0, 1000, m).astype(np.uint32)
    keys[4 * m:5 * m] = rng.integers(0, 1000, m).astype(np.uint32)
    with pytest.raises(ValueError, match="dcn_slack"):
        distributed.sort_sharded(jnp.asarray(keys), mesh, dcn_slack=1)
    got = np.asarray(distributed.sort_sharded(jnp.asarray(keys), mesh))
    np.testing.assert_array_equal(got, np.sort(keys))


def test_2d_overflow_hops_are_noop():
    """On staging overflow the exchange hops must run with zeroed sizes —
    returned buffers are untouched fills and ok is False everywhere. (On
    TPU this is what keeps a ragged_all_to_all from ever being launched
    with offsets/sizes past the staging buffer; the overflow verdict is
    computed from the replicated size matrix BEFORE any collective.)"""
    H, C = 2, 4
    mesh = distributed.make_mesh_2d(H, C)
    n = 8 * 1024
    m = n // 8
    rng = np.random.default_rng(47)
    keys = np.full(n, 0xF0000000, np.uint32)  # all data bound for host 1
    keys[0 * m:1 * m] = rng.integers(0, 1000, m).astype(np.uint32)
    keys[4 * m:5 * m] = rng.integers(0, 1000, m).astype(np.uint32)
    targets = (jnp.arange(1, 8) * m).astype(jnp.int32)
    axis = (distributed.DCN_AXIS, distributed.ICI_AXIS)
    spec = jax.sharding.PartitionSpec(axis)

    def shard_fn(ks):
        ks = jnp.sort(ks)
        in_off, _, _, _, sizes_all = distributed._exchange_plan(
            ks, targets, m, 8, axis
        )
        (out,), ok = distributed._staged_exchange(
            [ks], sizes_all, in_off, H, C, m, 1, [0xFFFFFFFF]
        )
        return out, ok.astype(jnp.int32).reshape(1)

    out, ok = jax.shard_map(
        shard_fn, mesh=mesh, in_specs=(spec,),
        out_specs=(spec, jax.sharding.PartitionSpec()), check_vma=False,
    )(jnp.asarray(keys))
    assert int(np.asarray(ok)[0]) == 0
    np.testing.assert_array_equal(
        np.asarray(out), np.full(n, 0xFFFFFFFF, np.uint32)
    )


def test_2d_traced_count_under_jit():
    """The count= contract says "traced scalar ok": under an outer jit on
    a 2-D mesh the adaptive retry cannot read the staging-fit flag, so
    the safe slack must engage when ANY operand is traced — count
    included, not just keys (regression: a traced count with concrete
    keys used to hit the concrete retry loop and crash on bool(tracer))."""
    mesh = distributed.make_mesh_2d(2, 4)
    n = 8 * 1024
    keys = datagen.generate_keys(n, seed=46, distribution="few")
    f = jax.jit(
        lambda c: distributed.sort_sharded(jnp.asarray(keys), mesh, count=c)
    )
    got = np.asarray(f(jnp.uint32(997)))
    np.testing.assert_array_equal(got[:997], np.sort(keys[:997]))
    np.testing.assert_array_equal(got[997:], keys[997:])


@pytest.mark.slow
def test_2d_pallas_engine_under_shard_map():
    """Production Pallas kernels inside the hierarchical path."""
    from vulkan_radix_sort_tpu.config import SortConfig

    mesh = distributed.make_mesh_2d(2, 4)
    n = 8 * 1024 + 29
    cfg = SortConfig(chunk=1 << 10, interpret=True)
    keys = datagen.generate_keys(n, seed=45, distribution="zipf")
    got = np.asarray(
        distributed.sort_sharded(
            jnp.asarray(keys), mesh, config=cfg, use_pallas=True
        )
    )
    np.testing.assert_array_equal(got, np.sort(keys))


class TestMergeResort:
    """Slotted exchange + merge-rounds-only re-sort (sort_sharded
    merge_resort=) — the distributed fast path exploiting that arrivals
    are one sorted run per source."""

    def _cfg(self):
        from vulkan_radix_sort_tpu.config import SortConfig

        return SortConfig(chunk=1 << 10, interpret=True)

    def test_keys(self, mesh):
        n = 8 * 2048
        keys = datagen.generate_keys(n, seed=31)
        got = np.asarray(
            distributed.sort_sharded(
                jnp.asarray(keys), mesh, config=self._cfg(),
                use_pallas=True, merge_resort=True,
            )
        )
        np.testing.assert_array_equal(got, np.sort(keys))

    @pytest.mark.slow
    def test_pairs_stable_duplicates(self, mesh):
        n = 8 * 1024
        keys = (datagen.generate_keys(n, seed=32) & 0xF) * 0x11111111
        vals = np.arange(n, dtype=np.uint32)
        k, v = distributed.sort_pairs_sharded(
            jnp.asarray(keys), jnp.asarray(vals), mesh, config=self._cfg(),
            use_pallas=True, merge_resort=True,
        )
        order = np.argsort(keys, kind="stable")
        np.testing.assert_array_equal(np.asarray(k), keys[order])
        np.testing.assert_array_equal(np.asarray(v), vals[order])

    def test_ragged_n_and_count(self, mesh):
        """Padding + count sentinels all route to the LAST destination's
        slot from the tail source(s), so the masked suffix must stay
        under the slot size for the merge path to fit (bigger masks
        auto-fall back — test_auto_fallback_on_skew)."""
        n = 8 * 1024 - 37
        m = n - 100
        keys = datagen.generate_keys(n, seed=33)
        got = np.asarray(
            distributed.sort_sharded(
                jnp.asarray(keys), mesh, config=self._cfg(),
                use_pallas=True, merge_resort=True, count=m,
            )
        )
        np.testing.assert_array_equal(got[:m], np.sort(keys[:m]))
        np.testing.assert_array_equal(got[m:], keys[m:])

    def test_auto_fallback_on_skew(self, mesh):
        """Constant keys make one source->dest cell hold a whole shard:
        the slack-2 slots overflow and auto mode falls back to the packed
        exchange + full re-sort (still exact)."""
        n = 8 * 512
        keys = np.zeros(n, np.uint32)
        got = np.asarray(
            distributed.sort_sharded(
                jnp.asarray(keys), mesh, config=self._cfg(),
                use_pallas=True, merge_resort=None,
            )
        )
        np.testing.assert_array_equal(got, keys)

    def test_explicit_overflow_raises(self, mesh):
        n = 8 * 1024
        keys = np.zeros(n, np.uint32)
        with pytest.raises(ValueError, match="slot staging"):
            distributed.sort_sharded(
                jnp.asarray(keys), mesh, config=self._cfg(),
                use_pallas=True, merge_resort=True,
            )

    def test_explicit_under_jit_raises(self, mesh):
        import jax

        n = 8 * 512
        keys = jnp.asarray(datagen.generate_keys(n, seed=34))

        @jax.jit
        def f(k):
            return distributed.sort_sharded(
                k, mesh, config=self._cfg(), use_pallas=True,
                merge_resort=True,
            )

        with pytest.raises(ValueError, match="outer jit"):
            f(keys)

    def test_auto_under_jit_uses_full_resort(self, mesh):
        """merge_resort=None under an outer jit silently picks the safe
        full re-sort (no concrete fit flag is available)."""
        import jax

        n = 8 * 512
        keys = datagen.generate_keys(n, seed=35)

        @jax.jit
        def f(k):
            return distributed.sort_sharded(
                k, mesh, config=self._cfg(), use_pallas=True,
            )

        np.testing.assert_array_equal(np.asarray(f(jnp.asarray(keys))),
                                      np.sort(keys))

    def test_2d_hierarchical_merge(self):
        """Slotted hop-B placement on a ("dcn", "ici") mesh: slot index =
        flat source rank, so the merge re-sort preserves the same
        positional stability the packed hop-B rounds give."""
        mesh2 = distributed.make_mesh_2d(2, 4)
        n = 8 * 1024
        keys = datagen.generate_keys(n, seed=41)
        got = np.asarray(
            distributed.sort_sharded(
                jnp.asarray(keys), mesh2, config=self._cfg(),
                use_pallas=True, merge_resort=True,
            )
        )
        np.testing.assert_array_equal(got, np.sort(keys))

    @pytest.mark.slow
    def test_2d_hierarchical_merge_pairs_stable(self):
        mesh2 = distributed.make_mesh_2d(4, 2)
        n = 8 * 1024
        keys = (datagen.generate_keys(n, seed=42) & 0x7) * 0x13371337
        vals = np.arange(n, dtype=np.uint32)
        k, v = distributed.sort_pairs_sharded(
            jnp.asarray(keys), jnp.asarray(vals), mesh2,
            config=self._cfg(), use_pallas=True, merge_resort=True,
        )
        order = np.argsort(keys, kind="stable")
        np.testing.assert_array_equal(np.asarray(k), keys[order])
        np.testing.assert_array_equal(np.asarray(v), vals[order])

    def test_overlap_merge_keys(self, mesh):
        """overlap=True composed with merge_resort: two slotted half-
        exchanges + half merges + final half-merge combine."""
        n = 8 * 1024
        keys = datagen.generate_keys(n, seed=43)
        got = np.asarray(
            distributed.sort_sharded(
                jnp.asarray(keys), mesh, config=self._cfg(),
                use_pallas=True, overlap=True, merge_resort=True,
            )
        )
        np.testing.assert_array_equal(got, np.sort(keys))

    @pytest.mark.slow
    def test_overlap_merge_pairs_stable_max_keys(self, mesh):
        n = 8 * 1024
        rng = np.random.default_rng(44)
        keys = (datagen.generate_keys(n, seed=44) & 0xF) * 0x11111111
        keys[rng.random(n) < 0.1] = 0xFFFFFFFF
        vals = np.arange(n, dtype=np.uint32)
        k, v = distributed.sort_pairs_sharded(
            jnp.asarray(keys), jnp.asarray(vals), mesh,
            config=self._cfg(), use_pallas=True, overlap=True,
            merge_resort=True,
        )
        order = np.argsort(keys, kind="stable")
        np.testing.assert_array_equal(np.asarray(k), keys[order])
        np.testing.assert_array_equal(np.asarray(v), vals[order])

    def test_overlap_merge_non_pow2_mesh(self):
        """D=5: next_pow2(half)*S < m, so the half merges are PADDED back
        to the shard size — regression for the uint32 fill overflowing the
        weak-typed pad argument (found by review; pow2 meshes never take
        the pad branch)."""
        mesh5 = distributed.make_mesh(5)
        n = 5 * 640
        keys = datagen.generate_keys(n, seed=45)
        got = np.asarray(
            distributed.sort_sharded(
                jnp.asarray(keys), mesh5, config=self._cfg(),
                use_pallas=True, overlap=True, merge_resort=True,
            )
        )
        np.testing.assert_array_equal(got, np.sort(keys))
        vals = np.arange(n, dtype=np.uint32)
        k2 = (keys & 0x3) * 0x40000001
        gk, gv = distributed.sort_pairs_sharded(
            jnp.asarray(k2), jnp.asarray(vals), mesh5, config=self._cfg(),
            use_pallas=True, overlap=True, merge_resort=True,
        )
        order = np.argsort(k2, kind="stable")
        np.testing.assert_array_equal(np.asarray(gk), k2[order])
        np.testing.assert_array_equal(np.asarray(gv), vals[order])
