"""Phase-fraction / scaling harness smoke tests (CPU mesh proxy)."""

import jax
import pytest

from vulkan_radix_sort_tpu.parallel import distributed, scaling


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return distributed.make_mesh(8)


def test_phase_report_shape(mesh):
    rep = scaling.phase_report(mesh, 8 * 512, iters=1)
    for key in ("local_sort_s", "exchange_s", "resort_s", "full_s",
                "overlap_hidden_s", "exchange_fraction"):
        assert key in rep
    assert rep["devices"] == 8
    assert rep["full_s"] > 0
    assert 0.0 <= rep["exchange_fraction"] <= 1.0


@pytest.mark.slow
def test_scaling_report_rows():
    rows = scaling.scaling_report(512, device_counts=[1, 2, 4], iters=1)
    assert len(rows) == 3
    assert rows[0]["weak_efficiency"] == 1.0
    assert all(r["full_s"] > 0 for r in rows)


def test_dcn_report_fields_and_traffic():
    from vulkan_radix_sort_tpu.parallel import distributed, scaling

    mesh = distributed.make_mesh_2d(2, 4)
    rep = scaling.dcn_report(mesh, 8 * 512, iters=1)
    assert rep["mesh"] == (2, 4)
    assert rep["dcn_messages_per_chip"] == 1
    assert rep["flat_dcn_messages_per_chip"] == 4
    # uniform keys: about half the data crosses the host boundary, all of
    # it rides hop B; both bounded by the total volume
    assert 0 < rep["dcn_bytes"] <= rep["hop_b_ici_bytes"] == 8 * 512 * 4
    assert rep["full_s"] > 0


def test_phase_report_rejects_2d_mesh():
    from vulkan_radix_sort_tpu.parallel import distributed, scaling

    mesh = distributed.make_mesh_2d(2, 4)
    with pytest.raises(ValueError, match="dcn_report"):
        scaling.phase_report(mesh, 8 * 512, iters=1)


def test_dcn_report_rejects_overflowing_slack():
    """A distribution that overflows hop-A staging at the given slack must
    raise instead of timing zeroed no-op hops."""
    import numpy as np

    from vulkan_radix_sort_tpu.parallel import distributed, scaling

    mesh = distributed.make_mesh_2d(2, 4)
    n = 8 * 1024
    m = n // 8
    rng = np.random.default_rng(48)
    keys = np.full(n, 0xF0000000, np.uint32)
    keys[0 * m:1 * m] = rng.integers(0, 1000, m).astype(np.uint32)
    keys[4 * m:5 * m] = rng.integers(0, 1000, m).astype(np.uint32)
    import unittest.mock as mock

    from vulkan_radix_sort_tpu.utils import datagen

    with mock.patch.object(datagen, "generate_keys", lambda *a, **k: keys):
        with pytest.raises(ValueError, match="dcn_slack"):
            scaling.dcn_report(mesh, n, dcn_slack=1, iters=1)
