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
