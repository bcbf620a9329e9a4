"""Unit tests for the distributed gather/scatter routing primitives."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec

from hpc_suffix_array_tpu.parallel import make_mesh
from hpc_suffix_array_tpu.parallel.gather import dist_gather, dist_scatter_perm


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(8)


def _sharded(mesh, x):
    return jax.device_put(x, NamedSharding(mesh, PartitionSpec("seq")))


def test_dist_gather_random_indices(mesh8, rng):
    n = 8 * 512
    values = rng.integers(-1000, 1000, n).astype(np.int32)
    indices = rng.integers(-50, n + 50, n).astype(np.int32)  # incl. o-o-r

    f = jax.jit(jax.shard_map(
        lambda v, i: dist_gather(v, i, "seq", 8, fill=-7),
        mesh=mesh8,
        in_specs=(PartitionSpec("seq"), PartitionSpec("seq")),
        out_specs=PartitionSpec("seq"), check_vma=False))
    out = np.asarray(f(_sharded(mesh8, values), _sharded(mesh8, indices)))
    expect = np.where((indices >= 0) & (indices < n), values[np.clip(indices, 0, n - 1)], -7)
    assert np.array_equal(out, expect)


def test_dist_gather_skewed(mesh8):
    n = 8 * 256
    values = np.arange(n, dtype=np.int32)
    indices = np.zeros(n, np.int32)          # everyone asks shard 0
    f = jax.jit(jax.shard_map(
        lambda v, i: dist_gather(v, i, "seq", 8),
        mesh=mesh8,
        in_specs=(PartitionSpec("seq"), PartitionSpec("seq")),
        out_specs=PartitionSpec("seq"), check_vma=False))
    out = np.asarray(f(_sharded(mesh8, values), _sharded(mesh8, indices)))
    assert np.array_equal(out, np.zeros(n, np.int32))


def test_dist_scatter_perm(mesh8, rng):
    n = 8 * 512
    values = rng.integers(0, 10_000, n).astype(np.int32)
    dest = rng.permutation(n).astype(np.int32)
    f = jax.jit(jax.shard_map(
        lambda v, d: dist_scatter_perm(v, d, "seq", 8),
        mesh=mesh8,
        in_specs=(PartitionSpec("seq"), PartitionSpec("seq")),
        out_specs=PartitionSpec("seq"), check_vma=False))
    out = np.asarray(f(_sharded(mesh8, values), _sharded(mesh8, dest)))
    expect = np.zeros(n, np.int32)
    expect[dest] = values
    assert np.array_equal(out, expect)
