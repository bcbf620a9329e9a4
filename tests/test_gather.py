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


def _routed_fn(mesh8, fill=0, ndim1=True):
    from hpc_suffix_array_tpu.parallel.gather import _serve_routed

    def g(v, i):
        n = 8 * v.shape[0]
        out = _serve_routed(v, jnp.clip(i, 0, n - 1), "seq", 8)
        ok = (i >= 0) & (i < n)
        if v.ndim > 1:
            ok = ok.reshape(ok.shape + (1,) * (v.ndim - 1))
        return jnp.where(ok, out, jnp.asarray(fill, v.dtype))

    return jax.jit(jax.shard_map(
        g, mesh=mesh8,
        in_specs=(PartitionSpec("seq"), PartitionSpec("seq")),
        out_specs=PartitionSpec("seq"), check_vma=False))


def test_dist_gather_routed_random(mesh8, rng):
    """Routed path (uniform requests -> no overflow) matches numpy."""
    n = 8 * 512
    values = rng.integers(-1000, 1000, n).astype(np.int32)
    indices = rng.integers(-50, n + 50, n).astype(np.int32)
    out = np.asarray(_routed_fn(mesh8, fill=-7)(
        _sharded(mesh8, values), _sharded(mesh8, indices)))
    expect = np.where((indices >= 0) & (indices < n),
                      values[np.clip(indices, 0, n - 1)], -7)
    assert np.array_equal(out, expect)


def test_dist_gather_routed_skew_fallback(mesh8):
    """Total skew (every request targets shard 0) overflows the routed
    budget on every shard and must take the ring branch — still exact."""
    n = 8 * 256
    values = np.arange(n, dtype=np.int32) * 3
    indices = np.zeros(n, np.int32)
    out = np.asarray(_routed_fn(mesh8)(
        _sharded(mesh8, values), _sharded(mesh8, indices)))
    assert np.array_equal(out, np.zeros(n, np.int32))


def test_dist_gather_routed_partial_skew(mesh8, rng):
    """One shard's requests all hit one owner (local overflow) while the
    others are uniform: the axis-uniform predicate must push EVERY shard
    to the ring branch together (no deadlock, exact result)."""
    n = 8 * 512
    m = n // 8
    values = rng.integers(0, 1 << 20, n).astype(np.int32)
    indices = rng.integers(0, n, n).astype(np.int32)
    indices[:m] = 5 * m + 17        # shard 0 -> all to owner 5
    out = np.asarray(_routed_fn(mesh8)(
        _sharded(mesh8, values), _sharded(mesh8, indices)))
    assert np.array_equal(out, values[indices])


def test_dist_gather_routed_2d(mesh8, rng):
    """Row gathers (values.ndim == 2), as used by the LCP jump step."""
    n = 8 * 256
    values = rng.integers(0, 100, (n, 3)).astype(np.int32)
    indices = rng.permutation(n).astype(np.int32)
    out = np.asarray(_routed_fn(mesh8)(
        _sharded(mesh8, values), _sharded(mesh8, indices)))
    assert np.array_equal(out, values[indices])


def test_dist_gather_dispatch_threshold(mesh8, rng, monkeypatch):
    """dist_gather takes the routed path when P >= ROUTED_MIN_SHARDS."""
    import hpc_suffix_array_tpu.parallel.gather as G

    monkeypatch.setattr(G, "ROUTED_MIN_SHARDS", 8)
    n = 8 * 512
    values = rng.integers(-99, 99, n).astype(np.int32)
    indices = rng.integers(-9, n + 9, n).astype(np.int32)
    f = jax.jit(jax.shard_map(
        lambda v, i: dist_gather(v, i, "seq", 8, fill=1234),
        mesh=mesh8,
        in_specs=(PartitionSpec("seq"), PartitionSpec("seq")),
        out_specs=PartitionSpec("seq"), check_vma=False))
    out = np.asarray(f(_sharded(mesh8, values), _sharded(mesh8, indices)))
    expect = np.where((indices >= 0) & (indices < n),
                      values[np.clip(indices, 0, n - 1)], 1234)
    assert np.array_equal(out, expect)


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
