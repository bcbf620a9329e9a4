"""Sharded-execution tests on the virtual 8-device CPU mesh.

The multi-device analog of the reference's `make test-mpi`
(reference Makefile:126-128) and oversubscribed MPI sweep
(scripts/benchmark_mpi.py:61,154), using XLA's forced host device count
instead of mpirun (see conftest.py).
"""

import jax
import numpy as np
import pytest

from hpc_suffix_array_tpu.core.oracle import suffix_array_oracle
from hpc_suffix_array_tpu.core.suffix_array import build_suffix_array
from hpc_suffix_array_tpu.parallel import build_suffix_array_sharded, make_mesh
from hpc_suffix_array_tpu.parallel.bitonic import block_bitonic_sort

from tests.conftest import CANONICAL


@pytest.fixture(scope="module", params=[1, 2, 4, 8])
def mesh(request):
    return make_mesh(request.param)


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(8)


def test_canonical_matches_oracle(mesh, canonical_case):
    name, text = canonical_case
    sa = np.asarray(build_suffix_array_sharded(text, mesh))
    assert np.array_equal(sa, suffix_array_oracle(text)), name


@pytest.mark.parametrize("n", [1, 2, 7, 127, 1024, 4097, 20000])
def test_random_matches_oracle(mesh8, rng, n):
    text = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    sa = np.asarray(build_suffix_array_sharded(text, mesh8))
    assert np.array_equal(sa, suffix_array_oracle(text))


@pytest.mark.parametrize("alphabet", [1, 2, 4])
def test_skewed_alphabets(mesh8, rng, alphabet):
    """Degenerate/low-entropy keys: the case that breaks splitter-based
    partitioning (SURVEY §7 hard part 7); bitonic must not care."""
    text = rng.integers(0, alphabet, 5000, dtype=np.uint8).tobytes()
    sa = np.asarray(build_suffix_array_sharded(text, mesh8))
    assert np.array_equal(sa, suffix_array_oracle(text))


def test_mesh_shape_determinism(rng):
    """Same input => identical SA on every mesh size (SURVEY §7 layer 7)."""
    text = rng.integers(0, 64, 3000, dtype=np.uint8).tobytes()
    results = [
        np.asarray(build_suffix_array_sharded(text, make_mesh(p)))
        for p in (1, 2, 4, 8)
    ]
    single = np.asarray(build_suffix_array(text))
    for r in results:
        assert np.array_equal(r, single)


def test_block_bitonic_sort_global_order(mesh8, rng):
    """Direct unit test of the distributed sort primitive."""
    from jax.sharding import NamedSharding, PartitionSpec
    import functools

    n = 8 * 256
    keys = rng.integers(0, 50, n).astype(np.int32)   # heavy duplicates
    vals = np.arange(n, dtype=np.int32)

    f = jax.jit(jax.shard_map(
        lambda a, b: block_bitonic_sort((a, b), 1, "seq", 8),
        mesh=mesh8,
        in_specs=(PartitionSpec("seq"), PartitionSpec("seq")),
        out_specs=(PartitionSpec("seq"), PartitionSpec("seq")),
        check_vma=False,
    ))
    sharding = NamedSharding(mesh8, PartitionSpec("seq"))
    sk, sv = f(jax.device_put(keys, sharding), jax.device_put(vals, sharding))
    sk, sv = np.asarray(sk), np.asarray(sv)
    assert np.all(np.diff(sk) >= 0)
    assert np.array_equal(np.sort(sv), vals)          # a permutation
    assert np.array_equal(sk, keys[sv])               # values follow keys


def test_graft_entry_contract():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.block_until_ready(jax.jit(fn)(*args))
    assert out[0].shape == args[0].shape
    ge.dryrun_multichip(8)
