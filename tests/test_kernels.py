"""Pallas kernel tests (interpret mode on CPU; compiled path runs on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hpc_suffix_array_tpu.kernels.pack import pack_ranks_pallas


def _reference_pack(codes, bits, h0):
    ext = np.concatenate([codes, np.zeros(h0, np.int32)])
    want = np.zeros(len(codes), np.int64)
    for j in range(h0):
        want = (want << bits) | ext[j:j + len(codes)]
    return want.astype(np.int32)


@pytest.mark.parametrize("n,bits,h0", [
    (128, 6, 5), (128 * 8, 3, 10), (128 * 9, 9, 3),
    (128 * 513, 6, 5), (1 << 17, 1, 30),
])
def test_pack_matches_reference(rng, n, bits, h0):
    codes = rng.integers(0, 1 << bits, n).astype(np.int32)
    got = np.asarray(pack_ranks_pallas(jnp.asarray(codes), bits, h0, True))
    assert np.array_equal(got, _reference_pack(codes, bits, h0))


def test_pack_zero_tail(rng):
    """Trailing zeros (pad sentinel region) fold in as rank 0."""
    codes = np.zeros(1024, np.int32)
    codes[:100] = rng.integers(1, 4, 100)
    got = np.asarray(pack_ranks_pallas(jnp.asarray(codes), 2, 15, True))
    assert np.array_equal(got, _reference_pack(codes, 2, 15))
