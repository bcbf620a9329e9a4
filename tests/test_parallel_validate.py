"""Sharded validator tests: must accept exactly the true SA, reject others."""

import numpy as np
import pytest

from hpc_suffix_array_tpu.parallel import (
    build_suffix_array_sharded, is_valid_suffix_array_sharded, make_mesh)

from tests.conftest import CANONICAL


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def test_accepts_true_sa(mesh, canonical_case):
    _name, text = canonical_case
    sa = np.asarray(build_suffix_array_sharded(text, mesh))
    assert is_valid_suffix_array_sharded(text, sa, mesh)


@pytest.mark.parametrize("alpha", [2, 256])
def test_random_accept_and_reject(mesh, rng, alpha):
    text = rng.integers(0, alpha, 3000, dtype=np.uint8).tobytes()
    sa = np.asarray(build_suffix_array_sharded(text, mesh))
    assert is_valid_suffix_array_sharded(text, sa, mesh)

    bad = sa.copy()
    bad[10], bad[2000] = bad[2000], bad[10]        # order violation
    assert not is_valid_suffix_array_sharded(text, bad, mesh)

    dup = sa.copy()
    dup[5] = dup[6]                                # not a permutation
    assert not is_valid_suffix_array_sharded(text, dup, mesh)

    shifted = (sa + 1) % len(sa)                   # permutation, wrong order
    assert not is_valid_suffix_array_sharded(text, shifted, mesh)


def test_zero_byte_text(mesh):
    text = b"xy\x00\x00" * 200
    sa = np.asarray(build_suffix_array_sharded(text, mesh))
    assert is_valid_suffix_array_sharded(text, sa, mesh)
