"""Native helper tests: SA-IS vs oracle, Kasai, O(n) validator.

The native layer is the trusted fast host oracle (role of the reference's
sequential C core, src/sequential/manber_myers.c) — it must agree with the
slow Python oracle everywhere.
"""

import numpy as np
import pytest

from hpc_suffix_array_tpu import native
from hpc_suffix_array_tpu.core.oracle import (
    lcp_oracle, suffix_array_oracle)

from tests.conftest import CANONICAL

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C compiler available")


def test_canonical(canonical_case):
    name, text = canonical_case
    arr = np.frombuffer(text, np.uint8)
    sa = native.sa_build(arr)
    assert np.array_equal(sa, suffix_array_oracle(text))
    assert np.array_equal(native.lcp_kasai(arr, sa), lcp_oracle(text, sa))
    assert native.sa_validate(arr, sa)


@pytest.mark.parametrize("n,alpha", [(1, 2), (100, 2), (1000, 4),
                                     (4097, 256), (50000, 26)])
def test_random_vs_oracle(rng, n, alpha):
    t = rng.integers(0, alpha, n, dtype=np.uint8)
    sa = native.sa_build(t)
    assert np.array_equal(sa, suffix_array_oracle(t.tobytes()))
    assert native.sa_validate(t, sa)


def test_validator_rejects_corruption(rng):
    t = rng.integers(0, 4, 1000, dtype=np.uint8)
    sa = native.sa_build(t)
    bad = sa.copy()
    bad[0], bad[500] = bad[500], bad[0]
    assert not native.sa_validate(t, bad)
    dup = sa.copy()
    dup[1] = dup[0]                      # not a permutation
    assert not native.sa_validate(t, dup)


def test_agrees_with_device_kernel(rng):
    from hpc_suffix_array_tpu.core.suffix_array import build_suffix_array

    t = rng.integers(0, 256, 8192, dtype=np.uint8)
    assert np.array_equal(np.asarray(build_suffix_array(t)),
                          native.sa_build(t))
