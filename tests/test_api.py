"""SuffixArray object API (the reference's create/build/destroy lifecycle,
src/common/suffix_array.h:24-29) on both single-device and mesh paths."""

import numpy as np
import pytest

from hpc_suffix_array_tpu import SuffixArray, make_mesh
from hpc_suffix_array_tpu.core.oracle import lcp_oracle, lrs_oracle


@pytest.mark.parametrize("mesh_size", [None, 4])
def test_lifecycle(rng, mesh_size):
    mesh = make_mesh(mesh_size) if mesh_size else None
    text = bytes(rng.integers(0, 16, 2000, dtype=np.uint8))
    sa = SuffixArray.create(text, mesh=mesh)
    assert sa.n == 2000
    sa.build().build_lcp()
    assert np.array_equal(np.asarray(sa.lcp),
                          lcp_oracle(text, np.asarray(sa.sa)))
    assert sa.longest_repeated_substring() == lrs_oracle(text)
    assert sa.validate()


def test_lazy_chains():
    sa = SuffixArray.create(b"banana")
    # LRS without explicit build/build_lcp triggers the whole chain
    assert sa.longest_repeated_substring() == b"ana"
    assert sa.sa is not None and sa.lcp is not None
    assert sa.validate()
