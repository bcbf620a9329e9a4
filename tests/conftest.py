"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device tests run on CPU with XLA's forced host device count - the
TPU-native analog of the reference's ``mpirun --oversubscribe`` single-node
fakery (reference scripts/benchmark_mpi.py:61). Must run before jax imports.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xC0FFEE)


# Canonical fixture strings; goldens from the reference Makefile:131-138 and
# generate_large_datasets.py:86-102.
CANONICAL = {
    "banana": b"banana",
    "mississippi": b"mississippi",
    "abcabcabc": b"abcabcabc",
    "aaaa": b"a" * 1000,
    "ababab": b"ab" * 500,
}

GOLDEN_LRS = {
    "banana": b"ana",
    "mississippi": b"issi",
    "abcabcabc": b"abcabc",
    "aaaa": b"a" * 999,
    "ababab": b"ab" * 499,
}


@pytest.fixture(params=sorted(CANONICAL))
def canonical_case(request):
    return request.param, CANONICAL[request.param]
