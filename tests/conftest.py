"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device tests run on CPU with XLA's forced host device count - the
TPU-native analog of the reference's ``mpirun --oversubscribe`` single-node
fakery (reference scripts/benchmark_mpi.py:61). Must run before jax imports.
"""

import os

# The session environment pins JAX_PLATFORMS to the real TPU tunnel ("axon",
# 1 chip, slow remote compiles) AND pre-imports jax at interpreter startup
# via PYTHONPATH=/root/.axon_site — so jax's config has already snapshotted
# the env var. Setting os.environ here is too late; jax.config.update is the
# reliable override (the backend itself is not initialized until first use).
# Force the value (replacing any pre-set count) rather than only appending:
# a pre-existing different device count would otherwise abort collection.
import re as _re

flags = os.environ.get("XLA_FLAGS", "")
flags = _re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Do NOT enable the persistent compile cache here: its XLA:CPU AOT
# entries are compiled for a machine profile this host lacks
# (+prefer-no-scatter etc.), and the load/recompile cycle runs away
# (measured 33+ GB RSS, never finishing, on the 8-device dryrun —
# 128 s with the cache off; 2026-08-18).
if jax.local_device_count() != 8:
    import pytest as _pytest

    _pytest.exit(
        "tests require the 8-device virtual CPU mesh (jax was initialized "
        f"before conftest could set XLA_FLAGS); got {jax.devices()}",
        returncode=3)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from hpc_suffix_array_tpu.utils.hostmem import (  # noqa: E402
    disable_hugepage_madvise, keep_host_memory_hot)

disable_hugepage_madvise()   # VM-class host-memory workarounds
keep_host_memory_hot()       # (see utils/hostmem.py)


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
