"""Sharded LCP tests: distributed PLCP vs the Kasai oracle.

Removes the reference's serial LCP tail (src/mpi/main_mpi.c:66-69) — so the
test bar is byte-equality with Kasai on every input class, including texts
containing 0x00 bytes (which stress the pad-disambiguation guards).
"""

import numpy as np
import pytest

from hpc_suffix_array_tpu.core.oracle import lcp_oracle
from hpc_suffix_array_tpu.parallel import make_mesh, build_suffix_array_sharded
from hpc_suffix_array_tpu.parallel.lcp import build_lcp_array_sharded

from tests.conftest import CANONICAL

ALNUM = np.frombuffer(
    b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789",
    np.uint8)


@pytest.fixture(scope="module", params=[2, 8])
def mesh(request):
    return make_mesh(request.param)


def _check(text, mesh):
    sa = build_suffix_array_sharded(text, mesh)
    lcp = np.asarray(build_lcp_array_sharded(text, sa, mesh))
    assert np.array_equal(lcp, lcp_oracle(text, np.asarray(sa)))


def test_canonical(mesh, canonical_case):
    _name, text = canonical_case
    _check(text, mesh)


@pytest.mark.parametrize("n,alpha", [(1, 256), (100, 4), (1023, 2),
                                     (5000, 256), (20000, 4)])
def test_random(mesh, rng, n, alpha):
    _check(rng.integers(0, alpha, n, dtype=np.uint8).tobytes(), mesh)


def test_zero_bytes(mesh):
    """0x00 text bytes must not be confused with the pad sentinel."""
    _check(b"\x00" * 700, mesh)
    _check(b"xy\x00\x00\x00" * 100 + b"\x00\x00\x00", mesh)


def test_matches_single_device(mesh, rng):
    from hpc_suffix_array_tpu.core.lcp import build_lcp_array
    from hpc_suffix_array_tpu.core.suffix_array import build_suffix_array

    text = rng.integers(0, 30, 4000, dtype=np.uint8).tobytes()
    sa1 = build_suffix_array(text)
    sa2 = build_suffix_array_sharded(text, mesh)
    assert np.array_equal(np.asarray(sa1), np.asarray(sa2))
    assert np.array_equal(
        np.asarray(build_lcp_array(text, sa1)),
        np.asarray(build_lcp_array_sharded(text, sa2, mesh)))


def test_big_route_carried_keys(mesh, rng, monkeypatch):
    """Past SA_LCP_BIG_MIN the sharded LCP rebuilds via the one-pass MSD
    carried-keys path (parallel/lcp.py big route); byte-equal to Kasai."""
    monkeypatch.setenv("SA_LCP_BIG_MIN", "4000")
    text = ALNUM[rng.integers(0, 62, 20_000)].tobytes()
    _check(text, mesh)


def test_big_route_periodic_chain(mesh, monkeypatch):
    """Globally periodic text takes the chain rule inside the rebuild."""
    monkeypatch.setenv("SA_LCP_BIG_MIN", "4000")
    _check((b"bananarama" * 2000)[:19_000], mesh)


def test_big_route_skew_falls_back(mesh, monkeypatch):
    """A single long repeated block defeats the residue predictor; the
    route must fall back to the distributed PLCP, still byte-exact."""
    monkeypatch.setenv("SA_LCP_BIG_MIN", "4000")
    rng = np.random.default_rng(7)
    t = ALNUM[rng.integers(0, 62, 16_000)]
    t[8_000:12_000] = t[1_000:5_000]
    _check(t.tobytes(), mesh)
