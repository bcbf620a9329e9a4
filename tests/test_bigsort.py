"""Out-of-core MSD bucket sort (core/bigsort.py) vs the SA-IS oracle.

Tiny chunk/bucket parameters force the full machinery (multi-chunk
distribute, ragged bucket assembly, deepening retries) at CPU-test sizes.
"""

import numpy as np
import pytest

from hpc_suffix_array_tpu.core.bigsort import (
    build_suffix_array_big, carried_depth_syms, prepare_big, execute_big)
from hpc_suffix_array_tpu.core.oracle import suffix_array_oracle

TINY = dict(target_bucket=1 << 12, chunk_elems=1 << 12, sample=1 << 12)

ALNUM = np.frombuffer(
    b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789",
    np.uint8)


def _check(text):
    sa = np.asarray(build_suffix_array_big(np.asarray(text), **TINY))
    ref = np.asarray(suffix_array_oracle(bytes(text)))
    assert np.array_equal(sa, ref)


def test_random_bytes(rng):
    _check(rng.integers(0, 256, 40_000).astype(np.uint8))


def test_alnum(rng):
    _check(ALNUM[rng.integers(0, 62, 40_000)])


def test_dna(rng):
    _check(np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, 40_000)])


def test_low_entropy_with_zero_bytes(rng):
    """Byte value 0 is a real symbol, distinct from past-the-end."""
    _check(rng.integers(0, 3, 30_000).astype(np.uint8))


def test_long_repeats_host_residue(rng):
    """A 60-symbol block repeated at scattered positions: those suffixes
    tie past the carried-key depth (alnum: 10 symbols) and must resolve
    through the host-residue path."""
    text = ALNUM[rng.integers(0, 62, 30_000)]
    block = ALNUM[rng.integers(0, 62, 60)]
    for at in (1000, 7777, 15000, 22222):
        text[at:at + 60] = block
    sa = np.asarray(build_suffix_array_big(text, **TINY))
    assert np.array_equal(sa, np.asarray(suffix_array_oracle(text.tobytes())))


def test_periodic_chain_resolution(rng):
    """Globally periodic text (the reference's repetitive corpus family,
    scripts/generate_large_datasets.py:16-23): window ties persist at any
    window depth and resolve through the periodic-chain rule instead."""
    text = np.tile(ALNUM[rng.integers(0, 62, 1000)], 40)      # exact tiling
    _check(text)


def test_periodic_with_partial_tail(rng):
    text = np.tile(ALNUM[rng.integers(0, 62, 997)], 41)[:40_000]
    _check(text)


def test_period_two(rng):
    _check(np.tile(np.frombuffer(b"ab", np.uint8), 15_000))


def test_broken_period_raises(rng):
    """P^k X P^k: chains exist but delta is not a global period - must
    fail loudly, not silently misorder."""
    pat = ALNUM[rng.integers(0, 62, 500)]
    text = np.concatenate([np.tile(pat, 30),
                           ALNUM[rng.integers(0, 62, 100)],
                           np.tile(pat, 30)])
    with pytest.raises(NotImplementedError, match="doubling|sharded"):
        build_suffix_array_big(text, **TINY)


def test_single_chunk_single_bucket(rng):
    _check(rng.integers(0, 256, 3000).astype(np.uint8))


def test_carried_depth():
    assert carried_depth_syms(4) == 20          # DNA: 3-bit codes
    assert carried_depth_syms(256) == 6         # full bytes: 9-bit codes
    assert carried_depth_syms(62) == 10         # alnum: 6-bit codes


def test_staged_api_matches_oneshot(rng):
    text = ALNUM[rng.integers(0, 62, 20_000)]
    state = prepare_big(text, **TINY)
    sa = np.asarray(execute_big(state))
    assert np.array_equal(
        sa, np.asarray(build_suffix_array_big(text, **TINY)))
    assert state["plan"].meta["n_buckets_run"] > 1


def test_dispatch_threshold(rng, monkeypatch):
    """build_suffix_array routes big texts through bigsort."""
    from hpc_suffix_array_tpu.core.suffix_array import build_suffix_array

    monkeypatch.setenv("SA_BIG_THRESHOLD", "10000")
    text = rng.integers(0, 256, 20_000).astype(np.uint8)
    sa = np.asarray(build_suffix_array(text))
    assert np.array_equal(sa, np.asarray(suffix_array_oracle(text.tobytes())))
