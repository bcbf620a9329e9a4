"""Window-compare LCP path (core/lcp_window.py) vs the Kasai oracle."""

import numpy as np
import pytest

from hpc_suffix_array_tpu.core.lcp_window import build_lcp_array_window
from hpc_suffix_array_tpu.core.oracle import lcp_oracle, suffix_array_oracle

ALNUM = np.frombuffer(
    b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789",
    np.uint8)


def _check(text):
    text = np.asarray(text)
    sa = np.asarray(suffix_array_oracle(text.tobytes()))
    lcp = np.asarray(build_lcp_array_window(text, sa))
    assert np.array_equal(lcp, np.asarray(lcp_oracle(text, sa)))


def test_random(rng):
    _check(rng.integers(0, 256, 50_000).astype(np.uint8))


def test_dna(rng):
    _check(np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, 50_000)])


def test_long_repeats_host_finish(rng):
    """Scattered 200-byte repeated blocks: window misses resolved by the
    host-finish path."""
    text = ALNUM[rng.integers(0, 62, 40_000)]
    block = ALNUM[rng.integers(0, 62, 200)]
    for at in (100, 9000, 25000):
        text[at:at + 200] = block
    _check(text)


def test_periodic_chain_fix(rng):
    """Globally periodic text: every adjacent chain pair misses the
    window and resolves via lcp[j] = n - sa[j-1]."""
    _check(np.tile(ALNUM[rng.integers(0, 62, 1000)], 40))


def test_period_two():
    _check(np.tile(np.frombuffer(b"ab", np.uint8), 10_000))


def test_routing(rng, monkeypatch):
    """build_lcp_array routes big texts through the window path."""
    from hpc_suffix_array_tpu.core.lcp import build_lcp_array

    monkeypatch.setenv("SA_LCP_WINDOW_MIN", "10000")
    text = rng.integers(0, 256, 30_000).astype(np.uint8)
    sa = np.asarray(suffix_array_oracle(text.tobytes()))
    lcp = np.asarray(build_lcp_array(text, sa))
    assert np.array_equal(lcp, np.asarray(lcp_oracle(text, sa)))


def test_lcp_router_plcp_fallback_on_deep_ties(monkeypatch):
    """Texts whose deep non-periodic repeats defeat both the carried-keys
    and window-finisher routes fall back to the PLCP rounds instead of
    raising (soak-found, r3): an RLE-skew text (8-byte runs) where most
    adjacent SA pairs exceed the fetch window."""
    import numpy as np
    from hpc_suffix_array_tpu.core.lcp import build_lcp_array
    from hpc_suffix_array_tpu.core.oracle import (lcp_oracle,
                                                  suffix_array_oracle)

    monkeypatch.setenv("SA_LCP_BIG_MIN", "5000")
    monkeypatch.setenv("SA_LCP_WINDOW_MIN", "2000")
    rng = np.random.default_rng(0x50 + 7)        # the failing soak draw
    n = 40_000
    alnum = np.frombuffer(
        b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789",
        np.uint8)
    text = np.repeat(alnum[rng.integers(0, 62, n // 8 + 1)], 8)[:n].copy()
    sa = np.asarray(suffix_array_oracle(text.tobytes()))
    lcp = np.asarray(build_lcp_array(text, sa))
    assert np.array_equal(lcp, np.asarray(lcp_oracle(text, sa)))
