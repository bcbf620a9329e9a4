"""Device tie refinement (core/refine.py): the r5 generality layer.

The carried-keys builders bounded their residue (RESIDUE_SLOTS) and
refused heavy-duplication texts before r5; refinement resolves ANY tie
mass by deepening window re-sorts on device, with the exact host pass
as the closer.  Oracle: native SA-IS + Kasai (tests/test_native.py
proves those against the goldens and the O(n) validator).

Reference parity target: the reference core builds ANY text
(src/sequential/manber_myers.c:81-133); after r5 so does every entry
point here, at any n (the host SA-IS fallback closes the adversarial
long tail past 2^28 — see core/suffix_array.sais_host_fallback).
"""

import numpy as np
import pytest

from hpc_suffix_array_tpu.core.bigsort import (
    build_suffix_array_big, build_suffix_array_direct)
from hpc_suffix_array_tpu.datasets.generate import generate_words_text
from hpc_suffix_array_tpu.native import lcp_kasai, sa_build

BUILDERS = {
    "direct": build_suffix_array_direct,
    "msd": build_suffix_array_big,
}


def _force_refine(monkeypatch, **extra):
    """Route even tiny tie masses through the device refinement pass."""
    monkeypatch.setenv("SA_HOST_RESIDUE_MAX", "8")
    monkeypatch.setenv("SA_REFINE_CHECK", "1")   # per-piece invariant on
    for k, v in extra.items():
        monkeypatch.setenv(k, str(v))


def _check(text, fn, want_info=False):
    info = {}
    sa, lcp = fn(text, want_lcp=True, info=info)
    ref = sa_build(text)
    np.testing.assert_array_equal(np.asarray(sa), ref)
    np.testing.assert_array_equal(np.asarray(lcp), lcp_kasai(text, ref))
    info2 = {}
    sa2 = fn(text, info=info2)
    np.testing.assert_array_equal(np.asarray(sa2), ref)
    return (info, info2) if want_info else None


@pytest.mark.parametrize("builder", sorted(BUILDERS))
@pytest.mark.parametrize("seed", [0, 3])
def test_words_corpus_exact(monkeypatch, builder, seed):
    """Zipfian word stream — the natural-text proxy whose wide-shallow
    tie mass was the r4 refusal class."""
    _force_refine(monkeypatch)
    text = generate_words_text(1 << 17, seed=seed)
    _check(text, BUILDERS[builder])


@pytest.mark.parametrize("builder", sorted(BUILDERS))
def test_words_multi_round(monkeypatch, builder):
    """A tiny per-piece host budget forces >= 2 device rounds; the
    round-boundary xor LCP patches must be exact."""
    _force_refine(monkeypatch, SA_REFINE_HOST_PIECE=1)
    text = generate_words_text(1 << 17, seed=2)
    info, _ = _check(text, BUILDERS[builder], want_info=True)
    assert info["refine_rounds"] >= 2
    assert info["refine_members"] > 8


@pytest.mark.parametrize("builder", sorted(BUILDERS))
def test_deep_repeated_block(monkeypatch, builder):
    """A 2000-byte block planted at three sites: ties deeper than the
    round budget resolves land in the exact host closer."""
    _force_refine(monkeypatch)
    rng = np.random.default_rng(11)
    text = rng.integers(97, 123, 1 << 17).astype(np.uint8)
    blk = text[:2000].copy()
    for pos in (30_000, 70_000, 110_000):
        text[pos:pos + 2000] = blk
    info, _ = _check(text, BUILDERS[builder], want_info=True)
    assert info["refine_host_members"] > 0


@pytest.mark.parametrize("builder", sorted(BUILDERS))
def test_minpad_duplication(monkeypatch, builder):
    """DNA (minpad packing) with planted duplication: refinement
    re-verifies from depth 0 under reserved-0 codes, so pad-vs-min
    mismatches hidden inside minpad 'ties' resolve exactly."""
    _force_refine(monkeypatch)
    rng = np.random.default_rng(5)
    text = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, 1 << 17)]
    text = text.copy()
    text[500:2500] = text[60_000:62_000]
    _check(text, BUILDERS[builder])


@pytest.mark.parametrize("builder", sorted(BUILDERS))
def test_min_symbol_tail(monkeypatch, builder):
    """Long min-symbol runs at both ends (prefix-of-prefix ties where
    suffixes end inside refinement windows)."""
    _force_refine(monkeypatch)
    rng = np.random.default_rng(6)
    text = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, 1 << 16)]
    text = text.copy()
    text[:3000] = ord("A")
    text[-3000:] = ord("A")
    _check(text, BUILDERS[builder])


@pytest.mark.parametrize("builder", sorted(BUILDERS))
def test_multi_piece_partition(monkeypatch, builder):
    """A tiny piece target forces the multi-piece partition (cuts at
    clean group boundaries) and the per-piece extraction windows."""
    _force_refine(monkeypatch, SA_REFINE_PIECE=256)
    text = generate_words_text(1 << 16, seed=9)
    info, _ = _check(text, BUILDERS[builder], want_info=True)
    assert info["refine_pieces"] >= 2


def test_refine_overflow_falls_back_to_library(monkeypatch):
    """With refinement capped to nothing, the one-call builders raise
    NotImplementedError (RefineOverflow is one) and the library router
    still serves the build via its fallback chain."""
    from hpc_suffix_array_tpu.core.refine import RefineOverflow
    from hpc_suffix_array_tpu.core.suffix_array import build_suffix_array

    _force_refine(monkeypatch, SA_REFINE_ROUNDS=0, SA_REFINE_HOST_PIECE=0)
    monkeypatch.setenv("SA_BIG_THRESHOLD", str(1 << 14))
    text = generate_words_text(1 << 16, seed=1)
    with pytest.raises(NotImplementedError):
        build_suffix_array_direct(text)
    info = {}
    sa = build_suffix_array(text, info=info)
    np.testing.assert_array_equal(np.asarray(sa), sa_build(text))
    assert info["path"] == "doubling"
    assert issubclass(RefineOverflow, NotImplementedError)


def test_sais_host_fallback_exact():
    """The last-resort host SA-IS fallback (>2^28 refusals route here)
    returns the exact suffix array and records its path."""
    from hpc_suffix_array_tpu.core.suffix_array import sais_host_fallback

    text = generate_words_text(1 << 15, seed=4)
    info = {}
    sa = sais_host_fallback(text, info)
    np.testing.assert_array_equal(np.asarray(sa), sa_build(text))
    assert info["path"] == "sais_host"


def test_build_sa_lcp_words_routing(monkeypatch):
    """The fused SA+LCP entry serves word corpora end to end."""
    _force_refine(monkeypatch)
    monkeypatch.setenv("SA_LCP_BIG_MIN", str(1 << 14))
    from hpc_suffix_array_tpu.core.lcp import build_sa_lcp

    text = generate_words_text(1 << 16, seed=8)
    sa, lcp = build_sa_lcp(text)
    ref = sa_build(text)
    np.testing.assert_array_equal(np.asarray(sa), ref)
    np.testing.assert_array_equal(np.asarray(lcp), lcp_kasai(text, ref))


def test_chain_gate_rejects_aperiodic_duplication():
    """chain_plausible: periodic texts gate chain mode; word corpora and
    bounded-repeat texts do not (pre-r5 every est>2*spw text flipped
    into a doomed chain build once its ties became buildable)."""
    from hpc_suffix_array_tpu.core.bigsort import (
        chain_plausible, estimate_repeat_len)

    n = 1 << 18
    words = generate_words_text(n, seed=0)
    assert not chain_plausible(estimate_repeat_len(words), n)
    periodic = np.tile(words[:1000], n // 1000 + 1)[:n]
    assert chain_plausible(estimate_repeat_len(periodic), n)


def test_twin_words_matches_host():
    """twin_words: device and host copies bit-identical; the stream is
    8-byte cells of 7 alnum chars + space."""
    import jax

    from hpc_suffix_array_tpu.utils.twin import twin_words

    host, dev = twin_words(1 << 16, (1 << 16) + 128)
    dev_h = np.asarray(jax.device_get(dev))
    np.testing.assert_array_equal(dev_h[:1 << 16], host)
    assert (dev_h[1 << 16:] == 0).all()
    assert (host[7::8] == ord(" ")).all()
    # Zipf-like head: the most common cell dominates a uniform draw.
    cells = host.reshape(-1, 8)
    _, counts = np.unique(cells, axis=0, return_counts=True)
    assert counts.max() > 3 * len(cells) / len(counts)


def test_words_generator_properties():
    """Host word generator: alnum+space alphabet, heavy-duplication tie
    structure (the property that makes the family a refusal stressor)."""
    text = generate_words_text(1 << 16, seed=0)
    assert len(text) == 1 << 16
    assert (text == ord(" ")).sum() > (1 << 16) // 12
    win = np.lib.stride_tricks.sliding_window_view(text, 12)[::7]
    _, counts = np.unique(win, axis=0, return_counts=True)
    assert (counts > 1).sum() > 50        # repeated 12-grams (Zipf head)
