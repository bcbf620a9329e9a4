"""Property fuzz of the FULL build_suffix_array / build_lcp_array
routing stack vs the SA-IS/Kasai oracles.

With thresholds forced low, every draw exercises the real dispatch
chain — direct one-sort (ascending / chain / mispredicted-chain), MSD,
and the doubling fallback — across corpus classes the individual path
tests don't compose: mixed regions, skewed alphabets, odd lengths,
zero bytes, single long repeats, near-periodic texts.
"""

import numpy as np
import pytest

from hpc_suffix_array_tpu.core.lcp import build_lcp_array
from hpc_suffix_array_tpu.core.oracle import lcp_oracle, suffix_array_oracle
from hpc_suffix_array_tpu.core.suffix_array import build_suffix_array

ALNUM = np.frombuffer(
    b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789",
    np.uint8)


def _draw(rng, n: int) -> np.ndarray:
    """One random corpus: pick a generator class, then mutate."""
    kind = rng.integers(0, 8)
    if kind == 7:                         # Zipfian words (r5: refinement)
        from hpc_suffix_array_tpu.datasets.generate import (
            generate_words_text)
        return generate_words_text(
            n, seed=int(rng.integers(0, 1 << 30)),
            vocab_size=int(rng.choice([1 << 8, 1 << 12])))
    if kind == 0:
        t = rng.integers(0, 256, n).astype(np.uint8)
    elif kind == 1:
        t = ALNUM[rng.integers(0, 62, n)]
    elif kind == 2:                       # tiny alphabet, zero bytes legal
        t = rng.integers(0, 3, n).astype(np.uint8)
    elif kind == 3:                       # periodic with mutations
        p = int(rng.integers(2, 500))
        t = np.tile(ALNUM[rng.integers(0, 62, p)], n // p + 1)[:n].copy()
        for _ in range(int(rng.integers(0, 4))):
            t[rng.integers(0, n)] ^= 1
    elif kind == 4:                       # blocks of long repeats
        t = ALNUM[rng.integers(0, 62, n)]
        blk = int(rng.integers(20, 300))
        src = int(rng.integers(0, max(n - blk, 1)))
        for _ in range(int(rng.integers(1, 5))):
            at = int(rng.integers(0, max(n - blk, 1)))
            t[at:at + blk] = t[src:src + blk]
    elif kind == 5:                       # mixed regions
        a = ALNUM[rng.integers(0, 62, n // 2)]
        b = np.full(n // 4, ord("z"), np.uint8)
        c = rng.integers(0, 256, n - len(a) - len(b)).astype(np.uint8)
        t = np.concatenate([a, b, c])
    else:                                 # runs (RLE-ish skew)
        t = np.repeat(ALNUM[rng.integers(0, 62, n // 8 + 1)],
                      8)[:n].copy()
    return t


@pytest.mark.parametrize("seed", range(12))
def test_routed_build_matches_oracle(seed, monkeypatch):
    monkeypatch.setenv("SA_BIG_THRESHOLD", "4000")
    monkeypatch.setenv("SA_CHAIN_MIN", "4000")
    monkeypatch.setenv("SA_LCP_BIG_MIN", "4000")
    monkeypatch.setenv("SA_LCP_WINDOW_MIN", "2000")
    rng = np.random.default_rng(0xF0 + seed)
    n = int(rng.integers(4_100, 60_000))
    text = _draw(rng, n)
    ref = np.asarray(suffix_array_oracle(text.tobytes()))
    sa = np.asarray(build_suffix_array(text))
    assert np.array_equal(sa, ref), f"SA mismatch (seed={seed}, n={n})"
    lcp = np.asarray(build_lcp_array(text, ref))
    assert np.array_equal(lcp, lcp_oracle(text, ref)), \
        f"LCP mismatch (seed={seed}, n={n})"
