"""Core single-device algorithm tests: goldens + property tests vs oracle.

Mirrors (and strengthens) the reference's test strategy: Makefile golden LRS
values (Makefile:131-138) become pytest asserts; the runtime self-validator
(manber_myers.c:184-202) becomes a property-test oracle; plus randomized
cross-checks against a trusted host reference, which the reference lacks
entirely (tests/test_basic.c is empty).
"""

import numpy as np
import pytest

from hpc_suffix_array_tpu import (
    build_suffix_array,
    build_lcp_array,
    find_longest_repeated_substring,
    is_valid_suffix_array,
    SuffixArray,
)
from hpc_suffix_array_tpu.core import oracle
from tests.conftest import CANONICAL, GOLDEN_LRS


class TestGoldens:
    def test_banana_sa(self):
        sa = np.asarray(build_suffix_array(b"banana"))
        assert sa.tolist() == [5, 3, 1, 0, 4, 2]

    def test_banana_lcp(self):
        text = b"banana"
        sa = build_suffix_array(text)
        lcp = np.asarray(build_lcp_array(text, sa))
        assert lcp.tolist() == [0, 1, 3, 0, 0, 2]

    def test_golden_lrs(self, canonical_case):
        name, text = canonical_case
        sa = build_suffix_array(text)
        lcp = build_lcp_array(text, sa)
        lrs = find_longest_repeated_substring(text, sa, lcp)
        assert lrs == GOLDEN_LRS[name]

    def test_canonical_match_oracle(self, canonical_case):
        _name, text = canonical_case
        sa = np.asarray(build_suffix_array(text))
        assert np.array_equal(sa, oracle.suffix_array_oracle(text))
        lcp = np.asarray(build_lcp_array(text, sa))
        assert np.array_equal(lcp, oracle.lcp_oracle(text, sa))


class TestEdgeCases:
    def test_empty(self):
        assert np.asarray(build_suffix_array(b"")).shape == (0,)
        assert np.asarray(build_lcp_array(b"", [])).shape == (0,)

    def test_single_char(self):
        assert np.asarray(build_suffix_array(b"x")).tolist() == [0]
        assert np.asarray(build_lcp_array(b"x", [0])).tolist() == [0]

    def test_two_chars(self):
        assert np.asarray(build_suffix_array(b"ba")).tolist() == [1, 0]
        assert np.asarray(build_suffix_array(b"ab")).tolist() == [0, 1]
        assert np.asarray(build_suffix_array(b"aa")).tolist() == [1, 0]

    def test_no_repeat(self):
        text = b"abcdefg"
        sa = build_suffix_array(text)
        lcp = build_lcp_array(text, sa)
        assert find_longest_repeated_substring(text, sa, lcp) is None

    def test_all_distinct_early_exit(self):
        # Strictly decreasing bytes: ranks distinct after round one.
        text = bytes(range(255, 155, -1))
        sa = np.asarray(build_suffix_array(text))
        assert np.array_equal(sa, np.arange(99, -1, -1))

    def test_full_byte_range(self):
        rng = np.random.default_rng(7)
        text = rng.integers(0, 256, size=257, dtype=np.uint8)
        sa = np.asarray(build_suffix_array(text))
        assert np.array_equal(sa, oracle.suffix_array_oracle(text))


class TestProperties:
    @pytest.mark.parametrize("n", [3, 17, 64, 100, 257, 1000, 4096])
    @pytest.mark.parametrize("alphabet", [2, 4, 26, 256])
    def test_random_match_oracle(self, rng, n, alphabet):
        text = rng.integers(0, alphabet, size=n, dtype=np.uint8)
        sa = np.asarray(build_suffix_array(text))
        assert np.array_equal(sa, oracle.suffix_array_oracle(text)), (
            f"n={n} alphabet={alphabet}")

    @pytest.mark.parametrize("n", [17, 128, 1000])
    @pytest.mark.parametrize("alphabet", [2, 26])
    def test_random_lcp_match_oracle(self, rng, n, alphabet):
        text = rng.integers(0, alphabet, size=n, dtype=np.uint8)
        sa = build_suffix_array(text)
        lcp = np.asarray(build_lcp_array(text, sa))
        assert np.array_equal(lcp, oracle.lcp_oracle(text, np.asarray(sa)))

    def test_validator_accepts_correct(self, rng):
        text = rng.integers(0, 4, size=500, dtype=np.uint8)
        sa = build_suffix_array(text)
        assert is_valid_suffix_array(text, sa)

    def test_validator_rejects_wrong(self, rng):
        text = rng.integers(0, 4, size=500, dtype=np.uint8)
        sa = np.asarray(build_suffix_array(text)).copy()
        sa[10], sa[20] = sa[20], sa[10]
        assert not is_valid_suffix_array(text, sa)

    def test_validator_rejects_non_permutation(self, rng):
        text = rng.integers(0, 4, size=100, dtype=np.uint8)
        sa = np.asarray(build_suffix_array(text)).copy()
        sa[0] = sa[1]
        assert not is_valid_suffix_array(text, sa)

    def test_repetitive_pattern(self, rng):
        # Reference's repetitive corpus shape (generate_large_datasets.py:16-23).
        pattern = rng.integers(97, 123, size=50, dtype=np.uint8)
        text = np.tile(pattern, 40)[:1900]
        sa = np.asarray(build_suffix_array(text))
        assert np.array_equal(sa, oracle.suffix_array_oracle(text))
        lcp = np.asarray(build_lcp_array(text, sa))
        assert np.array_equal(lcp, oracle.lcp_oracle(text, sa))


class TestSuffixArrayObject:
    def test_lifecycle(self):
        s = SuffixArray.create("mississippi").build().build_lcp()
        assert s.n == 11
        assert s.validate()
        assert s.longest_repeated_substring() == b"issi"


def test_validator_chunked_route(rng, monkeypatch):
    """Above SA_VALIDATE_FUSED_MAX the order check runs chunked (the
    memory-safe form the 1 GiB CLI contract relies on): accepts the true
    SA, rejects swaps in any chunk, rejects non-permutations."""
    from hpc_suffix_array_tpu.core.oracle import suffix_array_oracle
    from hpc_suffix_array_tpu.core.validate import is_valid_suffix_array

    monkeypatch.setenv("SA_VALIDATE_FUSED_MAX", "4096")   # force chunking
    alnum = np.frombuffer(
        b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789",
        np.uint8)
    text = alnum[rng.integers(0, 62, 40_000)]
    sa = np.asarray(suffix_array_oracle(text.tobytes()))
    assert is_valid_suffix_array(text, sa)
    for pos in (1, 17_000, 39_998):          # early / middle / last chunk
        bad = sa.copy()
        bad[pos - 1], bad[pos] = sa[pos], sa[pos - 1]
        assert not is_valid_suffix_array(text, bad), pos
    dup = sa.copy()
    dup[5] = dup[6]                          # not a permutation
    assert not is_valid_suffix_array(text, dup)
    assert not is_valid_suffix_array(text, sa[:-1])      # length mismatch
