"""Edge-case robustness: empty/one-char inputs, unicode, extreme alphabets."""

import numpy as np
import pytest

import hpc_suffix_array_tpu as sal
from hpc_suffix_array_tpu.core.oracle import (
    lcp_oracle, lrs_oracle, suffix_array_oracle)


def test_empty():
    assert sal.build_suffix_array(b"").shape == (0,)
    assert sal.build_lcp_array(b"", np.zeros(0, np.int32)).shape == (0,)
    assert sal.find_longest_repeated_substring(
        b"", np.zeros(0, np.int32), np.zeros(0, np.int32)) is None
    assert sal.is_valid_suffix_array(b"", np.zeros(0, np.int32))


def test_single_char():
    sa = np.asarray(sal.build_suffix_array(b"x"))
    assert np.array_equal(sa, [0])
    assert sal.find_longest_repeated_substring(
        b"x", sa, sal.build_lcp_array(b"x", sa)) is None


def test_unicode_string_input():
    text = "añoño"                    # multibyte utf-8
    raw = text.encode("utf-8")
    sa = np.asarray(sal.build_suffix_array(text))
    assert np.array_equal(sa, suffix_array_oracle(raw))


def test_two_distinct_extremes():
    text = bytes([0, 255] * 300)
    sa = np.asarray(sal.build_suffix_array(text))
    assert np.array_equal(sa, suffix_array_oracle(text))
    lcp = np.asarray(sal.build_lcp_array(text, sa))
    assert np.array_equal(lcp, lcp_oracle(text, sa))


def test_full_byte_alphabet(rng):
    text = bytes(rng.permutation(256).astype(np.uint8))   # all 256 values
    sa = np.asarray(sal.build_suffix_array(text))
    assert np.array_equal(sa, suffix_array_oracle(text))


def test_lrs_none_on_all_distinct():
    text = bytes(range(64))
    sa = sal.build_suffix_array(text)
    lcp = sal.build_lcp_array(text, sa)
    assert sal.find_longest_repeated_substring(text, sa, lcp) is None
    assert lrs_oracle(text) is None


@pytest.mark.parametrize("n", [31, 32, 33, 127, 128, 129])
def test_bucket_boundaries(rng, n):
    """Sizes straddling bucket/lane boundaries."""
    text = rng.integers(0, 4, n, dtype=np.uint8).tobytes()
    sa = np.asarray(sal.build_suffix_array(text))
    assert np.array_equal(sa, suffix_array_oracle(text))
