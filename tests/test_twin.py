"""Twin corpus generator (utils/twin.py) and the pre-staged device-text
entry points it feeds (prepare_big(text_dev=), prepare_lcp_sorted(
text_pad_dev=)). On the CPU test mesh both twins land on the same
backend; the cross-backend bit-identity is additionally guarded at run
time by twin_corpus's checksum."""

import numpy as np

from hpc_suffix_array_tpu.core.oracle import lcp_oracle, suffix_array_oracle
from hpc_suffix_array_tpu.utils.twin import twin_corpus

ALNUM = frozenset(
    b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789")


def test_twin_host_device_identical():
    host, dev = twin_corpus(100_000, 1 << 17)
    dev_np = np.asarray(dev)
    assert dev_np.shape == (1 << 17,)
    assert np.array_equal(dev_np[:100_000], host)
    assert not dev_np[100_000:].any()          # zero pad past n


def test_twin_alphabet_and_determinism():
    a, _ = twin_corpus(50_000)
    b, _ = twin_corpus(50_000)
    assert np.array_equal(a, b)
    assert set(np.unique(a).tolist()) <= {x for x in ALNUM}
    c, _ = twin_corpus(50_000, seed=7)
    assert not np.array_equal(a, c)


def test_twin_chunk_boundaries():
    """n not a multiple of the generator chunk: bytes are continuous
    across chunk seams and independent of the chunk size."""
    a, _ = twin_corpus(10_000, chunk=1 << 12)
    b, _ = twin_corpus(10_000, chunk=1 << 12)
    assert np.array_equal(a, b)


def test_prepare_big_with_device_text():
    from hpc_suffix_array_tpu.core.bigsort import (
        chunk_geometry, execute_big, prepare_big)

    n = 40_000
    _, _, pad_len = chunk_geometry(n, 1 << 12)
    host, dev = twin_corpus(n, pad_len)
    state = prepare_big(host, target_bucket=1 << 12, chunk_elems=1 << 12,
                        sample=1 << 12, text_dev=dev)
    sa = np.asarray(execute_big(state))
    assert np.array_equal(sa, np.asarray(suffix_array_oracle(host.tobytes())))


def test_prepare_big_rejects_wrong_pad():
    import pytest

    from hpc_suffix_array_tpu.core.bigsort import prepare_big

    host, dev = twin_corpus(40_000, 40_001)
    with pytest.raises(ValueError):
        prepare_big(host, chunk_elems=1 << 12, text_dev=dev)


def test_prepare_lcp_sorted_with_device_text():
    from hpc_suffix_array_tpu.core.lcp_window import (
        build_lcp_array_sorted, prepare_lcp_sorted)
    from hpc_suffix_array_tpu.core.suffix_array import bucket_size

    n = 30_000
    host, dev = twin_corpus(n, bucket_size(n))
    sa = np.asarray(suffix_array_oracle(host.tobytes()))
    state = prepare_lcp_sorted(host, text_pad_dev=dev)
    lcp = np.asarray(build_lcp_array_sorted(host, sa, state))
    assert np.array_equal(lcp, np.asarray(lcp_oracle(host, sa)))


def test_twin_dna_alphabet():
    from hpc_suffix_array_tpu.utils.twin import twin_corpus

    host, dev = twin_corpus(10_000, 10_240, alphabet="dna", seed=7)
    assert set(np.unique(host)) <= set(b"ACGT")
    d = np.asarray(dev)
    assert np.array_equal(d[:10_000], host)
    assert not d[10_000:].any()


def test_twin_periodic_tile():
    from hpc_suffix_array_tpu.utils.twin import twin_periodic

    pat = np.frombuffer(b"abcXYZ012", np.uint8)
    host, dev = twin_periodic(pat, 10_000, 10_240)
    assert np.array_equal(host, np.tile(pat, 10_000 // 9 + 1)[:10_000])
    d = np.asarray(dev)
    assert np.array_equal(d[:10_000], host)
    assert not d[10_000:].any()
