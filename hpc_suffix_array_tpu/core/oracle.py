"""Tiny trusted host-side reference implementations (test oracles only).

Used by the test suite to cross-check device results, mirroring the role the
Makefile golden tests play in the reference (Makefile:131-138). Intentionally
simple and slow - O(n^2 log n) sort-based SA, textbook Kasai - do not use on
large inputs.
"""

from __future__ import annotations

import numpy as np

from hpc_suffix_array_tpu.core.suffix_array import as_byte_array


def suffix_array_oracle(text) -> np.ndarray:
    """Suffix array by direct suffix sort (unsigned byte order).

    Above 64K chars this routes through the independent native SA-IS
    (hpc_suffix_array_tpu.native): ``sorted(range(n), key=...)``
    PRECOMPUTES all n suffix slices — O(n^2) bytes held at once, which
    is 130 GB (an OOM kill) at n=2^20. The two oracles cross-check each
    other in tests/test_native.py.
    """
    data = bytes(as_byte_array(text).tobytes())
    n = len(data)
    if n > 1 << 16:
        from hpc_suffix_array_tpu import native

        if native.available():
            return np.asarray(native.sa_build(np.frombuffer(
                data, np.uint8)), dtype=np.int32)
    return np.asarray(sorted(range(n), key=lambda i: data[i:]), dtype=np.int32)


def lcp_oracle(text, sa) -> np.ndarray:
    """LCP array via textbook Kasai; lcp[0] = 0.

    Above 64K chars the native C Kasai stands in for the Python loop
    (same algorithm, ~100x faster; cross-checked in tests/test_native.py).
    """
    data = as_byte_array(text)
    n = int(data.shape[0])
    if n > 1 << 16:
        from hpc_suffix_array_tpu import native

        if native.available():
            return np.asarray(native.lcp_kasai(data, np.asarray(
                sa, np.int32)), dtype=np.int32)
    sa = np.asarray(sa, dtype=np.int64)
    if n == 0:
        return np.zeros(0, np.int32)
    rank = np.zeros(n, np.int64)
    rank[sa] = np.arange(n)
    lcp = np.zeros(n, np.int32)
    h = 0
    for i in range(n):
        if rank[i] > 0:
            j = sa[rank[i] - 1]
            while i + h < n and j + h < n and data[i + h] == data[j + h]:
                h += 1
            lcp[rank[i]] = h
            if h > 0:
                h -= 1
    return lcp


def lrs_oracle(text):
    """Longest repeated substring (first-argmax tie-break), or None."""
    data = as_byte_array(text)
    sa = suffix_array_oracle(data)
    lcp = lcp_oracle(data, sa)
    if len(lcp) == 0 or lcp.max() == 0:
        return None
    j = int(np.argmax(lcp))
    return data[sa[j]:sa[j] + int(lcp[j])].tobytes()
