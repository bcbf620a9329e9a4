"""Longest repeated substring extraction.

Parity target: reference ``find_longest_repeated_substring``
(src/sequential/manber_myers.c:159-182): argmax over the LCP array with
first-occurrence tie-breaking (strict '>' scan), substring extracted at
``sa[argmax]``. ``jnp.argmax`` also returns the first maximum, so the
extracted string is identical. Returns None when there is no repeat
(max LCP == 0), matching the reference's NULL.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hpc_suffix_array_tpu.core.suffix_array import as_byte_array


@jax.jit
def lrs_locate_kernel(lcp: jnp.ndarray, sa: jnp.ndarray):
    """Return (max_lcp, start): length and text offset of the first-maximal LRS."""
    j = jnp.argmax(lcp)
    return lcp[j], sa[j]


def find_longest_repeated_substring(text, sa, lcp):
    """Return the longest repeated substring as bytes, or None if no repeat."""
    arr = as_byte_array(text)
    if arr.shape[0] == 0:
        return None
    length, start = jax.device_get(lrs_locate_kernel(
        jnp.asarray(lcp, jnp.int32), jnp.asarray(sa, jnp.int32)))
    length, start = int(length), int(start)
    if length == 0:
        return None
    return arr[start:start + length].tobytes()
