"""Suffix-array self-validation, O(n) and fully vectorized.

The reference validates with a permutation check plus adjacent ``strcmp``
(src/sequential/manber_myers.c:184-202) - O(n^2) worst case, and it runs on
*every* CLI invocation (main_sequential.c:120). This module implements the
standard linear-time verification instead:

  sa is the suffix array of text iff
    (1) sa is a permutation of [0, n);
    (2) for consecutive entries a = sa[j-1], b = sa[j]:
        text[a] < text[b],  or
        text[a] == text[b] and next_rank(a) < next_rank(b),
  where next_rank(s) = isa[s+1] (rank of the following suffix) and the empty
  suffix ranks below everything (-1). Condition (2) with isa derived from sa
  itself inductively forces full lexicographic order.

All checks are vector comparisons + one scatter; no host loop, no strcmp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hpc_suffix_array_tpu.core.suffix_array import as_byte_array


@jax.jit
def validate_kernel(text: jnp.ndarray, sa: jnp.ndarray):
    n = text.shape[0]
    iota = jax.lax.iota(jnp.int32, n)

    in_range = jnp.all((sa >= 0) & (sa < n))
    sa_c = jnp.clip(sa, 0, n - 1)
    hits = jnp.zeros((n,), jnp.int32).at[sa_c].add(1)
    is_perm = in_range & jnp.all(hits == 1)

    isa = jnp.zeros((n,), jnp.int32).at[sa_c].set(iota)

    def next_rank(s):
        return jnp.where(s + 1 < n, isa[jnp.minimum(s + 1, n - 1)], jnp.int32(-1))

    a, b = sa_c[:-1], sa_c[1:]
    ca, cb = text[a].astype(jnp.int32), text[b].astype(jnp.int32)
    ordered = jnp.all((ca < cb) | ((ca == cb) & (next_rank(a) < next_rank(b))))
    return is_perm & ordered


def is_valid_suffix_array(text, sa) -> bool:
    """True iff ``sa`` is exactly the suffix array of ``text``."""
    arr = jnp.asarray(as_byte_array(text), jnp.uint8)
    if int(arr.shape[0]) == 0:
        return True
    return bool(validate_kernel(arr, jnp.asarray(sa, jnp.int32)))
