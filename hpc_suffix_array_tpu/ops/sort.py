"""Per-round pair sort for prefix doubling.

Replaces the reference's stable two-pass LSD counting sort over ``Suffix``
structs (src/sequential/manber_myers.c:15-48) with a struct-of-arrays sort on
``(rank, rank_k, idx)``. Sorting with ``num_keys=3`` makes the output fully
deterministic (ties broken by suffix index), which matches the reference's
stable radix sort applied to index-ordered input.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def sort_by_rank_pairs(rank: jnp.ndarray, rank_k: jnp.ndarray, idx: jnp.ndarray):
    """Sort suffix records by the (rank, rank_k) pair; idx rides as payload.

    Args:
      rank:   int32[n] current rank of suffix i (most significant key).
      rank_k: int32[n] rank of suffix i+k, -1 sentinel past the end
              (least significant key; sentinel sorts first, matching the
              reference's get_rank_val +1 remap, manber_myers.c:10-12).
      idx:    int32[n] suffix start positions.

    Returns:
      (sorted_rank, sorted_rank_k, sorted_idx) tuple of int32[n].

    idx is a payload, not a third key: records tying on (rank, rank_k)
    receive the same dense rank whatever their relative order, and the
    final round's order is unique (all ranks distinct - the pad sentinel
    makes every suffix distinct), so the SA is exact either way while the
    comparator does one fewer compare per exchange.
    """
    return lax.sort((rank, rank_k, idx), num_keys=2, is_stable=False)
