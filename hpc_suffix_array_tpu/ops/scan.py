"""Re-rank scan: dense rank assignment over the sorted pair sequence.

Replaces the reference's sequential re-rank loop
(src/sequential/manber_myers.c:101-110) with a vectorized
adjacent-difference + cumulative-sum scan, then a scatter back to suffix
order. XLA fuses the comparison and cumsum; the scatter is a single
permutation write.
"""

from __future__ import annotations

import jax.numpy as jnp


def rerank_sorted(sorted_rank: jnp.ndarray, sorted_rank_k: jnp.ndarray,
                  sorted_idx: jnp.ndarray):
    """Assign dense ranks to the sorted records and scatter to suffix order.

    Returns:
      new_rank: int32[n] rank indexed by suffix start position.
      max_rank: int32 scalar, the largest assigned rank. ``max_rank == n-1``
                means all ranks are distinct (early-termination condition,
                reference manber_myers.c:113).
    """
    n = sorted_rank.shape[0]
    prev_r = jnp.concatenate([sorted_rank[:1], sorted_rank[:-1]])
    prev_rk = jnp.concatenate([sorted_rank_k[:1], sorted_rank_k[:-1]])
    bumps = (sorted_rank != prev_r) | (sorted_rank_k != prev_rk)
    bumps = bumps.at[0].set(False)
    dense = jnp.cumsum(bumps.astype(jnp.int32))
    new_rank = jnp.zeros((n,), jnp.int32).at[sorted_idx].set(dense)
    return new_rank, dense[-1]
