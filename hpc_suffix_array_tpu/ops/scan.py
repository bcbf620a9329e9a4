"""Re-rank scan: dense rank assignment over the sorted pair sequence.

Replaces the reference's sequential re-rank loop
(src/sequential/manber_myers.c:101-110) with a vectorized
adjacent-difference + cumulative-sum scan, then a permutation back to
suffix order. The permutation is routed per backend: on TPU a 1-key
`lax.sort` beats the random-access scatter HLO (measured on v5e at 2^24:
47 ms vs 111 ms net of dispatch — sorting networks stream HBM, scatters
don't); on CPU the scatter is cheaper.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def dense_ranks(sorted_rank: jnp.ndarray, sorted_rank_k: jnp.ndarray):
    """Dense rank per sorted record (cumsum of adjacent-difference flags).

    Returns (dense int32[n], max_rank scalar). ``max_rank == n-1`` means
    all ranks are distinct (early-termination condition, reference
    manber_myers.c:113).
    """
    prev_r = jnp.concatenate([sorted_rank[:1], sorted_rank[:-1]])
    prev_rk = jnp.concatenate([sorted_rank_k[:1], sorted_rank_k[:-1]])
    bumps = (sorted_rank != prev_r) | (sorted_rank_k != prev_rk)
    bumps = bumps.at[0].set(False)
    dense = jnp.cumsum(bumps.astype(jnp.int32))
    return dense, dense[-1]


def route_to_positions(sorted_idx: jnp.ndarray, dense: jnp.ndarray):
    """Permute dense ranks from sorted order back to suffix-position order.

    Platform dispatch happens at lowering time (`lax.platform_dependent`),
    so an array explicitly committed to a non-default backend still gets
    the right implementation compiled in (trace-time `default_backend()`
    checks would bake the wrong branch into cross-backend programs).
    """
    n = sorted_idx.shape[0]

    def _scatter(si, d):
        return jnp.zeros((n,), jnp.int32).at[si].set(d)

    def _sortroute(si, d):
        _, new_rank = lax.sort((si, d), num_keys=1)
        return new_rank

    return jax.lax.platform_dependent(
        sorted_idx, dense, cpu=_scatter, default=_sortroute)


def rerank_sorted(sorted_rank: jnp.ndarray, sorted_rank_k: jnp.ndarray,
                  sorted_idx: jnp.ndarray):
    """Dense re-rank + permutation to suffix order (see the two stages)."""
    dense, max_rank = dense_ranks(sorted_rank, sorted_rank_k)
    return route_to_positions(sorted_idx, dense), max_rank
