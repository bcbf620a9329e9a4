"""Distributed dense re-rank over the globally sorted record sequence.

Replaces the reference's root-only serial re-rank
(src/mpi/manber_myers_mpi.c:120-128) with the sharded version of
ops/scan.rerank_sorted: a one-element boundary exchange (`ppermute`), local
flag cumsum, and a cross-shard exclusive scan built from an
`all_gather` of P partial sums — O(n/P) work per device, O(P) bytes of
collective traffic (vs the reference's Bcast of the whole n-int array,
manber_myers_mpi.c:136).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def dist_rerank(*args, **kwargs):
    """Two-column convenience wrapper over :func:`dist_rerank_multi`."""
    s_rank, s_rank_k, axis_name, n_shards = args
    return dist_rerank_multi((s_rank, s_rank_k), axis_name, n_shards)


def dist_rerank_multi(sorted_cols, axis_name: str, n_shards: int):
    """Dense ranks for block-sharded, globally sorted key columns.

    Returns:
      dense:    int32[m] dense rank of each local sorted record (global
                numbering, starts at 0 for the globally first record).
      max_rank: int32 scalar (identical on every shard): largest dense rank;
                == n_total-1 means all ranks distinct (early-exit predicate,
                reference manber_myers.c:113).
    """
    me = lax.axis_index(axis_name)

    # Fetch predecessor of our first record: last record of shard me-1.
    lasts = jnp.stack([c[-1:] for c in sorted_cols])         # (C, 1)
    perm = [(i, i + 1) for i in range(n_shards - 1)]
    prev = lax.ppermute(lasts, axis_name, perm)              # shard 0: zeros

    bumps = None
    for c, col in enumerate(sorted_cols):
        prev_col = jnp.concatenate([prev[c], col[:-1]])
        b = col != prev_col
        bumps = b if bumps is None else (bumps | b)
    # The globally first record has no predecessor: its flag must be 0.
    bumps = bumps.at[0].set(jnp.where(me == 0, False, bumps[0]))

    local = jnp.cumsum(bumps.astype(jnp.int32))
    total = local[-1]
    gathered = lax.all_gather(total, axis_name)              # (P,)
    offset = jnp.sum(
        jnp.where(lax.iota(jnp.int32, n_shards) < me, gathered, 0))
    dense = local + offset
    max_rank = jnp.sum(gathered)
    return dense, max_rank
