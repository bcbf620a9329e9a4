"""Sharded offset-k rank lookup: out[i] = rank[i+k] globally, k traced.

Replaces the reference's broadcast of the *entire* n-int rank array to every
rank each round (src/mpi/manber_myers_mpi.c:136) with an O(n/P)-per-device
exchange: the global shift by k = q·m + r (m = shard width) needs only
shards ``me+q`` and ``me+q+1``. Because k is a traced value living inside
the doubling `lax.while_loop`, the shard-level shift by dynamic q is done
as a butterfly of log2(P) statically-patterned `ppermute` steps, each
masked by one bit of q — collective topology stays static, the distance is
data.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

SENTINEL = -1  # rank of the empty suffix (matches ops/shift.py)


def dist_shifted_ranks(rank: jnp.ndarray, k, axis_name: str,
                       n_shards: int) -> jnp.ndarray:
    """Local block of the globally shifted rank array, sentinel past the end.

    Args:
      rank: int32[m] local shard of the global rank array (block-sharded).
      k: traced int32 shift (power of two in the doubling loop, but any
         0 <= k is handled).
      axis_name: mesh axis; n_shards its (power-of-two) size.

    Returns int32[m]: out[i] = global_rank[me*m + i + k], or SENTINEL when
    me*m + i + k >= n_shards*m.
    """
    m = rank.shape[0]
    me = lax.axis_index(axis_name)
    k = jnp.asarray(k, jnp.int32)
    q = k // m
    r = k % m

    # Butterfly: after the loop, x holds shard (me + q) mod P of the input.
    x = rank
    b = 0
    while (1 << b) < n_shards:
        s = 1 << b
        perm = [(i, (i - s) % n_shards) for i in range(n_shards)]
        moved = lax.ppermute(x, axis_name, perm)
        x = jnp.where((q >> b) & 1 == 1, moved, x)
        b += 1

    # Neighbor pull: y = shard (me + q + 1) mod P.
    perm1 = [(i, (i - 1) % n_shards) for i in range(n_shards)]
    y = lax.ppermute(x, axis_name, perm1)

    # Local combine: element i comes from position i + r of [x | y].
    cat = jnp.concatenate([x, y])
    out = lax.dynamic_slice(cat, (r,), (m,))

    # Mask positions whose global source index falls past the padded end
    # (this also voids the modular wrap-around of the butterfly).
    g = me * m + lax.iota(jnp.int32, m)
    n_total = n_shards * m
    return jnp.where(g + k < n_total, out, jnp.int32(SENTINEL))
