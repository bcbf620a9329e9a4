"""Distributed random-access gather: out[i] = values[indices[i]], sharded.

The reference sidesteps distributed random access entirely by replicating
whole arrays on every rank (src/mpi/main_mpi.c:43-51,
src/mpi/manber_myers_mpi.c:136). Here neither values nor indices are
replicated: value blocks rotate around the mesh ring (P-1 statically
patterned `ppermute` steps, riding neighbor ICI links) and every shard
serves its local requests as each block visits — no shard ever holds more
than 2 blocks, and the pattern is static so the primitive composes with
`lax.while_loop` / nested use inside shard_map.

Cost: P neighbor exchanges of one block + P local gathers of m elements
= O(n) gather work per device-row sweep. Right-sized for the small meshes
of one host (P <= 8); a sorted request-routing variant (route requests to
owners via block-bitonic sort, serve once, route back) trades the O(P·m)
local work for O(m log m log²P) and becomes worthwhile at pod scale.

Used by the sharded LCP builder (parallel/lcp.py) for phi-chain, plcp and
text gathers.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def dist_gather(values: jnp.ndarray, indices: jnp.ndarray, axis_name: str,
                n_shards: int, fill=0) -> jnp.ndarray:
    """Gather across a block-sharded axis.

    Args:
      values:  [m, ...] local shard of the global value array (n = P*m rows).
      indices: int32[r] local shard of global row indices; out-of-range
               (< 0 or >= n) yields ``fill``.
      fill:    value returned for out-of-range indices.

    Returns values[indices] (local shard, requester order).
    """
    m = values.shape[0]
    n = n_shards * m
    safe = jnp.clip(indices, 0, n - 1)
    out = _serve_ring(values, safe, axis_name, n_shards)
    ok = (indices >= 0) & (indices < n)
    if values.ndim > 1:
        ok = ok.reshape(ok.shape + (1,) * (values.ndim - 1))
    return jnp.where(ok, out, jnp.asarray(fill, values.dtype))


def _serve_ring(values: jnp.ndarray, src: jnp.ndarray, axis_name: str,
                n_shards: int) -> jnp.ndarray:
    """values[src] for in-range src, rotating value blocks around the ring."""
    m = values.shape[0]
    me = lax.axis_index(axis_name)
    out = jnp.zeros(src.shape + values.shape[1:], values.dtype)
    block = values
    owner = me                       # owner id of the currently held block
    perm = [(i, (i - 1) % n_shards) for i in range(n_shards)]
    for step in range(n_shards):
        lo = owner * m
        local = jnp.clip(src - lo, 0, m - 1)
        hit = (src >= lo) & (src < lo + m)
        if values.ndim > 1:
            hit = hit.reshape(hit.shape + (1,) * (values.ndim - 1))
        out = jnp.where(hit, block[local], out)
        if step + 1 < n_shards:
            block = lax.ppermute(block, axis_name, perm)
            owner = (owner + 1) % n_shards
    return out


def dist_scatter_perm(values: jnp.ndarray, dest: jnp.ndarray,
                      axis_name: str, n_shards: int) -> jnp.ndarray:
    """out[dest[i]] = values[i] where ``dest`` is a global permutation.

    The inverse routing of ``dist_gather``: each shard's (dest, value)
    pairs rotate around the ring; the shard owning ``dest`` claims the
    element. Requires dest to be a permutation of [0, n) globally (true
    for rank scatters in the doubling loop: dest = suffix index).
    """
    m = values.shape[0]
    me = lax.axis_index(axis_name)
    lo = me * m
    out = jnp.zeros((m + 1,), values.dtype)   # slot m swallows non-hits
    pair = jnp.stack([dest, values])
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    for step in range(n_shards):
        d, v = pair[0], pair[1]
        hit = (d >= lo) & (d < lo + m)
        # dest is a permutation, so hits never collide; non-hits land in
        # the dummy slot instead of clobbering real entries.
        out = out.at[jnp.where(hit, d - lo, m)].set(v)
        if step + 1 < n_shards:
            pair = lax.ppermute(pair, axis_name, perm)
    return out[:m]
