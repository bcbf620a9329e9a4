"""Offset-k rank lookup: out[i] = rank[i + k], with -1 past the end.

Replaces the reference's scalar rank-refresh loop
(src/sequential/manber_myers.c:116-124). ``k`` is a traced value (it lives
inside the doubling ``lax.while_loop``), so the shift is implemented as a
dynamic slice of a doubled buffer rather than a Python-level roll - no
retracing per round, no gather.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

SENTINEL = -1  # rank of the empty suffix, sorts before all real ranks


def shifted_ranks(rank: jnp.ndarray, k) -> jnp.ndarray:
    """Return int32[n] r where r[i] = rank[i+k] if i+k < n else -1 (k traced)."""
    n = rank.shape[0]
    doubled = jnp.concatenate([rank, jnp.full((n,), SENTINEL, rank.dtype)])
    start = jnp.minimum(jnp.asarray(k, jnp.int32), jnp.int32(n))
    shifted = lax.dynamic_slice(doubled, (start,), (n,))
    positions = lax.iota(jnp.int32, n)
    return jnp.where(positions < n - k, shifted, jnp.asarray(SENTINEL, rank.dtype))
