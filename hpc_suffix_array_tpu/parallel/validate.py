"""Sharded suffix-array self-validation, O(n/P) per device.

Distributed version of core/validate.py (same linear-time criterion:
permutation + adjacent order via next-rank comparison, replacing the
reference's O(n^2)-worst-case strcmp walk, src/sequential/manber_myers.c:
184-202). The reference validates only on the MPI root over a replicated
array (src/mpi/main_mpi.c:78); here text and sa stay block-sharded:

  * permutation: ring scatter of 1s at sa positions + psum;
  * isa: ring permutation scatter;
  * adjacent pairs: one-element boundary ppermute + two ring gathers for
    text bytes and successor ranks at arbitrary positions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec

from hpc_suffix_array_tpu.core.suffix_array import as_byte_array, bucket_size
from hpc_suffix_array_tpu.parallel.gather import dist_gather, dist_scatter_perm
from hpc_suffix_array_tpu.parallel.mesh import SEQ_AXIS, make_mesh, sequence_sharding


def _validate_local(n_shards, text, sa_pad, n_real):
    m = sa_pad.shape[0]
    me = lax.axis_index(SEQ_AXIS)
    g = me * m + lax.iota(jnp.int32, m)
    n = n_shards * m

    in_range = lax.psum(
        jnp.sum(((sa_pad < 0) | (sa_pad >= n)).astype(jnp.int32)),
        SEQ_AXIS) == 0
    ones = jnp.ones((m,), jnp.int32)
    hits = dist_scatter_perm(ones, jnp.clip(sa_pad, 0, n - 1),
                             SEQ_AXIS, n_shards)
    is_perm = in_range & (lax.psum(
        jnp.sum((hits != 1).astype(jnp.int32)), SEQ_AXIS) == 0)

    isa = dist_scatter_perm(g, jnp.clip(sa_pad, 0, n - 1),
                            SEQ_AXIS, n_shards)

    # Adjacent SA entries: a = sa_pad[j-1], b = sa_pad[j] (global j).
    prev_in = lax.ppermute(sa_pad[-1:], SEQ_AXIS,
                           [(i, i + 1) for i in range(n_shards - 1)])
    a = jnp.concatenate([prev_in, sa_pad[:-1]])
    b = sa_pad
    ca = dist_gather(text, a, SEQ_AXIS, n_shards).astype(jnp.int32)
    cb = dist_gather(text, b, SEQ_AXIS, n_shards).astype(jnp.int32)
    # next rank: isa[s+1], or -1 when the successor suffix is empty (the
    # padded text's "empty" point is n, the first pad position).
    ra = dist_gather(isa, a + 1, SEQ_AXIS, n_shards, fill=-1)
    rb = dist_gather(isa, b + 1, SEQ_AXIS, n_shards, fill=-1)
    ok_pair = (ca < cb) | ((ca == cb) & (ra < rb))
    # global j = 0 has no predecessor
    ok_pair = ok_pair | (g == 0)
    ordered = lax.psum(jnp.sum((~ok_pair).astype(jnp.int32)), SEQ_AXIS) == 0
    return is_perm & ordered


@functools.cache
def _kernel(mesh: Mesh):
    S = int(mesh.devices.size)
    spec = PartitionSpec(SEQ_AXIS)
    return jax.jit(jax.shard_map(
        functools.partial(_validate_local, S),
        mesh=mesh, in_specs=(spec, spec, PartitionSpec()),
        out_specs=PartitionSpec(), check_vma=False))


def is_valid_suffix_array_sharded(text, sa, mesh: Mesh | None = None) -> bool:
    """True iff ``sa`` is exactly the suffix array of ``text`` (sharded)."""
    if mesh is None:
        mesh = make_mesh()
    S = int(mesh.devices.size)
    arr = as_byte_array(text)
    n = int(arr.shape[0])
    if n == 0:
        return True
    sa_np = np.asarray(sa, np.int32)
    if sa_np.shape[0] != n:
        return False

    n_pad = bucket_size(n, multiple_of=S * 128)
    text_pad = np.zeros(n_pad, np.uint8)
    text_pad[:n] = arr
    # Padded SA: pad suffixes (all-zero tails, longest last) sort before
    # all real suffixes and in descending start order (see parallel/lcp.py).
    sa_pad = np.concatenate([
        np.arange(n_pad - 1, n - 1, -1, dtype=np.int32), sa_np])

    sh = sequence_sharding(mesh)
    return bool(_kernel(mesh)(
        jax.device_put(text_pad, sh), jax.device_put(sa_pad, sh),
        jnp.int32(n)))
