"""Sharded prefix-doubling driver: the distributed suffix-array builder.

One jitted `shard_map` program replaces the reference's three backends
(sequential C, MPI master-worker, absent CUDA): the same code runs on 1
chip, 8 chips, or N hosts, differing only in the Mesh. Semantics match the
sequential reference loop (src/sequential/manber_myers.c:97-125, early exit
at :113) and therefore `core.suffix_array.suffix_array_kernel` exactly —
the padded suffix order is unique, so dist output == single-device output
== reference output.

Per doubling round (all block-sharded, all inside ONE `lax.while_loop` —
no per-round retrace, no host round-trip, no root bottleneck):

  1. rank_k  <- butterfly shifted ranks        (parallel/shift.py)
  2. sort (rank, rank_k, idx) globally         (parallel/bitonic.py)
  3. dense re-rank + convergence scalar        (parallel/rerank.py)
  4. route dense ranks back to position order  (ring scatter, gather.py)

Contrast with the reference MPI round (manber_myers_mpi.c:108-143):
Gatherv(n records) -> root qsort -> root re-rank -> Bcast(n ranks). Here no
step is serial and no device holds more than 2·(n/P) records.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec

from hpc_suffix_array_tpu.core.suffix_array import (
    FACTOR, PACK_BITS, alphabet_remap, as_byte_array, bucket_size)
from hpc_suffix_array_tpu.parallel.bitonic import block_bitonic_sort
from hpc_suffix_array_tpu.parallel.gather import dist_scatter_perm
from hpc_suffix_array_tpu.parallel.mesh import SEQ_AXIS, make_mesh, sequence_sharding
from hpc_suffix_array_tpu.parallel.rerank import dist_rerank_multi
from hpc_suffix_array_tpu.parallel.shift import dist_shifted_ranks


def _dist_round(rank, k, axis_name, n_shards):
    """One sharded doubling round; returns (new_rank, max_rank, sa_local)."""
    m = rank.shape[0]
    me = lax.axis_index(axis_name)
    gidx = me * m + lax.iota(jnp.int32, m)

    n = n_shards * m
    shifts = [dist_shifted_ranks(rank, j * k, axis_name, n_shards)
              for j in range(1, FACTOR)]
    sorted_cols = block_bitonic_sort(
        (rank, *shifts, gidx), num_keys=FACTOR + 1, axis_name=axis_name,
        n_shards=n_shards)
    s_idx = sorted_cols[-1]
    dense, max_rank = dist_rerank_multi(
        sorted_cols[:-1], axis_name, n_shards)
    # Route each record's dense rank back to the shard owning its text
    # position: s_idx is a global permutation, so a ring scatter (O(P)
    # neighbor hops, linear local work) replaces a second full sort. On
    # the converged round new_rank is never read again — skip the route
    # (max_rank is psum-replicated, so every shard takes the same branch).
    new_rank = lax.cond(
        max_rank >= n - 1,
        lambda: rank,
        lambda: dist_scatter_perm(dense, s_idx, axis_name, n_shards))
    return new_rank, max_rank, s_idx


def _pack_local(n_shards: int, bits: int, h0: int, text_u8, remap, n_real):
    """Per-shard packed initial ranks with a static neighbor halo pull.

    Mirrors core/suffix_array.pack_ranks_kernel but block-sharded: the
    h0-1 codes that windows near the shard end need come from the next
    shard via one statically-patterned ppermute (pad shards read 0).
    """
    m = text_u8.shape[0]
    me = lax.axis_index(SEQ_AXIS)
    g = me * m + lax.iota(jnp.int32, m)
    codes = jnp.where(g < n_real, remap[text_u8], 0)
    halo = lax.ppermute(
        codes[:PACK_BITS], SEQ_AXIS,
        [(i, i - 1) for i in range(1, n_shards)])   # last shard: zeros
    ext = jnp.concatenate([codes, halo])
    out = jnp.zeros((m,), jnp.int32)
    for j in range(h0):
        out = (out << bits) | lax.slice(ext, (j,), (j + m,))
    return out


def _kernel_local(n_shards: int, rank0, k0):
    """shard_map body: local shard of the doubling loop (see module doc)."""
    m = rank0.shape[0]
    n = n_shards * m
    me = lax.axis_index(SEQ_AXIS)
    gidx = me * m + lax.iota(jnp.int32, m)

    def cond(carry):
        _rank, k, max_rank, _sa, rounds = carry
        # At least one round (see core/suffix_array.py: tiny-n + packed k0).
        return (rounds == 0) | ((max_rank < n - 1) & (k < 2 * n))

    def body(carry):
        rank, k, _max_rank, _sa, rounds = carry
        new_rank, max_rank, sa = _dist_round(rank, k, SEQ_AXIS, n_shards)
        return new_rank, k * FACTOR, max_rank, sa, rounds + 1

    init = (rank0, jnp.asarray(k0, jnp.int32), jnp.int32(-1), gidx,
            jnp.int32(0))
    rank, _k, _max_rank, sa, rounds = lax.while_loop(cond, body, init)
    return sa, rank, rounds


@functools.cache
def suffix_array_kernel_sharded(mesh: Mesh):
    """Jitted sharded kernel for ``mesh``: rank0 (sharded int32[n]) ->
    (sa, rank, rounds) with sa/rank block-sharded along SEQ_AXIS."""
    n_shards = mesh.devices.size
    f = jax.shard_map(
        functools.partial(_kernel_local, n_shards),
        mesh=mesh,
        in_specs=(PartitionSpec(SEQ_AXIS), PartitionSpec()),
        out_specs=(PartitionSpec(SEQ_AXIS), PartitionSpec(SEQ_AXIS),
                   PartitionSpec()),
        check_vma=False,
    )
    return jax.jit(f)


@functools.cache
def suffix_array_from_bytes_sharded(mesh: Mesh, bits: int, h0: int):
    """Jitted sharded build from raw bytes: device-side per-shard packing
    (halo ppermute) + the doubling loop, one dispatch. Only uint8 text
    crosses the host->device link."""
    n_shards = mesh.devices.size

    def local(text_u8, remap, n_real):
        rank0 = _pack_local(n_shards, bits, h0, text_u8, remap, n_real)
        return _kernel_local(n_shards, rank0, h0)

    f = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(PartitionSpec(SEQ_AXIS), PartitionSpec(),
                  PartitionSpec()),
        out_specs=(PartitionSpec(SEQ_AXIS), PartitionSpec(SEQ_AXIS),
                   PartitionSpec()),
        check_vma=False,
    )
    return jax.jit(f)


def build_suffix_array_sharded(text, mesh: Mesh | None = None,
                               info: dict | None = None,
                               msd: bool | None = None) -> jnp.ndarray:
    """Suffix array of ``text``, computed block-sharded over ``mesh``.

    Same pad-sentinel scheme as the single-device builder
    (core/suffix_array.py): pad ranks (0) sort below all real bytes (+1),
    so the real SA is the tail slice of the padded suffix order.

    Texts above SA_SHARDED_MSD_MIN (default 4 MiB) first try the
    one-pass carried-keys MSD builder (parallel/bigsort.py — one
    distributed sort instead of log(n) doubling rounds); tie structure
    it cannot bound falls back here to the doubling loop, which handles
    any skew. Both builders produce the same (unique) suffix array.
    """
    import os

    if mesh is None:
        mesh = make_mesh()
    n_shards = int(mesh.devices.size)
    arr = as_byte_array(text)
    n = int(arr.shape[0])
    if n == 0:
        return jnp.zeros((0,), jnp.int32)
    # ``msd``: force (True) or skip (False) the one-pass MSD attempt —
    # a caller whose own MSD pass just refused (build_sa_lcp_sharded's
    # fused attempt) passes False so the identical build is not re-run
    # on the way to the doubling fallback.
    msd_min = int(os.environ.get("SA_SHARDED_MSD_MIN", 1 << 22))
    try_msd = n >= msd_min if msd is None else msd
    if msd is None and not try_msd and n >= int(os.environ.get(
            "SA_SHARDED_CHAIN_MIN", 1 << 16)):
        # Mid-size deep-repeat texts (the reference's repetitive corpus
        # family): the doubling loop pays log2(n) rounds x the bitonic
        # network before ranks separate, while the MSD chain pass
        # finishes them in one windowed sort (the r4 single-device
        # routing fix, core/suffix_array.py — r5 ports it here: the
        # mesh sweep measured repetitive_1MB at 8.9-16.9 s sharded vs
        # 0.33 s single-device before this gate).
        from hpc_suffix_array_tpu.core.bigsort import (
            deep_repeat_class, estimate_repeat_len)
        try_msd = deep_repeat_class(estimate_repeat_len(arr))
    if try_msd:
        from hpc_suffix_array_tpu.parallel.bigsort import (
            build_suffix_array_sharded_big)
        try:
            out = build_suffix_array_sharded_big(arr, mesh)
            if info is not None:
                info["path"] = "sharded_msd"
            return out
        except NotImplementedError:
            pass                     # irregular ties: doubling handles them
    if info is not None:
        info["path"] = "sharded_doubling"
    # Shard width padded to the lane quantum so local arrays tile cleanly.
    n_pad = bucket_size(n, multiple_of=n_shards * 128)
    remap, bits, h0 = alphabet_remap(arr)
    text_pad = np.zeros(n_pad, np.uint8)
    text_pad[:n] = arr
    text_d = jax.device_put(text_pad, sequence_sharding(mesh))
    sa, _rank, _rounds = suffix_array_from_bytes_sharded(mesh, bits, h0)(
        text_d, jnp.asarray(remap), jnp.int32(n))
    return sa[n_pad - n:]
