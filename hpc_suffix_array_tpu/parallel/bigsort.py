"""Distributed one-pass MSD (carried-keys) suffix build over a mesh.

The sharded doubling builder (parallel/doubling.py) pays log(n) rounds of
(bitonic sort + re-rank + route-back); on texts whose suffixes separate
within the first 2*spw symbols (every corpus family of the reference's
generator: random, DNA, and — via chain mode — periodic), ONE distributed
sort of the carried key pair (k0, k1) already yields the suffix array, up
to a bounded residue of still-tied positions. This module is the mesh
version of core/bigsort.py's carried-keys design, built from the same
distributed primitives as the doubling path:

  * per-shard key packing with a 2*spw-code neighbor halo (one
    statically-patterned ppermute, like doubling's ``_pack_local``);
  * ONE oblivious block-bitonic sort of (k0, k1, tiebreak) — skew-immune,
    static communication pattern (parallel/bitonic.py);
  * tie flags + chain-delta stats via a boundary ppermute (each shard
    compares its first sorted record against its left neighbor's last) +
    psum/pmax reductions — O(P) scalars of traffic;
  * residue compaction per shard into fixed RESIDUE_SLOTS records
    (sort-based, no scatter), resolved by direct comparison on the host
    and patched into the sharded SA (bounded transfer);
  * periodic texts: the same descending-index tiebreak as
    core/bigsort.py chain mode (for a global period d, s_{i+d} is a
    strict prefix of s_i), with the period verified on the host text.

This is the "≥ 4 GiB across ≥ 2 hosts" ladder config's intended builder
(BASELINE.md): per-chip working set is one sort pass over 12 B/char of
carried keys + the text shard — no rank arrays carried across log(n)
rounds — and every collective is a static-pattern ppermute riding
neighbor ICI links. Pathological inputs (irregular massive ties) raise
NotImplementedError; callers fall back to the doubling builder, which
handles them at any skew.

Reference scope note: this replaces the master-centric MPI round
(src/mpi/manber_myers_mpi.c:108-143) like parallel/doubling.py does, but
with single-pass semantics; output is byte-identical to the sequential
reference on all supported inputs (the suffix array is unique).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec

from hpc_suffix_array_tpu.core.bigsort import (
    PAD_KEY, RESIDUE_SLOTS, _resolve_residue_host, byte_ranges,
    codes_from_bytes, estimate_repeat_len)
from hpc_suffix_array_tpu.core.suffix_array import (
    alphabet_remap, as_byte_array, bucket_size)
from hpc_suffix_array_tpu.parallel.bitonic import block_bitonic_sort
from hpc_suffix_array_tpu.parallel.mesh import (
    SEQ_AXIS, make_mesh, sequence_sharding)

_BIG = np.int32(1 << 30)   # np, not jnp: no device buffer at import
#                            (backend init before callers configure it)


def _boundary_prev(cols, axis_name: str, n_shards: int):
    """Each shard's view of its left neighbor's LAST sorted record.

    ``cols`` is a tuple of int32[m] sorted columns; returns a tuple of
    scalars (shard 0 receives zeros — harmless: no real k0 is 0, so the
    manufactured 'previous record' never compares equal)."""
    packet = jnp.stack([c[-1] for c in cols])
    perm = [(i, i + 1) for i in range(n_shards - 1)]
    got = lax.ppermute(packet, axis_name, perm)
    return tuple(got[i] for i in range(len(cols)))


def _local_build(P: int, bits: int, spw: int, R: int, ranges,
                 text_u8, vals, n_real, desc):
    """shard_map body: pack carried keys, one global sort, flags + residue.

    Returns (s_idx[m], lcp[m], slots[R], res_idx[R], stats[6]) per shard;
    stats = (tie_cnt, dmax, dmin, res_cnt_local, res_overflow, _pad) with
    the first three psum/pmax/pmin-replicated and the residue fields
    local. ``lcp[j] = LCP(sa[j-1], sa[j])`` comes from adjacent xor +
    count-leading-zeros on the sorted carried keys (exact for every pair
    that mismatches within 2*spw symbols; the chain rule covers periodic
    ties in-kernel, the host residue patch covers the bounded rest) — a
    handful of elementwise passes on columns the sort already moved, so
    it is always computed.
    """
    m = text_u8.shape[0]
    me = lax.axis_index(SEQ_AXIS)
    g = me * m + lax.iota(jnp.int32, m)

    codes = codes_from_bytes(text_u8, vals, ranges)
    codes = jnp.where(g < n_real, codes, 0)
    halo = lax.ppermute(codes[:2 * spw], SEQ_AXIS,
                        [(i, i - 1) for i in range(1, P)])
    ext = jnp.concatenate([codes, halo])             # m + 2*spw codes
    k0 = jnp.zeros((m,), jnp.int32)
    k1 = jnp.zeros((m,), jnp.int32)
    for s in range(spw):
        k0 = (k0 << bits) | lax.slice(ext, (s,), (s + m,))
        k1 = (k1 << bits) | lax.slice(ext, (spw + s,), (spw + s + m,))

    real = g < n_real
    k0 = jnp.where(real, k0, PAD_KEY)
    k1 = jnp.where(real, k1, PAD_KEY)
    tb = jnp.where(real, jnp.where(desc, n_real - g, g), _BIG)

    k0s, k1s, tbs = block_bitonic_sort((k0, k1, tb), num_keys=3,
                                       axis_name=SEQ_AXIS, n_shards=P)
    gpos = me * m + lax.iota(jnp.int32, m)           # global sorted slot
    real_s = gpos < n_real                           # pads sort last
    s_idx = jnp.where(real_s, jnp.where(desc, n_real - tbs, tbs), n_real)

    # Tie with the global predecessor (boundary record via one ppermute).
    pk0, pk1, pidx_t = _boundary_prev((k0s, k1s, tbs), SEQ_AXIS, P)
    prev_k0 = jnp.concatenate([pk0[None], k0s[:-1]])
    prev_k1 = jnp.concatenate([pk1[None], k1s[:-1]])
    prev_ix = jnp.where(desc, n_real - pidx_t, pidx_t)
    prev_idx = jnp.concatenate([prev_ix[None], s_idx[:-1]])
    tie = (k0s == prev_k0) & (k1s == prev_k1) & real_s & (gpos > 0)
    delta = jnp.where(tie, jnp.where(desc, prev_idx - s_idx,
                                     s_idx - prev_idx), 0)
    tie_cnt = lax.psum(jnp.sum(tie.astype(jnp.int32)), SEQ_AXIS)
    dmax = lax.pmax(jnp.max(jnp.where(tie, delta, 0)), SEQ_AXIS)
    dmin = lax.pmin(jnp.min(jnp.where(tie, delta, _BIG)), SEQ_AXIS)

    # LCP from the carried keys (mirror of core _bucket_sort want_lcp):
    # first differing symbol via xor + clz per word; symbols pack
    # first-highest in the low spw*bits bits.
    depth = jnp.int32(2 * spw)
    x0, x1 = prev_k0 ^ k0s, prev_k1 ^ k1s
    off0 = jnp.where(x0 != 0, spw - 1 - (31 - lax.clz(x0)) // bits, depth)
    off1 = jnp.where(x1 != 0,
                     2 * spw - 1 - (31 - lax.clz(x1)) // bits, depth)
    lcp = jnp.maximum(jnp.where(x0 != 0, off0, off1), 0)
    # Periodic ties: chain members are consecutive, lcp = n - prev_idx.
    lcp = jnp.where(tie & desc, n_real - prev_idx, lcp)
    # Row 0's manufactured zero predecessor and pad rows clamp to 0.
    lcp = jnp.where(real_s & (gpos > 0), lcp, 0).astype(jnp.int32)

    # Residue membership: every element of a tied group (the flag marks
    # the later element of each tied pair; group heads join through their
    # successor's flag, pulled across the right boundary).
    nxt0 = lax.ppermute(tie[:1].astype(jnp.int32), SEQ_AXIS,
                        [(i, i - 1) for i in range(1, P)])[0]
    next_tie = jnp.concatenate([tie[1:].astype(jnp.int32), nxt0[None]])
    member = (tie | (next_tie > 0)) & real_s
    keyed = jnp.where(member, lax.iota(jnp.int32, m), _BIG)
    o_slot, o_idx = lax.sort((keyed, s_idx), num_keys=1)
    k = min(R, m)
    slots = jnp.where(o_slot[:k] < _BIG, gpos[0] + o_slot[:k], -1)
    slots = jnp.concatenate([slots, jnp.full((R - k,), -1, jnp.int32)])
    res_idx = jnp.concatenate(
        [o_idx[:k], jnp.zeros((R - k,), jnp.int32)])
    res_cnt = jnp.sum(member.astype(jnp.int32))
    stats = jnp.stack([tie_cnt, dmax, dmin, res_cnt,
                       (res_cnt > R).astype(jnp.int32), jnp.int32(0)])
    return s_idx, lcp, slots, res_idx, stats


def _local_build_wide(P: int, bits: int, spw: int, R: int, ranges,
                      text_u8, vals, n_hi, n_lo, desc):
    """``_local_build`` with TWO-WORD global indices: the >=4 GiB path.

    Global suffix index g = hi * m + lo (hi = shard id, lo = local
    offset, both int32) — n up to P * 2^31 with no int64 sort operands
    (TPU int64 is emulated 32-bit pairs; a 4-key int32 sort is the same
    comparator work done natively). Descending order uses the exact
    two-word complement (P*m - 1) - g = (P-1-hi, m-1-lo). Index compares
    (real mask, tie deltas) are lexicographic (hi, lo) pairs; delta
    uniformity is checked componentwise (all pairs equal <=> both
    columns' pmax == pmin, since fills are 0 / +inf and deltas are
    nonnegative). Returns per shard:
    (s_hi[m], s_lo[m], slot_lo[R], res_hi[R], res_lo[R], stats[8]);
    slots are LOCAL sorted offsets (-1 pads) — the host adds shard*m.
    """
    m = text_u8.shape[0]
    me = lax.axis_index(SEQ_AXIS)
    lo = lax.iota(jnp.int32, m)

    def lt_n(hi, lo_):
        return (hi < n_hi) | ((hi == n_hi) & (lo_ < n_lo))

    codes = codes_from_bytes(text_u8, vals, ranges)
    codes = jnp.where(lt_n(me, lo), codes, 0)
    halo = lax.ppermute(codes[:2 * spw], SEQ_AXIS,
                        [(i, i - 1) for i in range(1, P)])
    ext = jnp.concatenate([codes, halo])
    k0 = jnp.zeros((m,), jnp.int32)
    k1 = jnp.zeros((m,), jnp.int32)
    for s in range(spw):
        k0 = (k0 << bits) | lax.slice(ext, (s,), (s + m,))
        k1 = (k1 << bits) | lax.slice(ext, (spw + s,), (spw + s + m,))

    real = lt_n(me, lo)
    k0 = jnp.where(real, k0, PAD_KEY)
    k1 = jnp.where(real, k1, PAD_KEY)
    tbh = jnp.where(real, jnp.where(desc, P - 1 - me, me), _BIG)
    tbl = jnp.where(real, jnp.where(desc, m - 1 - lo, lo), _BIG)

    k0s, k1s, tbhs, tbls = block_bitonic_sort(
        (k0, k1, tbh, tbl), num_keys=4, axis_name=SEQ_AXIS, n_shards=P)
    real_s = (k0s != PAD_KEY) | (k1s != PAD_KEY)     # pads sort last
    s_hi = jnp.where(real_s, jnp.where(desc, P - 1 - tbhs, tbhs), n_hi)
    s_lo = jnp.where(real_s, jnp.where(desc, m - 1 - tbls, tbls), n_lo)

    pk0, pk1, phi, plo = _boundary_prev((k0s, k1s, s_hi, s_lo),
                                        SEQ_AXIS, P)
    prev_k0 = jnp.concatenate([pk0[None], k0s[:-1]])
    prev_k1 = jnp.concatenate([pk1[None], k1s[:-1]])
    prev_hi = jnp.concatenate([phi[None], s_hi[:-1]])
    prev_lo = jnp.concatenate([plo[None], s_lo[:-1]])
    first_global = (me == 0) & (lo == 0)
    tie = (k0s == prev_k0) & (k1s == prev_k1) & real_s & ~first_global
    # delta = |g - g_prev| as a two-word (hi, lo) pair with borrow.
    a_hi = jnp.where(desc, prev_hi, s_hi)
    a_lo = jnp.where(desc, prev_lo, s_lo)
    b_hi = jnp.where(desc, s_hi, prev_hi)
    b_lo = jnp.where(desc, s_lo, prev_lo)
    borrow = (a_lo < b_lo).astype(jnp.int32)
    d_lo = a_lo - b_lo + borrow * m
    d_hi = a_hi - b_hi - borrow
    tie_cnt = lax.psum(jnp.sum(tie.astype(jnp.int32)), SEQ_AXIS)
    dmax_hi = lax.pmax(jnp.max(jnp.where(tie, d_hi, 0)), SEQ_AXIS)
    dmin_hi = lax.pmin(jnp.min(jnp.where(tie, d_hi, _BIG)), SEQ_AXIS)
    dmax_lo = lax.pmax(jnp.max(jnp.where(tie, d_lo, 0)), SEQ_AXIS)
    dmin_lo = lax.pmin(jnp.min(jnp.where(tie, d_lo, _BIG)), SEQ_AXIS)

    nxt0 = lax.ppermute(tie[:1].astype(jnp.int32), SEQ_AXIS,
                        [(i, i - 1) for i in range(1, P)])[0]
    next_tie = jnp.concatenate([tie[1:].astype(jnp.int32), nxt0[None]])
    member = (tie | (next_tie > 0)) & real_s
    keyed = jnp.where(member, lo, _BIG)
    o_slot, o_hi, o_lo = lax.sort((keyed, s_hi, s_lo), num_keys=1)
    k = min(R, m)
    slot_lo = jnp.where(o_slot[:k] < _BIG, o_slot[:k], -1)
    slot_lo = jnp.concatenate([slot_lo, jnp.full((R - k,), -1, jnp.int32)])
    res_hi = jnp.concatenate([o_hi[:k], jnp.zeros((R - k,), jnp.int32)])
    res_lo = jnp.concatenate([o_lo[:k], jnp.zeros((R - k,), jnp.int32)])
    res_cnt = jnp.sum(member.astype(jnp.int32))
    stats = jnp.stack([tie_cnt, dmax_hi, dmin_hi, dmax_lo, dmin_lo,
                       res_cnt, (res_cnt > R).astype(jnp.int32),
                       jnp.int32(0)])
    return s_hi, s_lo, slot_lo, res_hi, res_lo, stats


@functools.cache
def _kernels(mesh: Mesh, bits: int, spw: int, ranges):
    P = int(mesh.devices.size)
    spec = PartitionSpec(SEQ_AXIS)
    rep = PartitionSpec()
    f = jax.shard_map(
        functools.partial(_local_build, P, bits, spw, RESIDUE_SLOTS,
                          ranges),
        mesh=mesh,
        in_specs=(spec, rep, rep, rep),
        out_specs=(spec, spec, spec, spec, spec),
        check_vma=False)
    return jax.jit(f)


@functools.cache
def _kernels_wide(mesh: Mesh, bits: int, spw: int, ranges):
    P = int(mesh.devices.size)
    spec = PartitionSpec(SEQ_AXIS)
    rep = PartitionSpec()
    f = jax.shard_map(
        functools.partial(_local_build_wide, P, bits, spw, RESIDUE_SLOTS,
                          ranges),
        mesh=mesh,
        in_specs=(spec, rep, rep, rep, rep),
        out_specs=(spec, spec, spec, spec, spec, spec),
        check_vma=False)
    return jax.jit(f)


def build_suffix_array_sharded_big(text, mesh: Mesh | None = None,
                                   force_chain_mode: bool | None = None,
                                   wide_index: bool | None = None,
                                   want_lcp: bool = False):
    """Suffix array of ``text`` via ONE distributed carried-keys sort.

    Returns the sharded int32[n] suffix array. Raises NotImplementedError
    on inputs whose tie structure exceeds the bounded residue and is not
    a clean periodic chain — callers fall back to
    ``build_suffix_array_sharded`` (the doubling path handles any skew).

    ``want_lcp``: also return the sharded int32[n] LCP array as
    ``(sa, lcp)`` — derived in-kernel from the sorted carried keys
    (adjacent xor+clz + the chain rule; host residue for the bounded
    rest). This is the multi-host ladder config's LCP path: the
    distributed PLCP (parallel/lcp.py) pays scan-class per-chip compiles
    the TPU tunnel prices at minutes-to-hours, while this adds a few
    elementwise column passes to a sort the build already runs. Not
    supported with ``wide_index`` (lcp values past the int32 range need
    two-word columns — see _local_build_wide's note).

    ``wide_index``: two-word (hi, lo) global indices for texts past the
    int32 range — the >=4 GiB ladder config (BASELINE.md). Auto-enabled
    when n (plus padding) nears 2^31; forcible for tests. Wide builds
    return a HOST int64[n] array (this convenience API materializes the
    result anyway; a production multi-host pipeline would keep the
    per-shard (hi, lo) columns on device — see _local_build_wide).
    """
    if mesh is None:
        mesh = make_mesh()
    P = int(mesh.devices.size)
    arr = as_byte_array(text)
    n = int(arr.shape[0])
    if n < 8:
        raise ValueError("sharded bigsort needs n >= 8; use the doubling "
                         "builder")
    remap, bits, spw = alphabet_remap(arr)
    ranges = byte_ranges(remap)
    chain = force_chain_mode
    if chain is None:
        chain = estimate_repeat_len(arr) > 2 * spw

    n_pad = bucket_size(n, multiple_of=P * 128)
    if wide_index is None:
        wide_index = n_pad >= (1 << 31) - 1
    if wide_index:
        if want_lcp:
            raise NotImplementedError(
                "want_lcp needs two-word lcp columns past the int32 "
                "range - build the LCP shard-locally from the (hi, lo) "
                "columns in a production pipeline")
        return _build_wide(arr, mesh, P, n, n_pad, remap, bits, spw,
                           ranges, chain, force_chain_mode)
    text_pad = np.zeros(n_pad, np.uint8)
    text_pad[:n] = arr
    text_d = jax.device_put(text_pad, sequence_sharding(mesh))
    vals_d = jnp.asarray(np.flatnonzero(remap > 0).astype(np.uint8))

    kern = _kernels(mesh, bits, spw, ranges)
    s_idx, lcp_d, slots, res_idx, stats = kern(
        text_d, vals_d, jnp.int32(n), jnp.bool_(chain))
    st = np.asarray(jax.device_get(stats)).reshape(P, 6)
    tie_cnt, dmax, dmin = int(st[0, 0]), int(st[0, 1]), int(st[0, 2])

    if chain:
        if tie_cnt:
            delta_ok = (dmin == dmax) and dmax >= 1
            if not delta_ok:
                if force_chain_mode is None and tie_cnt <= n // 4:
                    return build_suffix_array_sharded_big(
                        arr, mesh, force_chain_mode=False,
                        want_lcp=want_lcp)
                raise NotImplementedError(
                    "sharded bigsort: residual ties are not uniform "
                    "arithmetic chains - use the doubling builder")
            d = dmax
            # Host-side period verification (the host holds the text in
            # this API; a multi-host deployment would psum a shifted
            # compare via dist_gather instead).
            if d and np.any(arr[:-d] != arr[d:]):
                raise NotImplementedError(
                    f"sharded bigsort: chain delta {d} is not a global "
                    "period - use the doubling builder")
        sa = s_idx[:n]
        return (sa, lcp_d[:n]) if want_lcp else sa

    if tie_cnt > n // 4 and force_chain_mode is None:
        return build_suffix_array_sharded_big(arr, mesh,
                                              force_chain_mode=True,
                                              want_lcp=want_lcp)
    if np.any(st[:, 4]):
        raise NotImplementedError(
            "sharded bigsort: window-tied elements exceed the per-shard "
            "residue cap - use the doubling builder")

    sa = s_idx[:n]
    lcp = lcp_d[:n] if want_lcp else None
    if tie_cnt:
        slots_h = np.asarray(jax.device_get(slots))
        idx_h = np.asarray(jax.device_get(res_idx))
        keep = slots_h >= 0
        if keep.any():
            s_sorted, fixed, ls, lv = _resolve_residue_host(
                arr, slots_h[keep].astype(np.int64), idx_h[keep], n,
                want_lcp=want_lcp)
            ok = s_sorted < n          # pads never join groups, but guard
            sa = sa.at[jnp.asarray(s_sorted[ok].astype(np.int32))].set(
                jnp.asarray(fixed[ok].astype(np.int32)))
            if want_lcp and len(ls):
                ok_l = ls < n
                lcp = lcp.at[jnp.asarray(ls[ok_l].astype(np.int32))].set(
                    jnp.asarray(lv[ok_l].astype(np.int32)))
    return (sa, lcp) if want_lcp else sa


def _build_wide(arr, mesh, P, n, n_pad, remap, bits, spw, ranges, chain,
                force_chain_mode):
    """Wide-index (two-word) sharded build; returns host int64[n]."""
    m = n_pad // P
    text_pad = np.zeros(n_pad, np.uint8)
    text_pad[:n] = arr
    text_d = jax.device_put(text_pad, sequence_sharding(mesh))
    vals_d = jnp.asarray(np.flatnonzero(remap > 0).astype(np.uint8))

    kern = _kernels_wide(mesh, bits, spw, ranges)
    s_hi, s_lo, slot_lo, res_hi, res_lo, stats = kern(
        text_d, vals_d, jnp.int32(n // m), jnp.int32(n % m),
        jnp.bool_(chain))
    st = np.asarray(jax.device_get(stats)).reshape(P, 8)
    tie_cnt = int(st[0, 0])
    dmax_hi, dmin_hi, dmax_lo, dmin_lo = (int(x) for x in st[0, 1:5])

    sa = (np.asarray(jax.device_get(s_hi)).astype(np.int64) * m
          + np.asarray(jax.device_get(s_lo)))[:n]

    if chain:
        if tie_cnt:
            uniform = (dmax_hi == dmin_hi) and (dmax_lo == dmin_lo)
            d = dmax_hi * m + dmax_lo
            if not uniform or d < 1:
                if force_chain_mode is None and tie_cnt <= n // 4:
                    return build_suffix_array_sharded_big(
                        arr, mesh, force_chain_mode=False,
                        wide_index=True)
                raise NotImplementedError(
                    "sharded bigsort[wide]: residual ties are not "
                    "uniform arithmetic chains - use the doubling "
                    "builder")
            if np.any(arr[:-d] != arr[d:]):
                raise NotImplementedError(
                    f"sharded bigsort[wide]: chain delta {d} is not a "
                    "global period - use the doubling builder")
        return sa

    if tie_cnt > n // 4 and force_chain_mode is None:
        return build_suffix_array_sharded_big(arr, mesh,
                                              force_chain_mode=True,
                                              wide_index=True)
    if np.any(st[:, 6]):
        raise NotImplementedError(
            "sharded bigsort[wide]: window-tied elements exceed the "
            "per-shard residue cap - use the doubling builder")

    if tie_cnt:
        # Shard s's slot block is local; globalize with s * m.
        slots_h = np.asarray(jax.device_get(slot_lo)).astype(np.int64)
        shard_of = np.repeat(np.arange(P, dtype=np.int64), RESIDUE_SLOTS)
        keep = slots_h >= 0
        slots_g = slots_h[keep] + shard_of[keep] * m
        idx_g = (np.asarray(jax.device_get(res_hi)).astype(np.int64) * m
                 + np.asarray(jax.device_get(res_lo)))[keep]
        if keep.any():
            s_sorted, fixed, _ls, _lv = _resolve_residue_host(
                arr, slots_g, idx_g, n)
            ok = s_sorted < n
            sa[s_sorted[ok]] = fixed[ok]
    return sa
