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
    PAD_KEY, RESIDUE_SLOTS, _clamp_lcp, _resolve_residue_host,
    byte_ranges, codes_from_bytes, estimate_repeat_len, packing_mode,
    residue_feasible)
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
    scalars. Shard 0 receives zeros — NOT always distinguishable from a
    real record: under minpad packing an all-min-symbol suffix
    legitimately packs to key 0, so shard 0's manufactured zero packet
    CAN compare equal to its first real row. Callers must mask the
    first global row themselves (both _local_build and _local_build_wide
    do, via ``gpos > 0`` / ``~first_global``)."""
    packet = jnp.stack([c[-1] for c in cols])
    perm = [(i, i + 1) for i in range(n_shards - 1)]
    got = lax.ppermute(packet, axis_name, perm)
    return tuple(got[i] for i in range(len(cols)))


def _pack_words(ext, m: int, spw: int, bits: int, nw: int):
    """nw carried key words from m + nw*spw halo-extended codes."""
    words = []
    for w in range(nw):
        kw = jnp.zeros((m,), jnp.int32)
        for s in range(spw):
            kw = (kw << bits) | lax.slice(ext, (w * spw + s,),
                                          (w * spw + s + m,))
        words.append(kw)
    return words


def _key_lcp(prev_words, sorted_words, spw: int, bits: int, nw: int):
    """First-mismatch depth (symbols) of adjacent sorted carried keys.

    xor + count-leading-zeros per word (symbols pack first-highest in
    the low spw*bits bits); fully-equal rows return the nw*spw lower
    bound (ties — chain rule or host residue finish them)."""
    depth = jnp.int32(nw * spw)
    lcp = depth
    for w in range(nw - 1, -1, -1):
        x = prev_words[w] ^ sorted_words[w]
        off = jnp.where(x != 0,
                        (w + 1) * spw - 1 - (31 - lax.clz(x)) // bits,
                        depth)
        lcp = jnp.where(x != 0, off, lcp)
    return jnp.maximum(lcp, 0)


def _local_build(P: int, bits: int, spw: int, R: int, ranges, nw: int,
                 minpad: bool, text_u8, vals, n_real, desc):
    """shard_map body: pack carried keys, one global sort, flags + residue.

    Returns (s_idx[m], lcp[m], slots[R], res_idx[R], stats[6]) per shard;
    stats = (tie_cnt, dmax, dmin, res_cnt_local, res_overflow, _pad) with
    the first three psum/pmax/pmin-replicated and the residue fields
    local. ``lcp[j] = LCP(sa[j-1], sa[j])`` comes from adjacent xor +
    count-leading-zeros on the sorted carried keys (exact for every pair
    that mismatches within nw*spw symbols; the chain rule covers periodic
    ties in-kernel, the host residue patch covers the bounded rest) — a
    handful of elementwise passes on columns the sort already moved, so
    it is always computed. ``nw`` carried words (2, or 3 for small
    alphabets whose 2-word residue overflows the caps — the core
    _direct_sort3 rationale, sharded).
    """
    m = text_u8.shape[0]
    me = lax.axis_index(SEQ_AXIS)
    g = me * m + lax.iota(jnp.int32, m)

    codes = codes_from_bytes(text_u8, vals, ranges)
    codes = jnp.where(g < n_real, codes - (1 if minpad else 0), 0)
    halo = lax.ppermute(codes[:nw * spw], SEQ_AXIS,
                        [(i, i - 1) for i in range(1, P)])
    ext = jnp.concatenate([codes, halo])             # m + nw*spw codes
    words = _pack_words(ext, m, spw, bits, nw)

    real = g < n_real
    words = [jnp.where(real, w, PAD_KEY) for w in words]
    tb = jnp.where(real, jnp.where(desc, n_real - g, g), _BIG)

    out = block_bitonic_sort(tuple(words) + (tb,), num_keys=nw + 1,
                             axis_name=SEQ_AXIS, n_shards=P)
    sw, tbs = list(out[:nw]), out[nw]
    gpos = me * m + lax.iota(jnp.int32, m)           # global sorted slot
    real_s = gpos < n_real                           # pads sort last
    s_idx = jnp.where(real_s, jnp.where(desc, n_real - tbs, tbs), n_real)

    # Tie with the global predecessor (boundary record via one ppermute).
    bprev = _boundary_prev(tuple(sw) + (tbs,), SEQ_AXIS, P)
    prev_w = [jnp.concatenate([bprev[w][None], sw[w][:-1]])
              for w in range(nw)]
    prev_ix = jnp.where(desc, n_real - bprev[nw], bprev[nw])
    prev_idx = jnp.concatenate([prev_ix[None], s_idx[:-1]])
    tie = real_s & (gpos > 0)
    for w in range(nw):
        tie &= sw[w] == prev_w[w]
    delta = jnp.where(tie, jnp.where(desc, prev_idx - s_idx,
                                     s_idx - prev_idx), 0)
    tie_cnt = lax.psum(jnp.sum(tie.astype(jnp.int32)), SEQ_AXIS)
    dmax = lax.pmax(jnp.max(jnp.where(tie, delta, 0)), SEQ_AXIS)
    dmin = lax.pmin(jnp.min(jnp.where(tie, delta, _BIG)), SEQ_AXIS)

    # LCP from the carried keys (mirror of core _bucket_sort want_lcp).
    lcp = _key_lcp(prev_w, sw, spw, bits, nw)
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
    # Unstable: member keys are distinct iota values; the shared _BIG
    # tail's payload order is dead (sliced off by the member count).
    o_slot, o_idx = lax.sort((keyed, s_idx), num_keys=1, is_stable=False)
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
                      nw: int, minpad: bool, text_u8, vals, n_hi, n_lo,
                      desc):
    """``_local_build`` with TWO-WORD global indices: the >=4 GiB path.

    Global suffix index g = hi * m + lo (hi = shard id, lo = local
    offset, both int32) — n up to P * 2^31 with no int64 sort operands
    (TPU int64 is emulated 32-bit pairs; an (nw+2)-key int32 sort is the
    same comparator work done natively). Descending order uses the exact
    two-word complement (P*m - 1) - g = (P-1-hi, m-1-lo). Index compares
    (real mask, tie deltas) are lexicographic (hi, lo) pairs; delta
    uniformity is checked componentwise (all pairs equal <=> both
    columns' pmax == pmin, since fills are 0 / +inf and deltas are
    nonnegative). The LCP rides as the same two-word (hi, lo) base-m
    pair: in-window values are tiny (<= nw*spw, lo word only), chain-
    rule values n - prev_g use exact two-word borrow arithmetic — this
    is the wide build's LCP path (r2 raised NotImplementedError here).
    Returns per shard: (s_hi[m], s_lo[m], lcp_hi[m], lcp_lo[m],
    slot_lo[R], res_hi[R], res_lo[R], stats[8]); slots are LOCAL sorted
    offsets (-1 pads) — the host adds shard*m.
    """
    m = text_u8.shape[0]
    me = lax.axis_index(SEQ_AXIS)
    lo = lax.iota(jnp.int32, m)

    def lt_n(hi, lo_):
        return (hi < n_hi) | ((hi == n_hi) & (lo_ < n_lo))

    codes = codes_from_bytes(text_u8, vals, ranges)
    codes = jnp.where(lt_n(me, lo), codes - (1 if minpad else 0), 0)
    halo = lax.ppermute(codes[:nw * spw], SEQ_AXIS,
                        [(i, i - 1) for i in range(1, P)])
    ext = jnp.concatenate([codes, halo])
    words = _pack_words(ext, m, spw, bits, nw)

    real = lt_n(me, lo)
    words = [jnp.where(real, w, PAD_KEY) for w in words]
    tbh = jnp.where(real, jnp.where(desc, P - 1 - me, me), _BIG)
    tbl = jnp.where(real, jnp.where(desc, m - 1 - lo, lo), _BIG)

    out = block_bitonic_sort(tuple(words) + (tbh, tbl), num_keys=nw + 2,
                             axis_name=SEQ_AXIS, n_shards=P)
    sw, tbhs, tbls = list(out[:nw]), out[nw], out[nw + 1]
    real_s = sw[0] != PAD_KEY                        # pads sort last
    for w in range(1, nw):
        real_s |= sw[w] != PAD_KEY
    s_hi = jnp.where(real_s, jnp.where(desc, P - 1 - tbhs, tbhs), n_hi)
    s_lo = jnp.where(real_s, jnp.where(desc, m - 1 - tbls, tbls), n_lo)

    bprev = _boundary_prev(tuple(sw) + (s_hi, s_lo), SEQ_AXIS, P)
    prev_w = [jnp.concatenate([bprev[w][None], sw[w][:-1]])
              for w in range(nw)]
    prev_hi = jnp.concatenate([bprev[nw][None], s_hi[:-1]])
    prev_lo = jnp.concatenate([bprev[nw + 1][None], s_lo[:-1]])
    first_global = (me == 0) & (lo == 0)
    tie = real_s & ~first_global
    for w in range(nw):
        tie &= sw[w] == prev_w[w]
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

    # LCP as a two-word base-m pair. In-window first mismatches are tiny
    # (<= nw*spw — lo word only); chain-rule ties get the exact
    # lcp = n - prev_g with borrow; ascending ties keep the nw*spw lower
    # bound for the host residue patch (same contract as _local_build).
    key_lcp = _key_lcp(prev_w, sw, spw, bits, nw)
    nb = (n_lo < prev_lo).astype(jnp.int32)
    chain_lo = n_lo - prev_lo + nb * m
    chain_hi = n_hi - prev_hi - nb
    use_chain = tie & desc
    gpos_ok = real_s & ~first_global
    lcp_hi = jnp.where(gpos_ok & use_chain, chain_hi, 0).astype(jnp.int32)
    lcp_lo = jnp.where(gpos_ok, jnp.where(use_chain, chain_lo, key_lcp),
                       0).astype(jnp.int32)

    nxt0 = lax.ppermute(tie[:1].astype(jnp.int32), SEQ_AXIS,
                        [(i, i - 1) for i in range(1, P)])[0]
    next_tie = jnp.concatenate([tie[1:].astype(jnp.int32), nxt0[None]])
    member = (tie | (next_tie > 0)) & real_s
    keyed = jnp.where(member, lo, _BIG)
    o_slot, o_hi, o_lo = lax.sort((keyed, s_hi, s_lo), num_keys=1,
                                  is_stable=False)
    k = min(R, m)
    slot_lo = jnp.where(o_slot[:k] < _BIG, o_slot[:k], -1)
    slot_lo = jnp.concatenate([slot_lo, jnp.full((R - k,), -1, jnp.int32)])
    res_hi = jnp.concatenate([o_hi[:k], jnp.zeros((R - k,), jnp.int32)])
    res_lo = jnp.concatenate([o_lo[:k], jnp.zeros((R - k,), jnp.int32)])
    res_cnt = jnp.sum(member.astype(jnp.int32))
    stats = jnp.stack([tie_cnt, dmax_hi, dmin_hi, dmax_lo, dmin_lo,
                       res_cnt, (res_cnt > R).astype(jnp.int32),
                       jnp.int32(0)])
    return s_hi, s_lo, lcp_hi, lcp_lo, slot_lo, res_hi, res_lo, stats


@functools.cache
def _kernels(mesh: Mesh, bits: int, spw: int, ranges, nw: int = 2,
             minpad: bool = False):
    P = int(mesh.devices.size)
    spec = PartitionSpec(SEQ_AXIS)
    rep = PartitionSpec()
    f = jax.shard_map(
        functools.partial(_local_build, P, bits, spw, RESIDUE_SLOTS,
                          ranges, nw, minpad),
        mesh=mesh,
        in_specs=(spec, rep, rep, rep),
        out_specs=(spec, spec, spec, spec, spec),
        check_vma=False)
    return jax.jit(f)


@functools.cache
def _kernels_wide(mesh: Mesh, bits: int, spw: int, ranges, nw: int = 2,
                  minpad: bool = False):
    P = int(mesh.devices.size)
    spec = PartitionSpec(SEQ_AXIS)
    rep = PartitionSpec()
    f = jax.shard_map(
        functools.partial(_local_build_wide, P, bits, spw, RESIDUE_SLOTS,
                          ranges, nw, minpad),
        mesh=mesh,
        in_specs=(spec, rep, rep, rep, rep),
        out_specs=(spec,) * 8,
        check_vma=False)
    return jax.jit(f)


@functools.cache
def _clamp_kernel_wide(mesh: Mesh):
    """Two-word shorter-suffix-length clamp over the assembled sharded
    (sa, lcp) column pairs — the wide counterpart of core ``_clamp_lcp``
    (see its docstring for why minpad packing needs this and why it must
    run AFTER the residue patch). g = hi * m + lo; all compares and the
    n - max(prev_g, g) subtraction are exact two-word base-m arithmetic.
    Global row 0's manufactured zero predecessor loses the max() against
    any real g, so lcp[0] = 0 is preserved; pad rows (g = n) clamp to 0,
    which they already are."""
    P = int(mesh.devices.size)
    spec = PartitionSpec(SEQ_AXIS)
    rep = PartitionSpec()

    def body(s_hi, s_lo, lcp_hi, lcp_lo, n_hi, n_lo):
        m = s_hi.shape[0]
        bprev = _boundary_prev((s_hi, s_lo), SEQ_AXIS, P)
        p_hi = jnp.concatenate([bprev[0][None], s_hi[:-1]])
        p_lo = jnp.concatenate([bprev[1][None], s_lo[:-1]])
        use_prev = (p_hi > s_hi) | ((p_hi == s_hi) & (p_lo > s_lo))
        m_hi = jnp.where(use_prev, p_hi, s_hi)
        m_lo = jnp.where(use_prev, p_lo, s_lo)
        borrow = (n_lo < m_lo).astype(jnp.int32)
        len_lo = n_lo - m_lo + borrow * m
        len_hi = n_hi - m_hi - borrow
        use_len = (len_hi < lcp_hi) | ((len_hi == lcp_hi)
                                       & (len_lo < lcp_lo))
        return (jnp.where(use_len, len_hi, lcp_hi),
                jnp.where(use_len, len_lo, lcp_lo))

    return jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec, spec, rep, rep),
        out_specs=(spec, spec), check_vma=False))


@functools.cache
def _patch_kernel(mesh: Mesh):
    """Per-shard scatter of host-resolved residue values into a sharded
    column (wide device-resident mode): each shard receives its own
    RESIDUE_SLOTS (local offset, value) rows, -1 slots are pads."""
    spec = PartitionSpec(SEQ_AXIS)

    def body(col, slots, vals):
        # Pads (-1) scatter out of range and drop — never clamp pads to
        # a real slot alongside a genuine patch for it (duplicate-index
        # set() ordering is undefined; see core _apply_patch, soak r3).
        m = col.shape[0]
        tgt = jnp.where(slots >= 0, slots, m)
        return col.at[tgt].set(vals, mode="drop")

    return jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False))


def build_suffix_array_sharded_big(text, mesh: Mesh | None = None,
                                   force_chain_mode: bool | None = None,
                                   wide_index: bool | None = None,
                                   want_lcp: bool = False,
                                   device_columns: bool = False):
    """Suffix array of ``text`` via ONE distributed carried-keys sort.

    Returns the sharded int32[n] suffix array. Raises NotImplementedError
    on inputs whose tie structure exceeds the bounded residue and is not
    a clean periodic chain — callers fall back to
    ``build_suffix_array_sharded`` (the doubling path handles any skew).

    ``want_lcp``: also return the LCP array as ``(sa, lcp)`` — derived
    in-kernel from the sorted carried keys (adjacent xor+clz + the chain
    rule; host residue for the bounded rest). This is the multi-host
    ladder config's LCP path: the distributed PLCP (parallel/lcp.py)
    pays scan-class per-chip compiles the TPU tunnel prices at
    minutes-to-hours, while this adds a few elementwise column passes to
    a sort the build already runs. Under ``wide_index`` the LCP is a
    two-word base-m pair like the SA itself (r2's NotImplementedError
    here is closed — see _local_build_wide).

    ``wide_index``: two-word (hi, lo) global indices for texts past the
    int32 range — the >=4 GiB ladder config (BASELINE.md). Auto-enabled
    when n (plus padding) nears 2^31; forcible for tests. By default
    wide builds materialize HOST int64[n] arrays (convenience API);
    ``device_columns=True`` instead returns the device-resident sharded
    int32[n_pad] base-m column pairs ``(sa_hi, sa_lo)`` (and
    ``(lcp_hi, lcp_lo)`` with want_lcp), g = hi * m + lo with
    m = n_pad // len(mesh): the production multi-host form — nothing
    n-sized crosses to the host, residue patches apply per shard on
    device (_patch_kernel).
    """
    if mesh is None:
        mesh = make_mesh()
    P = int(mesh.devices.size)
    arr = as_byte_array(text)
    n = int(arr.shape[0])
    if n < 8:
        raise ValueError("sharded bigsort needs n >= 8; use the doubling "
                         "builder")
    remap, _, _ = alphabet_remap(arr)
    bits, spw, minpad = packing_mode(remap)
    ranges = byte_ranges(remap)
    est_repeat = estimate_repeat_len(arr)
    # Carried word count: 2, or 3 when the 2-word expected residue
    # overflows the mesh-wide extraction budget but 3 words' fits (small
    # alphabets at scale — DNA past ~2^26; core _direct_sort3 rationale,
    # sharded). Periodic texts stay at 2 (chain rule needs no cap).
    cap_total = P * RESIDUE_SLOTS / 4
    nw = 2
    if not residue_feasible(arr, n, cap_total, est_repeat, spw=spw):
        if residue_feasible(arr, n, cap_total, est_repeat, words=3,
                            spw=spw):
            nw = 3
    chain = force_chain_mode
    if chain is None:
        chain = est_repeat > nw * spw

    n_pad = bucket_size(n, multiple_of=P * 128)
    if wide_index is None:
        wide_index = n_pad >= (1 << 31) - 1
    if wide_index:
        return _build_wide(arr, mesh, P, n, n_pad, remap, bits, spw,
                           minpad, ranges, nw, chain, force_chain_mode,
                           want_lcp, device_columns)
    text_pad = np.zeros(n_pad, np.uint8)
    text_pad[:n] = arr
    text_d = jax.device_put(text_pad, sequence_sharding(mesh))
    vals_d = jnp.asarray(np.flatnonzero(remap > 0).astype(np.uint8))

    kern = _kernels(mesh, bits, spw, ranges, nw, minpad)
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
                if force_chain_mode is None and tie_cnt <= n // 4:
                    # Uniform deltas that are NOT a global period (e.g.
                    # a min-symbol tail run under minpad packing, or one
                    # long repeated block): ascending + host residue
                    # handles the bounded ties; chain mode was a
                    # misprediction (mirrors core execute_big).
                    return build_suffix_array_sharded_big(
                        arr, mesh, force_chain_mode=False,
                        want_lcp=want_lcp)
                raise NotImplementedError(
                    f"sharded bigsort: chain delta {d} is not a global "
                    "period - use the doubling builder")
        sa = s_idx[:n]
        if want_lcp:
            lcp = lcp_d[:n]
            if minpad:
                lcp = _clamp_lcp(sa, lcp, jnp.int32(n))
            return sa, lcp
        return sa

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
    if want_lcp and minpad:
        lcp = _clamp_lcp(sa, lcp, jnp.int32(n))
    return (sa, lcp) if want_lcp else sa


def _group_patches(slots_g, vals, P: int, m: int, R: int):
    """Group global-slot patches by owning shard into (P*R,) padded
    int32 (local slot, value) arrays for the shard_map patch kernel."""
    out_s = np.full(P * R, -1, np.int32)
    out_v = np.zeros(P * R, np.int32)
    sh = (slots_g // m).astype(np.int64)
    loc = (slots_g % m).astype(np.int32)
    for p_ in range(P):
        idx = np.flatnonzero(sh == p_)
        assert len(idx) <= R, "per-shard residue cap violated"
        out_s[p_ * R:p_ * R + len(idx)] = loc[idx]
        out_v[p_ * R:p_ * R + len(idx)] = vals[idx]
    return out_s, out_v


def _build_wide(arr, mesh, P, n, n_pad, remap, bits, spw, minpad, ranges,
                nw, chain, force_chain_mode, want_lcp, device_columns):
    """Wide-index (two-word) sharded build.

    ``device_columns=False`` (default): host int64[n] arrays (sa, and
    lcp when ``want_lcp``) — the convenience API. ``device_columns=True``:
    the device-resident sharded int32[n_pad] base-m column pairs
    ``(sa_hi, sa_lo)`` (and ``(lcp_hi, lcp_lo)``), valid in the first n
    rows, g = hi * m + lo with m = n_pad // P — the production multi-host
    form: nothing n-sized ever crosses to the host, and the residue
    patch is applied per shard on device (_patch_kernel).
    """
    m = n_pad // P
    text_pad = np.zeros(n_pad, np.uint8)
    text_pad[:n] = arr
    text_d = jax.device_put(text_pad, sequence_sharding(mesh))
    vals_d = jnp.asarray(np.flatnonzero(remap > 0).astype(np.uint8))

    kern = _kernels_wide(mesh, bits, spw, ranges, nw, minpad)
    s_hi, s_lo, lcp_hi, lcp_lo, slot_lo, res_hi, res_lo, stats = kern(
        text_d, vals_d, jnp.int32(n // m), jnp.int32(n % m),
        jnp.bool_(chain))
    st = np.asarray(jax.device_get(stats)).reshape(P, 8)
    tie_cnt = int(st[0, 0])
    dmax_hi, dmin_hi, dmax_lo, dmin_lo = (int(x) for x in st[0, 1:5])

    def materialize():
        if device_columns:
            cols_l = (lcp_hi, lcp_lo)
            if want_lcp and minpad:
                # Final two-word length clamp over the (possibly
                # patched) columns — see _clamp_kernel_wide.
                cols_l = _clamp_kernel_wide(mesh)(
                    s_hi, s_lo, lcp_hi, lcp_lo, jnp.int32(n // m),
                    jnp.int32(n % m))
            sa_cols = (s_hi, s_lo)
            return ((sa_cols, cols_l) if want_lcp else sa_cols)
        sa = (np.asarray(jax.device_get(s_hi)).astype(np.int64) * m
              + np.asarray(jax.device_get(s_lo)))[:n]
        if not want_lcp:
            return sa
        lcp = (np.asarray(jax.device_get(lcp_hi)).astype(np.int64) * m
               + np.asarray(jax.device_get(lcp_lo)))[:n]
        return sa, lcp

    def np_clamp(sa, lcp):
        """Host counterpart of the final minpad length clamp (applied
        AFTER any numpy residue patch — see core _clamp_lcp)."""
        prev = np.concatenate([sa[:1], sa[:-1]])
        return np.minimum(lcp, n - np.maximum(prev, sa))

    def finish():
        out = materialize()
        if not (want_lcp and minpad) or device_columns:
            return out
        sa, lcp = out
        return sa, np_clamp(sa, lcp)

    if chain:
        if tie_cnt:
            uniform = (dmax_hi == dmin_hi) and (dmax_lo == dmin_lo)
            d = dmax_hi * m + dmax_lo
            if not uniform or d < 1:
                if force_chain_mode is None and tie_cnt <= n // 4:
                    return build_suffix_array_sharded_big(
                        arr, mesh, force_chain_mode=False,
                        wide_index=True, want_lcp=want_lcp,
                        device_columns=device_columns)
                raise NotImplementedError(
                    "sharded bigsort[wide]: residual ties are not "
                    "uniform arithmetic chains - use the doubling "
                    "builder")
            if np.any(arr[:-d] != arr[d:]):
                if force_chain_mode is None and tie_cnt <= n // 4:
                    # Misprediction fallback — see the narrow branch.
                    return build_suffix_array_sharded_big(
                        arr, mesh, force_chain_mode=False,
                        wide_index=True, want_lcp=want_lcp,
                        device_columns=device_columns)
                raise NotImplementedError(
                    f"sharded bigsort[wide]: chain delta {d} is not a "
                    "global period - use the doubling builder")
        return finish()

    if tie_cnt > n // 4 and force_chain_mode is None:
        return build_suffix_array_sharded_big(
            arr, mesh, force_chain_mode=True, wide_index=True,
            want_lcp=want_lcp, device_columns=device_columns)
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
            s_sorted, fixed, ls, lv = _resolve_residue_host(
                arr, slots_g, idx_g, n, want_lcp=want_lcp)
            ok = s_sorted < n
            if device_columns:
                patch = _patch_kernel(mesh)
                R = RESIDUE_SLOTS
                ps, pv = _group_patches(s_sorted[ok], fixed[ok] // m,
                                        P, m, R)
                s_hi = patch(s_hi, jnp.asarray(ps), jnp.asarray(pv))
                ps, pv = _group_patches(s_sorted[ok], fixed[ok] % m,
                                        P, m, R)
                s_lo = patch(s_lo, jnp.asarray(ps), jnp.asarray(pv))
                if want_lcp and len(ls):
                    ok_l = ls < n
                    ps, pv = _group_patches(ls[ok_l], lv[ok_l] // m,
                                            P, m, R)
                    lcp_hi = patch(lcp_hi, jnp.asarray(ps),
                                   jnp.asarray(pv))
                    ps, pv = _group_patches(ls[ok_l], lv[ok_l] % m,
                                            P, m, R)
                    lcp_lo = patch(lcp_lo, jnp.asarray(ps),
                                   jnp.asarray(pv))
            else:
                out = materialize()
                sa, lcp = out if want_lcp else (out, None)
                sa[s_sorted[ok]] = fixed[ok]
                if want_lcp and len(ls):
                    ok_l = ls < n
                    lcp[ls[ok_l]] = lv[ok_l]
                if want_lcp and minpad:
                    lcp = np_clamp(sa, lcp)
                return (sa, lcp) if want_lcp else sa
    return finish()
