"""Out-of-core single-chip suffix sort: the 1 GiB class.

The prefix-doubling kernel (core/suffix_array.py) holds ~30 B of device
state per input char during its pair sort, capping single-chip builds
near 256 MB of the ~15.6 GiB usable v5e HBM (measured). This module
covers the 1 GiB ladder config of BASELINE.md with an algorithm whose
phases each stay under ~15 GB and whose programs avoid the two measured
TPU sinkholes (see TODO.md "tunnel remote-compile economics"):

  * scan ops (cummax/cumsum/associative_scan) and lax.map cost 10-60x a
    sort in remote compile — every program here is sort/slice/reduce/DUS;
  * XLA gathers cost ~10 ns per gathered ELEMENT regardless of row shape
    (measured: 1-elem rows 9.7 ns/el, 18-byte rows 10 ns/el), so the
    design CARRIES sort keys through the data movement instead of
    gathering windows per bucket — gathers touch only the tiny residue.

**Carried-keys MSD bucket sort.**

  1. *Plan (host)*: dense alphabet remap (core alphabet_remap) packs
     ``spw = 30//bits`` symbols per int32 word; each suffix gets two
     words k0, k1 = its first 2*spw symbols (6 for bytes, 10 for
     alnum, 20 for DNA after remap — sized so the expected number of
     SA pairs still tied after 2*spw symbols stays within the bounded
     residue for random-ish texts at 2^30: C(n,2)/sigma^(2*spw) is ~1
     for alnum/bytes and ~5e5 spread over all buckets for DNA). Symbol
     0 is
     reserved for past-the-end so a shorter suffix that is a prefix of a
     longer one orders first (the reference gets this from strcmp,
     src/sequential/manber_myers.c:195). Bucket edges = quantiles of
     sampled (k0,k1) pairs.
  2. *Distribute (device, C chunk passes)*: compute k0,k1 by STREAMING
     slices in position space (no gathers), bucket id by edge compare,
     sort ``(bid, k0, k1, idx)`` per chunk, append to storage. Run
     boundaries come back in ONE transfer.
  3. *Bucket passes*: assemble each bucket's C runs, sort
     ``(k0, k1, idx)``, write the sorted idx back into the bucket's own
     storage slices (read-modify-write, so no second n-sized buffer is
     live while the 12 B/char key storage still is).
  4. *Assembly*: free the key storage, then concatenate the bucket runs
     into the SA accumulator (streaming).
  5. *Residue*: pairs still tied after 2*spw symbols are extracted
     (device compaction sort, bounded), resolved by direct comparison on
     the HOST (which has the text), and patched into the SA.
  6. *Periodic chain mode*: when most of the text ties (globally
     periodic input, the reference's repetitive corpus family),
     re-running the bucket sort with a DESCENDING idx tiebreak is exact:
     for a verified global period d, s_{i+d} is a strict prefix of s_i,
     so every tie chain orders by descending index (telescoping
     comparison). Verification = one streaming period sweep + uniform
     chain-delta check; non-conforming texts fail loudly.

Behavioral parity: byte-identical suffix array to the reference's
``build_suffix_array`` (src/sequential/manber_myers.c:81-133); this is an
algorithmic replacement for scale, validated against the same oracles.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from hpc_suffix_array_tpu.core.suffix_array import (
    alphabet_remap, as_byte_array, bucket_size)

PAD_KEY = jnp.int32(1) << 30     # > any 30-bit packed word
RESIDUE_SLOTS = 1 << 15          # extracted tie pairs per bucket (fetch cap)
HALO = 128                       # text halo: >= 3*spw + slack symbols
MAX_PASS_ELEMS = 1 << 28         # padded elements one bucket pass may sort
#   (~10 live int32 arrays during the 3-key sort -> ~10.7 GB at the cap;
#    beyond it one bucket dominates the text and this path can't help)


@dataclass
class BigPlan:
    """Host-side plan: geometry, alphabet packing, bucket edges."""

    n: int
    m: int                      # chunk width (position space)
    n_chunks: int
    bits: int                   # bits per dense symbol code
    spw: int                    # symbols packed per key word (30 // bits)
    remap: np.ndarray           # uint8 -> dense code (1..sigma), int32[256]
    e0: np.ndarray              # int32[E] edge k0 words
    e1: np.ndarray              # int32[E] edge k1 words
    bounds: np.ndarray | None = None
    counts: np.ndarray | None = None
    meta: dict = field(default_factory=dict)

    @property
    def n_buckets(self) -> int:
        return len(self.e0) + 1


def _host_pack_words(arr, remap, pos, spw: int, bits: int, word: int):
    """k{word} for sampled positions (host mirror of the device packing)."""
    n = len(arr)
    out = np.zeros(len(pos), np.int64)
    for s in range(spw):
        p = pos + word * spw + s
        code = np.where(p < n, remap[arr[np.minimum(p, n - 1)]], 0)
        out = (out << bits) | code
    return out


def sample_edges(arr: np.ndarray, remap, spw: int, bits: int,
                 target_bucket: int, sample: int = 1 << 21,
                 seed: int = 0x5A) -> tuple[np.ndarray, np.ndarray]:
    """Quantile bucket edges over sampled (k0, k1) pairs (host)."""
    n = len(arr)
    n_buckets = max(2, math.ceil(n / target_bucket))
    rng = np.random.default_rng(seed)
    pos = rng.integers(0, n, min(sample, 4 * n))
    code = (_host_pack_words(arr, remap, pos, spw, bits, 0) << 31) | \
        _host_pack_words(arr, remap, pos, spw, bits, 1)
    code.sort()
    q = (np.arange(1, n_buckets) * len(code)) // n_buckets
    edges = np.unique(code[q])
    return ((edges >> 31).astype(np.int32),
            (edges & ((1 << 31) - 1)).astype(np.int32))


def _dev_pack_word(codes_ext, offset: int, spw: int, bits: int, m: int):
    """Packed word of spw codes starting at element offset (static fold)."""
    out = jnp.zeros((m,), jnp.int32)
    for s in range(spw):
        out = (out << bits) | lax.slice(
            codes_ext, (offset + s,), (offset + s + m,))
    return out


@functools.partial(jax.jit, static_argnums=(0, 1, 2),
                   donate_argnums=(3, 4, 5))
def _distribute_chunk(m: int, spw: int, bits: int, idxS, k0S, k1S,
                      text_pad, remap_d, e0, e1, start, n):
    """One chunk: carried-key distribute (see module docstring, step 2).

    Writes the chunk's sorted run directly into the donated storage
    slabs at offset ``start`` (the storage layout is position-aligned:
    chunk c owns [c*m, (c+1)*m)) — a list-append + concatenate here
    would double the 12 B/char storage at its peak, which is exactly
    the HBM headroom the 1 GiB config does not have.
    """
    E = e0.shape[0]
    ext = lax.dynamic_slice(text_pad, (start,), (m + 2 * spw,))
    pos_ext = start + lax.iota(jnp.int32, m + 2 * spw)
    codes = jnp.where(pos_ext < n, remap_d[ext], 0)
    k0 = _dev_pack_word(codes, 0, spw, bits, m)
    k1 = _dev_pack_word(codes, spw, spw, bits, m)

    # (m, E) compare fuses into its row reduction (no m*E buffer).
    ge = (k0[:, None] > e0) | ((k0[:, None] == e0) & (k1[:, None] >= e1))
    bid = jnp.sum(ge.astype(jnp.int32), axis=1)
    pos = start + lax.iota(jnp.int32, m)
    bid = jnp.where(pos < n, bid, E + 1)      # trash bucket for pads
    s_bid, s_k0, s_k1, s_idx = lax.sort(
        (bid, k0, k1, pos), num_keys=1, is_stable=False)
    bounds = jnp.searchsorted(s_bid, jnp.arange(E + 2, dtype=jnp.int32))
    return (lax.dynamic_update_slice(idxS, s_idx, (start,)),
            lax.dynamic_update_slice(k0S, s_k0, (start,)),
            lax.dynamic_update_slice(k1S, s_k1, (start,)),
            bounds.astype(jnp.int32))


def _assemble_runs(C: int, S: int, arrays, starts, counts, fills):
    """Concatenate C fixed-size reads per array; mask = iota < counts[c].

    Returns (list of assembled arrays, valid mask). ``fills`` supplies
    the per-array pad value used outside the valid region.
    """
    iota_s = lax.iota(jnp.int32, S)
    outs = [[] for _ in arrays]
    valid = []
    for c in range(C):
        ok = iota_s < counts[c]
        valid.append(ok)
        for a, (arr, fill) in enumerate(zip(arrays, fills)):
            run = lax.dynamic_slice(arr, (starts[c],), (S,))
            outs[a].append(jnp.where(ok, run, fill))
    return [jnp.concatenate(o) for o in outs], jnp.concatenate(valid)


def _bucket_sort_core(C: int, S: int, k0S, k1S, idxS, starts, counts, n,
                      desc_idx: bool):
    """Assemble + sort one bucket; returns (sorted k0,k1,idx, tie, n_real)."""
    (k0, k1, idx), valid = _assemble_runs(
        C, S, (k0S, k1S, idxS), starts, counts,
        ((PAD_KEY, PAD_KEY, n)))
    k0 = jnp.where(valid, k0, PAD_KEY)
    tiebreak = (n - idx) if desc_idx else idx
    sk0, sk1, st = lax.sort((k0, k1, tiebreak), num_keys=3)
    s_idx = (n - st) if desc_idx else st
    real = s_idx < n
    tie = (sk0 == jnp.concatenate([sk0[:1], sk0[:-1]])) & \
          (sk1 == jnp.concatenate([sk1[:1], sk1[:-1]])) & \
          real & jnp.concatenate([real[:1], real[:-1]])
    tie = tie.at[0].set(False)
    return sk0, sk1, s_idx, tie, jnp.sum(real.astype(jnp.int32))


@functools.partial(jax.jit, static_argnums=(0, 1, 2), donate_argnums=(4, 5))
def _bucket_pass(C: int, S: int, desc_idx: bool, k0S, k1S, idxS,
                 starts, counts, n):
    """Sort one bucket; write the order back into its own storage runs
    (read-modify-write on idxS) and the tie flags into the bucket's own
    k1S regions — the keys there are dead the moment this pass consumed
    them, and reusing their storage saves an n-sized flag buffer the
    1 GiB config cannot afford. The flags are aligned with the
    written-back order (the key columns do NOT follow the write-back,
    so any later tie processing must use these flags, via
    ``_extract_ties``). For desc_idx=True (chain mode) additionally
    checks chain-delta uniformity.

    Returns (idxS, k1S, tie_count, d, delta_ok)."""
    _sk0, _sk1, s_idx, tie, _n_real = _bucket_sort_core(
        C, S, k0S, k1S, idxS, starts, counts, n, desc_idx)

    prev_idx = jnp.concatenate([s_idx[:1], s_idx[:-1]])
    delta = jnp.where(tie, (prev_idx - s_idx) if desc_idx
                      else (s_idx - prev_idx), 0)
    big = jnp.int32(1) << 30
    dmax = jnp.max(jnp.where(tie, delta, 0))
    dmin = jnp.min(jnp.where(tie, delta, big))
    delta_ok = (~jnp.any(tie)) | ((dmin == dmax) & (dmax >= 1))

    # Write back: run c receives s_idx[off_c : off_c + counts[c]].
    iota_s = lax.iota(jnp.int32, S)
    tie32 = tie.astype(jnp.int32)
    off = jnp.int32(0)
    for c in range(C):
        win = lax.dynamic_slice(s_idx, (off,), (S,))
        cur = lax.dynamic_slice(idxS, (starts[c],), (S,))
        ok = iota_s < counts[c]
        idxS = lax.dynamic_update_slice(
            idxS, jnp.where(ok, win, cur), (starts[c],))
        fwin = lax.dynamic_slice(tie32, (off,), (S,))
        fcur = lax.dynamic_slice(k1S, (starts[c],), (S,))
        k1S = lax.dynamic_update_slice(
            k1S, jnp.where(ok, fwin, fcur), (starts[c],))
        off = off + counts[c]
    return idxS, k1S, jnp.sum(tie.astype(jnp.int32)), dmax, \
        delta_ok.astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _extract_ties(C: int, S: int, flagS, idxS, starts, counts, n):
    """Compact one bucket's tied elements to (slot, idx) pairs.

    Reads the written-back order (idxS) and its tie flags (``flagS`` =
    the k1S storage after ``_bucket_pass`` overwrote the bucket's dead
    key regions with 0/1 flags). A tie GROUP contributes all its members
    (the flag marks the later element of each tied pair; heads join via
    the successor's flag). ``slot`` is the element's rank among the
    bucket's real elements — closed form off_c + j per run, no scan.
    Returns fixed RESIDUE_SLOTS pairs (-1-padded slots) + the true
    member count.
    """
    iota_s = lax.iota(jnp.int32, S)
    big = jnp.int32(1) << 30
    fs, ids, sls = [], [], []
    off = jnp.int32(0)
    for c in range(C):
        ok = iota_s < counts[c]
        fs.append(jnp.where(
            ok, lax.dynamic_slice(flagS, (starts[c],), (S,)), 0))
        ids.append(jnp.where(
            ok, lax.dynamic_slice(idxS, (starts[c],), (S,)), n))
        sls.append(jnp.where(ok, off + iota_s, big))
        off = off + counts[c]
    f = jnp.concatenate(fs).astype(jnp.int32)
    ix = jnp.concatenate(ids)
    sl = jnp.concatenate(sls)

    # Compact real-first in bucket order, then mark members.
    sl2, f2, ix2 = lax.sort((sl, f, ix), num_keys=1)
    tied = f2 > 0
    member = tied | jnp.concatenate([tied[1:], tied[:1]])
    keyed = jnp.where(member & (sl2 < big), sl2, big)
    o_slot, o_idx = lax.sort((keyed, ix2), num_keys=1)
    k = min(RESIDUE_SLOTS, C * S)
    out_slot = jnp.where(o_slot[:k] < big, o_slot[:k], -1)
    return out_slot, o_idx[:k], jnp.sum(
        (member & (sl2 < big)).astype(jnp.int32))


@functools.partial(jax.jit, static_argnums=(0, 1), donate_argnums=(3,))
def _assemble_bucket(C: int, S: int, idxS, sa_acc, starts, counts, base):
    """Concatenate one bucket's (already sorted) runs into sa_acc at base
    (read-modify-write so later buckets never clobber earlier ones)."""
    (vals,), valid = _assemble_runs(
        C, S, (idxS,), starts, counts, ((0,)))
    # compact: valid-first stable by position
    P = C * S
    keyed = jnp.where(valid, lax.iota(jnp.int32, P), jnp.int32(P))
    _k, compact = lax.sort((keyed, vals), num_keys=1)
    n_real = jnp.sum(valid.astype(jnp.int32))
    cur = lax.dynamic_slice(sa_acc, (base,), (P,))
    merged = jnp.where(lax.iota(jnp.int32, P) < n_real, compact, cur)
    return lax.dynamic_update_slice(sa_acc, merged, (base,))


@functools.partial(jax.jit, donate_argnums=(0,))
def _apply_patch(sa_acc, slots, vals):
    """Scatter host-resolved residue orderings back into the SA."""
    ok = slots >= 0
    safe = jnp.where(ok, slots, 0)
    cur = sa_acc[safe]
    return sa_acc.at[safe].set(jnp.where(ok, vals, cur))


@jax.jit
def _period_mismatches(text_pad, d, n):
    """#positions t in [0, n-d) with text[t] != text[t+d] (d traced)."""
    L = text_pad.shape[0]
    shifted = lax.dynamic_slice(
        jnp.concatenate([text_pad, jnp.zeros_like(text_pad)]), (d,), (L,))
    t = lax.iota(jnp.int32, L)
    bad = (text_pad != shifted) & (t < n - d)
    return jnp.sum(bad.astype(jnp.int32))


def estimate_repeat_len(arr: np.ndarray, sample: int = 1 << 16,
                        probe_depth: int = 4096, seed: int = 0x11
                        ) -> int:
    """Cheap host-side estimate of the text's longest repeat (bytes).

    Samples positions, finds 8-byte-window collisions among them, and
    extends a few hundred colliding pairs by direct comparison. Periodic
    texts (every sample collides, repeats ~n) score huge; random text
    scores ~log n. Used to route repetitive mid-size texts to the chain
    machinery before the doubling loop burns log2(n) rounds on them.
    """
    n = len(arr)
    if n < 64:
        return 0
    rng = np.random.default_rng(seed)
    pos = rng.integers(0, n - 9, min(sample, n))
    win = np.zeros(len(pos), np.uint64)
    for j in range(8):
        win = (win << np.uint64(8)) | arr[pos + j].astype(np.uint64)
    order = np.argsort(win, kind="stable")
    ws, ps = win[order], pos[order]
    coll = np.flatnonzero((ws[1:] == ws[:-1]) & (ps[1:] != ps[:-1]))[:256]
    best = 8 if len(coll) else 0
    for c in coll:
        a, b = int(ps[c]), int(ps[c + 1])
        lim = min(probe_depth, n - max(a, b))
        wa, wb = arr[a:a + lim], arr[b:b + lim]
        neq = np.flatnonzero(wa != wb)
        best = max(best, int(neq[0]) if len(neq) else lim)
    return best


def carried_depth_syms(sigma: int) -> int:
    """Symbols resolved by the carried keys (2 words)."""
    bits = max(1, int(sigma).bit_length())
    return 2 * (30 // bits)


def prepare_big(text, *, target_bucket: int = 1 << 24,
                chunk_elems: int | None = None, sample: int = 1 << 21):
    """Stage the text on device and build the host plan (untimed setup)."""
    arr = as_byte_array(text)
    n = int(arr.shape[0])
    if n < 8:
        raise ValueError("bigsort needs n >= 8; use build_suffix_array")
    if chunk_elems is None:
        # Above ~0.5 GiB the distribute-sort temporaries (~9 int32
        # arrays of m) must shrink so storage + text + temporaries stay
        # under the ~15.6 GiB usable v5e HBM (measured).
        chunk_elems = 1 << 24 if n > 1 << 29 else 1 << 25
    m = bucket_size(min(chunk_elems, n))
    n_chunks = -(-n // m)
    remap, bits, spw = alphabet_remap(arr)
    e0, e1 = sample_edges(arr, remap, spw, bits, target_bucket,
                          sample=sample)
    host = np.zeros(n_chunks * m + HALO, np.uint8)
    host[:n] = arr
    return {
        "plan": BigPlan(n=n, m=m, n_chunks=n_chunks, bits=bits, spw=spw,
                        remap=remap, e0=e0, e1=e1,
                        meta={"est_repeat": estimate_repeat_len(arr)}),
        "text_pad": jnp.asarray(host),
        "remap_d": jnp.asarray(remap),
        "host_text": arr,
    }


def _suffix_less(arr: np.ndarray, a: int, b: int, n: int,
                 step: int = 4096) -> bool:
    """Exact suffix comparison by bounded windows (host)."""
    off = 0
    while True:
        la, lb = n - a - off, n - b - off
        L = min(la, lb, step)
        if L <= 0:
            return la < lb          # equal through the shorter's end
        wa = arr[a + off:a + off + L]
        wb = arr[b + off:b + off + L]
        neq = np.flatnonzero(wa != wb)
        if len(neq):
            t = int(neq[0])
            return bool(wa[t] < wb[t])
        if L < step:
            return la < lb
        off += L


def _resolve_residue_host(arr: np.ndarray, slots: np.ndarray,
                          idxs: np.ndarray, n: int):
    """Exact order for one bucket's tied elements (host comparison).

    Groups are runs of CONSECUTIVE slots; order within each group =
    full suffix order. Returns (ascending slots, idx aligned to them)."""
    order = np.argsort(slots, kind="stable")
    slots, idxs = slots[order], idxs[order]
    out = np.empty_like(idxs)
    i = 0
    while i < len(slots):
        j = i + 1
        while j < len(slots) and slots[j] == slots[j - 1] + 1:
            j += 1
        group = idxs[i:j].tolist()
        group.sort(key=functools.cmp_to_key(
            lambda a, b: -1 if _suffix_less(arr, a, b, n) else 1))
        out[i:j] = group
        i = j
    return slots, out


def execute_big(state, *, max_bucket_elems: int | None = None,
                force_chain_mode: bool | None = None) -> jnp.ndarray:
    """Run distribute + bucket passes; returns the SA (device int32[n]).

    Chain mode (descending tiebreak for globally periodic texts) is
    chosen up front from the host repeat estimate — the bucket sort's
    write-back invalidates the key<->idx pairing, so the direction
    cannot be switched after the fact without redistributing (the
    misprediction fallback below does exactly that, once).
    """
    plan: BigPlan = state["plan"]
    text_pad = state["text_pad"]
    remap_d = state["remap_d"]
    n, m, C = plan.n, plan.m, plan.n_chunks
    e0 = jnp.asarray(plan.e0)
    e1 = jnp.asarray(plan.e1)
    NB = plan.n_buckets

    # --- phase 1: distribute -----------------------------------------
    # Storage slabs are preallocated and DONATED through every chunk
    # call: peak device memory stays at 12 B/char storage + text +
    # one chunk's sort temporaries (~14.8 GB at 2^30 with 2^24 chunks) —
    # a list-append + concatenate assembly would peak ~5 GB higher.
    # The (C+1)-th slab run stays at its init values (idx=n, PAD_KEY)
    # and provides the tail slack for fixed-width S_uni run reads.
    total = (C + 1) * m
    idxS = jnp.full((total,), n, jnp.int32)
    k0S = jnp.full((total,), PAD_KEY, jnp.int32)
    k1S = jnp.full((total,), PAD_KEY, jnp.int32)
    bounds = []
    for c in range(C):
        idxS, k0S, k1S, bnd = _distribute_chunk(
            m, plan.spw, plan.bits, idxS, k0S, k1S, text_pad, remap_d,
            e0, e1, jnp.int32(c * m), jnp.int32(n))
        bounds.append(bnd)
    bounds = np.asarray(jax.device_get(jnp.stack(bounds)))   # ONE sync
    plan.bounds = bounds
    counts = (bounds[:, 1:NB + 1] - bounds[:, :NB]).astype(np.int64)
    plan.counts = counts
    fills = counts.sum(axis=0)
    assert fills.sum() == n, (fills.sum(), n)

    def bucket_args(b):
        starts = jnp.asarray(
            (np.arange(C) * m + bounds[:, b]).astype(np.int32))
        cnt = jnp.asarray(counts[:, b].astype(np.int32))
        return starts, cnt

    # --- phase 2: bucket sorts (write back into idxS) ------------------
    chain_mode = force_chain_mode
    if chain_mode is None:
        chain_mode = plan.meta.get("est_repeat", 0) > 2 * plan.spw
    # One run width for EVERY bucket: each distinct S is a distinct
    # compiled program, and big-shape first-executions cost minutes
    # through the tunnel (TODO.md) - uniform padding (<~15% waste for
    # sampled-balanced buckets) buys one compile per phase instead.
    S_uni = bucket_size(int(counts.max()))
    cap = max_bucket_elems or MAX_PASS_ELEMS
    if C * S_uni > cap:
        raise NotImplementedError(
            f"bucket skew: one bucket pass would sort {C * S_uni} "
            f"padded elements (largest bucket {int(fills.max())}, n={n});"
            " the text's prefix distribution is too degenerate for the "
            "out-of-core path - use the doubling kernel (<=256 MB) or "
            "the sharded multi-chip build")
    live = [(b, S_uni) for b in range(NB) if fills[b]]
    pend = []
    dvals, doks = [], []
    for b, S in live:
        starts, cnt = bucket_args(b)
        idxS, k1S, ties, d, dok = _bucket_pass(
            C, S, chain_mode, k0S, k1S, idxS, starts, cnt,
            jnp.int32(n))
        pend.append((b, S, ties))
        dvals.append(d)
        doks.append(dok)
    tie_counts = np.asarray(jax.device_get(
        jnp.stack([t for _, _, t in pend])))                 # ONE sync

    verified: set[int] = set()
    if chain_mode:
        dvals = np.asarray(jax.device_get(jnp.stack(dvals)))
        doks = np.asarray(jax.device_get(jnp.stack(doks)))
        for (b, S, _), tc, d, dok in zip(pend, tie_counts, dvals, doks):
            if tc == 0:
                continue
            if not int(dok):
                if force_chain_mode is None and tie_counts.sum() <= n // 4:
                    # Few irregular ties: the ascending + host-residue
                    # path handles this; chain mode was a misprediction.
                    del idxS, k0S, k1S      # free before re-running
                    return execute_big(
                        state, max_bucket_elems=max_bucket_elems,
                        force_chain_mode=False)
                raise NotImplementedError(
                    f"bucket {b}: residual ties are not uniform arithmetic "
                    "chains - use the doubling kernel (<=256 MB) or the "
                    "sharded multi-chip build")
            d = int(d)
            if d and d not in verified:
                mm = int(jax.device_get(_period_mismatches(
                    text_pad, jnp.int32(d), jnp.int32(n))))
                if mm:
                    raise NotImplementedError(
                        f"bucket {b}: chain delta {d} is not a global "
                        f"period ({mm} mismatches) - use the doubling "
                        "kernel (<=256 MB) or the sharded build")
                verified.add(d)
    elif tie_counts.sum() > n // 4:
        # Misprediction (heavily tied text ran ascending): redistribute
        # once in chain mode — the write-back already consumed the
        # key<->idx pairing, so phases must restart.
        del idxS, k0S, k1S                  # free before re-running
        return execute_big(state, max_bucket_elems=max_bucket_elems,
                           force_chain_mode=True)

    # --- residue extraction ---------------------------------------------
    patches = []    # (bucket, slots-within-bucket, idx) for host resolve
    if not chain_mode:
        for (b, S, _), tc in zip(pend, tie_counts):
            if tc == 0:
                continue
            starts, cnt = bucket_args(b)
            slots_d, idx_d, total = _extract_ties(
                C, S, k1S, idxS, starts, cnt, jnp.int32(n))
            total = int(jax.device_get(total))
            if total > RESIDUE_SLOTS:
                raise NotImplementedError(
                    f"bucket {b}: {total} window-tied elements exceed the "
                    "host-residue cap - use the doubling kernel "
                    "(<=256 MB) or the sharded multi-chip build")
            slots = np.asarray(jax.device_get(slots_d))[:total]
            idxs = np.asarray(jax.device_get(idx_d))[:total]
            patches.append((b, slots, idxs))

    # --- phase 3: free keys + flags, assemble SA ------------------------
    del k0S, k1S
    # Tail slack covers the last bucket's full padded assembly window
    # (base <= n and each _assemble_bucket writes C * S_uni elements).
    sa_acc = jnp.zeros(n + C * S_uni, jnp.int32)
    base = 0
    bases = {}
    for b, S in live:
        starts, cnt = bucket_args(b)
        sa_acc = _assemble_bucket(C, S, idxS, sa_acc, starts, cnt,
                                  jnp.int32(base))
        bases[b] = base
        base += int(fills[b])
    del idxS

    # --- apply host-resolved residue ------------------------------------
    if patches:
        arr = state["host_text"]
        all_slots, all_vals = [], []
        for b, slots, idxs in patches:
            if not len(slots):
                continue
            s_sorted, fixed = _resolve_residue_host(arr, slots, idxs, n)
            all_slots.append(s_sorted.astype(np.int64) + bases[b])
            all_vals.append(fixed)
        if all_slots:
            slots = np.concatenate(all_slots)
            vals = np.concatenate(all_vals)
            k = bucket_size(len(slots))
            ps = np.full(k, -1, np.int32)
            pv = np.zeros(k, np.int32)
            ps[:len(slots)] = slots
            pv[:len(slots)] = vals
            sa_acc = _apply_patch(sa_acc, jnp.asarray(ps), jnp.asarray(pv))

    plan.meta["n_buckets_run"] = len(live)
    plan.meta["chain_mode"] = chain_mode
    plan.meta["periods"] = sorted(verified)
    plan.meta["n_patched"] = int(sum(len(s) for _, s, _ in patches)) \
        if patches else 0
    return sa_acc[:n]


def build_suffix_array_big(text, **kw) -> jnp.ndarray:
    """One-call build (see prepare_big/execute_big for the staged form)."""
    exec_kw = {k: kw.pop(k) for k in ("max_bucket_elems",) if k in kw}
    return execute_big(prepare_big(text, **kw), **exec_kw)
