"""In-situ pass-B (scatter) time attribution at the 1 GiB config.

experiments/dus_overhead.py showed the standalone per-op numbers in
TODO.md are fence-inflated (~26 ms dispatch RTT per fenced call; the
W-window writes execute in ~1-3 ms, not 40). This profiles the REAL
execute_big pass sequence: per-call host ENQUEUE time (no fence) vs
total fenced phase time, separating host-side call overhead from
device execution.

Run on the real chip (single-tenant): python experiments/scatter_profile.py [log2_n=30]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from hpc_suffix_array_tpu.core.bigsort import (
        _bucket_sort, _bucket_write_lcp, _count_chunks, _scatter_chunk,
        chunk_geometry, execute_big, prepare_big, replan_edges)
    from hpc_suffix_array_tpu.core.suffix_array import bucket_size
    from hpc_suffix_array_tpu.utils.twin import twin_corpus

    log2_n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    n = 1 << log2_n
    _, _, pad_len = chunk_geometry(n)
    text, text_dev = twin_corpus(n, pad_len)
    state = prepare_big(text, text_dev=text_dev)
    replan_edges(state, text)

    # Warmup: compile every program in the pass sequence once.
    sa = execute_big(dict(state))
    jax.device_get(sa[-1])
    del sa

    plan = state["plan"]
    text_pad, vals_d, ranges = (state["text_pad"], state["vals_d"],
                                state.get("ranges"))
    n_, m, C = plan.n, plan.m, plan.n_chunks
    e0, e1 = jnp.asarray(plan.e0), jnp.asarray(plan.e1)
    NB = plan.n_buckets

    # ---- pass A (count) ------------------------------------------------
    t0 = time.perf_counter()
    cnt_ge = np.asarray(jax.device_get(_count_chunks(
        C, m, plan.spw, plan.bits, text_pad, vals_d, e0, e1,
        jnp.int32(n_), ranges))).astype(np.int64)
    t_count = time.perf_counter() - t0
    real = np.minimum(m, np.maximum(0, n_ - np.arange(C) * m))
    full = np.concatenate(
        [real[:, None], cnt_ge, np.zeros((C, 1), np.int64)], axis=1)
    counts = full[:, :-1] - full[:, 1:]
    fills = counts.sum(axis=0)

    W = int(bucket_size(int(counts.max())))
    live = [b for b in range(NB) if fills[b]]
    S_of = {b: bucket_size(int(fills[b])) for b in live}
    slack = max((S_of[b] - int(fills[b]) for b in live), default=0)
    gaps = [max(W, slack)] + [W] * (NB - 1)
    base = np.zeros(NB + 1, np.int64)
    out_base = np.zeros(NB, np.int64)
    acc = out = 0
    for b in range(NB):
        base[b], out_base[b] = acc, out
        acc += int(fills[b]) + gaps[b]
        out += int(fills[b])
    base[NB] = acc
    slab_len = max(int(acc),
                   max((int(base[b]) + S_of[b] for b in live), default=0))
    dest = base[None, :NB] + np.concatenate(
        [np.zeros((1, NB), np.int64), counts.cumsum(axis=0)[:-1]])
    bnd = np.concatenate(
        [np.zeros((C, 1), np.int64), counts.cumsum(axis=1)[:, :-1]], axis=1)
    keys = 1 if not plan.e1.any() else 2

    # ---- pass B (scatter): per-call enqueue stamps ---------------------
    t0 = time.perf_counter()
    idxB = jnp.zeros((slab_len,), jnp.int32)
    k0B = jnp.zeros((slab_len,), jnp.int32)
    k1B = jnp.zeros((slab_len,), jnp.int32)
    t_alloc = time.perf_counter() - t0

    enq = []
    t_phase = time.perf_counter()
    for c in range(C):
        t0 = time.perf_counter()
        k0B, k1B, idxB = _scatter_chunk(
            m, plan.spw, plan.bits, W, keys, k0B, k1B, idxB, text_pad,
            vals_d, jnp.asarray(dest[c].astype(np.int32)),
            jnp.asarray(bnd[c].astype(np.int32)),
            jnp.int32(c * m), jnp.int32(n_), ranges)
        enq.append(time.perf_counter() - t0)
    t_enq_total = time.perf_counter() - t_phase
    _ = jax.device_get(idxB[0])
    t_scatter = time.perf_counter() - t_phase

    enq = np.asarray(enq)
    print(f"n=2^{log2_n} C={C} NB={NB} W={W} slab_len={slab_len}")
    print(f"count pass (fenced):        {t_count:8.3f} s")
    print(f"slab alloc (host):          {t_alloc:8.3f} s")
    print(f"scatter enqueue total:      {t_enq_total:8.3f} s "
          f"({1e3 * t_enq_total / C:.1f} ms/chunk)")
    print(f"  enqueue per call: min {enq.min() * 1e3:.1f} "
          f"median {np.median(enq) * 1e3:.1f} max {enq.max() * 1e3:.1f} ms")
    print(f"scatter total (fenced):     {t_scatter:8.3f} s "
          f"({1e3 * t_scatter / C:.1f} ms/chunk)")

    # ---- pass C (bucket sorts): same split -----------------------------
    enq_s, enq_w = [], []
    prev_k0 = prev_k1 = jnp.int32(-1)
    pend = []
    t_phase = time.perf_counter()
    for b in live:
        t0 = time.perf_counter()
        s_idx, tie32, ties, d, dok, lcp32, prev_k0, prev_k1 = _bucket_sort(
            S_of[b], False, True, plan.spw, plan.bits,
            k0B, k1B, idxB, jnp.int32(base[b]),
            jnp.int32(fills[b]), jnp.int32(n_), prev_k0, prev_k1)
        enq_s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        idxB, k1B, k0B = _bucket_write_lcp(
            S_of[b], idxB, k1B, k0B, s_idx, tie32, lcp32,
            jnp.int32(out_base[b]))
        enq_w.append(time.perf_counter() - t0)
        pend.append(ties)
    _ = np.asarray(jax.device_get(jnp.stack(pend)))
    t_bucket = time.perf_counter() - t_phase
    enq_s, enq_w = np.asarray(enq_s), np.asarray(enq_w)
    print(f"bucket enqueue sort:        {enq_s.sum():8.3f} s "
          f"(median {np.median(enq_s) * 1e3:.1f} ms)")
    print(f"bucket enqueue write:       {enq_w.sum():8.3f} s "
          f"(median {np.median(enq_w) * 1e3:.1f} ms)")
    print(f"bucket pass total (fenced): {t_bucket:8.3f} s "
          f"({1e3 * t_bucket / max(len(live), 1):.1f} ms/bucket)")


if __name__ == "__main__":
    main()
