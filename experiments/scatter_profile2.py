"""Pass-B/C rerun with ALL per-call operands pre-staged on device.

scatter_profile.py showed enqueue is 0.4 ms/call yet the fenced scatter
runs 136 ms/chunk vs ~65 ms of estimated device compute. Hypothesis:
the per-call host->device operand transfers (dest row, bnd row, start
and n scalars) serialize with compute on the tunnel's stream. Here the
loops pass ONLY pre-staged device arrays — the jit signatures (and so
the compiled programs) are identical, isolating the transfer cost.

Run on the real chip: python experiments/scatter_profile2.py [log2_n=30]
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
    sa = execute_big(dict(state))       # warmup: compile everything
    jax.device_get(sa[-1])
    del sa

    plan = state["plan"]
    text_pad, vals_d, ranges = (state["text_pad"], state["vals_d"],
                                state.get("ranges"))
    n_, m, C = plan.n, plan.m, plan.n_chunks
    e0, e1 = jnp.asarray(plan.e0), jnp.asarray(plan.e1)
    NB = plan.n_buckets

    cnt_ge = np.asarray(jax.device_get(_count_chunks(
        C, m, plan.spw, plan.bits, text_pad, vals_d, e0, e1,
        jnp.int32(n_), ranges))).astype(np.int64)
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

    # ---- PRE-STAGE every per-call operand (outside the timed region) ---
    t0 = time.perf_counter()
    dest_d = [jnp.asarray(dest[c].astype(np.int32)) for c in range(C)]
    bnd_d = [jnp.asarray(bnd[c].astype(np.int32)) for c in range(C)]
    start_d = [jnp.int32(c * m) for c in range(C)]
    n_d = jnp.int32(n_)
    base_d = {b: jnp.int32(base[b]) for b in live}
    fills_d = {b: jnp.int32(fills[b]) for b in live}
    out_d = {b: jnp.int32(out_base[b]) for b in live}
    jax.device_get(dest_d[-1][-1])
    t_stage = time.perf_counter() - t0

    # ---- pass B with staged operands -----------------------------------
    idxB = jnp.zeros((slab_len,), jnp.int32)
    k0B = jnp.zeros((slab_len,), jnp.int32)
    k1B = jnp.zeros((slab_len,), jnp.int32)
    t_phase = time.perf_counter()
    for c in range(C):
        k0B, k1B, idxB = _scatter_chunk(
            m, plan.spw, plan.bits, W, keys, k0B, k1B, idxB, text_pad,
            vals_d, dest_d[c], bnd_d[c], start_d[c], n_d, ranges)
    _ = jax.device_get(idxB[0])
    t_scatter = time.perf_counter() - t_phase

    # ---- pass C with staged operands -----------------------------------
    prev_k0 = prev_k1 = jnp.int32(-1)
    pend = []
    t_phase = time.perf_counter()
    for b in live:
        s_idx, tie32, ties, d, dok, lcp32, prev_k0, prev_k1 = _bucket_sort(
            S_of[b], False, True, plan.spw, plan.bits,
            k0B, k1B, idxB, base_d[b], fills_d[b], n_d, prev_k0, prev_k1)
        idxB, k1B, k0B = _bucket_write_lcp(
            S_of[b], idxB, k1B, k0B, s_idx, tie32, lcp32, out_d[b])
        pend.append(ties)
    _ = np.asarray(jax.device_get(jnp.stack(pend)))
    t_bucket = time.perf_counter() - t_phase

    print(f"n=2^{log2_n} C={C} NB={NB} (operands pre-staged: "
          f"{t_stage:.3f} s untimed)")
    print(f"scatter total (fenced):     {t_scatter:8.3f} s "
          f"({1e3 * t_scatter / C:.1f} ms/chunk)")
    print(f"bucket pass total (fenced): {t_bucket:8.3f} s "
          f"({1e3 * t_bucket / max(len(live), 1):.1f} ms/bucket)")


if __name__ == "__main__":
    main()
