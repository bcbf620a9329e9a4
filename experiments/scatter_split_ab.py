"""Fix candidates for the 63 ms/chunk scheduling pathology in scatter.

The exact fused codes+sort+windows program runs 134.6 ms/chunk, yet its
stages measure 2.6 + 66.8 + ~3 ms in isolation. Suspect: XLA fuses /
remats the window slices with the sort's output copies (the compile
dumps show select_n-laden remat fusions), serializing DMA. Candidates:

  barrier : exact program + lax.optimization_barrier between the sort
            outputs and the window loop (one program, same traffic)
  split   : program 1 = codes+sort -> materialized sorted arrays;
            program 2 = windows only (donated slabs; the sep3 shape
            measured at 3.2 ms/call)

Run on the real chip: python experiments/scatter_split_ab.py [log2_n=30]
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from hpc_suffix_array_tpu.core.bigsort import (
        PAD_KEY, _chunk_codes, _count_chunks, chunk_geometry, prepare_big)
    from hpc_suffix_array_tpu.core.suffix_array import bucket_size
    from hpc_suffix_array_tpu.utils.twin import twin_corpus

    log2_n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    n = 1 << log2_n
    _, _, pad_len = chunk_geometry(n)
    text, text_dev = twin_corpus(n, pad_len)
    state = prepare_big(text, text_dev=text_dev)
    plan = state["plan"]
    text_pad, vals_d, ranges = (state["text_pad"], state["vals_d"],
                                state.get("ranges"))
    n_, m, C = plan.n, plan.m, plan.n_chunks
    e0, e1 = jnp.asarray(plan.e0), jnp.asarray(plan.e1)
    NB = plan.n_buckets
    spw, bits = plan.spw, plan.bits

    cnt_ge = np.asarray(jax.device_get(_count_chunks(
        C, m, spw, bits, text_pad, vals_d, e0, e1, jnp.int32(n_),
        ranges))).astype(np.int64)
    real = np.minimum(m, np.maximum(0, n_ - np.arange(C) * m))
    full = np.concatenate(
        [real[:, None], cnt_ge, np.zeros((C, 1), np.int64)], axis=1)
    counts = full[:, :-1] - full[:, 1:]
    W = int(bucket_size(int(counts.max())))
    fills = counts.sum(axis=0)
    base = np.zeros(NB + 1, np.int64)
    acc = 0
    for b in range(NB):
        base[b] = acc
        acc += int(fills[b]) + W
    slab_len = int(acc)
    dest = base[None, :NB] + np.concatenate(
        [np.zeros((1, NB), np.int64), counts.cumsum(axis=0)[:-1]])
    bnd = np.concatenate(
        [np.zeros((C, 1), np.int64), counts.cumsum(axis=1)[:, :-1]], axis=1)
    keys = 1 if not plan.e1.any() else 2
    print(f"n=2^{log2_n} m={m} C={C} NB={NB} W={W} keys={keys}")

    dest_d = [jnp.asarray(dest[c].astype(np.int32)) for c in range(C)]
    bnd_d = [jnp.asarray(bnd[c].astype(np.int32)) for c in range(C)]
    start_d = [jnp.int32(c * m) for c in range(C)]
    n_d = jnp.int32(n_)

    @functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4),
                       donate_argnums=(5, 6, 7))
    def scatter_barrier(m, spw, bits, W, keys, k0B, k1B, idxB, text_pad,
                        vals, dest, bnd, start, n, ranges=None):
        NBl = dest.shape[0]
        k0, k1 = _chunk_codes(m, spw, bits, text_pad, vals, start, n,
                              ranges=ranges)
        pos = start + lax.iota(jnp.int32, m)
        ok = pos < n
        k0 = jnp.where(ok, k0, PAD_KEY)
        k1 = jnp.where(ok, k1, PAD_KEY)
        padk = jnp.full((W,), PAD_KEY, jnp.int32)
        s_k0, s_k1, s_idx = lax.sort(
            (jnp.concatenate([k0, padk]), jnp.concatenate([k1, padk]),
             jnp.concatenate([pos, padk])),
            num_keys=keys, is_stable=False)
        s_k0, s_k1, s_idx = lax.optimization_barrier((s_k0, s_k1, s_idx))
        for b in range(NBl):
            k0B = lax.dynamic_update_slice(
                k0B, lax.dynamic_slice(s_k0, (bnd[b],), (W,)), (dest[b],))
            k1B = lax.dynamic_update_slice(
                k1B, lax.dynamic_slice(s_k1, (bnd[b],), (W,)), (dest[b],))
            idxB = lax.dynamic_update_slice(
                idxB, lax.dynamic_slice(s_idx, (bnd[b],), (W,)), (dest[b],))
        return k0B, k1B, idxB

    @functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
    def sort_part(m, spw, bits, W, keys, text_pad, vals, start, n,
                  ranges=None):
        k0, k1 = _chunk_codes(m, spw, bits, text_pad, vals, start, n,
                              ranges=ranges)
        pos = start + lax.iota(jnp.int32, m)
        ok = pos < n
        k0 = jnp.where(ok, k0, PAD_KEY)
        k1 = jnp.where(ok, k1, PAD_KEY)
        padk = jnp.full((W,), PAD_KEY, jnp.int32)
        return lax.sort(
            (jnp.concatenate([k0, padk]), jnp.concatenate([k1, padk]),
             jnp.concatenate([pos, padk])),
            num_keys=keys, is_stable=False)

    @functools.partial(jax.jit, static_argnums=(0,),
                       donate_argnums=(1, 2, 3))
    def write_part(W, k0B, k1B, idxB, s_k0, s_k1, s_idx, dest, bnd):
        NBl = dest.shape[0]
        for b in range(NBl):
            k0B = lax.dynamic_update_slice(
                k0B, lax.dynamic_slice(s_k0, (bnd[b],), (W,)), (dest[b],))
            k1B = lax.dynamic_update_slice(
                k1B, lax.dynamic_slice(s_k1, (bnd[b],), (W,)), (dest[b],))
            idxB = lax.dynamic_update_slice(
                idxB, lax.dynamic_slice(s_idx, (bnd[b],), (W,)), (dest[b],))
        return k0B, k1B, idxB

    def trial_loop(tag, body):
        # warmup (first-exec)
        slabs = [jnp.zeros((slab_len,), jnp.int32) for _ in range(3)]
        slabs = body(slabs, 0)
        jax.device_get(slabs[2][0])
        for trial in range(2):
            t0 = time.perf_counter()
            for c in range(C):
                slabs = body(slabs, c)
            jax.device_get(slabs[2][0])
            dt = time.perf_counter() - t0
            if trial:
                print(f"{tag:>8}: {dt:7.3f} s ({dt / C * 1e3:.1f} ms/chunk)",
                      flush=True)
        del slabs

    def barrier_body(slabs, c):
        return list(scatter_barrier(
            m, spw, bits, W, keys, *slabs, text_pad, vals_d,
            dest_d[c], bnd_d[c], start_d[c], n_d, ranges))

    def split_body(slabs, c):
        s_k0, s_k1, s_idx = sort_part(
            m, spw, bits, W, keys, text_pad, vals_d, start_d[c], n_d,
            ranges)
        return list(write_part(
            W, *slabs, s_k0, s_k1, s_idx, dest_d[c], bnd_d[c]))

    trial_loop("barrier", barrier_body)
    trial_loop("split", split_body)


if __name__ == "__main__":
    main()
