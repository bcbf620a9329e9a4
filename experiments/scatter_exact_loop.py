"""Loop the EXACT production _scatter_chunk steady-state.

scatter_stage_ab.py: codes 2.6 + sort 66.8 + windows ~3 = ~72 ms/chunk,
yet the in-situ pass B runs 135 ms/chunk. Same program, same shapes,
isolated loop — if 135 reproduces here, the slowdown is in the compiled
program's structure (e.g. XLA copy-start pairs around the window
slices); if ~72, it is an interaction inside execute_big.

Run on the real chip: python experiments/scatter_exact_loop.py [log2_n=30]
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
        _count_chunks, _scatter_chunk, chunk_geometry, prepare_big)
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

    cnt_ge = np.asarray(jax.device_get(_count_chunks(
        C, m, plan.spw, plan.bits, text_pad, vals_d, e0, e1,
        jnp.int32(n_), ranges))).astype(np.int64)
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
    print(f"n=2^{log2_n} m={m} C={C} NB={NB} W={W} keys={keys} "
          f"spw={plan.spw} bits={plan.bits}")

    dest_d = [jnp.asarray(dest[c].astype(np.int32)) for c in range(C)]
    bnd_d = [jnp.asarray(bnd[c].astype(np.int32)) for c in range(C)]
    start_d = [jnp.int32(c * m) for c in range(C)]
    n_d = jnp.int32(n_)

    idxB = jnp.zeros((slab_len,), jnp.int32)
    k0B = jnp.zeros((slab_len,), jnp.int32)
    k1B = jnp.zeros((slab_len,), jnp.int32)
    # warmup (first-exec in this process)
    k0B, k1B, idxB = _scatter_chunk(
        m, plan.spw, plan.bits, W, keys, k0B, k1B, idxB, text_pad,
        vals_d, dest_d[0], bnd_d[0], start_d[0], n_d, ranges)
    jax.device_get(idxB[0])

    for trial in range(2):
        t0 = time.perf_counter()
        for c in range(C):
            k0B, k1B, idxB = _scatter_chunk(
                m, plan.spw, plan.bits, W, keys, k0B, k1B, idxB, text_pad,
                vals_d, dest_d[c], bnd_d[c], start_d[c], n_d, ranges)
        jax.device_get(idxB[0])
        dt = time.perf_counter() - t0
        print(f"trial {trial}: {C} exact _scatter_chunk calls: {dt:7.3f} s "
              f"({dt / C * 1e3:.1f} ms/chunk)", flush=True)


if __name__ == "__main__":
    main()
