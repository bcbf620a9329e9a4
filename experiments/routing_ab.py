"""MSD-vs-doubling crossover for the SA_BIG_THRESHOLD routing default.

After the post-sort barrier + finer geometry (124.5 MB/s at 2^30), the
MSD path may beat the doubling kernel well below the 256 MB routing
threshold. Measures both paths at the same sizes on-chip.

Run on the real chip: python experiments/routing_ab.py [log2_sizes ...]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from hpc_suffix_array_tpu.core.bigsort import (
        chunk_geometry, execute_big, prepare_big, replan_edges)
    from hpc_suffix_array_tpu.core.suffix_array import (
        alphabet_remap, bucket_size, suffix_array_from_bytes_kernel)
    from hpc_suffix_array_tpu.utils.twin import twin_corpus

    sizes = [int(a) for a in sys.argv[1:]] or [25, 26, 27]
    for lg in sizes:
        n = 1 << lg
        # --- MSD path ---------------------------------------------------
        _, _, pad_len = chunk_geometry(n)
        text, text_dev = twin_corpus(n, pad_len)
        state = prepare_big(text, text_dev=text_dev)
        replan_edges(state, text)
        sa = execute_big(dict(state))
        jax.device_get(sa[-1])
        del sa
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            replan_edges(state, text)
            sa = execute_big(dict(state))
            jax.device_get(sa[-1])
            best = min(best, time.perf_counter() - t0)
            del sa
        print(json.dumps({"path": "msd", "log2_n": lg,
                          "mb_s": round(n / best / 1e6, 1)}), flush=True)
        del state

        # --- doubling path ----------------------------------------------
        n_pad = bucket_size(n)
        text2, text_pad = twin_corpus(n, n_pad)
        remap, bits, h0 = alphabet_remap(text2)
        args = (text_pad, jnp.asarray(remap), bits, h0, jnp.int32(n))
        sa, _r, rounds = suffix_array_from_bytes_kernel(*args)
        jax.device_get(sa[-1])
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            sa, _r, rounds = suffix_array_from_bytes_kernel(*args)
            jax.device_get(sa[-1])
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"path": "doubling", "log2_n": lg,
                          "mb_s": round(n / best / 1e6, 1),
                          "rounds": int(jax.device_get(rounds))}),
              flush=True)
        del text_pad, args, sa


if __name__ == "__main__":
    main()
