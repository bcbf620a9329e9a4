"""MSD-vs-doubling crossover for SMALL-alphabet (DNA) texts.

The doubling kernel needs ~2 rounds for DNA (h0 packs 10 symbols, the
needed depth is ~2 log_4 n), so the single-pass MSD path may win below
the general 16 MiB threshold. Measures both at 2^23 and 2^24.

Run on the real chip: python experiments/routing_dna.py [log2_sizes ...]
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

    from hpc_suffix_array_tpu.core.bigsort import execute_big, prepare_big
    from hpc_suffix_array_tpu.core.suffix_array import (
        alphabet_remap, bucket_size, suffix_array_from_bytes_kernel)

    rng = np.random.default_rng(0xD0)
    for lg in ([int(a) for a in sys.argv[1:]] or [23, 24]):
        n = 1 << lg
        arr = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, n)]

        state = prepare_big(arr)
        sa = execute_big(dict(state))
        jax.device_get(sa[-1])
        del sa
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            sa = execute_big(dict(state))
            jax.device_get(sa[-1])
            best = min(best, time.perf_counter() - t0)
            del sa
        print(json.dumps({"path": "msd", "log2_n": lg, "corpus": "dna",
                          "mb_s": round(n / best / 1e6, 1)}), flush=True)
        del state

        host = np.zeros(bucket_size(n), np.uint8)
        host[:n] = arr
        remap, bits, h0 = alphabet_remap(arr)
        args = (jnp.asarray(host), jnp.asarray(remap), bits, h0,
                jnp.int32(n))
        sa, _r, rounds = suffix_array_from_bytes_kernel(*args)
        jax.device_get(sa[-1])
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            sa, _r, rounds = suffix_array_from_bytes_kernel(*args)
            jax.device_get(sa[-1])
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"path": "doubling", "log2_n": lg, "corpus": "dna",
                          "mb_s": round(n / best / 1e6, 1),
                          "rounds": int(jax.device_get(rounds))}),
              flush=True)


if __name__ == "__main__":
    main()
