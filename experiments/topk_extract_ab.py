"""Can lax.top_k replace _extract_ties' full compaction sort?

Extraction compacts <=RESIDUE_SLOTS tied members out of an S-element
bucket with a 2-operand keyed sort (~30 ms at S=2^23). top_k(k=2^15)
needs only the k smallest keys; if the TPU lowering is meaningfully
cheaper than the full sort, heavy-residue corpora (DNA) win ~0.7 s at
2^28. Negate keys for min-k; member indices come back as positions, and
a tiny gather recovers the payload.

Run on the real chip: python experiments/topk_extract_ab.py
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

    S, K = 1 << 23, 1 << 15
    rng = np.random.default_rng(0)
    # ~2k sparse members (the DNA-at-2^28 per-bucket tie density).
    member = np.zeros(S, bool)
    member[rng.choice(S, 2048, replace=False)] = True
    big = np.int32(1) << 30
    keyed = np.where(member, np.arange(S, dtype=np.int32), big)
    ix = rng.integers(0, S, S, dtype=np.int32)
    keyed_d, ix_d = jnp.asarray(keyed), jnp.asarray(ix)

    @jax.jit
    def by_sort(keyed, ix):
        o_slot, o_idx = lax.sort((keyed, ix), num_keys=1)
        return o_slot[:K], o_idx[:K]

    @jax.jit
    def by_topk(keyed, ix):
        negv, pos = lax.top_k(-keyed, K)
        return -negv, ix[pos]

    def bench(tag, fn):
        out = fn(keyed_d, ix_d)
        jax.device_get(out[0][-1])
        for trial in range(2):
            t0 = time.perf_counter()
            outs = [fn(keyed_d, ix_d) for _ in range(16)]
            jax.device_get(outs[-1][0][-1])
            dt = (time.perf_counter() - t0) / 16
            if trial:
                print(f"{tag:>8}: {dt * 1e3:7.1f} ms", flush=True)
        return out

    s1 = bench("sort", by_sort)
    s2 = bench("topk", by_topk)
    a = np.asarray(jax.device_get(s1))
    b = np.asarray(jax.device_get(s2))
    print("agree:", np.array_equal(a[0], b[0]) and np.array_equal(
        a[1][a[0] < big], b[1][b[0] < big]))


if __name__ == "__main__":
    main()
