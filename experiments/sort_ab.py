"""A/B: operand-count vs key-width tradeoffs for the bigsort hot sorts.

The 1 GiB headline (core/bigsort.py) spends ~9.5 s of its ~14 s in two
lax.sort calls per 2^24 elements: the scatter grouping sort (1 key k0,
payloads k1+idx — 3 int32 operands) and the bucket sort (3 keys k0,k1,tb —
3 int32 operands). Hypothesis: packing (k0,k1) into one int64 drops the
operand count to 2 and wins if lax.sort cost tracks operand count more
than key width. Run standalone on the chip BEFORE wiring anything
(tunnel compiles cost minutes per program; see TODO.md).

Usage:  python experiments/sort_ab.py [log2_n]
"""
from __future__ import annotations

import pathlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_enable_x64", True)   # for the int64 variants only

LOGN = int(sys.argv[1]) if len(sys.argv) > 1 else 24
N = 1 << LOGN


def bench(name, fn, args, reps=5):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0][-1])   # compile+warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0][-1])
        best = min(best, time.perf_counter() - t0)
    ns = best / N * 1e9
    print(f"{name:34s} {best*1e3:8.2f} ms   {ns:6.3f} ns/elem", flush=True)
    return best


def main():
    rng = np.random.default_rng(0)
    k0 = jnp.asarray(rng.integers(0, 1 << 30, N).astype(np.int32))
    k1 = jnp.asarray(rng.integers(0, 1 << 30, N).astype(np.int32))
    idx = jnp.asarray(np.arange(N, dtype=np.int32))
    kk = (k0.astype(jnp.int64) << 31) | k1.astype(jnp.int64)
    jax.device_get(kk[-1])
    print(f"n = 2^{LOGN} on {jax.devices()[0].platform}", flush=True)

    s = jax.jit(lambda *a: jax.lax.sort(a, num_keys=1))
    s2 = jax.jit(lambda *a: jax.lax.sort(a, num_keys=2))
    s3 = jax.jit(lambda *a: jax.lax.sort(a, num_keys=3))

    bench("scatter: 1key 3op int32 (cur)", s, (k0, k1, idx))
    bench("scatter: 1key 2op i64+i32", s, (kk, idx))
    bench("bucket: 3key 3op int32 (cur)", s3, (k0, k1, idx))
    bench("bucket: 2key 2op i64+i32", s2, (kk, idx))
    bench("lower bd: 1key 2op int32", s, (k0, idx))
    bench("1op int32 sort", s, (k0,))
    bench("1op int64 sort", s, (kk,))


if __name__ == "__main__":
    main()
