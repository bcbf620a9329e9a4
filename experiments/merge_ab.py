"""A/B: bitonic MERGE network vs full lax.sort for the bucket pass.

The 1 GiB MSD build sorts every element twice: the scatter's chunk
grouping sort and the bucket pass's full (k0,k1,tb) sort. If the scatter
sorts chunks FULLY (3-key, measured +~5% over 1-key), each bucket is a
concatenation of C presorted runs — and an oblivious bitonic merge tree
needs only sum_{l=17}^{23} l = 140 compare-exchange stages to combine
them vs ~276 inside a full 2^23 bitonic sort. Hypothesis: hand-written
merge stages (reshape + lexicographic compare + select, no gathers) get
close enough to lax.sort's internal per-stage efficiency that the merge
wins >=1.3x; measure BEFORE wiring anything (tunnel compiles cost
minutes per program).

Also measures: lax.sort (3 int32 ops) per-element cost across bucket
sizes 2^21..2^24 and num_keys 2 vs 3 (geometry + comparator levers for
the same decision), and the in-scatter searchsorted for the count-free
design.

Usage:  python experiments/merge_ab.py
"""
from __future__ import annotations

import functools
import pathlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

REPO = pathlib.Path(__file__).resolve().parents[1]
jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

PAD = np.int32(1 << 30)
REPS = 8       # unfenced loop, one end fence (dispatch RTT amortized)


def bench(name, fn, args, n_elems, reps=REPS):
    t0 = time.perf_counter()
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(leaf.reshape(-1)[-1])       # compile + warm
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].reshape(-1)[-1])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:42s} {dt*1e3:8.2f} ms  {dt/n_elems*1e9:6.3f} ns/elem"
          f"   (first {compile_s:.1f}s)", flush=True)
    return dt


# --- merge network ----------------------------------------------------------

def _cmpex(k0, k1, tb, s):
    """One compare-exchange stage at stride s on bitonic rows (R, L)."""
    R, L = k0.shape
    def split(x):
        x = x.reshape(R, L // (2 * s), 2, s)
        return x[:, :, 0, :], x[:, :, 1, :]
    a0, b0 = split(k0)
    a1, b1 = split(k1)
    at, bt = split(tb)
    gt = (a0 > b0) | ((a0 == b0) & ((a1 > b1) | ((a1 == b1) & (at > bt))))
    def join(lo, hi):
        return jnp.stack([lo, hi], axis=2).reshape(R, L)
    k0 = join(jnp.where(gt, b0, a0), jnp.where(gt, a0, b0))
    k1 = join(jnp.where(gt, b1, a1), jnp.where(gt, a1, b1))
    tb = join(jnp.where(gt, bt, at), jnp.where(gt, at, bt))
    return k0, k1, tb


def _merge_level(k0, k1, tb):
    """Merge adjacent row pairs: (R, L) sorted rows -> (R/2, 2L)."""
    R, L = k0.shape
    def fold(x):
        x = x.reshape(R // 2, 2, L)
        return jnp.concatenate([x[:, 0, :], x[:, 1, ::-1]], axis=1)
    k0, k1, tb = fold(k0), fold(k1), fold(tb)
    s = L
    while s >= 1:
        k0, k1, tb = _cmpex(k0, k1, tb, s)
        s //= 2
    return k0, k1, tb


@functools.partial(jax.jit, static_argnums=())
def merge_tree(k0, k1, tb):
    """(C, W) sorted rows -> fully sorted (1, C*W) by (k0, k1, tb)."""
    while k0.shape[0] > 1:
        k0, k1, tb = _merge_level(k0, k1, tb)
    return k0, k1, tb


def main():
    rng = np.random.default_rng(0)
    print(f"platform: {jax.devices()[0].platform}", flush=True)

    # --- lax.sort size/keys sweep (bucket-pass baseline + geometry) ----
    for logn in (21, 22, 23, 24):
        n = 1 << logn
        k0 = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))
        k1 = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))
        idx = jnp.asarray(np.arange(n, dtype=np.int32))
        s3 = jax.jit(lambda *a: lax.sort(a, num_keys=3))
        bench(f"lax.sort 3op 3key 2^{logn}", s3, (k0, k1, idx), n)
        if logn == 23:
            s2 = jax.jit(lambda *a: lax.sort(a, num_keys=2,
                                             is_stable=False))
            bench(f"lax.sort 3op 2key unstable 2^{logn}", s2,
                  (k0, k1, idx), n)
        del k0, k1, idx

    # --- searchsorted of E edges in a sorted 2^23 chunk (count-free) ---
    n = 1 << 23
    sk = jnp.asarray(np.sort(rng.integers(0, 1 << 30, n).astype(np.int32)))
    edges = jnp.asarray(
        np.sort(rng.integers(0, 1 << 30, 127).astype(np.int32)))
    ss = jax.jit(lambda a, e: jnp.searchsorted(a, e))
    bench("searchsorted 127 edges in 2^23", ss, (sk, edges), n)

    # --- merge tree vs full sort at bucket scale ------------------------
    for C, logw in ((128, 16), (64, 16), (32, 17)):
        W = 1 << logw
        S = C * W
        k0 = rng.integers(0, 1 << 30, (C, W)).astype(np.int32)
        k1 = rng.integers(0, 1 << 30, (C, W)).astype(np.int32)
        tb = rng.integers(0, 1 << 30, (C, W)).astype(np.int32)
        # row-sort by (k0, k1, tb) on host
        for c in range(C):
            o = np.lexsort((tb[c], k1[c], k0[c]))
            k0[c], k1[c], tb[c] = k0[c][o], k1[c][o], tb[c][o]
        dk0, dk1, dtb = map(jnp.asarray, (k0, k1, tb))
        dt = bench(f"merge tree {C}x2^{logw} -> 2^{int(np.log2(S))}",
                   merge_tree, (dk0, dk1, dtb), S)
        # validate once
        m0, m1, mt = (np.asarray(x).reshape(-1)
                      for x in merge_tree(dk0, dk1, dtb))
        o = np.lexsort((tb.reshape(-1), k1.reshape(-1), k0.reshape(-1)))
        ok = (np.array_equal(m0, k0.reshape(-1)[o])
              and np.array_equal(m1, k1.reshape(-1)[o])
              and np.array_equal(mt, tb.reshape(-1)[o]))
        print(f"    exact: {ok}", flush=True)
        del dk0, dk1, dtb

    # --- scatter-side cost of full 3-key chunk sort vs 1-key -----------
    n = 1 << 23
    k0 = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))
    k1 = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))
    idx = jnp.asarray(np.arange(n, dtype=np.int32))
    s1 = jax.jit(lambda *a: lax.sort(a, num_keys=1, is_stable=False))
    s3s = jax.jit(lambda *a: lax.sort(a, num_keys=3, is_stable=False))
    bench("scatter sort 1key 3op 2^23 (cur)", s1, (k0, k1, idx), n)
    bench("scatter sort 3key 3op 2^23 (new)", s3s, (k0, k1, idx), n)


if __name__ == "__main__":
    main()
