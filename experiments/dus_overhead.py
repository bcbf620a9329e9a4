"""Where do the scatter-pass W-window writes spend their 40 ms/chunk?

The bigsort scatter (core/bigsort.py:_scatter_chunk) issues, per chunk,
NB=64 (dynamic_slice W + dynamic_update_slice W) pairs per slab x 3
slabs = 384 ops moving ~0.8 GB of HBM traffic — ~1 ms at bandwidth, yet
the recorded phase split attributes ~40 ms/chunk to the writes.

Measured here (v5e, 2026-08-18):
  * sep3 NB=64 W=2^18 L=2^30:  45.6 ms   — matches the in-situ 40 ms
  * aligned dests (512-elem):  45.8 ms   — alignment is NOT the cause
  * a (3, L) stacked slab OOMs at compile: TPU 2D tiled layout pads the
    3-row dim (12 GiB -> 16 GB "arguments") — 2D slabs are a DEAD END;
  * the scaling matrix below separates per-op overhead from
    slab-size-proportional cost (a hidden whole-slab copy would scale
    with L; op overhead scales with NB).

Run on the real chip (single-tenant — never concurrent with bench.py):
    python experiments/dus_overhead.py
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

    m = 1 << 24
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, 1 << 30, m + (1 << 20),
                                   dtype=np.int32))

    def make_sep3(NB, W):
        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def sep3(a, b, c, src, dest, bnd):
            for i in range(NB):
                a = lax.dynamic_update_slice(
                    a, lax.dynamic_slice(src, (bnd[i],), (W,)), (dest[i],))
                b = lax.dynamic_update_slice(
                    b, lax.dynamic_slice(src, (bnd[i],), (W,)), (dest[i],))
                c = lax.dynamic_update_slice(
                    c, lax.dynamic_slice(src, (bnd[i],), (W,)), (dest[i],))
            return a, b, c
        return sep3

    @functools.partial(jax.jit, donate_argnums=(0,))
    def mono(a, src, dest0):
        return lax.dynamic_update_slice(
            a, lax.dynamic_slice(src, (0,), (m,)), (dest0,))

    def bench(tag, fn, mk_args, reps=3):
        out = fn(*mk_args())        # warmup/compile (donates the slabs)
        jax.device_get(jax.tree_util.tree_leaves(out)[0][..., -1])
        del out                     # free before the next slab allocation
        best = float("inf")
        for _ in range(reps):
            args2 = mk_args()
            t0 = time.perf_counter()
            out = fn(*args2)
            jax.device_get(jax.tree_util.tree_leaves(out)[0][..., -1])
            best = min(best, time.perf_counter() - t0)
            del out, args2
        print(f"{tag:>28}: {best * 1e3:8.2f} ms", flush=True)
        return best

    for log2_L in (28, 30):
        L = 1 << log2_L
        for NB in (16, 64):
            W = m // NB             # total window data constant = m
            dest_np = (np.arange(NB, dtype=np.int64) * ((L - 2 * W) // NB)
                       + rng.integers(0, 1024, NB)).astype(np.int32)
            bnd_np = (np.arange(NB, dtype=np.int64) * W).astype(np.int32)
            dest_d, bnd_d = jnp.asarray(dest_np), jnp.asarray(bnd_np)
            fn = make_sep3(NB, W)
            z1 = lambda: jnp.zeros((L,), jnp.int32)  # noqa: E731
            bench(f"sep3 L=2^{log2_L} NB={NB}", fn,
                  lambda: (z1(), z1(), z1(), src, dest_d, bnd_d))
        bench(f"mono L=2^{log2_L}", mono,
              lambda: (jnp.zeros((L,), jnp.int32), src, jnp.int32(1024)))


if __name__ == "__main__":
    main()
