"""Where do the scatter-pass W-window writes spend their 40 ms/chunk?

The bigsort scatter (core/bigsort.py:_scatter_chunk) issues, per chunk,
NB=64 (dynamic_slice W + dynamic_update_slice W) pairs per slab x 3
slabs = 384 ops moving ~0.8 GB of HBM traffic — ~1 ms at bandwidth, yet
the recorded phase split attributes ~40 ms/chunk to the writes. This
micro-benchmark isolates the per-op cost of chained dynamic windows on
a multi-GB donated buffer and A/Bs the consolidation candidates:

  sep3    : 3 slabs x NB windows (the current structure)
  stack3  : ONE (3, L) slab, NB windows of (3, W)   [3x fewer DUS]
  mono    : one slab, ONE contiguous NB*W DUS        [lower bound]
  aligned : sep3 with 512-element-aligned dests      [alignment probe]

Run on the real chip (single-tenant — never concurrent with bench.py):
    python experiments/dus_overhead.py [log2_L=30]
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

    log2_L = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    L = 1 << log2_L          # slab elements (int32) — 4 GiB at 2^30
    NB, W = 64, 1 << 18      # the 1 GiB-config window geometry
    m = 1 << 24

    rng = np.random.default_rng(0)
    # Unaligned, strictly increasing dests with bucket-ish spacing.
    dest_np = (np.arange(NB, dtype=np.int64) * ((L - W) // NB)
               + rng.integers(0, 1024, NB)).astype(np.int32)
    bnd_np = (np.arange(NB, dtype=np.int64) * (m // NB)).astype(np.int32)
    dest_al = (dest_np // 512) * 512

    src = jnp.asarray(rng.integers(0, 1 << 30, m + W, dtype=np.int32))

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def sep3(a, b, c, src, dest, bnd):
        # Faithful to _scatter_chunk: 3 independent slice+DUS per bucket
        # (the real sources s_k0/s_k1/s_idx differ; same src suffices
        # for cost — what matters is the op count and window shapes).
        for i in range(NB):
            a = lax.dynamic_update_slice(
                a, lax.dynamic_slice(src, (bnd[i],), (W,)), (dest[i],))
            b = lax.dynamic_update_slice(
                b, lax.dynamic_slice(src, (bnd[i],), (W,)), (dest[i],))
            c = lax.dynamic_update_slice(
                c, lax.dynamic_slice(src, (bnd[i],), (W,)), (dest[i],))
        return a, b, c

    @functools.partial(jax.jit, donate_argnums=(0,))
    def stack3(s, src, dest, bnd):
        # Candidate layout: one (3, L) slab, one (3, W) DUS per bucket.
        # Three real slices + a stack, so the update materializes the
        # same way the production version would.
        for i in range(NB):
            win = jnp.stack(
                [lax.dynamic_slice(src, (bnd[i],), (W,)) for _ in range(3)])
            s = lax.dynamic_update_slice(s, win, (0, dest[i]))
        return s

    @functools.partial(jax.jit, donate_argnums=(0,))
    def mono(a, src, dest0):
        return lax.dynamic_update_slice(
            a, lax.dynamic_slice(src, (0,), (m,)), (dest0,))

    def bench(tag, fn, mk_args, reps=5):
        args = mk_args()
        args = fn(*args)            # warmup/compile (donates the slabs)
        jax.device_get(jax.tree_util.tree_leaves(args)[0][..., -1])
        best = float("inf")
        for _ in range(reps):
            args2 = mk_args()
            t0 = time.perf_counter()
            out = fn(*args2)
            jax.device_get(jax.tree_util.tree_leaves(out)[0][..., -1])
            best = min(best, time.perf_counter() - t0)
        print(f"{tag:>10}: {best * 1e3:8.2f} ms")
        return best

    dest_d = jnp.asarray(dest_np)
    dest_ald = jnp.asarray(dest_al)
    bnd_d = jnp.asarray(bnd_np)

    z1 = lambda: jnp.zeros((L,), jnp.int32)  # noqa: E731
    print(f"L=2^{log2_L} ({4 * L / 2**30:.1f} GiB/slab), NB={NB}, "
          f"W=2^{W.bit_length() - 1}")
    bench("sep3", sep3, lambda: (z1(), z1(), z1(), src, dest_d, bnd_d))
    bench("aligned", sep3, lambda: (z1(), z1(), z1(), src, dest_ald, bnd_d))
    bench("stack3", stack3,
          lambda: (jnp.zeros((3, L), jnp.int32), src, dest_d, bnd_d))
    bench("mono", mono, lambda: (z1(), src, jnp.int32(int(dest_np[0]))))


if __name__ == "__main__":
    main()
