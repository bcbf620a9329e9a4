"""Is there a hidden per-call cost when LOOPING donated-slab programs?

dus_overhead.py: one fenced sep3 call (3x4GiB donated slabs, 192
window ops) = 46 ms, of which ~28 ms is the fence RTT + slab zero-fill
=> ~15 ms execution. If a 64-iteration unfenced loop of the same
program costs ~64x15 ms, per-call overhead is nil and the scatter's
135 ms/chunk is genuine compute; if it costs ~64x45 ms, the tunnel
charges ~30 ms per program EXECUTION (handle round-trips etc.) and
batching chunks per program is the headline lever.

Run on the real chip: python experiments/call_loop_overhead.py
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

    L, NB, W, m = 1 << 30, 64, 1 << 18, 1 << 24
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, 1 << 30, m + (1 << 20),
                                   dtype=np.int32))
    dest_np = (np.arange(NB, dtype=np.int64) * ((L - 2 * W) // NB)
               + rng.integers(0, 1024, NB)).astype(np.int32)
    bnd_np = (np.arange(NB, dtype=np.int64) * W).astype(np.int32)
    dest_d, bnd_d = jnp.asarray(dest_np), jnp.asarray(bnd_np)

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

    a = jnp.zeros((L,), jnp.int32)
    b = jnp.zeros((L,), jnp.int32)
    c = jnp.zeros((L,), jnp.int32)
    a, b, c = sep3(a, b, c, src, dest_d, bnd_d)   # warmup (first-exec)
    jax.device_get(a[-1])

    for trial in range(2):
        t0 = time.perf_counter()
        for _ in range(64):
            a, b, c = sep3(a, b, c, src, dest_d, bnd_d)
        jax.device_get(a[-1])
        dt = time.perf_counter() - t0
        print(f"trial {trial}: 64 looped sep3 calls: {dt:7.3f} s "
              f"({dt / 64 * 1e3:.1f} ms/call)", flush=True)


if __name__ == "__main__":
    main()
