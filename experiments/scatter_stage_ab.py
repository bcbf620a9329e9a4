"""Decompose _scatter_chunk's 135 ms/chunk into codes / sort / windows.

call_loop_overhead.py proved the W-window writes are ~3 ms and looped
calls carry no hidden per-call cost, so ~132 ms/chunk sits in the codes
(remap+pack) and the 3-operand sort — far above the fence-corrected
micro estimates (~62-67 ms for the sort). This measures each stage
in situ with the real text, geometry, and key packing of the 1 GiB
config, looped 16x per trial, steady state.

Run on the real chip: python experiments/scatter_stage_ab.py [log2_n=30]
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
        PAD_KEY, _chunk_codes, chunk_geometry, prepare_big)
    from hpc_suffix_array_tpu.utils.twin import twin_corpus

    log2_n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    n = 1 << log2_n
    m, C, pad_len = chunk_geometry(n)
    text, text_dev = twin_corpus(n, pad_len)
    state = prepare_big(text, text_dev=text_dev)
    plan = state["plan"]
    text_pad, vals_d, ranges = (state["text_pad"], state["vals_d"],
                                state.get("ranges"))
    W = 327680                       # the measured 1 GiB-config W
    spw, bits = plan.spw, plan.bits

    @functools.partial(jax.jit, static_argnums=(0, 1, 2))
    def codes_only(m, spw, bits, text_pad, vals, start, n, ranges=None):
        k0, k1 = _chunk_codes(m, spw, bits, text_pad, vals, start, n,
                              ranges=ranges)
        return k0.sum() + k1.sum()

    @functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
    def codes_sort(m, spw, bits, W, text_pad, vals, start, n, ranges=None):
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
        num_keys=1, is_stable=False)
        return s_k0.sum() + s_k1.sum() + s_idx.sum()

    @functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
    def sort_only(m, spw, bits, W, k0, k1, pos):
        padk = jnp.full((W,), PAD_KEY, jnp.int32)
        s_k0, s_k1, s_idx = lax.sort(
            (jnp.concatenate([k0, padk]), jnp.concatenate([k1, padk]),
             jnp.concatenate([pos, padk])),
            num_keys=1, is_stable=False)
        return s_k0.sum() + s_k1.sum() + s_idx.sum()

    n_d = jnp.int32(n)
    start_d = [jnp.int32(c * m) for c in range(min(C, 16))]
    rng = np.random.default_rng(1)
    k0r = jnp.asarray(rng.integers(0, 1 << 30, m, dtype=np.int32))
    k1r = jnp.asarray(rng.integers(0, 1 << 30, m, dtype=np.int32))
    posr = jnp.asarray(np.arange(m, dtype=np.int32))

    def steady(tag, launch):
        acc = launch(0)                        # warmup (first-exec)
        jax.device_get(acc)
        for trial in range(2):
            t0 = time.perf_counter()
            accs = [launch(i % 16) for i in range(16)]
            jax.device_get(accs[-1])
            dt = (time.perf_counter() - t0) / 16
            if trial:
                print(f"{tag:>12}: {dt * 1e3:7.1f} ms/chunk", flush=True)

    print(f"n=2^{log2_n} m={m} C={C} spw={spw} bits={bits} W={W}")
    steady("codes", lambda i: codes_only(
        m, spw, bits, text_pad, vals_d, start_d[i], n_d, ranges))
    steady("codes+sort", lambda i: codes_sort(
        m, spw, bits, W, text_pad, vals_d, start_d[i], n_d, ranges))
    steady("sort_only", lambda i: sort_only(m, spw, bits, W, k0r, k1r, posr))


if __name__ == "__main__":
    main()
