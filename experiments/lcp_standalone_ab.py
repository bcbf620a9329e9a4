"""Standalone-LCP anomaly A/B (r4 VERDICT weak #1 / r5 task #5).

TODO.md's open question: the same carried-keys want_lcp program costs
~1.4 s at 2^28 in the fused bench context but 2.2-2.8 s standalone,
when the CALLER's 1 GiB ``sa`` device buffer is alive across the call
— suspected allocator/fragmentation pressure.  This measures exactly
that: best-of-3 execute_big(want_lcp=True) with (A) no extra live
buffer, (B) a dummy 1 GiB device buffer alive, (C) two of them.

Run alone on the chip (no concurrent CPU load).
"""

import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from hpc_suffix_array_tpu.utils.hostmem import (  # noqa: E402
    disable_hugepage_madvise, keep_host_memory_hot)

disable_hugepage_madvise()
keep_host_memory_hot()

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> None:
    import jax.numpy as jnp

    from hpc_suffix_array_tpu.core.bigsort import (
        chunk_geometry, execute_big, prepare_big, replan_edges)
    from hpc_suffix_array_tpu.utils.twin import twin_corpus

    n = 1 << 28
    pad = chunk_geometry(n)[2]
    text, dev = twin_corpus(n, pad)
    state = prepare_big(text, text_dev=dev)

    def timed(tag, extra_gib: int):
        dummies = [jnp.zeros((1 << 28,), jnp.int32)
                   for _ in range(extra_gib)]
        for d in dummies:
            jax.device_get(d[-1])
        out = execute_big(dict(state), want_lcp=True)    # warm
        jax.device_get(out[1][-1])
        del out
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            replan_edges(state, text)
            out = execute_big(dict(state), want_lcp=True)
            jax.device_get(out[1][-1])
            best = min(best, time.perf_counter() - t0)
            del out
        print(f"{tag}: best {best:.3f}s ({n / best / 1e6:.1f} MB/s), "
              f"extra live device GiB = {extra_gib}", flush=True)
        del dummies
        return best

    a = timed("A clean     ", 0)
    b = timed("B +1GiB live", 1)
    c = timed("C +2GiB live", 2)
    print(f"ratio B/A = {b / a:.2f}, C/A = {c / a:.2f}", flush=True)


if __name__ == "__main__":
    main()
