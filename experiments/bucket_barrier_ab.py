"""Does _bucket_sort want the same post-sort barrier as the scatter?

Its sort outputs feed shifted-concat tie flags, xor/clz lcp rows and
dynamic_slice last-key picks — the same consumer class that serialized
the scatter's windows (134.6 -> 68.9 ms/chunk with a barrier). This
runs execute_big at the target size and prints the recorded phase
split (plan.meta["phase_host_s"]); run it before and after editing a
barrier into _bucket_sort to A/B pass C.

Also a geometry probe: optional [log2_chunk] [log2_bucket] args re-run
the same measurement with non-default chunk/bucket sizes (smaller
sorts cost less per element on the bitonic network; windows got cheap
once the barrier landed, so finer geometry may now win).

Run on the real chip: python experiments/bucket_barrier_ab.py \
    [log2_n=30] [want_lcp=0] [log2_chunk=0] [log2_bucket=0]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from hpc_suffix_array_tpu.core.bigsort import (
        chunk_geometry, execute_big, prepare_big, replan_edges)
    from hpc_suffix_array_tpu.utils.twin import twin_corpus

    log2_n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    want_lcp = bool(int(sys.argv[2])) if len(sys.argv) > 2 else False
    log2_chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    log2_bucket = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    n = 1 << log2_n
    chunk_elems = (1 << log2_chunk) if log2_chunk else None
    _, _, pad_len = chunk_geometry(n, chunk_elems)
    text, text_dev = twin_corpus(n, pad_len)
    kw = {"chunk_elems": chunk_elems} if chunk_elems else {}
    if log2_bucket:
        kw["target_bucket"] = 1 << log2_bucket
    state = prepare_big(text, text_dev=text_dev, **kw)
    replan_edges(state, text)

    out = execute_big(dict(state), want_lcp=want_lcp)      # warmup
    fence = out[1] if want_lcp else out
    jax.device_get(fence[-1])
    del out, fence

    for trial in range(2):
        t0 = time.perf_counter()
        replan_edges(state, text)
        out = execute_big(dict(state), want_lcp=want_lcp)
        fence = out[1] if want_lcp else out
        jax.device_get(fence[-1])
        dt = time.perf_counter() - t0
        del out, fence
        print(f"trial {trial}: {dt:7.3f} s "
              f"({n / dt / 1e6:.1f} MB/s)  phases: "
              f"{state['plan'].meta.get('phase_host_s')}", flush=True)


if __name__ == "__main__":
    main()
