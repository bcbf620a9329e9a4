"""DNA at the full 1 GiB headline size (2-word MSD).

The BASELINE ladder's DNA config is 256 MB (direct path, measured
188.7 MB/s r3 minpad); this records the 1 GiB DNA point through the
2-word MSD (a 3-word variant's 4th slab would not fit HBM).

History: under reserved-0 packing (20 carried symbols) this was the
heavy-residue stress — n^2 * 4^-20 ~ 2^20 window-tied pairs (measured
1,050,967), 4.6 s of a 12.8 s build (84.0 MB/s, r3 session 1). Min-pad
packing (packing_from_sigma: 2-bit codes, 30 carried symbols) collapses
the prediction to n^2 * 4^-30 ~ 1: measured 2026-08-19 — 166.6 MB/s,
0 patched pairs (phases scatter 3.62 / bucket 2.71 / residue 0.0),
host-validated exact by the native O(n) validator. Re-measured
2026-08-20 on the r4 sub-2^23 geometry (SA_TARGET_BUCKET planning +
7*2^20 chunks, which took alnum 168.6 -> 218.9): **215.2 MB/s, 0
patched pairs** (phases scatter 2.79 / bucket 2.10 / residue 0.0),
host-validated exact again. DNA tracks the alnum headline (221.9) at
the full 1 GiB scale.

Usage: python experiments/dna_1gib.py [log2_n]
"""
from __future__ import annotations

import pathlib
import sys
import time

import jax
import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    n = 1 << logn
    from hpc_suffix_array_tpu.core.bigsort import (chunk_geometry,
                                                   execute_big,
                                                   prepare_big,
                                                   replan_edges)
    from hpc_suffix_array_tpu import native
    from hpc_suffix_array_tpu.utils.twin import twin_corpus

    t0 = time.perf_counter()
    _, _, pad_len = chunk_geometry(n)
    text, text_dev = twin_corpus(n, pad_len, seed=0xD1, alphabet="dna")
    print(f"twin DNA corpus: {time.perf_counter() - t0:.1f}s", flush=True)

    state = prepare_big(text, text_dev=text_dev)
    replan_edges(state, text)
    t0 = time.perf_counter()
    sa = execute_big(dict(state))                      # warmup/compile
    jax.device_get(sa[-1])
    print(f"warmup: {time.perf_counter() - t0:.1f}s "
          f"(patched {state['plan'].meta.get('n_patched')})", flush=True)
    # The on-chip O(n) validator needs ~17 GB with the build buffers
    # alive at 2^30 (measured OOM) — validate on the host via the native
    # C O(n) validator instead (4 GiB SA fetch through the tunnel, slow
    # but exact; one-off evidence run).
    t0 = time.perf_counter()
    sa_h = np.asarray(jax.device_get(sa))
    del sa
    valid = native.sa_validate(text, sa_h)
    print(f"host O(n) validator: {valid} "
          f"(fetch+check {time.perf_counter() - t0:.1f}s)", flush=True)
    assert valid
    del sa_h

    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        replan_edges(state, text)
        sa = execute_big(dict(state))
        jax.device_get(sa[-1])
        best = min(best, time.perf_counter() - t0)
        del sa
    meta = state["plan"].meta
    print(f"DNA n=2^{logn}: {best:.2f}s = {n / best / 1e6:.1f} MB/s "
          f"(patched {meta.get('n_patched')}, phases "
          f"{meta.get('phase_host_s')})", flush=True)


if __name__ == "__main__":
    main()
