"""MSD with the under-2^23 plan geometry at direct-path sizes.

The r3 step-structure finding (sort cost jumps past powers of two;
plan fills/chunks under 2^23 -> 1 GiB 168.6 -> 218.9 MB/s) may move the
direct-vs-MSD crossover: the direct path pays ONE whole-text sort whose
per-element cost grows with log n, while the MSD pays two small
cheap-class sorts. This measures execute_big at sizes the router
currently sends to the direct path (143-164 MB/s measured r3).

Run on the real chip: python experiments/routing_msd_small.py [log2 ...]
Corpus via env SA_RD_CORPUS=alnum|dna|p1000 (default alnum) — same knob
as routing_direct.py, twin-generated (no tunnel staging).

MEASURED (v5e 2026-08-20, best-of-2, MB/s) — and the same sweep re-run
through routing_direct.py on current code, which showed the r2-era
direct table (151/164/144) was stale:

    n      MSD(alnum)  direct(alnum)  MSD(dna)  direct(dna)  MSD(p1000)  direct(p1000)
    2^24     64.5          151*          -          -            -          -
    2^26    145.7          212.3       143.9      208.7        70.9       177.8
    2^27    175.2          203.0       177.5      202.7         -          -
    2^28    195.6          192.8       194.7      187.8       110.1       179.8
    (* r3 value; not re-measured — far from the crossover)

VERDICT: crossover just past 2^27 for non-chain text; chain-class
(p1000) stays direct at every feasible n. Router retuned accordingly
(core/bigsort.prefer_direct, SA_DIRECT_CROSS=2^27) and validated
end-to-end: bench.py at 2^28 routes msd_bigsort at 196.6 MB/s
(was 144 via direct under the old router), sa_lcp 193.3.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from hpc_suffix_array_tpu.core.bigsort import (
        chunk_geometry, execute_big, prepare_big, replan_edges)
    from hpc_suffix_array_tpu.utils.twin import twin_corpus, twin_periodic

    corpus = os.environ.get("SA_RD_CORPUS", "alnum")
    chunk = 7 << 20
    sizes = [1 << int(a) for a in sys.argv[1:]] or [1 << lg
                                                    for lg in (24, 26, 28)]
    for n in sizes:
        _, _, pad_len = chunk_geometry(n, chunk)
        if corpus == "p1000":
            alnum = np.frombuffer(
                b"abcdefghijklmnopqrstuvwxyz"
                b"ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789", np.uint8)
            pat = alnum[np.random.default_rng(0xD1).integers(0, 62, 1000)]
            text, text_dev = twin_periodic(pat, n, pad_len)
        else:
            text, text_dev = twin_corpus(n, pad_len, alphabet=corpus)
        state = prepare_big(text, chunk_elems=chunk, text_dev=text_dev)
        sa = execute_big(dict(state))                   # warmup/compile
        jax.device_get(sa[-1])
        del sa
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            replan_edges(state, text)
            sa = execute_big(dict(state))
            jax.device_get(sa[-1])
            best = min(best, time.perf_counter() - t0)
            del sa
        meta = state["plan"].meta
        print(json.dumps({
            "path": "msd", "corpus": corpus, "log2_n": int(np.log2(n)),
            "mb_s": round(n / best / 1e6, 1),
            "n_buckets": meta.get("n_buckets_run"),
            "phases": meta.get("phase_host_s")}), flush=True)
        del state, text_dev


if __name__ == "__main__":
    main()
