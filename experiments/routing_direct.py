"""Direct one-sort path vs the two-sort MSD, on-chip, across sizes.

Run on the real chip: python experiments/routing_direct.py [log2_sizes ...]
Optional corpora via env SA_RD_CORPUS=alnum|dna|p1000 (default alnum);
SA_RD_LCP=1 adds the want_lcp variant.
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
        execute_direct, prepare_direct)
    from hpc_suffix_array_tpu.core.suffix_array import bucket_size
    from hpc_suffix_array_tpu.utils.twin import twin_corpus

    corpus = os.environ.get("SA_RD_CORPUS", "alnum")
    want_lcp = os.environ.get("SA_RD_LCP", "0") == "1"
    rng = np.random.default_rng(0xD1)
    alnum = np.frombuffer(
        b"abcdefghijklmnopqrstuvwxyz"
        b"ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789", np.uint8)

    sizes = [int(float(a)) if "e" in a or "." in a else (1 << int(a))
             for a in sys.argv[1:]] or [1 << lg for lg in range(24, 29)]
    for n in sizes:
        lg = round(np.log2(n), 2)
        if corpus == "alnum":
            text, text_dev = twin_corpus(n, bucket_size(n))
        elif corpus == "dna":
            text = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, n)]
            text_dev = None
        else:
            text = np.tile(alnum[rng.integers(0, 62, 1000)],
                           n // 1000 + 1)[:n]
            text_dev = None
        state = prepare_direct(text, text_dev=text_dev)
        out = execute_direct(dict(state), want_lcp=want_lcp)
        fence = out[1] if want_lcp else out
        jax.device_get(fence[-1])
        del out, fence
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = execute_direct(dict(state), want_lcp=want_lcp)
            fence = out[1] if want_lcp else out
            jax.device_get(fence[-1])
            best = min(best, time.perf_counter() - t0)
            del out, fence
        print(json.dumps({
            "path": "direct", "corpus": corpus, "log2_n": lg,
            "want_lcp": want_lcp, "mb_s": round(n / best / 1e6, 1),
            "chain": state["meta"].get("chain_mode"),
            "patched": state["meta"].get("n_patched", 0)}), flush=True)
        del state


if __name__ == "__main__":
    main()
