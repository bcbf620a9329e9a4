"""On-chip measurements for the BASELINE.md config-ladder middle rungs.

The ladder (BASELINE.md "configs") asks for 64-256 MB synthetic-skew and
256 MB DNA single-chip numbers; bench.py's secondary sweep caps its skew
corpora at 2^24 to keep the driver round fast. This script measures the
real thing once and records it:

  dna_2^28          : 256 MB ACGT (4-symbol alphabet, 20-symbol carried
                      keys) through the same routing as build_suffix_array
  periodic_2^26     : 64 MB period-1000 text through the MSD chain path
  periodic_2^28     : 256 MB period-1000 (chain mode at scale)

Run on the real chip (single-tenant — never concurrently with bench.py):
    python experiments/ladder_onchip.py [which ...]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def measure(tag, arr, reps=2):
    import jax

    from hpc_suffix_array_tpu.core.bigsort import (
        direct_feasible, estimate_repeat_len, execute_big, execute_direct,
        prepare_big, prepare_direct)
    from hpc_suffix_array_tpu.core.suffix_array import (
        alphabet_remap, bucket_size, suffix_array_from_bytes_kernel)

    n = len(arr)
    rep = estimate_repeat_len(arr)
    if rep > 48 or n > (1 << 22):   # build_suffix_array's routing
        direct = direct_feasible(arr, n, est_repeat=rep)
        prep = prepare_direct if direct else prepare_big
        exe = execute_direct if direct else execute_big
        state = prep(arr)
        sa = exe(dict(state))                             # warmup/compile
        jax.device_get(sa[-1])
        del sa
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            sa = exe(dict(state))
            jax.device_get(sa[-1])
            best = min(best, time.perf_counter() - t0)
            del sa
        meta = state["meta"] if direct else state["plan"].meta
        path = ("direct" if direct else "msd") + \
            ("_chain" if meta.get("chain_mode") else "_sort")
    else:
        import jax.numpy as jnp

        host = np.zeros(bucket_size(n), np.uint8)
        host[:n] = arr
        remap, bits, h0 = alphabet_remap(arr)
        args = (jnp.asarray(host), jnp.asarray(remap), bits, h0,
                jnp.int32(n))
        sa, _r, _k = suffix_array_from_bytes_kernel(*args)   # warmup
        jax.device_get(sa[-1])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            sa, _r, _k = suffix_array_from_bytes_kernel(*args)
            jax.device_get(sa[-1])
            best = min(best, time.perf_counter() - t0)
        path = "doubling"
    print(json.dumps({
        "metric": f"sa_build_{tag}", "value": round(n / best / 1e6, 3),
        "unit": "MB/s/chip", "n": n, "path": path}))


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    which = set(sys.argv[1:]) or {"dna28", "p26", "p28"}
    rng = np.random.default_rng(0xD0)
    if "dna28" in which:
        measure("dna", np.frombuffer(b"ACGT", np.uint8)[
            rng.integers(0, 4, 1 << 28)])
    if "p26" in which or "p28" in which:
        alnum = np.frombuffer(
            b"abcdefghijklmnopqrstuvwxyz"
            b"ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789", np.uint8)
        base = alnum[rng.integers(0, 62, 1000)]
        for tag, ln in (("periodic_p1000_64m", 1 << 26),
                        ("periodic_p1000_256m", 1 << 28)):
            if (tag.endswith("64m") and "p26" not in which) or \
               (tag.endswith("256m") and "p28" not in which):
                continue
            measure(tag, np.tile(base, ln // 1000 + 1)[:ln])


if __name__ == "__main__":
    main()
