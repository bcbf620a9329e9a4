"""Measure sorted-fetch LCP at 2^28 (256 MB) on the chip.

Completes the BASELINE 64-256 MB LCP target range; bench.py's lcp_build
cap rises to 2^28 if this fits HBM and holds throughput.
"""
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
from hpc_suffix_array_tpu.utils.hostmem import (  # noqa: E402
    disable_hugepage_madvise, keep_host_memory_hot)

disable_hugepage_madvise()
keep_host_memory_hot()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hpc_suffix_array_tpu.core.lcp_window import (  # noqa: E402
    build_lcp_array_sorted, prepare_lcp_sorted)
from hpc_suffix_array_tpu.core.suffix_array import (  # noqa: E402
    alphabet_remap, bucket_size, suffix_array_from_bytes_kernel)
from hpc_suffix_array_tpu.utils.twin import twin_corpus  # noqa: E402

nl = 1 << int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 28
t0 = time.perf_counter()
arr, text_pad = twin_corpus(nl, bucket_size(nl))
print(f"twin corpus: {time.perf_counter()-t0:.1f}s", flush=True)

remap, bits, h0 = alphabet_remap(arr)
t0 = time.perf_counter()
sa, _r, _rounds = suffix_array_from_bytes_kernel(
    text_pad, jnp.asarray(remap), bits, h0, jnp.int32(nl))
jax.device_get(sa[-1])
print(f"SA build (incl compile): {time.perf_counter()-t0:.1f}s", flush=True)

lstate = prepare_lcp_sorted(arr, text_pad_dev=text_pad)
t0 = time.perf_counter()
lcp = build_lcp_array_sorted(arr, sa, lstate)
jax.device_get(lcp[-1])
print(f"LCP warmup (incl compile): {time.perf_counter()-t0:.1f}s", flush=True)
del lcp

best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    lcp = build_lcp_array_sorted(arr, sa, lstate)
    jax.device_get(lcp[-1])
    best = min(best, time.perf_counter() - t0)
    del lcp
print(f"lcp_build n=2^{nl.bit_length()-1}: {best:.3f}s "
      f"= {nl/best/1e6:.1f} MB/s", flush=True)
