"""Per-phase benchmark timing: SA build / LCP build / LRS search.

Parity with the reference C benchmark core
(src/benchmark/suffix_array_benchmark.{h,c}): the ``BenchmarkResult``
record mirrors the struct at suffix_array_benchmark.h:9-18 and
``run_benchmark`` mirrors the phase protocol at :22-68 including the
3·n·sizeof(int32) working-set estimate (:61). TPU-first: every phase is
fenced with `jax.block_until_ready` so device-async execution cannot leak
one phase's work into the next timer (the C code needed no fences).
"""

from __future__ import annotations

import time
from dataclasses import asdict, dataclass

import numpy as np


@dataclass
class BenchmarkResult:
    """Mirror of the reference BenchmarkResult struct
    (suffix_array_benchmark.h:9-18)."""

    implementation: str
    input_type: str
    string_length: int
    total_time: float
    sa_time: float
    lcp_time: float
    lrs_time: float
    memory_used: int
    lrs_length: int = 0
    valid: bool | None = None

    def as_row(self) -> dict:
        return asdict(self)


def run_benchmark(text, implementation: str = "tpu",
                  input_type: str = "random", mesh=None,
                  validate: bool = False) -> BenchmarkResult:
    """Time one full SA + LCP + LRS pipeline on ``text``.

    ``mesh=None`` uses the single-device kernel; otherwise the sharded
    builder over the given Mesh.
    """
    import jax

    from hpc_suffix_array_tpu.core.lcp import build_lcp_array
    from hpc_suffix_array_tpu.core.lrs import find_longest_repeated_substring
    from hpc_suffix_array_tpu.core.suffix_array import (
        as_byte_array, build_suffix_array)

    arr = as_byte_array(text)
    n = int(arr.shape[0])

    t0 = time.perf_counter()
    if mesh is None:
        sa = jax.block_until_ready(build_suffix_array(arr))
    else:
        from hpc_suffix_array_tpu.parallel import build_suffix_array_sharded
        sa = jax.block_until_ready(build_suffix_array_sharded(arr, mesh))
    t1 = time.perf_counter()

    if mesh is None:
        lcp = jax.block_until_ready(build_lcp_array(arr, sa))
    else:
        from hpc_suffix_array_tpu.parallel import build_lcp_array_sharded
        lcp = jax.block_until_ready(build_lcp_array_sharded(arr, sa, mesh))
    t2 = time.perf_counter()

    lrs = find_longest_repeated_substring(arr, sa, lcp)
    t3 = time.perf_counter()

    valid = None
    if validate:
        from hpc_suffix_array_tpu.core.validate import is_valid_suffix_array
        valid = bool(is_valid_suffix_array(arr, sa))

    return BenchmarkResult(
        implementation=implementation,
        input_type=input_type,
        string_length=n,
        total_time=t3 - t0,
        sa_time=t1 - t0,
        lcp_time=t2 - t1,
        lrs_time=t3 - t2,
        memory_used=3 * n * 4,   # reference estimate, suffix_array_benchmark.c:61
        lrs_length=len(lrs) if lrs else 0,
        valid=valid,
    )
