"""Corpus benchmark harness: file sweep, CSVs, speedup/efficiency.

Parity with the reference Python harness while fixing its known defects:

  * sequential sweep + schema: scripts/benchmark_sequential.py:147-223
    (columns at :192-209, throughput at :198-199);
  * sharded sweep + speedup/efficiency math: scripts/benchmark_mpi.py:
    133-215 (speedup = seq sa_time / parallel sa_time, efficiency =
    speedup / nprocs, :203-210);
  * FIXED: the reference reads the sequential baseline from
    results/csv/sequential_results.csv (benchmark_mpi.py:198) but writes
    it to results/benchmarks/ (benchmark_sequential.py:221) so speedup is
    silently 0 — here everything lives under one results dir (SURVEY §2.15).

TPU-first: no subprocess + stdout-regex contract — the harness calls the
library in-process and gets structured results directly; the
STRUCTURED_RESULTS text protocol still exists at the CLI boundary for
external consumers.
"""

from __future__ import annotations

import os
import pathlib
import time
from datetime import datetime

import numpy as np
import pandas as pd

from hpc_suffix_array_tpu.bench.timing import run_benchmark
from hpc_suffix_array_tpu.utils.io import read_file

MB = 1024 * 1024


def _row_for_file(path, result, backend: str, processes: int) -> dict:
    size = result.string_length
    t = result.total_time
    return {
        "file": os.path.basename(str(path)),
        "size_bytes": size,
        "size_mb": size / MB,
        "backend": backend,
        "processes": processes,
        "time_seconds": t,
        "throughput_mb_s": (size / MB) / t if t > 0 else 0,
        "throughput_chars_per_second": size / t if t > 0 else 0,
        "lrs_length": result.lrs_length,
        "total_time": result.total_time,
        "sa_time": result.sa_time,
        "lcp_time": result.lcp_time,
        "success": True,
        "timestamp": datetime.now(),
    }


def benchmark_corpora(files, results_dir="results/benchmarks",
                      mesh_sizes=(None,), verbose: bool = True
                      ) -> pd.DataFrame:
    """Sweep corpus files across backends; write per-backend CSVs.

    ``mesh_sizes``: iterable of None (single-device) and/or ints (sharded
    mesh sizes) — the analog of the reference's np sweep [2,4,8]
    (benchmark_mpi.py:154).
    """
    results_dir = pathlib.Path(results_dir)
    results_dir.mkdir(parents=True, exist_ok=True)
    rows = []
    for ms in mesh_sizes:
        mesh = None
        backend = "tpu"
        processes = 1
        if ms is not None:
            from hpc_suffix_array_tpu.parallel import make_mesh
            mesh = make_mesh(ms)
            backend = f"tpu_sharded_{ms}"
            processes = ms
        for path in files:
            text = read_file(str(path))
            if verbose:
                print(f"[{backend}] {path} ({len(text) / MB:.1f} MB) ... ",
                      end="", flush=True)
            t0 = time.perf_counter()
            r = run_benchmark(text, backend, "file", mesh=mesh)
            if verbose:
                print(f"OK ({time.perf_counter() - t0:.2f}s) "
                      f"LRS={r.lrs_length}")
            rows.append(_row_for_file(path, r, backend, processes))

    df = pd.DataFrame(rows)
    if df.empty:
        return df
    seq = df[df.backend == "tpu"]
    if not seq.empty:
        seq.to_csv(results_dir / "sequential_results.csv", index=False)
    par = df[df.backend != "tpu"]
    if not par.empty:
        par = add_speedup_efficiency(par, seq)
        par.to_csv(results_dir / "parallel_results.csv", index=False)
    return df


def add_speedup_efficiency(par: pd.DataFrame,
                           seq: pd.DataFrame) -> pd.DataFrame:
    """speedup = seq sa_time / parallel sa_time; efficiency = speedup / P
    (reference benchmark_mpi.py:203-210, with the baseline-path bug fixed)."""
    par = par.copy()
    seq_times = ({} if seq is None or seq.empty
                 else pd.Series(seq.sa_time.values, index=seq.file).to_dict())
    par["speedup"] = par.apply(
        lambda r: seq_times.get(r["file"], 0) / r["sa_time"]
        if r["sa_time"] > 0 else 0, axis=1)
    par["efficiency"] = par.apply(
        lambda r: r["speedup"] / r["processes"]
        if r["processes"] > 0 else 0, axis=1)
    return par
