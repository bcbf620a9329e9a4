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

import contextlib
import os
import pathlib
import signal
import threading
import time
from datetime import datetime

import numpy as np
import pandas as pd

from hpc_suffix_array_tpu.bench.timing import run_benchmark
from hpc_suffix_array_tpu.utils.io import read_file

MB = 1024 * 1024


def _platform() -> str:
    """Real device platform behind the rows (axon = the TPU tunnel,
    cpu = the virtual mesh) — recorded so artifacts from the two
    environments can never be confused for each other."""
    import jax

    try:
        return jax.devices()[0].platform
    except Exception:
        return "unknown"


def _row_for_file(path, result, backend: str, processes: int) -> dict:
    size = result.string_length
    t = result.total_time
    return {
        "file": os.path.basename(str(path)),
        "size_bytes": size,
        "size_mb": size / MB,
        "backend": backend,
        "platform": _platform(),
        "processes": processes,
        "time_seconds": t,
        "throughput_mb_s": (size / MB) / t if t > 0 else 0,
        "throughput_chars_per_second": size / t if t > 0 else 0,
        "lrs_length": result.lrs_length,
        "total_time": result.total_time,
        "sa_time": result.sa_time,
        "lcp_time": result.lcp_time,
        "lrs_time": result.lrs_time,
        "compile_time": result.compile_time,
        "builder": getattr(result, "builder", ""),
        "success": True,
        "error": "",
        "timestamp": datetime.now(),
    }


def _failed_row(path, size_bytes: int, backend: str, processes: int,
                error: str) -> dict:
    """FAILED row: the sweep records the failure and continues, matching
    the reference harness (benchmark_sequential.py:105-130,211-213)."""
    return {
        "file": os.path.basename(str(path)),
        "size_bytes": size_bytes,
        "size_mb": size_bytes / MB,
        "backend": backend,
        "platform": _platform(),
        "processes": processes,
        "time_seconds": 0.0,
        "throughput_mb_s": 0.0,
        "throughput_chars_per_second": 0.0,
        "lrs_length": 0,
        "total_time": 0.0,
        "sa_time": 0.0,
        "lcp_time": 0.0,
        "lrs_time": 0.0,
        "compile_time": 0.0,
        "success": False,
        "error": error[:500],
        "timestamp": datetime.now(),
    }


class _PhaseTimeout(Exception):
    pass


@contextlib.contextmanager
def _time_limit(seconds):
    """Best-effort per-run timeout via SIGALRM (main thread only; a jitted
    dispatch that never yields to Python cannot be preempted — this catches
    the common failure mode of a pathologically slow corpus between
    dispatches, the analog of the reference's subprocess timeout at
    benchmark_sequential.py:84)."""
    if not seconds or threading.current_thread() is not threading.main_thread():
        yield
        return

    def _raise(signum, frame):
        raise _PhaseTimeout(f"timeout after {seconds}s")

    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(int(seconds))
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def _twin_for_file(path):
    """Device-born twin of a generated-family corpus file, or None.

    Parses ``{random,repetitive,dna}_{N}MB`` from the filename and
    twin-generates (host mirror, device copy) of the same family and
    size at the padded geometry the routed build will use (direct →
    bucket_size, MSD → chunk pad; repetitive is chain-class so it stays
    direct at every feasible size — mirrors core.bigsort.prefer_direct).
    The bytes are family-equivalent, not the file's bytes: twin rows
    measure the build, not this environment's ~20-25 MB/s host<->device
    tunnel (README 'Benchmarking notes')."""
    import re as _re

    m = _re.match(r"(random|repetitive|dna)_(\d+)MB",
                  os.path.basename(str(path)))
    if m is None:
        return None
    fam, mb = m.group(1), int(m.group(2))
    n = mb * MB
    from hpc_suffix_array_tpu.core.bigsort import chunk_geometry
    from hpc_suffix_array_tpu.core.suffix_array import bucket_size
    from hpc_suffix_array_tpu.utils.twin import twin_corpus, twin_periodic

    cross = int(os.environ.get("SA_DIRECT_CROSS", 1 << 27))
    direct_max = int(os.environ.get("SA_DIRECT_MAX", 1 << 28))
    direct = bucket_size(n) <= (direct_max if fam == "repetitive"
                                else min(cross, direct_max))
    pad = bucket_size(n) if direct else chunk_geometry(n)[2]
    if fam == "repetitive":
        from hpc_suffix_array_tpu.datasets.generate import (
            generate_random_text)
        return twin_periodic(generate_random_text(1000, seed=0), n, pad)
    return twin_corpus(n, pad, alphabet="alnum" if fam == "random"
                       else "dna")


def benchmark_corpora(files, results_dir="results/benchmarks",
                      mesh_sizes=(None,), verbose: bool = True,
                      timeout_s: float | None = 7200,
                      seq_csv_name: str = "sequential_results.csv",
                      twin: bool = False) -> pd.DataFrame:
    """Sweep corpus files across backends; write per-backend CSVs.

    ``mesh_sizes``: iterable of None (single-device) and/or ints (sharded
    mesh sizes) — the analog of the reference's np sweep [2,4,8]
    (benchmark_mpi.py:154). A file that fails or exceeds ``timeout_s``
    (default = the reference's 7200 s envelope,
    benchmark_sequential.py:84) produces a FAILED row and the sweep
    continues.

    ``seq_csv_name``: filename for the single-device rows — the CPU-mesh
    sweep (bench/mesh_sweep.py) writes its own baseline under a distinct
    name so it never clobbers the committed TPU artifact; the
    speedup/efficiency math always uses THIS run's baseline (same
    platform), never a CSV from another machine.

    ``twin``: corpora are twin-generated on device instead of read from
    disk (family/size parsed from the filename; see _twin_for_file) —
    the timed phases then measure the build, not this environment's
    pathological host<->device staging. Rows carry
    ``input_mode=twin_device``; files whose names don't parse fall back
    to file mode for that row.
    """
    results_dir = pathlib.Path(results_dir)
    results_dir.mkdir(parents=True, exist_ok=True)
    # Label rows by the REAL platform: "tpu"/"tpu_sharded_P" on the chip
    # (axon tunnel), "cpu"/"cpu_sharded_P" on the virtual mesh — a
    # CPU-mesh sweep can never masquerade as chip numbers.
    base = "tpu" if _platform() in ("tpu", "axon") else "cpu"
    rows = []
    for ms in mesh_sizes:
        mesh = None
        backend = base
        processes = 1
        if ms is not None:
            from hpc_suffix_array_tpu.parallel import make_mesh
            mesh = make_mesh(ms)
            backend = f"{base}_sharded_{ms}"
            processes = ms
        for path in files:
            text_dev = None
            input_mode = "file"
            if twin:
                pair = _twin_for_file(path)
                if pair is not None:
                    text, text_dev = pair
                    input_mode = "twin_device"
            if input_mode == "file":
                try:
                    text = read_file(str(path))
                except OSError as e:
                    if verbose:
                        print(f"[{backend}] {path} ... FAILED (read: {e})")
                    rows.append(_failed_row(path, 0, backend, processes,
                                            f"read error: {e}"))
                    continue
            # Twin rows get their own backend label so chart/report
            # groupings never mix device-born and file-staged timings.
            bk = (backend + "_twin" if input_mode == "twin_device"
                  else backend)
            if verbose:
                print(f"[{bk}] {path} ({len(text) / MB:.1f} MB, "
                      f"{input_mode}) ... ", end="", flush=True)
            t0 = time.perf_counter()
            try:
                with _time_limit(timeout_s):
                    r = run_benchmark(text, bk, input_mode, mesh=mesh,
                                      text_dev=text_dev)
            except _PhaseTimeout as e:
                if verbose:
                    print("TIMEOUT")
                rows.append(_failed_row(path, len(text), backend, processes,
                                        str(e)))
                continue
            except Exception as e:
                if verbose:
                    print(f"FAILED ({type(e).__name__})")
                rows.append(_failed_row(path, len(text), backend, processes,
                                        f"{type(e).__name__}: {e}"))
                continue
            if verbose:
                print(f"OK ({time.perf_counter() - t0:.2f}s) "
                      f"LRS={r.lrs_length}")
            row = _row_for_file(path, r, bk, processes)
            row["input_mode"] = input_mode
            rows.append(row)

    df = pd.DataFrame(rows)
    if df.empty:
        return df
    seq = df[~df.backend.str.contains("_sharded_")]
    if not seq.empty:
        seq.to_csv(results_dir / seq_csv_name, index=False)
    par = df[df.backend.str.contains("_sharded_")]
    if not par.empty:
        par = add_speedup_efficiency(par, seq)
        par.to_csv(results_dir / "parallel_results.csv", index=False)
    return df


def weak_scaling_proxy(bytes_per_shard: int = 1 << 20,
                       mesh_sizes=(1, 2, 4, 8),
                       results_dir="results/benchmarks",
                       input_type: str = "random",
                       builder: str = "auto",
                       verbose: bool = True) -> pd.DataFrame:
    """Weak-scaling sweep: n grows with the mesh (n = P * bytes_per_shard).

    Stand-in for the >=70% multi-host weak-scaling north star while real
    multi-chip hardware is unavailable: on the virtual CPU mesh the curve
    tracks algorithmic overhead (collective hops, seam exchanges), not ICI
    bandwidth — a proxy, and labeled as such in the CSV. Rows append to
    ``parallel_results.csv`` with two efficiency columns:

    * ``weak_efficiency`` = t(1)/t(P) — the hardware definition. On a
      virtual mesh ALL P devices share the host's physical cores, so
      even zero-overhead scaling lands near 1/P here; kept for schema
      parity, do not quote it as scaling evidence.
    * ``weak_efficiency_normalized`` = P*t(1)/t(P) — per-shard time
      inflation, the shared-core-honest proxy: 1.0 means P shards cost
      exactly P times one shard's compute (no algorithmic overhead);
      the collective/seam/round-growth overhead is what pushes it
      below 1. This is the number to hold against the 70% bar, with
      the caveat that P > nproc points also pay core oversubscription.

    ``builder`` pins the sharded build path for the whole sweep so the
    curve measures ONE algorithm: "msd" (one-pass carried-keys sort),
    "doubling", or "auto" (production routing — n crosses the MSD
    threshold as P grows, so auto curves mix algorithms; fine for
    end-to-end tracking, wrong for efficiency claims). Two more
    variants time ``build_suffix_array_sharded_big`` directly (no
    pipeline, sa_time = the whole fused build):

    * "msd_lcp" — ``want_lcp=True``: the fused SA+LCP build, the route
      production takes above SA_LCP_BIG_MIN (core/lcp.py);
    * "msd_wide" — forced ``wide_index`` + ``device_columns`` +
      ``want_lcp``: two-word base-m SA and LCP columns kept sharded on
      device, the >=4 GiB ladder config's arithmetic (BASELINE.md).
    """
    from hpc_suffix_array_tpu.datasets.generate import (
        generate_dna_text, generate_random_text, generate_repetitive_text)
    from hpc_suffix_array_tpu.parallel import make_mesh

    thresholds = {"msd": "0", "doubling": str(1 << 62), "auto": None}
    big_variants = {
        "msd_lcp": dict(want_lcp=True),
        "msd_wide": dict(wide_index=True, device_columns=True,
                         want_lcp=True),
    }
    if builder in big_variants:
        return _weak_scaling_big_variant(
            builder, big_variants[builder], bytes_per_shard, mesh_sizes,
            results_dir, input_type, verbose)
    if builder not in thresholds:
        raise ValueError(
            f"builder must be one of {sorted(thresholds) + sorted(big_variants)}")
    gens = {"random": generate_random_text,
            "repetitive": generate_repetitive_text,
            "dna": generate_dna_text}
    rows = []
    t1 = None
    prev_env = os.environ.get("SA_SHARDED_MSD_MIN")
    if thresholds[builder] is not None:
        os.environ["SA_SHARDED_MSD_MIN"] = thresholds[builder]
    try:
        for p in mesh_sizes:
            n = bytes_per_shard * p
            text = gens[input_type](n, seed=42)
            mesh = make_mesh(p)
            r = run_benchmark(text, f"tpu_sharded_{p}", input_type,
                              mesh=mesh)
            if t1 is None:
                t1 = r.sa_time
            eff = t1 / r.sa_time if r.sa_time > 0 else 0.0
            eff_n = p * t1 / r.sa_time if r.sa_time > 0 else 0.0
            if verbose:
                print(f"weak-scaling[{builder}] P={p} n={n / MB:.1f}MB "
                      f"sa={r.sa_time:.3f}s eff={eff:.2f} "
                      f"eff_norm={eff_n:.2f}")
            row = _row_for_file(f"weak_{input_type}_{p}shard", r,
                                f"tpu_sharded_{p}", p)
            row["scaling_mode"] = "weak_proxy_cpu_mesh"
            row["builder"] = builder
            row["weak_efficiency"] = eff
            row["weak_efficiency_normalized"] = eff_n
            rows.append(row)
    finally:
        if thresholds[builder] is not None:
            if prev_env is None:
                os.environ.pop("SA_SHARDED_MSD_MIN", None)
            else:
                os.environ["SA_SHARDED_MSD_MIN"] = prev_env

    return _append_scaling_rows(rows, results_dir)


def _append_scaling_rows(rows, results_dir) -> pd.DataFrame:
    df = pd.DataFrame(rows)
    results_dir = pathlib.Path(results_dir)
    results_dir.mkdir(parents=True, exist_ok=True)
    out = results_dir / "parallel_results.csv"
    if out.exists():
        old = pd.read_csv(out)
        old = old[old.get("scaling_mode").isna()] if "scaling_mode" in old \
            else old
        df = pd.concat([old, df], ignore_index=True)
    df.to_csv(out, index=False)
    return df


def _fence_tree(out) -> None:
    """Completion fence for a (possibly nested) tuple of device arrays:
    materialize every addressable shard (works single- and multi-process;
    `block_until_ready` alone is not a fence through the TPU tunnel)."""
    import jax

    for leaf in jax.tree_util.tree_leaves(out):
        for s in getattr(leaf, "addressable_shards", []):
            np.asarray(s.data)


def _weak_scaling_big_variant(builder: str, kwargs: dict,
                              bytes_per_shard: int, mesh_sizes,
                              results_dir, input_type: str,
                              verbose: bool) -> pd.DataFrame:
    """Weak-scaling rows for a ``build_suffix_array_sharded_big`` variant
    (want_lcp / wide device-columns) — the fused build IS the timed
    region; sa_time = total_time (there is no separate LCP phase: the
    LCP columns come out of the same sort)."""
    from hpc_suffix_array_tpu.bench.timing import BenchmarkResult
    from hpc_suffix_array_tpu.datasets.generate import (
        generate_dna_text, generate_random_text, generate_repetitive_text)
    from hpc_suffix_array_tpu.parallel import make_mesh
    from hpc_suffix_array_tpu.parallel.bigsort import (
        build_suffix_array_sharded_big)

    gens = {"random": generate_random_text,
            "repetitive": generate_repetitive_text,
            "dna": generate_dna_text}
    rows = []
    t1 = None
    for p in mesh_sizes:
        n = bytes_per_shard * p
        text = gens[input_type](n, seed=42)
        mesh = make_mesh(p)

        def run():
            _fence_tree(build_suffix_array_sharded_big(text, mesh,
                                                       **kwargs))

        t0 = time.perf_counter()
        run()                                   # warmup (compile)
        warmup_total = time.perf_counter() - t0
        t0 = time.perf_counter()
        run()
        dt = time.perf_counter() - t0
        if t1 is None:
            t1 = dt
        eff = t1 / dt if dt > 0 else 0.0
        eff_n = p * t1 / dt if dt > 0 else 0.0
        if verbose:
            print(f"weak-scaling[{builder}] P={p} n={n / MB:.1f}MB "
                  f"sa={dt:.3f}s eff={eff:.2f} eff_norm={eff_n:.2f}")
        r = BenchmarkResult(
            implementation=f"tpu_sharded_{p}", input_type=input_type,
            string_length=n, total_time=dt, sa_time=dt, lcp_time=0.0,
            lrs_time=0.0, memory_used=3 * n * 4,
            compile_time=max(0.0, warmup_total - dt))
        row = _row_for_file(f"weak_{input_type}_{p}shard", r,
                            f"tpu_sharded_{p}", p)
        row["scaling_mode"] = "weak_proxy_cpu_mesh"
        row["builder"] = builder
        row["weak_efficiency"] = eff
        row["weak_efficiency_normalized"] = eff_n
        rows.append(row)
    return _append_scaling_rows(rows, results_dir)


def add_speedup_efficiency(par: pd.DataFrame,
                           seq: pd.DataFrame) -> pd.DataFrame:
    """speedup = seq sa_time / parallel sa_time; efficiency = speedup / P
    (reference benchmark_mpi.py:203-210, with the baseline-path bug fixed).

    Honesty columns (r4 VERDICT weak #6): each parallel row records its
    own ``builder`` and the baseline's ``baseline_builder``; when they
    differ, ``builder_mismatch`` is True and the pair measures routing
    luck, not scaling (e.g. a single-device doubling baseline against a
    sharded MSD chain build showed 431% "efficiency"). Charts exclude
    flagged pairs (viz/charts.py)."""
    par = par.copy()
    empty = seq is None or seq.empty
    seq_times = ({} if empty
                 else pd.Series(seq.sa_time.values, index=seq.file).to_dict())
    seq_builders = ({} if empty or "builder" not in seq.columns
                    else pd.Series(seq.builder.values,
                                   index=seq.file).to_dict())
    par["speedup"] = par.apply(
        lambda r: seq_times.get(r["file"], 0) / r["sa_time"]
        if r["sa_time"] > 0 else 0, axis=1)
    par["efficiency"] = par.apply(
        lambda r: r["speedup"] / r["processes"]
        if r["processes"] > 0 else 0, axis=1)
    par["baseline_builder"] = par["file"].map(
        lambda f: seq_builders.get(f, ""))

    def _mismatch(r):
        b, sb = str(r.get("builder", "")), str(r["baseline_builder"])
        if not b or not sb or b == "nan" or sb == "nan":
            return False
        # A sharded build paired with the same-algorithm single-device
        # baseline is the honest comparison; sharded_msd vs doubling is
        # not.
        return b.replace("sharded_", "") != sb.replace("sharded_", "")

    par["builder_mismatch"] = par.apply(_mismatch, axis=1)
    return par
