"""The driver contract: bench.py prints exactly one parseable JSON line."""

import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]


def test_bench_json_line():
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               SA_BENCH_BYTES=str(1 << 16),
               SA_BENCH_BASELINE_BYTES=str(1 << 16),
               SA_BENCH_REPS="1",
               SA_BENCH_SECONDARY="0")
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")], capture_output=True,
        text=True, timeout=900, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-500:]
    lines = [l for l in out.stdout.splitlines() if l.strip().startswith("{")]
    assert len(lines) == 1, out.stdout
    rec = json.loads(lines[0])
    # Driver contract keys plus the honesty keys (corpus size, class,
    # round count; requested_bytes/oom_fallback appear only on fallback).
    assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)
    assert {"n", "corpus", "rounds"} <= set(rec)
    assert rec["n"] == 1 << 16 and "oom_fallback" not in rec
    assert rec["value"] > 0
    assert rec["unit"] == "MB/s/chip"


def test_bench_oom_match_is_narrow():
    """Only genuine allocator exhaustion triggers the size-halving
    fallback; a non-OOM error that merely mentions memory re-raises
    (r3 weak #5)."""
    sys.path.insert(0, str(REPO))
    try:
        import bench
    finally:
        sys.path.pop(0)
    assert bench._is_oom(MemoryError("host"))
    assert bench._is_oom(RuntimeError(
        "RESOURCE_EXHAUSTED: Out of memory while trying to allocate"))
    assert bench._is_oom(ValueError("Out of memory allocating 8 GiB"))
    assert not bench._is_oom(ValueError("bad memory layout for operand"))
    assert not bench._is_oom(RuntimeError("Allocation tracker mismatch"))
    assert not bench._is_oom(RuntimeError("OOM score adjusted"))


def test_bench_secondary_metrics_stderr():
    """The secondary corpus classes (DNA / periodic) emit one JSON line
    each on STDERR (the driver consumes stdout only), with the routing
    metadata keys the r3 rewrite added."""
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               SA_BENCH_BYTES=str(1 << 16),
               SA_BENCH_BASELINE_BYTES=str(1 << 16),
               SA_BENCH_REPS="1",
               SA_BENCH_SECONDARY="1",
               SA_BENCH_LCP="0")
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")], capture_output=True,
        text=True, timeout=900, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-500:]
    # stdout: still exactly one line (driver contract unchanged).
    assert len([l for l in out.stdout.splitlines()
                if l.strip().startswith("{")]) == 1
    recs = {}
    for line in out.stderr.splitlines():
        if line.strip().startswith("{"):
            r = json.loads(line)
            recs[r["metric"]] = r
    for metric in ("sa_build_dna", "sa_build_repetitive_p1000"):
        assert metric in recs, out.stderr[-800:]
        assert recs[metric]["value"] > 0
        assert recs[metric]["n"] == 1 << 16
