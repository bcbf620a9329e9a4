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
