"""Wide-index (>int32) build at a REAL wide size: the r5 proof run.

Every prior wide test forced wide_index=True at n <= 2^16; the
auto-enable threshold (parallel/bigsort.py: n_pad >= 2^31 - 1) had
never actually fired and nothing had executed the two-word arithmetic
at a size where it matters.  This script builds n = 2^31 + 2^22 bytes
(~2.004 GiB... past every int32 index) on the 8-device virtual CPU
mesh via build_suffix_array_sharded_big WITHOUT passing wide_index —
asserting the auto-enable fires — and validates the resulting int64
suffix array with a chunked host O(n) validator (the int32 SA-IS
oracle cannot go there; the validator's
permutation + rank-comparison check is a full proof: a unique sorted
permutation IS the suffix array).

Memory: host text 2.0 GiB + int64 sa 16 GiB + validator isa 16 GiB +
chunked temps; device (CPU backend) slabs ~10x n x 4 B during the
build.  Run alone on an idle host.

Result artifact: results/wide_index/wide_real.json (+ .txt summary).
"""

import json
import os
import pathlib
import re
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from hpc_suffix_array_tpu.utils.hostmem import (  # noqa: E402
    disable_hugepage_madvise, keep_host_memory_hot)

disable_hugepage_madvise()
keep_host_memory_hot()

flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
               os.environ.get("XLA_FLAGS", ""))
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NEVER the persistent cache for XLA:CPU (TODO.md: profile-mismatched
# AOT entries sent the dryrun past 33 GB RSS without finishing).

import numpy as np  # noqa: E402

ALNUM = np.frombuffer(
    b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789",
    np.uint8)
CH = 1 << 26


def gen_text(n: int, seed: int = 0xA11CE) -> np.ndarray:
    rng = np.random.default_rng(seed)
    out = np.empty(n, np.uint8)
    for i in range(0, n, CH):
        m = min(CH, n - i)
        out[i:i + m] = ALNUM[rng.integers(0, 62, m).astype(np.uint8)]
    return out


def validate_wide(text: np.ndarray, sa: np.ndarray) -> bool:
    """Chunked host O(n) suffix-array check for int64 indices.

    1. permutation: every index in [0, n) exactly once;
    2. order: for adjacent pairs (a, b): text[a] < text[b], or
       text[a] == text[b] and rank(a+1) < rank(b+1) with rank(n) = -1
       (suffix n is the empty string, smaller than all) — the standard
       O(n) reduction: if the permutation is consistent under its own
       successor ranks, it is sorted."""
    n = len(text)
    seen = np.zeros(n, bool)
    for i in range(0, n, CH):
        blk = sa[i:i + CH]
        if blk.min() < 0 or blk.max() >= n:
            return False
        seen[blk] = True
    if not seen.all():
        return False
    del seen
    isa = np.empty(n, np.int64)
    for i in range(0, n, CH):
        isa[sa[i:i + CH]] = np.arange(i, min(i + CH, n), dtype=np.int64)
    ok = True
    for i in range(0, n - 1, CH):
        a = sa[i:i + CH + 1][:-1] if i + CH < n else sa[i:n - 1]
        b = sa[i + 1:i + 1 + len(a)]
        ta, tb = text[a], text[b]
        if (ta > tb).any():
            return False
        eq = ta == tb
        if eq.any():
            ae, be = a[eq], b[eq]
            ra = np.where(ae + 1 < n, isa[np.minimum(ae + 1, n - 1)], -1)
            rb = np.where(be + 1 < n, isa[np.minimum(be + 1, n - 1)], -1)
            if (ra >= rb).any():
                return False
    return ok


def main() -> None:
    n = (1 << 31) + (1 << 22)
    print(f"n = {n} (2^31 + 2^22); generating...", flush=True)
    t0 = time.perf_counter()
    text = gen_text(n)
    print(f"generated in {time.perf_counter() - t0:.0f}s", flush=True)

    from hpc_suffix_array_tpu.parallel import (
        build_suffix_array_sharded_big, make_mesh)

    mesh = make_mesh(8)
    t0 = time.perf_counter()
    # wide_index NOT passed: the auto-enable must fire (asserted below
    # by the dtype of the result).
    sa = build_suffix_array_sharded_big(text, mesh)
    sa = np.asarray(sa)
    build_s = time.perf_counter() - t0
    assert sa.dtype == np.int64, (
        f"expected the auto-enabled WIDE build (int64 host assembly), "
        f"got {sa.dtype}")
    assert int(sa.max()) >= (1 << 31), (
        "no index past int32 — not a wide-range proof")
    print(f"built in {build_s:.0f}s ({n / build_s / 1e6:.1f} MB/s "
          "aggregate, 8 virtual CPU devices / 4 cores)", flush=True)

    t0 = time.perf_counter()
    ok = validate_wide(text, sa)
    val_s = time.perf_counter() - t0
    print(f"validate_wide: {ok} in {val_s:.0f}s", flush=True)

    out = REPO / "results" / "wide_index"
    out.mkdir(parents=True, exist_ok=True)
    rec = {
        "n": n,
        "n_past_int32": int(sa.max()) - ((1 << 31) - 1),
        "mesh": 8,
        "platform": "cpu_virtual_mesh",
        "build_seconds": round(build_s, 1),
        "aggregate_MBps": round(n / build_s / 1e6, 2),
        "validated": bool(ok),
        "validator": "chunked host O(n) permutation+rank check "
                     "(int32 SA-IS oracle cannot reach this n)",
        "auto_wide_enabled": True,
        "date": "2026-08-20",
    }
    (out / "wide_real.json").write_text(json.dumps(rec, indent=2))
    (out / "wide_real.txt").write_text(
        "Wide-index proof run (r5)\n"
        f"n = {n} = 2^31 + 2^22 bytes, random alnum\n"
        f"build: {build_s:.0f}s on the 8-device virtual CPU mesh "
        "(4 physical cores), wide_index auto-enabled\n"
        f"max SA index: {int(sa.max())} (past int32 by "
        f"{rec['n_past_int32']})\n"
        f"validated: {ok} (chunked host O(n) validator, {val_s:.0f}s)\n")
    assert ok
    print("RECORDED", out / "wide_real.json", flush=True)


if __name__ == "__main__":
    main()
