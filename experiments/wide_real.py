"""Wide-index (>int32 machinery) at REAL size: the r5 proof + limits.

Every prior wide test forced wide_index=True at n <= 2^16.  This
script executes the two-word index arithmetic at n = 2^29 (0.5 GiB,
8192x the old test sizes) on the 8-device virtual CPU mesh and checks
the int64 result BYTE-EXACT against the SA-IS oracle.

Why not n > 2^31 (the auto-enable size)?  Measured on this host
(2026-08-20): the wide sharded build peaks at **242.7 B/char** on the
virtual CPU mesh — the proxy holds ALL P shards of every sort column,
the block-bitonic stage temps, and XLA:CPU's collective copies in ONE
address space.  At n_pad = 2^31 + 2^28 that is ~587 GB; two attempts
at n = 2^31 + 2^22 were OOM-killed (127 GB RSS; then ~175 GB with an
80 GB swap cushion).  This is a proxy-host limit, not a design limit:
on the real >= 4 GiB multi-host ladder config each chip holds only its
own shard — ~(4 sort columns x 4 B x ~2.5 live copies) x n/P + the
text shard ~= 40 B/char x n/P, i.e. ~11 GB/chip at n = 4.3e9 with
P = 16, inside a v5e's 16 GB HBM.  The auto-enable threshold itself
(n_pad >= 2^31 - 1) is unit-tested (tests/test_parallel_bigsort.py).

Artifact: results/wide_index/wide_real.{json,txt}.

Usage: python experiments/wide_real.py [log2_n]    (default 29)
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
    disable_hugepage_madvise)

disable_hugepage_madvise()

flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
               os.environ.get("XLA_FLAGS", ""))
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# No persistent compile cache for XLA:CPU (TODO.md: profile-mismatched
# AOT entries make the load/recompile cycle run away).

import numpy as np  # noqa: E402

ALNUM = np.frombuffer(
    b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789",
    np.uint8)


def peak_tracker():
    import threading

    peak = [0]

    def poll():
        while True:
            with open("/proc/self/status") as f:
                s = f.read()
            rss = int(re.search(r"VmRSS:\s+(\d+)", s).group(1))
            sw = int(re.search(r"VmSwap:\s+(\d+)", s).group(1))
            peak[0] = max(peak[0], rss + sw)
            time.sleep(0.5)

    threading.Thread(target=poll, daemon=True).start()
    return peak


def main() -> None:
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 29
    n = 1 << lg
    peak = peak_tracker()
    rng = np.random.default_rng(1)
    text = ALNUM[rng.integers(0, 62, n).astype(np.int64)]

    from hpc_suffix_array_tpu.parallel import (
        build_suffix_array_sharded_big, make_mesh)

    mesh = make_mesh(8)
    t0 = time.perf_counter()
    sa = np.asarray(build_suffix_array_sharded_big(text, mesh,
                                                   wide_index=True))
    build_s = time.perf_counter() - t0
    assert sa.dtype == np.int64, sa.dtype
    print(f"n=2^{lg} wide build: {build_s:.0f}s, peak "
          f"{peak[0] / 1048576:.1f} GiB "
          f"({peak[0] * 1024 / n:.1f} B/char)", flush=True)

    t0 = time.perf_counter()
    from hpc_suffix_array_tpu.native import sa_build
    ref = sa_build(text)
    exact = bool(np.array_equal(sa, ref.astype(np.int64)))
    val_s = time.perf_counter() - t0
    print(f"SA-IS oracle byte-exact: {exact} ({val_s:.0f}s)", flush=True)
    assert exact

    out = REPO / "results" / "wide_index"
    out.mkdir(parents=True, exist_ok=True)
    rec = {
        "n": n,
        "mesh": 8,
        "platform": "cpu_virtual_mesh",
        "build_seconds": round(build_s, 1),
        "peak_bytes_per_char": round(peak[0] * 1024 / n, 1),
        "oracle_exact": exact,
        "scale_vs_prior_wide_tests": n // (1 << 16),
        "auto_enable_attempts": [
            {"n": (1 << 31) + (1 << 22), "result": "OOM at 127 GB RSS"},
            {"n": (1 << 31) + (1 << 22),
             "result": "OOM at ~175 GB with an 80 GB swap cushion"},
        ],
        "projected_need_at_2p31": "~587 GB on the one-address-space "
                                  "proxy (242.7 B/char measured)",
        "real_hardware_math": "per-chip ~40 B/char x n/P: 4.3 GB text "
                              "at P=16 => ~11 GB/chip, fits v5e 16 GB",
        "date": "2026-08-20",
    }
    (out / "wide_real.json").write_text(json.dumps(rec, indent=2))
    (out / "wide_real.txt").write_text(
        "Wide-index (two-word >int32 machinery) real-size run (r5)\n"
        f"n = 2^{lg} random alnum, 8-device virtual CPU mesh, "
        "wide_index=True\n"
        f"build {build_s:.0f}s; int64 output BYTE-EXACT vs the SA-IS "
        f"oracle ({val_s:.0f}s)\n"
        f"peak memory {peak[0] / 1048576:.1f} GiB = "
        f"{peak[0] * 1024 / n:.1f} B/char on the proxy (all shards + "
        "XLA:CPU collective copies share one address space)\n\n"
        "Auto-enable-size attempts (n = 2^31 + 2^22): OOM-killed at\n"
        "127 GB RSS, then at ~175 GB with an 80 GB swap cushion —\n"
        "projected ~587 GB needed on this proxy. Real multi-host\n"
        "hardware holds n/P per chip (~11 GB/chip at 4 GiB, P=16).\n"
        "The auto-enable predicate (n_pad >= 2^31 - 1) is unit-tested.\n")
    print("RECORDED", out / "wide_real.json", flush=True)


if __name__ == "__main__":
    main()
