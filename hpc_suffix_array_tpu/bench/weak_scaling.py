"""Weak-scaling evidence runner (the BASELINE.md >=70% north star's proxy).

Real multi-chip hardware is unavailable in this environment (one v5e
chip behind a tunnel), so the agreed stand-in is the virtual CPU mesh:
``XLA_FLAGS=--xla_force_host_platform_device_count=P`` gives P real XLA
devices whose collectives run the same program the TPU mesh would — the
curve tracks *algorithmic* overhead (collective hops, seam exchanges,
per-shard pad waste), not ICI bandwidth, and every artifact row is
labeled ``weak_proxy_cpu_mesh`` so nobody mistakes it for hardware
scaling. Run:

    python -m hpc_suffix_array_tpu.bench.weak_scaling [bytes_per_shard]

Writes, under results/weak_scaling/ (committed as review evidence):
  * weak_scaling.csv — per (builder, P) rows with both efficiency
    formulas (raw t1/tP and shared-core-normalized P*t1/tP — see
    bench.harness.weak_scaling_proxy for why both);
  * weak_scaling.png — efficiency curves per builder vs the 70% bar;
  * weak_scaling.txt — the numbers a reviewer reads without running.

Each sharded build variant is swept separately (mixing them would
measure routing, not scaling): the one-pass carried-keys MSD
(production path at benchmark sizes), its fused SA+LCP form
(``msd_lcp``), the forced wide-index device-columns form (``msd_wide``
— the >=4 GiB ladder config's arithmetic), and the prefix-doubling
loop (the any-skew fallback). A final ``msd_2proc`` point runs the
one-pass MSD as TWO REAL OS PROCESSES under `jax.distributed`
(weak_scaling_worker.py) — a real coordinator and per-process-local
text feed, the launch shape of the reference's `mpirun -np 2`. Parity
anchor: the reference's own scaling evidence is the oversubscribed
single-node MPI sweep (scripts/benchmark_mpi.py:61,154) — this proxy
is the same idea with real XLA device boundaries.
"""

from __future__ import annotations

import os
import pathlib
import re
import sys


def _force_cpu_mesh(n_devices: int) -> None:
    """In-process CPU mesh (the sitecustomize axon plugin wins over
    env-only JAX_PLATFORMS — same dance as __graft_entry__)."""
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   os.environ.get("XLA_FLAGS", ""))
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    # The persistent compile cache is pathological for XLA:CPU programs
    # on this VM class (see .claude/skills/verify): always compile fresh.
    jax.config.update("jax_compilation_cache_dir", None)


def _distributed_point(bytes_per_shard: int):
    """Real 2-process `jax.distributed` weak-scaling point (builder
    ``msd_2proc``): worker processes with a real coordinator, each
    feeding only its local text block to the one-pass MSD `_mp` build —
    the same launch shape as the reference's `mpirun -np 2`
    (scripts/benchmark_mpi.py:59-90), text sharded instead of
    replicated. t1 = the SAME `_mp` code path at 1 process x 1 device;
    tP at 2 processes x 2 devices each (P=4 <= the host's cores).
    Returns a DataFrame of two rows, or None if a worker fails."""
    import json
    import socket
    import subprocess
    import sys as _sys

    worker = pathlib.Path(__file__).with_name("weak_scaling_worker.py")

    def launch(nprocs: int, dpp: int):
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
        procs = [subprocess.Popen(
            [_sys.executable, str(worker), str(i), str(nprocs), str(port),
             str(bytes_per_shard), str(dpp)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env) for i in range(nprocs)]
        outs = [p.communicate(timeout=1200) for p in procs]
        for p, (so, se) in zip(procs, outs):
            if p.returncode != 0:
                print(f"weak-scaling[msd_2proc] worker failed:\n{se[-2000:]}")
                return None
        return json.loads(outs[0][0].strip().splitlines()[-1])

    r1 = launch(1, 1)
    rP = launch(2, 2)
    if r1 is None or rP is None:
        return None
    import pandas as pd
    t1, tP, P = r1["sa_time"], rP["sa_time"], rP["P"]
    rows = []
    for r, p_ in ((r1, 1), (rP, P)):
        dt = r["sa_time"]
        rows.append({
            "file": f"weak_random_{p_}shard", "size_bytes": r["n"],
            "size_mb": r["n"] / (1 << 20), "backend": f"tpu_sharded_{p_}",
            "platform": "cpu", "processes": p_, "time_seconds": dt,
            "throughput_mb_s": r["n"] / (1 << 20) / dt if dt > 0 else 0,
            "sa_time": dt, "total_time": dt, "lcp_time": 0.0,
            "lrs_time": 0.0, "compile_time": 0.0, "success": True,
            "error": "", "scaling_mode": "weak_dist_2proc_cpu_mesh",
            "builder": "msd_2proc",
            "weak_efficiency": t1 / dt if dt > 0 else 0.0,
            "weak_efficiency_normalized": p_ * t1 / dt if dt > 0 else 0.0,
        })
    print(f"weak-scaling[msd_2proc] P={P} (2 procs x {P // 2} dev) "
          f"t1={t1:.3f}s tP={tP:.3f}s eff_norm={P * t1 / tP:.2f}")
    return pd.DataFrame(rows)


def main(bytes_per_shard: int = 1 << 21,
         mesh_sizes=(1, 2, 4, 8),
         out_dir: str = "results/weak_scaling") -> None:
    _force_cpu_mesh(max(mesh_sizes))
    from hpc_suffix_array_tpu.utils.hostmem import release_host_memory

    release_host_memory()           # XLA:CPU churn vs the malloc pin

    import pandas as pd

    from hpc_suffix_array_tpu.bench.harness import weak_scaling_proxy

    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    frames = []
    for builder in ("msd", "msd_lcp", "msd_wide", "doubling"):
        df = weak_scaling_proxy(bytes_per_shard=bytes_per_shard,
                                mesh_sizes=mesh_sizes,
                                results_dir=str(out), builder=builder)
        df = df[df["builder"] == builder].copy()
        frames.append(df)
    dist = _distributed_point(bytes_per_shard)
    if dist is not None:
        frames.append(dist)
    all_df = pd.concat(frames, ignore_index=True)
    csv_path = out / "weak_scaling.csv"
    all_df.to_csv(csv_path, index=False)

    # Chart (same matplotlib conventions as viz/charts.py).
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 5.5))
    for builder, g in all_df.groupby("builder"):
        g = g.sort_values("processes")
        ax.plot(g.processes, 100 * g.weak_efficiency_normalized, "o-",
                label=f"{builder} builder (normalized P*t1/tP)")
    ax.axhline(70, color="tab:red", ls="--", lw=1,
               label="70% north star (BASELINE.md)")
    ncores = os.cpu_count() or 1
    for p_ in mesh_sizes:
        if p_ > ncores:
            ax.axvspan(ncores * 1.2, max(mesh_sizes) * 1.1, alpha=0.08,
                       color="gray")
            ax.text(max(mesh_sizes), 8,
                    f"P > {ncores} physical cores:\nalso pays "
                    "oversubscription", ha="right", fontsize=8,
                    color="gray")
            break
    ax.set_xscale("log", base=2)
    ax.set_xticks(list(mesh_sizes))
    ax.set_xticklabels([str(p) for p in mesh_sizes])
    ax.set_xlabel("mesh devices P (virtual CPU mesh)")
    ax.set_ylabel("weak-scaling efficiency %  (P*t1/tP, n = P x "
                  f"{bytes_per_shard // (1 << 20)} MiB)")
    ax.set_ylim(0, 115)
    ax.grid(True, alpha=0.3)
    ax.legend()
    ax.set_title("Weak scaling (CPU-mesh proxy; algorithmic overhead "
                 "only, not ICI)")
    fig.tight_layout()
    png_path = out / "weak_scaling.png"
    fig.savefig(png_path, dpi=120)
    plt.close(fig)

    lines = ["WEAK-SCALING PROXY (virtual CPU mesh; see module docstring)",
             f"bytes/shard: {bytes_per_shard} "
             f"({bytes_per_shard / (1 << 20):.0f} MiB)", ""]
    for builder, g in all_df.groupby("builder"):
        g = g.sort_values("processes")
        lines.append(f"[{builder}]")
        for _, r in g.iterrows():
            lines.append(
                f"  P={int(r.processes)}  n={int(r.size_bytes)}  "
                f"sa_time={r.sa_time:.3f}s  "
                f"eff_norm(P*t1/tP)={100 * r.weak_efficiency_normalized:.1f}%"
                f"  eff_raw(t1/tP)={100 * r.weak_efficiency:.1f}%")
        lines.append("")
    ncores = os.cpu_count() or 1
    lines.append(
        f"NOTE: virtual mesh on {ncores} physical cores — all P devices\n"
        "share the same silicon, so eff_raw ~ 1/P even at zero overhead;\n"
        "eff_norm is the algorithmic-overhead proxy to hold against the\n"
        f"70% bar, and P > {ncores} points additionally pay core\n"
        "oversubscription. Real ICI scaling needs real chips.")
    txt_path = out / "weak_scaling.txt"
    txt_path.write_text("\n".join(lines))
    print(f"wrote {csv_path}, {png_path}, {txt_path}")
    print("\n".join(lines))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 21)
