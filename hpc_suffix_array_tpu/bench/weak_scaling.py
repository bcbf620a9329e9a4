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

Both sharded builders are swept separately (mixing them would measure
routing, not scaling): the one-pass carried-keys MSD (production path
at benchmark sizes) and the prefix-doubling loop (the any-skew
fallback). Parity anchor: the reference's own scaling evidence is the
oversubscribed single-node MPI sweep (scripts/benchmark_mpi.py:61,154)
— this proxy is the same idea with real XLA device boundaries.
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
    for builder in ("msd", "doubling"):
        df = weak_scaling_proxy(bytes_per_shard=bytes_per_shard,
                                mesh_sizes=mesh_sizes,
                                results_dir=str(out), builder=builder)
        df = df[df["builder"] == builder].copy()
        frames.append(df)
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
