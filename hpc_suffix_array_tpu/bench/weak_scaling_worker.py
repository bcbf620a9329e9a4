"""Timed worker for the REAL multi-process weak-scaling point.

The in-process sweep (bench/weak_scaling.py) measures collective/seam
overhead on a single-process virtual mesh; this worker adds the piece
that sweep cannot see — a real process boundary with a real coordinator
(`jax.distributed`), per-process-local text feed, and the one-pass MSD
build running as separate OS processes, exactly like the reference's
`mpirun -np P` launch (scripts/benchmark_mpi.py:59-90) but with the
text sharded instead of replicated (src/mpi/main_mpi.c:43-51).

Usage (launched by bench/weak_scaling.py, one invocation per process):

    weak_scaling_worker.py <proc_id> <nprocs> <port> <bytes_per_shard> \
        <devices_per_proc>

n = bytes_per_shard * nprocs * devices_per_proc (weak scaling: work per
device is constant). Each process generates ONLY its local text block
(deterministic seed, sliced), builds via
``build_suffix_array_sharded_big_mp``, and process 0 prints one JSON
line ``{"sa_time": best_s, "P": total_devices, "nprocs": ...}`` after a
warmup run.
"""

import json
import os
import pathlib
import re
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))


def main() -> int:
    proc_id, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    bytes_per_shard, dpp = int(sys.argv[4]), int(sys.argv[5])

    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   os.environ.get("XLA_FLAGS", ""))
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={dpp}").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", None)
    if nprocs > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=nprocs, process_id=proc_id)

    import numpy as np

    from hpc_suffix_array_tpu.bench.harness import _fence_tree
    from hpc_suffix_array_tpu.parallel.bigsort import (
        build_suffix_array_sharded_big_mp, mp_local_geometry)
    from hpc_suffix_array_tpu.parallel.multihost import make_global_mesh

    mesh = make_global_mesh()
    P = int(mesh.devices.size)
    assert P == nprocs * dpp
    n = bytes_per_shard * P

    # Deterministic corpus; each process materializes only its block.
    n_pad, start, stop = mp_local_geometry(n, mesh)
    rng = np.random.default_rng(42)
    alnum = np.frombuffer(
        b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789",
        np.uint8)
    full = alnum[rng.integers(0, 62, n)]        # cheap at proxy sizes;
    pad = np.zeros(n_pad, np.uint8)             # a real deployment reads
    pad[:n] = full                              # its own file block
    local = pad[start:stop]
    del full, pad

    def run():
        _fence_tree(build_suffix_array_sharded_big_mp(local, n, mesh))

    run()                                       # warmup (compile)
    t0 = time.perf_counter()
    run()
    dt = time.perf_counter() - t0
    if proc_id == 0:
        print(json.dumps({"sa_time": dt, "P": P, "nprocs": nprocs,
                          "n": n}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
