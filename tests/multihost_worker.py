"""Worker process for the real 2-process multi-host test.

Each process owns 4 virtual CPU devices (8 global), initializes the JAX
distributed service, feeds ONLY its host-local block of the text via
``put_sharded_text`` (no process ever holds a replicated device copy), and
runs the sharded build over the global mesh. Local output shards are
checked against the SA-IS oracle slice.

This is the TPU-native analog of the reference's mpirun launch
(scripts/benchmark_mpi.py:59-90): real process boundary, real
coordinator, per-host data feed. Launched by tests/test_multihost.py.

Usage: multihost_worker.py <process_id> <num_processes> <port>
"""

import os
import pathlib
import sys

# python puts the script's dir (tests/) on sys.path, not the repo root.
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> int:
    proc_id, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=proc_id)
    assert jax.process_count() == nprocs
    assert jax.local_device_count() == 4
    assert jax.device_count() == 4 * nprocs

    import jax.numpy as jnp
    import numpy as np

    from hpc_suffix_array_tpu.core.oracle import suffix_array_oracle
    from hpc_suffix_array_tpu.core.suffix_array import (
        alphabet_remap, bucket_size)
    from hpc_suffix_array_tpu.parallel.doubling import (
        suffix_array_from_bytes_sharded)
    from hpc_suffix_array_tpu.parallel.multihost import (
        host_local_shard, make_global_mesh, put_sharded_text)

    # Mixed corpus: random head + periodic tail (skewed ranks stress the
    # distributed sort exactly like the reference's repetitive fixtures).
    rng = np.random.default_rng(7)
    text = np.concatenate([
        rng.integers(0, 256, 30_000).astype(np.uint8),
        np.tile(np.frombuffer(b"ab", np.uint8), 10_000),
    ])
    n = len(text)

    mesh = make_global_mesh()
    n_shards = int(mesh.devices.size)
    assert n_shards == 4 * nprocs
    n_pad = bucket_size(n, multiple_of=n_shards * 128)
    text_pad = np.zeros(n_pad, np.uint8)
    text_pad[:n] = text
    remap, bits, h0 = alphabet_remap(text)

    # Per-host feed: only this host's block leaves host memory.
    start, stop = host_local_shard(n_pad, mesh)
    assert stop - start == n_pad // nprocs
    text_d = put_sharded_text(text_pad, mesh)

    sa, _rank, rounds = suffix_array_from_bytes_sharded(mesh, bits, h0)(
        text_d, jnp.asarray(remap), jnp.int32(n))

    # The kernel's contract covers the REAL tail slice [n_pad-n, n_pad)
    # (pad suffixes sort first but their internal order is unspecified -
    # build_suffix_array_sharded slices them off). Check every local
    # shard's overlap with the real region against the SA-IS oracle.
    expected_real = np.asarray(suffix_array_oracle(text.tobytes()), np.int32)
    pad = n_pad - n
    checked = 0
    for shard in sa.addressable_shards:
        lo, hi = shard.index[0].start or 0, shard.index[0].stop
        got = np.asarray(shard.data)
        if hi <= pad:
            continue
        cut = max(pad - lo, 0)
        want = expected_real[lo + cut - pad:hi - pad]
        assert np.array_equal(got[cut:], want), (
            f"proc {proc_id} shard [{lo},{hi}) mismatch")
        checked += hi - (lo + cut)
    assert checked > 0

    print(f"MULTIHOST_OK proc={proc_id} rounds={int(rounds)} "
          f"shards={len(sa.addressable_shards)}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
