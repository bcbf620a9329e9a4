"""utils: profiling timers and multi-host mesh helpers."""

import numpy as np
import pytest

from hpc_suffix_array_tpu.utils.profiling import PhaseTimings, phase_timer


def test_phase_timer_accumulates():
    import jax.numpy as jnp

    t = PhaseTimings()
    with phase_timer(t, "alpha") as out:
        out["fence"] = jnp.arange(10).sum()
    with phase_timer(t, "alpha"):
        pass
    with phase_timer(t, "beta"):
        pass
    assert set(t) == {"alpha", "beta"}
    assert all(v >= 0 for v in t.values())
    report = t.report()
    assert "alpha" in report and "total" in report


def test_multihost_single_process(rng):
    from hpc_suffix_array_tpu.parallel.multihost import (
        host_local_shard, initialize_distributed, make_global_mesh,
        put_sharded_text)

    initialize_distributed()            # no-op single process
    mesh = make_global_mesh()
    assert mesh.devices.size == 8
    start, stop = host_local_shard(8 * 256, mesh)
    assert (start, stop) == (0, 8 * 256)
    arr = rng.integers(0, 256, 8 * 256, dtype=np.uint8)
    g = put_sharded_text(arr, mesh)
    assert np.array_equal(np.asarray(g), arr)


def test_multihost_feeds_sharded_build(rng):
    """End to end: global array staging -> sharded suffix array."""
    from hpc_suffix_array_tpu.core.oracle import suffix_array_oracle
    from hpc_suffix_array_tpu.parallel import (
        build_suffix_array_sharded, make_mesh)

    mesh = make_mesh(8)
    text = rng.integers(0, 16, 4096, dtype=np.uint8)
    sa = np.asarray(build_suffix_array_sharded(text, mesh))
    assert np.array_equal(sa, suffix_array_oracle(text.tobytes()))
