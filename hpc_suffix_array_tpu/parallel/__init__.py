"""Distributed (multi-device / multi-host) execution.

TPU-native replacement for the reference MPI backend
(src/mpi/manber_myers_mpi.c, src/mpi/main_mpi.c). Where the reference
gathers all suffix records to rank 0 each round and re-sorts them serially
(manber_myers_mpi.c:111-128), this package keeps every array block-sharded
over a `jax.sharding.Mesh` axis and sorts with a distributed block-bitonic
compare-split network over `ppermute` — no master, no replicated state,
O(n/P) memory per device.
"""

from hpc_suffix_array_tpu.parallel.mesh import make_mesh, sequence_sharding
from hpc_suffix_array_tpu.parallel.doubling import (
    build_suffix_array_sharded,
    suffix_array_kernel_sharded,
)
from hpc_suffix_array_tpu.parallel.bigsort import (
    build_suffix_array_sharded_big,
    build_suffix_array_sharded_big_mp,
    mp_local_geometry,
)
from hpc_suffix_array_tpu.parallel.lcp import build_lcp_array_sharded
from hpc_suffix_array_tpu.parallel.validate import is_valid_suffix_array_sharded

__all__ = [
    "make_mesh",
    "sequence_sharding",
    "build_suffix_array_sharded",
    "build_suffix_array_sharded_big",
    "build_suffix_array_sharded_big_mp",
    "mp_local_geometry",
    "suffix_array_kernel_sharded",
    "build_lcp_array_sharded",
    "is_valid_suffix_array_sharded",
]
