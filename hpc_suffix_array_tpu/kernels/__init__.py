"""Pallas TPU kernels for the hot ops (SURVEY §2.9 native obligations).

Each kernel has an XLA fallback; `available()` gates usage so CPU tests
and interpret-mode debugging keep working everywhere.
"""

from hpc_suffix_array_tpu.kernels.pack import pack_ranks_pallas

__all__ = ["pack_ranks_pallas"]
