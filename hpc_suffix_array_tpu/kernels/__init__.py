"""Pallas TPU kernels for the hot ops (SURVEY §2.9 native obligations).

Each kernel has an XLA fallback; `available()` gates usage so CPU tests
and interpret-mode debugging keep working everywhere.

A complete Pallas LSD radix pass lived here through round 2; it is
byte-exact on hardware but measured ~5x slower than `lax.sort` (VPU
starvation in the serialized run merge) and was retired to
``experiments/radix_write.py`` with its full verdict — the package tree
holds live code only.
"""

from hpc_suffix_array_tpu.kernels.pack import pack_ranks_pallas

__all__ = ["pack_ranks_pallas"]
