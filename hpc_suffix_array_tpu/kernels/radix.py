"""Pallas radix-partition building blocks (standalone; not yet wired in).

Groundwork for replacing the per-round `lax.sort` with an LSD radix sort
(TODO.md item 1). This module implements the two per-pass kernels and an
XLA-glued driver:

  1. `digit_histogram` — per-block digit counts, computed in VMEM with
     one-hot compares + reductions (histograms are scatter-bound in
     plain XLA);
  2. exclusive scan over the (blocks, R) count matrix — tiny, plain XLA;
  3. `partition_pass` — stable global partition by digit. Every element's
     destination is its block's digit base plus its stable rank within
     the block, computed densely as sum(one_hot * cumsum(one_hot)) with
     no gathers; the write applies the destination permutation with a
     1-key `lax.sort` for now (the TPU grid being sequential makes
     per-digit masked-window DMA stores race-free — that Pallas write
     path is the next step and the point of this scaffolding).

Numerically validated against np.argsort in interpret mode; performance
work happens on-chip in a later round (see TODO.md for the measured
cost model: 8x16-bit passes must beat ~90 ms at 2^24 to win).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ROWS = 256                  # 32K elements per block
BLOCK = ROWS * LANES
RBITS = 4                   # digit width
R = 1 << RBITS


def _hist_kernel(shift: int, keys_ref, hist_ref):
    """hist_ref[0, d] = count of digit d in this block."""
    d = (keys_ref[:] >> shift) & (R - 1)            # (ROWS, LANES)
    for b in range(R):
        hist_ref[0, b] = jnp.sum((d == b).astype(jnp.int32))


@functools.partial(jax.jit, static_argnums=(1, 2))
def digit_histogram(keys: jnp.ndarray, shift: int,
                    interpret: bool = False) -> jnp.ndarray:
    """(NB, R) per-block digit counts; len(keys) must divide by BLOCK."""
    nb = keys.shape[0] // BLOCK
    return pl.pallas_call(
        functools.partial(_hist_kernel, shift),
        out_shape=jax.ShapeDtypeStruct((nb, R), jnp.int32),
        grid=(nb,),
        in_specs=[pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, R), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(keys.reshape(nb * ROWS, LANES))


def _dest_kernel(shift: int, keys_ref, bases_ref, dest_ref):
    """Global stable destination for every element of the block.

    dest[i] = bases[digit_i] + (# of earlier elements in this block with
    the same digit). Dense formulation: one-hot O (flat, R), exclusive
    cumsum along the flattened order, row-select by multiply-sum.
    """
    d = ((keys_ref[:] >> shift) & (R - 1)).reshape(-1)        # (B,)
    bases = bases_ref[0]                                       # (R,)
    total = jnp.zeros((R,), jnp.int32)
    out = jnp.zeros(d.shape, jnp.int32)
    # process in sublane tiles to bound the one-hot working set
    T = 8 * LANES
    nt = d.shape[0] // T
    d2 = d.reshape(nt, T)

    def body(t, carry):
        total, out = carry
        dt = d2[t]                                             # (T,)
        oh = (dt[:, None] == lax.broadcasted_iota(
            jnp.int32, (T, R), 1)).astype(jnp.int32)           # (T, R)
        pre = jnp.cumsum(oh, axis=0) - oh                      # exclusive
        rank = jnp.sum(oh * (pre + total[None, :]), axis=1)    # (T,)
        base = jnp.sum(oh * bases[None, :], axis=1)
        out = lax.dynamic_update_slice(out, base + rank, (t * T,))
        return total + jnp.sum(oh, axis=0), out

    _, out = lax.fori_loop(0, nt, body, (total, out))
    dest_ref[:] = out.reshape(keys_ref.shape)


@functools.partial(jax.jit, static_argnums=(2, 3))
def partition_dest(keys: jnp.ndarray, bases: jnp.ndarray, shift: int,
                   interpret: bool = False) -> jnp.ndarray:
    """Stable global destination index for every element (one digit pass).

    ``bases``: (NB, R) global start offset of (block, digit) groups.
    """
    nb = keys.shape[0] // BLOCK
    out = pl.pallas_call(
        functools.partial(_dest_kernel, shift),
        out_shape=jax.ShapeDtypeStruct((nb * ROWS, LANES), jnp.int32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(keys.reshape(nb * ROWS, LANES), bases)
    return out.reshape(-1)


def radix_pass(keys: jnp.ndarray, payload: jnp.ndarray, shift: int,
               interpret: bool = False):
    """One stable LSD pass by the 4-bit digit at ``shift``.

    Requires len % BLOCK == 0. The permutation application is currently a
    1-key sort (see module docstring).
    """
    hist = digit_histogram(keys, shift, interpret)
    nb = hist.shape[0]
    totals = hist.sum(axis=0)                                  # (R,)
    digit_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(totals)[:-1]])
    within = jnp.cumsum(hist, axis=0) - hist                   # excl per col
    bases = digit_starts[None, :] + within                     # (NB, R)
    dest = partition_dest(keys, bases, shift, interpret)
    _, k2, p2 = lax.sort((dest, keys, payload), num_keys=1)
    return k2, p2


def radix_sort(keys: jnp.ndarray, payload: jnp.ndarray, key_bits: int = 32,
               interpret: bool = False):
    """Full LSD radix sort (stable) over ``key_bits`` bits."""
    k, p = keys, payload
    for shift in range(0, key_bits, RBITS):
        k, p = radix_pass(k, p, shift, interpret)
    return k, p
