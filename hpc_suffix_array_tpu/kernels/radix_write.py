"""Pallas radix write path: block digit sort + global run placement.

Completes half of the radix-pass design of kernels/radix.py (TODO.md #1)
with no dynamic-length DMA and no scatter:

  * each 1K tile is sorted by its 4-bit digit with a one-hot destination
    + permutation-matrix matmul apply (exact through hi/lo 16-bit f32
    splits: every output row has exactly one product term);
  * the per-tile digit runs merge into block runs via fixed-length
    MASKED stores at dynamic VMEM offsets (`pltpu.store` with a length
    mask) — padding never lands, so blocks stay exactly (BLOCK,);
  * emits the block-sorted records plus the (NB, R) histogram that the
    global placement pass (kernel B, round 2: digit-major sequential
    run copies with quantum padding) consumes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
TILE = 8 * LANES            # 1024 elements per permutation tile
TILES = 32                  # tiles per block
BLOCK = TILE * TILES        # 32K elements per block
RBITS = 4
R = 1 << RBITS


def _permute_tile(dest, cols):
    """out[dest[j], c] = cols[j, c] for a (TILE,) permutation, via MXU.

    Exact for int32 in [0, 2^31): the one-hot indicator gives each output
    row exactly one product, and each 16-bit half fits f32 exactly.
    """
    oh = (dest[None, :] == lax.broadcasted_iota(
        jnp.int32, (TILE, TILE), 0)).astype(jnp.float32)      # (out, in)
    lo = (cols & 0xFFFF).astype(jnp.float32)
    hi = (cols >> 16).astype(jnp.float32)
    out_lo = jnp.dot(oh, lo, preferred_element_type=jnp.float32)
    out_hi = jnp.dot(oh, hi, preferred_element_type=jnp.float32)
    return (out_hi.astype(jnp.int32) << 16) | out_lo.astype(jnp.int32)


def _block_sort_kernel(shift: int, keys_ref, pay_ref, out_k_ref, out_p_ref,
                       hist_ref, scratch_k, scratch_p):
    b_id = pl.program_id(0)
    """Stable 4-bit-digit sort of one 32K block (see module docstring)."""
    keys = keys_ref[:].reshape(TILES, TILE)
    pays = pay_ref[:].reshape(TILES, TILE)
    digits = (keys >> shift) & (R - 1)                        # (T, TILE)

    oh = (digits[:, :, None] == lax.broadcasted_iota(
        jnp.int32, (TILES, TILE, R), 2)).astype(jnp.int32)
    tile_hist = jnp.sum(oh, axis=1)                           # (T, R)
    pre = jnp.cumsum(oh, axis=1) - oh                         # excl in tile
    tile_starts = jnp.cumsum(tile_hist, axis=1) - tile_hist   # (T, R)
    dest_in_tile = jnp.sum(oh * (tile_starts[:, None, :] + pre), axis=2)

    # Stage 1: tile-sort via MXU permutation, into scratch.
    for t in range(TILES):
        cols = jnp.stack([keys[t], pays[t]], axis=1)          # (TILE, 2)
        sorted_cols = _permute_tile(dest_in_tile[t], cols)
        scratch_k[t, :TILE] = sorted_cols[:, 0]
        scratch_p[t, :TILE] = sorted_cols[:, 1]

    # Stage 2: merge tile runs into block runs with masked fixed-length
    # stores at dynamic offsets (only `count` lanes actually land).
    block_hist = jnp.sum(tile_hist, axis=0)                   # (R,)
    block_starts = jnp.cumsum(block_hist) - block_hist        # (R,)
    seg_iota = lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)[:, 0]
    zeros = jnp.zeros((TILE,), jnp.int32)
    for d in range(R):
        cursor = block_starts[d]
        for t in range(TILES):
            src = tile_starts[t, d]
            count = tile_hist[t, d]
            # scratch rows are 2*TILE wide so this never clamps
            # (dynamic_slice clamps start to size - slice_size).
            seg_k = lax.dynamic_slice(scratch_k[t, :], (src,), (TILE,))
            seg_p = lax.dynamic_slice(scratch_p[t, :], (src,), (TILE,))
            # Keep the store window inside the block ref: clamp the
            # window start and shift the segment to compensate (the
            # hardware would silently clamp pl.ds and corrupt offsets;
            # cursor + count <= BLOCK guarantees sh + count <= TILE).
            off = jnp.minimum(cursor, BLOCK - TILE)
            sh = cursor - off
            seg_k = lax.dynamic_slice(
                jnp.concatenate([zeros, seg_k]), (TILE - sh,), (TILE,))
            seg_p = lax.dynamic_slice(
                jnp.concatenate([zeros, seg_p]), (TILE - sh,), (TILE,))
            mask = (seg_iota >= sh) & (seg_iota < sh + count)
            pltpu.store(out_k_ref.at[pl.ds(off, TILE)], seg_k, mask=mask)
            pltpu.store(out_p_ref.at[pl.ds(off, TILE)], seg_p, mask=mask)
            cursor = cursor + count
    # hist rows are 128 wide for TPU tiling; only the first R are real.
    hist_ref[b_id, :] = jnp.concatenate(
        [block_hist, jnp.zeros((LANES - R,), jnp.int32)])


@functools.partial(jax.jit, static_argnums=(2, 3))
def block_digit_sort(keys: jnp.ndarray, payload: jnp.ndarray, shift: int,
                     interpret: bool = False):
    """Per-block stable sort by the digit at ``shift``. len % BLOCK == 0.

    Returns (sorted_keys, sorted_payload, hist): each BLOCK segment of
    the outputs is digit-sorted; hist is the (NB, R) per-block counts.
    """
    nb = keys.shape[0] // BLOCK
    out_k, out_p, hist = pl.pallas_call(
        functools.partial(_block_sort_kernel, shift),
        out_shape=(
            jax.ShapeDtypeStruct((nb * BLOCK,), jnp.int32),
            jax.ShapeDtypeStruct((nb * BLOCK,), jnp.int32),
            jax.ShapeDtypeStruct((nb, LANES), jnp.int32),
        ),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
            # whole-array spec: each step writes only its own row
            pl.BlockSpec((nb, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((TILES, 2 * TILE), jnp.int32),
            pltpu.VMEM((TILES, 2 * TILE), jnp.int32),
        ],
        interpret=interpret,
    )(keys, payload)
    return out_k, out_p, hist[:, :R]


QUANT = TILE                 # DMA copy quantum for run placement


def _place_kernel(src_starts_ref, dst_starts_ref, lens_ref,
                  k_ref, p_ref, out_k_ref, out_p_ref,
                  vk, vp, sem_k, sem_p):
    """Copy one (digit, block) run staging->output in QUANT chunks.

    Grid is (R, NB) digit-major and TPU grid steps run sequentially, so
    each chunk's tail padding (up to QUANT-1 elements of the next run's
    data, re-read from staging) lands where a later step rewrites it;
    the output carries one QUANT of tail padding for the final run.
    """
    d = pl.program_id(0)
    b = pl.program_id(1)
    i = d * pl.num_programs(1) + b
    src0 = src_starts_ref[i]
    dst0 = dst_starts_ref[i]
    length = lens_ref[i]
    chunks = (length + QUANT - 1) // QUANT

    def body(c, _):
        off = c * QUANT
        cp_k = pltpu.make_async_copy(
            k_ref.at[pl.ds(src0 + off, QUANT)], vk, sem_k)
        cp_p = pltpu.make_async_copy(
            p_ref.at[pl.ds(src0 + off, QUANT)], vp, sem_p)
        cp_k.start(); cp_p.start(); cp_k.wait(); cp_p.wait()
        wk = pltpu.make_async_copy(
            vk, out_k_ref.at[pl.ds(dst0 + off, QUANT)], sem_k)
        wp = pltpu.make_async_copy(
            vp, out_p_ref.at[pl.ds(dst0 + off, QUANT)], sem_p)
        wk.start(); wp.start(); wk.wait(); wp.wait()
        return 0

    lax.fori_loop(0, chunks, body, 0)


@functools.partial(jax.jit, static_argnums=(5,))
def place_runs(sorted_k, sorted_p, src_starts, dst_starts, lens,
               interpret: bool = False):
    """Scatter block runs to their global offsets (see _place_kernel).

    src/dst/lens are (R*NB,) int32 in digit-major order; staging arrays
    carry QUANT tail padding; the returned arrays carry QUANT tail
    padding to absorb the final spill.
    """
    n = sorted_k.shape[0] - QUANT          # staging includes QUANT pad
    rnb = src_starts.shape[0]
    nb = rnb // R
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(R, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((QUANT,), jnp.int32),
            pltpu.VMEM((QUANT,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _place_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n + QUANT,), jnp.int32),
            jax.ShapeDtypeStruct((n + QUANT,), jnp.int32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(src_starts, dst_starts, lens, sorted_k, sorted_p)


def radix_pass_dma(keys, payload, shift: int, interpret: bool = False):
    """One full stable LSD pass: kernel A + scan glue + kernel B.

    len(keys) % BLOCK == 0. Returns (keys, payload) stably partitioned
    by the 4-bit digit at ``shift``.
    """
    n = keys.shape[0]
    nb = n // BLOCK
    bk, bp, hist = block_digit_sort(keys, payload, shift, interpret)

    totals = hist.sum(axis=0)                                # (R,)
    digit_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(totals)[:-1]])
    within = jnp.cumsum(hist, axis=0) - hist                 # (NB, R) excl
    dst = (digit_starts[None, :] + within).T.reshape(-1)     # digit-major
    block_within = jnp.cumsum(hist, axis=1) - hist           # start in block
    src = (jnp.arange(nb, dtype=jnp.int32)[:, None] * BLOCK
           + block_within).T.reshape(-1)
    lens = hist.T.reshape(-1)

    bk = jnp.concatenate([bk, jnp.zeros((QUANT,), jnp.int32)])
    bp = jnp.concatenate([bp, jnp.zeros((QUANT,), jnp.int32)])
    ok, op = place_runs(bk, bp, src, dst, lens, interpret)
    return ok[:n], op[:n]
