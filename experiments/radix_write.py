"""Pallas radix pass: block digit sort + global run placement.

FINAL VERDICT (r2, measured on v5e): a documented dead end in its
current form, retained as the reference implementation of the approach.
The pass is byte-exact on hardware, but kernel A costs ~390 ms at 2^24
vs 74 ms for a full `lax.sort` — the fori_loop-serialized run merge
(512 sequential roll/blend steps) starves the VPU, and a competitive
data-parallel merge needs per-lane variable shifts TPU vector units do
not have. With the r2 finding that `lax.sort` programs are also the
cheapest class to compile through the TPU tunnel (TODO.md "remote
compile economics"), the production sort paths stay on `lax.sort`; an
earlier scaffolding variant of the pass glue (kernels/radix.py, whose
write step fell back to a 1-key lax.sort) was retired in r2.

Design (no dynamic-length DMA, no scatter):

  * `block_digit_sort` (kernel A): each 1K tile is sorted by its 4-bit
    digit with a one-hot destination + permutation-matrix matmul apply
    (exact through hi/lo 16-bit f32 splits: every output row has exactly
    one product term); per-tile digit runs merge into block runs via
    fixed-length MASKED stores at dynamic VMEM offsets. All prefix sums
    are explicit shift-add scans (`pltpu.roll` lane/sublane composition)
    because Mosaic has no cumsum lowering.
  * `place_runs` (kernel B): digit-major (R, NB) grid copies each
    (block, digit) run from staging to its final global offset in
    QUANT-sized DMA chunks; TPU grid steps execute sequentially, so each
    chunk's tail padding lands where a later step rewrites it (outputs
    carry one QUANT of tail padding).

`radix_pass_dma` = A + XLA scan glue + B: one full stable LSD pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBL = 8
TILE = SUBL * LANES         # 1024 elements per permutation tile
TILES = 32                  # tiles per block
BLOCK = TILE * TILES        # 32K elements per block
RBITS = 4
R = 1 << RBITS


def _flat_shift_right(x, s: int, row_id, lane_id):
    """Zero-fill shift of a (SUBL, LANES) tile by s in flat order."""
    if s >= SUBL * LANES:
        return jnp.zeros_like(x)
    r, c = divmod(s, LANES)
    y = x
    if c:
        a = pltpu.roll(y, shift=c, axis=1)
        prev = pltpu.roll(y, shift=1, axis=0)        # row i <- row i-1
        b = pltpu.roll(prev, shift=c, axis=1)
        y = jnp.where(lane_id >= c, a, b)
        y = jnp.where((row_id == 0) & (lane_id < c), 0, y)
    if r:
        y = pltpu.roll(y, shift=r, axis=0)
        y = jnp.where(row_id < r, 0, y)
    return y


def _inclusive_scan_flat(m, row_id, lane_id, interpret: bool = False):
    """Inclusive prefix sum over the flat order of a (SUBL, LANES) tile.

    The compiled path is a log-step shift-add scan (Mosaic cannot lower
    cumsum); interpret mode uses cumsum directly — the emulated per-op
    cost of 10 shift-adds x 16 digits x 32 tiles made tests minutes
    long. The two paths are equivalence-tested in tests/test_kernels.py.
    """
    if interpret:
        return jnp.cumsum(m.reshape(-1)).reshape(m.shape)
    p = m
    s = 1
    while s < SUBL * LANES:
        p = p + _flat_shift_right(p, s, row_id, lane_id)
        s *= 2
    return p


def _flat_roll_right(x, r):
    """Circular right-roll of a (rows, LANES) tile by traced r in flat
    order (wrapped entries are junk the callers mask out). Mosaic
    supports dynamic lane/sublane rolls (probed on v5e)."""
    c = r % LANES
    w = r // LANES
    lane = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    a = pltpu.roll(x, shift=c, axis=1)
    b = pltpu.roll(pltpu.roll(x, shift=1, axis=0), shift=c, axis=1)
    y = jnp.where(lane >= c, a, b)
    return pltpu.roll(y, shift=w, axis=0)


def _permute_tile(dest, cols):
    """out[dest[j], c] = cols[j, c] for a (TILE,) permutation, via MXU.

    Exact for int32 in [0, 2^31): the one-hot indicator gives each output
    row exactly one product term, and the values are split into 8-bit
    parts so every operand is exactly representable even at the MXU's
    default bf16 multiply precision (16-bit halves were silently rounded
    on v5e, which corrupted within-digit order on hardware while
    interpret mode - real f32 - passed).
    """
    oh = (dest[None, :] == lax.broadcasted_iota(
        jnp.int32, (TILE, TILE), 0)).astype(jnp.float32)      # (out, in)
    out = jnp.zeros(cols.shape, jnp.int32)
    for shift in (0, 8, 16, 24):
        part = ((cols >> shift) & 0xFF).astype(jnp.float32)
        moved = jnp.dot(oh, part, preferred_element_type=jnp.float32)
        out = out | (moved.astype(jnp.int32) << shift)
    return out


def _block_sort_kernel(shift: int, interpret: bool, keys_ref, pay_ref,
                       out_k_ref, out_p_ref, hist_ref, scratch_k,
                       scratch_p, stage_k, stage_p, smem_hist):
    """Stable 4-bit-digit sort of one 32K block (see module docstring).

    Control flow is fori_loop-heavy with SMEM scalar tables: a fully
    unrolled (digit x tile) graph OOM-killed the Mosaic compiler.
    """
    b_id = pl.program_id(0)
    row_id = lax.broadcasted_iota(jnp.int32, (SUBL, LANES), 0)
    lane_id = lax.broadcasted_iota(jnp.int32, (SUBL, LANES), 1)

    # Per tile: dest (stable within-tile sort by digit) + SMEM hist row.
    for t in range(TILES):
        keys_t = keys_ref[pl.ds(t * TILE, TILE)].reshape(SUBL, LANES)
        dig = (keys_t >> shift) & (R - 1)

        def digit_body(d, carry):
            start, dest = carry
            m = (dig == d).astype(jnp.int32)
            pre = _inclusive_scan_flat(m, row_id, lane_id, interpret) - m
            cnt = jnp.sum(m)
            dest = jnp.where(m == 1, start + pre, dest)
            smem_hist[t * R + d] = cnt
            return start + cnt, dest

        _, dest = lax.fori_loop(
            0, R, digit_body,
            (jnp.int32(0), jnp.zeros((SUBL, LANES), jnp.int32)))

        pays_t = pay_ref[pl.ds(t * TILE, TILE)]
        cols = jnp.stack([keys_ref[pl.ds(t * TILE, TILE)], pays_t], axis=1)
        sorted_cols = _permute_tile(dest.reshape(TILE), cols)
        scratch_k[pl.ds(t * 2 * TILE, TILE)] = sorted_cols[:, 0]
        scratch_p[pl.ds(t * 2 * TILE, TILE)] = sorted_cols[:, 1]

    # Merge tile runs into block runs. Mosaic only allows dynamic vector
    # loads/stores at TILE-aligned offsets, so both sides go through
    # aligned 2-tile windows: read the tile-sorted segment with an
    # aligned load + dynamic flat roll; write with an aligned
    # read-modify-write (load window, roll into place, blend by mask).
    g2 = lax.broadcasted_iota(jnp.int32, (2 * SUBL, LANES), 0) * LANES \
        + lax.broadcasted_iota(jnp.int32, (2 * SUBL, LANES), 1)

    def merge_body(i, cursor):
        d = i // TILES
        t = i % TILES

        def src_body(dd, acc):
            return acc + smem_hist[t * R + dd]

        src = lax.fori_loop(0, d, src_body, jnp.int32(0))
        count = smem_hist[t * R + d]
        win_k = scratch_k[pl.ds(t * 2 * TILE, 2 * TILE)].reshape(
            2 * SUBL, LANES)
        win_p = scratch_p[pl.ds(t * 2 * TILE, 2 * TILE)].reshape(
            2 * SUBL, LANES)
        seg_k = _flat_roll_right(win_k, 2 * TILE - src)
        seg_p = _flat_roll_right(win_p, 2 * TILE - src)
        base = (cursor // TILE) * TILE
        base = pl.multiple_of(base, TILE)
        r = cursor - base
        old_k = stage_k[pl.ds(base, 2 * TILE)].reshape(2 * SUBL, LANES)
        old_p = stage_p[pl.ds(base, 2 * TILE)].reshape(2 * SUBL, LANES)
        put_k = _flat_roll_right(seg_k, r)
        put_p = _flat_roll_right(seg_p, r)
        sel = (g2 >= r) & (g2 < r + count)
        stage_k[pl.ds(base, 2 * TILE)] = jnp.where(
            sel, put_k, old_k).reshape(-1)
        stage_p[pl.ds(base, 2 * TILE)] = jnp.where(
            sel, put_p, old_p).reshape(-1)
        return cursor + count

    # i = d * TILES + t iterates digit-major (digit 0's tiles first).
    lax.fori_loop(0, R * TILES, merge_body, jnp.int32(0))
    out_k_ref[:] = stage_k[:BLOCK]
    out_p_ref[:] = stage_p[:BLOCK]

    # hist rows are 128 wide for TPU tiling; only the first R are real.
    lane = lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    def hist_body(d, row):
        def tsum(t, acc):
            return acc + smem_hist[t * R + d]
        total_d = lax.fori_loop(0, TILES, tsum, jnp.int32(0))
        return jnp.where(lane == d, total_d, row)

    row = lax.fori_loop(0, R, hist_body, jnp.zeros((1, LANES), jnp.int32))
    hist_ref[pl.ds(b_id, 1), :] = row


@functools.partial(jax.jit, static_argnums=(2, 3))
def block_digit_sort(keys: jnp.ndarray, payload: jnp.ndarray, shift: int,
                     interpret: bool = False):
    """Per-block stable sort by the digit at ``shift``. len % BLOCK == 0.

    Returns (sorted_keys, sorted_payload, hist): each BLOCK segment of
    the outputs is digit-sorted; hist is the (NB, R) per-block counts.
    """
    nb = keys.shape[0] // BLOCK
    out_k, out_p, hist = pl.pallas_call(
        functools.partial(_block_sort_kernel, shift, interpret),
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
            pltpu.VMEM((TILES * 2 * TILE,), jnp.int32),
            pltpu.VMEM((TILES * 2 * TILE,), jnp.int32),
            pltpu.VMEM((BLOCK + 2 * TILE,), jnp.int32),
            pltpu.VMEM((BLOCK + 2 * TILE,), jnp.int32),
            pltpu.SMEM((TILES * R,), jnp.int32),
        ],
        interpret=interpret,
    )(keys, payload)
    return out_k, out_p, hist[:, :R]


QUANT = TILE                 # DMA copy quantum for run placement


def _place_kernel(src_starts_ref, dst_starts_ref, lens_ref,
                  k_ref, p_ref, out_k_ref, out_p_ref,
                  vk_src, vp_src, vk_dst, vp_dst, sem_a, sem_b):
    """Copy one (digit, block) run staging->output in QUANT chunks.

    HBM memrefs are 1024-tiled, so every DMA offset must be provably
    tile-aligned: each chunk is moved as an aligned read-modify-write —
    aligned 2-tile reads of source and destination windows, a circular
    flat roll to line the source up with its destination phase, a masked
    blend, and an aligned 2-tile write back. The TPU grid is sequential,
    so overlapping windows of consecutive runs stay consistent.
    """
    d = pl.program_id(0)
    b = pl.program_id(1)
    i = d * pl.num_programs(1) + b
    src0 = src_starts_ref[i]
    dst0 = dst_starts_ref[i]
    length = lens_ref[i]
    chunks = (length + QUANT - 1) // QUANT
    g2 = lax.broadcasted_iota(jnp.int32, (2 * SUBL, LANES), 0) * LANES \
        + lax.broadcasted_iota(jnp.int32, (2 * SUBL, LANES), 1)

    def body(c, _):
        off = c * QUANT
        len_c = jnp.minimum(QUANT, length - off)
        rs = pl.multiple_of(((src0 + off) // QUANT) * QUANT, QUANT)
        wb = pl.multiple_of(((dst0 + off) // QUANT) * QUANT, QUANT)
        src_r = src0 + off - rs
        dst_r = dst0 + off - wb

        rd_k = pltpu.make_async_copy(
            k_ref.at[pl.ds(rs, 2 * QUANT)], vk_src, sem_a)
        rd_p = pltpu.make_async_copy(
            p_ref.at[pl.ds(rs, 2 * QUANT)], vp_src, sem_b)
        rd_k.start(); rd_p.start(); rd_k.wait(); rd_p.wait()
        rd_ok = pltpu.make_async_copy(
            out_k_ref.at[pl.ds(wb, 2 * QUANT)], vk_dst, sem_a)
        rd_op = pltpu.make_async_copy(
            out_p_ref.at[pl.ds(wb, 2 * QUANT)], vp_dst, sem_b)
        rd_ok.start(); rd_op.start(); rd_ok.wait(); rd_op.wait()

        delta = (dst_r - src_r) % (2 * QUANT)
        sk = _flat_roll_right(
            vk_src[:].reshape(2 * SUBL, LANES), delta)
        sp = _flat_roll_right(
            vp_src[:].reshape(2 * SUBL, LANES), delta)
        sel = (g2 >= dst_r) & (g2 < dst_r + len_c)
        vk_dst[:] = jnp.where(
            sel, sk, vk_dst[:].reshape(2 * SUBL, LANES)).reshape(-1)
        vp_dst[:] = jnp.where(
            sel, sp, vp_dst[:].reshape(2 * SUBL, LANES)).reshape(-1)

        wr_k = pltpu.make_async_copy(
            vk_dst, out_k_ref.at[pl.ds(wb, 2 * QUANT)], sem_a)
        wr_p = pltpu.make_async_copy(
            vp_dst, out_p_ref.at[pl.ds(wb, 2 * QUANT)], sem_b)
        wr_k.start(); wr_p.start(); wr_k.wait(); wr_p.wait()
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
    n = sorted_k.shape[0] - 2 * QUANT      # staging includes 2*QUANT pad
    rnb = src_starts.shape[0]
    nb = rnb // R
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(R, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * QUANT,), jnp.int32),
            pltpu.VMEM((2 * QUANT,), jnp.int32),
            pltpu.VMEM((2 * QUANT,), jnp.int32),
            pltpu.VMEM((2 * QUANT,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _place_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n + 2 * QUANT,), jnp.int32),
            jax.ShapeDtypeStruct((n + 2 * QUANT,), jnp.int32),
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

    bk = jnp.concatenate([bk, jnp.zeros((2 * QUANT,), jnp.int32)])
    bp = jnp.concatenate([bp, jnp.zeros((2 * QUANT,), jnp.int32)])
    ok, op = place_runs(bk, bp, src, dst, lens, interpret)
    return ok[:n], op[:n]
