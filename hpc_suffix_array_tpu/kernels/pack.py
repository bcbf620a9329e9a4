"""Pallas kernel: alphabet-packed initial ranks (sliding-window fold).

out[i] = sum_{j<h0} codes[i+j] << bits*(h0-1-j)

The XLA formulation reads h0 shifted copies of the code array; every
unaligned shift is a cross-lane rotate of the whole array (~35 ms per
shift at 2^24 on v5e), so packing cost rivaled a whole doubling round.
Here each grid block loads once into VMEM (plus a one-row halo block)
and the h0 shifted reads become in-register `pltpu.roll` lane/sublane
rotations — one HBM read + one write total.

Blocks are (ROWS, 128) int32 views of the flat array; a flat shift by
j < 128 decomposes into a lane roll by j, with the wrapped lanes taking
the next row (sublane roll by 1); the halo block supplies the row after
the block's last.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ROWS = 512                      # 512*128 = 64K elements per block


def _pack_block_kernel(bits: int, h0: int, main_ref, halo_ref, out_ref):
    """main: (R, 128) block; halo: (8, 128) rows following the block."""
    rows = main_ref.shape[0]
    x = jnp.concatenate([main_ref[:], halo_ref[:1]], axis=0)  # (R+1, 128)
    lane = lax.broadcasted_iota(jnp.int32, (rows + 1, LANES), 1)
    out = jnp.zeros((rows + 1, LANES), jnp.int32)
    # pltpu.roll matches np.roll (shift >= 0 moves elements to higher
    # indices); a left-shift by r is roll by size - r.
    nxt = pltpu.roll(x, shift=rows, axis=0)        # row i -> row i+1's data
    for j in range(h0):
        r = j % LANES
        a = pltpu.roll(x, shift=LANES - r, axis=1) if r else x
        b = pltpu.roll(nxt, shift=LANES - r, axis=1) if r else nxt
        shifted = jnp.where(lane < LANES - r, a, b)
        out = (out << bits) | shifted
    out_ref[:] = out[:rows]


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def pack_ranks_pallas(codes: jnp.ndarray, bits: int, h0: int,
                      interpret: bool = False) -> jnp.ndarray:
    """Packed window codes for int32[n] ``codes``; n must be a multiple of
    LANES; h0 <= LANES. Positions past n read as 0 (zero padding)."""
    n = codes.shape[0]
    rows_total = n // LANES
    # block rows must be a multiple of 8 for the halo block-index math
    grid_rows = min(ROWS, -(-rows_total // 8) * 8)
    nb = -(-rows_total // grid_rows)
    # pad to the grid plus 8 halo rows of zeros
    pad_rows = nb * grid_rows + 8 - rows_total
    x2 = jnp.concatenate(
        [codes.reshape(rows_total, LANES),
         jnp.zeros((pad_rows, LANES), jnp.int32)])

    out = pl.pallas_call(
        functools.partial(_pack_block_kernel, bits, h0),
        out_shape=jax.ShapeDtypeStruct((nb * grid_rows, LANES), jnp.int32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((grid_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            # halo: the 8 rows starting right after block i's last row
            pl.BlockSpec((8, LANES), lambda i: (i * grid_rows // 8 + \
                         grid_rows // 8, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((grid_rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, x2)
    return out.reshape(-1)[:n]
