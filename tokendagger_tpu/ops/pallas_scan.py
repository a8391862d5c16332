"""Pallas TPU kernel: blockwise vectorized UTF-8 decode.

The pretokenizer's first stage classifies every byte (lead/continuation)
and assembles codepoints from up to four neighbors (ops/pretokenize.py
`utf8_decode`). This kernel runs that stage block-by-block in VMEM:
bytes live as (rows, 128) tiles, neighbor access is column shifts with a
row carry, and the 4-byte lookahead across the block edge comes from a
one-row halo block mapped from the same array. Pure VPU work, no gathers.

The global parts of the decode (valid masking, char-index cumsum, and the
compaction scatter) stay in XLA where cross-block scans belong.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BLOCK_ROWS = 64
LANES = 128
BLOCK = BLOCK_ROWS * LANES


def _shift1(b: jnp.ndarray, next_first: jnp.ndarray) -> jnp.ndarray:
    """Flat +1 shift of a (R, 128) row-major tile; next_first is the scalar
    element that follows the tile (from the next row block / halo).

    Implemented with circular rolls + masked patches — Mosaic lowers these
    natively, unlike concatenates of misaligned narrow slices."""
    from jax.experimental.pallas import tpu as pltpu

    R, L = b.shape
    # pltpu.roll needs non-negative shifts: roll by size-1 == roll by -1
    shifted_cols = pltpu.roll(b, L - 1, 1)  # col c <- c+1 (col L-1 garbage)
    next_rows = pltpu.roll(b, R - 1, 0)     # row r <- r+1 (last row garbage)
    carry = next_rows[:, 0:1]             # (R, 1): b[r+1, 0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    carry = jnp.where(row_ids == R - 1, next_first, carry)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    return jnp.where(col_ids < L - 1, shifted_cols, carry)


def _kernel(b_ref, halo_ref, cp_ref, start_ref):
    b = b_ref[...].astype(jnp.int32)        # (R, 128)
    # halo block is 8 rows (TPU min sublane tile); only row 0 is the
    # actual next-row lookahead
    halo = halo_ref[0:1, :].astype(jnp.int32)  # (1, 128)

    n1 = _shift1(b, halo[0, 0])
    n2 = _shift1(n1, halo[0, 1])
    n3 = _shift1(n2, halo[0, 2])

    cp1 = b
    cp2 = ((b & 0x1F) << 6) | (n1 & 0x3F)
    cp3 = ((b & 0x0F) << 12) | ((n1 & 0x3F) << 6) | (n2 & 0x3F)
    cp4 = (
        ((b & 0x07) << 18) | ((n1 & 0x3F) << 12) | ((n2 & 0x3F) << 6)
        | (n3 & 0x3F)
    )
    cp = jnp.where(
        b < 0x80, cp1, jnp.where(b < 0xE0, cp2, jnp.where(b < 0xF0, cp3, cp4))
    )
    cp_ref[...] = jnp.clip(cp, 0, 0x10FFFF)
    start_ref[...] = ((b & 0xC0) != 0x80).astype(jnp.int32)


@partial(jax.jit, static_argnames=("interpret",))
def utf8_decode_block(
    data: jnp.ndarray,  # (N,) uint8, N % BLOCK == 0
    *,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-byte (codepoint-if-start, is-lead-byte) via the Pallas kernel.

    Returns (cp_at (N,) int32, is_start (N,) int32). Caller applies
    validity masking and runs the compaction (see ops/pretokenize.py).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = data.shape[0]
    assert N % BLOCK == 0, N
    rows = N // LANES
    d2 = data.reshape(rows, LANES)
    # eight zero rows appended so the last block's 8-row halo is in range
    d2p = jnp.concatenate([d2, jnp.zeros((8, LANES), data.dtype)], axis=0)

    grid = (rows // BLOCK_ROWS,)
    cp2, start2 = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            # 8-row halo block (TPU sublane minimum); block index units are
            # in block-shape multiples: row offset = 8 * (BLOCK_ROWS/8) * (i+1)
            pl.BlockSpec((8, LANES), lambda i: ((BLOCK_ROWS // 8) * (i + 1), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(d2p, d2p)
    return cp2.reshape(N), start2.reshape(N)
