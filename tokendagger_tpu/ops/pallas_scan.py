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
    """Flat +1 shift of a (R, 128) row-major tile; next_first is the (1, 1)
    element that follows the tile (from the next row block / halo)."""
    right_col = jnp.concatenate([b[1:, :1], next_first], axis=0)
    return jnp.concatenate([b[:, 1:], right_col], axis=1)


def _kernel(b_ref, halo_ref, cp_ref, start_ref):
    b = b_ref[...].astype(jnp.int32)        # (R, 128)
    halo = halo_ref[...].astype(jnp.int32)  # (1, 128): the next row

    n1 = _shift1(b, halo[:1, 0:1])
    n2 = _shift1(n1, halo[:1, 1:2])
    n3 = _shift1(n2, halo[:1, 2:3])

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
    # one zero row appended so the last block's halo is in range
    d2p = jnp.concatenate([d2, jnp.zeros((1, LANES), data.dtype)], axis=0)

    grid = (rows // BLOCK_ROWS,)
    cp2, start2 = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (BLOCK_ROWS * (i + 1), 0),
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
