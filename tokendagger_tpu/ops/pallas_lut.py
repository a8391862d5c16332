"""Pallas TPU kernel: first-round BPE pair-rank lookup as MXU one-hot
matmuls.

The merge loop's initial pass ranks every adjacent byte pair of every
packed pretoken row (ops/merge.py). On TPU, random gathers are the enemy —
but a lookup into a table indexed by *bytes* can be recast as a one-hot
matmul, which the MXU executes at systolic-array rates with zero
irregular memory traffic:

    rank(b0, b1) = onehot(b0) @ LUT @ onehot(b1)^T

Per row-block, the kernel keeps the 256x256 pair LUT and the 256-entry
byte->rank table resident in VMEM and computes, for all columns of the
block:

    tok0[r, c] = byte_rank[buf[r, c]]          (one-hot matvec)
    pr0[r, c]  = LUT[buf[r, c], buf[r, c+1]]   (one-hot bilinear form)

float32 accumulation is exact here: every rank fits in f32's 24-bit
mantissa (vocab ids < 2^24; MAX_RANK is mapped to a sentinel inside the
kernel and restored outside).

This feeds ops/merge.py's while-loop (which then only performs the ~2
hash-gather refreshes per merge), replacing the widest gather of the merge
with MXU work — the canonical "turn gathers into matmuls" TPU pattern.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

MAX_RANK = np.int32(0x7FFFFFFF)
# f32-exact sentinel standing in for MAX_RANK. Every valid rank must be
# < 2^24 (f32 integer-exactness bound); the engine gates the Pallas path
# on n_vocab accordingly.
_SENTINEL = np.float32(1 << 24)

BLOCK_ROWS = 256


def _kernel(buf_ref, len_ref, byte_rank_ref, lut_ref, tok_ref, pr_ref):
    buf = buf_ref[...].astype(jnp.int32)          # (TR, C)
    tr, C = buf.shape
    lens = len_ref[...][:, 0]                      # (TR, 1) -> (TR,)

    cols = jax.lax.broadcasted_iota(jnp.int32, (tr, C), 1)
    valid = cols < lens[:, None]
    has_pair = cols < (lens[:, None] - 1)

    lut = lut_ref[...]                             # (256, 256) f32
    br = byte_rank_ref[...]                        # (256, 1) f32 (sentinel for -1)

    ids = jax.lax.broadcasted_iota(jnp.int32, (tr, 256), 1)

    tok_cols = []
    pr_cols = []
    for c in range(C):
        b0 = buf[:, c]
        oh0 = (ids == b0[:, None]).astype(jnp.float32)       # (TR, 256)
        # tok0: one-hot matvec against byte_rank
        tok_c = jax.lax.dot_general(
            oh0, br,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )[:, 0]
        tok_cols.append(tok_c)
        if c + 1 < C:
            b1 = buf[:, c + 1]
            rows = jax.lax.dot_general(                      # (TR, 256)
                oh0, lut,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                # exactness over speed: without HIGHEST the MXU may run
                # f32 dots in bf16 passes, rounding integer values > 256
                # (observed on v5e: tok (<=255) exact, pair ranks wrong)
                precision=jax.lax.Precision.HIGHEST,
            )
            oh1 = (ids == b1[:, None]).astype(jnp.float32)
            pr_c = jnp.sum(rows * oh1, axis=1)
            pr_cols.append(pr_c)
        else:
            pr_cols.append(jnp.full((tr,), _SENTINEL, jnp.float32))

    tok = jnp.stack(tok_cols, axis=1)
    pr = jnp.stack(pr_cols, axis=1)
    tok_ref[...] = jnp.where(valid, tok, _SENTINEL).astype(jnp.float32)
    pr_ref[...] = jnp.where(has_pair, pr, _SENTINEL).astype(jnp.float32)


@partial(jax.jit, static_argnames=("interpret",))
def lut_init(
    byte_buf: jnp.ndarray,    # (R, C) uint8 packed pretoken rows
    lengths: jnp.ndarray,     # (R,) int32
    byte_rank: jnp.ndarray,   # (256,) int32 (-1 = no rank)
    pair_lut: jnp.ndarray,    # (256, 256) int32 (MAX_RANK = no pair)
    *,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """First-round merge state via the Pallas MXU kernel.

    Returns (tok0 (R, C) int32 with -1 at dead slots,
             pr0 (R, C) int32 with MAX_RANK where no pair starts).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, C = byte_buf.shape
    TR = min(BLOCK_ROWS, R)
    assert R % TR == 0

    # f32-encode tables: -1 / MAX_RANK both become the sentinel.
    # All operands are >= 2-D (TPU layouts reject 1-D kernel operands).
    br_f = jnp.where(
        byte_rank < 0, _SENTINEL, byte_rank.astype(jnp.float32)
    ).reshape(256, 1)
    lut_f = jnp.where(
        pair_lut == MAX_RANK, _SENTINEL, pair_lut.astype(jnp.float32)
    )
    lens2 = lengths.reshape(R, 1)

    grid = (R // TR,)
    tok_f, pr_f = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TR, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((256, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((256, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TR, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, C), jnp.float32),
            jax.ShapeDtypeStruct((R, C), jnp.float32),
        ],
        interpret=interpret,
    )(byte_buf, lens2, br_f, lut_f)

    tok0 = jnp.where(tok_f >= _SENTINEL, -1, tok_f.astype(jnp.int32))
    pr0 = jnp.where(pr_f >= _SENTINEL, MAX_RANK, pr_f.astype(jnp.int32))
    return tok0, pr0
