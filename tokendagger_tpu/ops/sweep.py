r"""Pallas sweep framework: fused multi-scan passes for the pretokenizer.

The boundary-local piece-start derivation (ops/pretokenize.piece_starts_jax)
is ~77 global scans interleaved with elementwise logic. As separate XLA
scan kernels each costs ~2 ms per (8,1M) dispatch and materializes its
operands in HBM (~26 ms/MB total, bandwidth ~100x above the theoretical
minimum). This module runs *chained* forward scans in ONE blockwise sweep:

  grid = (batch, n_blocks), sequential on a TPU core; each step loads a
  (R, 128) tile into VMEM, computes every scan quantity block-locally
  (lane scan -> row-carry scan), seeds from scalar carries of the previous
  block kept in SMEM scratch, and writes outputs. Any DEPTH of
  forward-chained scans costs one pass over the data; reverse quantities
  mirror the same machinery with a reversed grid index_map.

Helpers here implement raster-order (row-major) block scans from
`pltpu.roll` shifts — Mosaic has no native prefix-scan primitive.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

I32_MIN = -(1 << 31)
I32_MAX = (1 << 31) - 1
LANES = 128


def _roll(x, s, axis):
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.roll(x, s, axis)


def _col_ids(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)


def _row_ids(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 0)


def _comb(op, a, b):
    if op == "max":
        return jnp.maximum(a, b)
    if op == "min":
        return jnp.minimum(a, b)
    return a + b


def _ident(op):
    return {"max": I32_MIN, "min": I32_MAX, "add": 0}[op]


def raster_scan(x: jnp.ndarray, op: str, carry_in) -> jnp.ndarray:
    """Inclusive raster-order (row-major) scan of a (R, 128) int32 tile,
    seeded with scalar ``carry_in`` (scan state just before the tile).
    op: "max" | "min" | "add". New carry is ``out[R-1, L-1]``."""
    R, L = x.shape
    ident = _ident(op)
    col = _col_ids((R, L))
    row = _row_ids((R, L))

    # 1) inclusive scan within each row (along lanes)
    y = x
    k = 1
    while k < L:
        sh = jnp.where(col >= k, _roll(y, k, 1), ident)
        y = _comb(op, y, sh)
        k *= 2

    # 2) row totals -> exclusive row prefix (+ carry_in)
    tot = jnp.where(col == 0, _roll(y, 1, 1), ident)  # lane0 = row total
    tot = y if L == 1 else tot
    k = 1
    while k < L:  # broadcast total across the row
        tot = _comb(op, tot, jnp.where(col >= k, _roll(tot, k, 1), ident))
        k *= 2
    k = 1
    rowpref = tot  # inclusive scan of totals down rows
    while k < R:
        rowpref = _comb(
            op, rowpref, jnp.where(row >= k, _roll(rowpref, k, 0), ident)
        )
        k *= 2
    excl = jnp.where(row == 0, ident, _roll(rowpref, 1, 0))
    excl = _comb(op, excl, jnp.full((R, L), 1, jnp.int32) * carry_in)
    return _comb(op, y, excl)


def reverse_raster_scan(x: jnp.ndarray, op: str, carry_in) -> jnp.ndarray:
    """Inclusive reverse raster scan (suffix scan: out[i] combines
    x[i..end]), seeded with scalar ``carry_in`` = state just AFTER the
    tile. New carry is ``out[0, 0]``."""
    R, L = x.shape
    ident = _ident(op)
    col = _col_ids((R, L))
    row = _row_ids((R, L))

    y = x
    k = 1
    while k < L:
        sh = jnp.where(col < L - k, _roll(y, L - k, 1), ident)
        y = _comb(op, y, sh)
        k *= 2

    tot = jnp.where(col == L - 1, _roll(y, L - 1, 1), ident)  # last lane = row total
    k = 1
    while k < L:
        tot = _comb(
            op, tot, jnp.where(col < L - k, _roll(tot, L - k, 1), ident)
        )
        k *= 2
    k = 1
    rowsuf = tot
    while k < R:
        rowsuf = _comb(
            op, rowsuf, jnp.where(row < R - k, _roll(rowsuf, R - k, 0), ident)
        )
        k *= 2
    excl = jnp.where(row == R - 1, ident, _roll(rowsuf, R - 1, 0))
    excl = _comb(op, excl, jnp.full((R, L), 1, jnp.int32) * carry_in)
    return _comb(op, y, excl)


def shift_fwd(x: jnp.ndarray, prev_last) -> jnp.ndarray:
    """Raster-order shift by +1: out[i] = x[i-1]; out[0] = prev_last (the
    element just before this tile)."""
    R, L = x.shape
    col = _col_ids((R, L))
    row = _row_ids((R, L))
    sh = _roll(x, 1, 1)                      # out[r, c] = x[r, c-1]
    prev_rows = _roll(x, 1, 0)               # row r <- r-1
    carry = prev_rows[:, L - 1 : L]          # x[r-1, L-1]
    carry = jnp.where(row == 0, prev_last, carry)
    return jnp.where(col == 0, carry, sh)


def shift_bwd(x: jnp.ndarray, next_first) -> jnp.ndarray:
    """Raster-order shift by -1: out[i] = x[i+1]; out[last] = next_first."""
    R, L = x.shape
    col = _col_ids((R, L))
    row = _row_ids((R, L))
    sh = _roll(x, L - 1, 1)                  # out[r, c] = x[r, c+1]
    next_rows = _roll(x, R - 1, 0)           # row r <- r+1
    carry = next_rows[:, 0:1]                # x[r+1, 0]
    carry = jnp.where(row == R - 1, next_first, carry)
    return jnp.where(col == L - 1, carry, sh)
