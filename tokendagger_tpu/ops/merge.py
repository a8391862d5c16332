"""Parallel BPE merge on device.

Replaces the reference's sequential per-pretoken merge loop
(/root/reference/src/tiktoken/tiktoken.cpp:282-378) with a vectorized
formulation: a batch of pretokens is packed into fixed-width rows, and all
rows advance in lockstep, each merging its own leftmost minimum-rank
adjacent pair per iteration. Per-row semantics are *identical* to the
sequential algorithm (global min per pretoken, leftmost tie-break, rank
refresh of the two neighboring pairs after each merge), so token ids are
byte-for-byte equal to tiktoken's.

Data layout per row (pretoken) of bucket width C:
  slots 0..C-1   byte positions; a slot is a live part head iff tok >= 0
  slot  C        END sentinel (tok = -1, pr = MAX)
  slot  C+1      TRASH sentinel — rows that finished early direct all their
                 reads/writes here, making them no-ops; trash columns are
                 re-cleared every iteration.

Arrays: tok (token id at head), nxt/prv (live-part linked list), pr (rank
of the pair starting at this head, MAX if none). A merge is O(1) pointer
surgery plus two pair-table lookups; the pair value being merged *is* the
merged token id, so no extra lookup is needed for the merge itself.

The pair table is the two-choice bucketed hash from tables.py: every
lookup is exactly two 48-byte row gathers from HBM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..tables import _MIX

MAX_RANK = np.int32(0x7FFFFFFF)


def _mix(a: jnp.ndarray, b: jnp.ndarray, which: int, mask: int) -> jnp.ndarray:
    """uint32 multiply-xor mix; bit-identical to tables._mix_hash."""
    c1, c2, c3 = _MIX[which]
    h = a.astype(jnp.uint32) * jnp.uint32(c1) + b.astype(jnp.uint32) * jnp.uint32(c2)
    h = h ^ (h >> jnp.uint32(16))
    h = h * jnp.uint32(c3)
    h = h ^ (h >> jnp.uint32(15))
    return (h & jnp.uint32(mask)).astype(jnp.int32)


def pair_lookup(rows: jnp.ndarray, mask: int, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """rank(bytes(a)+bytes(b)) or MAX_RANK. a, b int32, any shape.

    Invalid ids (< 0, used for dead slots/sentinels) always miss.
    """
    out = jnp.full(a.shape, MAX_RANK, jnp.int32)
    for which in (0, 1):
        h = _mix(a, b, which, mask)
        # barrier: 3 slice consumers would otherwise rematerialize the
        # row gather into each fusion (see ops/join.vocab_probe8)
        r = jax.lax.optimization_barrier(rows[h])  # (..., 12) row gather
        hit = (r[..., 0:4] == a[..., None]) & (r[..., 4:8] == b[..., None])
        vals = jnp.max(jnp.where(hit, r[..., 8:12], -1), axis=-1)
        out = jnp.where((out == MAX_RANK) & (vals >= 0), vals, out)
    return jnp.where((a < 0) | (b < 0), MAX_RANK, out)


def merge_rows_local(
    byte_buf: jnp.ndarray,   # (R, C) uint8, zero-padded pretoken bytes
    lengths: jnp.ndarray,    # (R,) int32 pretoken byte lengths (0 = padding row)
    byte_rank: jnp.ndarray,  # (256,) int32
    rows: jnp.ndarray,       # pair table rows (nb, 12) int32
    *,
    mask: int,               # pair table bucket mask (static)
    pair_lut: jnp.ndarray | None = None,  # (256, 256) int32 byte-pair ranks
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """BPE-merge every row. Returns (tok (R, C) int32 with -1 at dead slots,
    counts (R,) int32). Live slots in slot order are the token ids.

    With ``pair_lut`` the first-round pair ranks come from one flat gather
    into the 256x256 byte-pair table instead of two hash-row gathers."""
    cols = jnp.arange(byte_buf.shape[1], dtype=jnp.int32)[None, :]
    lens = lengths[:, None]
    valid = cols < lens
    b = byte_buf.astype(jnp.int32)
    tok0 = jnp.where(valid, byte_rank[b], -1)
    if pair_lut is not None:
        b1 = jnp.roll(b, -1, axis=1)
        pr0 = pair_lut.reshape(-1)[b * 256 + b1]
    else:
        pr0 = pair_lookup(rows, mask, tok0, jnp.roll(tok0, -1, axis=1))
    pr0 = jnp.where(cols < (lens - 1), pr0, MAX_RANK)
    return merge_rows_from_state(tok0, pr0, lengths, rows, mask=mask)


def merge_rows_from_state(
    tok0: jnp.ndarray,       # (R, C) int32 initial token ids (-1 dead)
    pr0: jnp.ndarray,        # (R, C) int32 initial pair ranks (MAX if none)
    lengths: jnp.ndarray,    # (R,) int32
    rows: jnp.ndarray,       # pair table rows (nb, 12) int32
    *,
    mask: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """The merge while-loop, starting from externally computed first-round
    state.

    The body is deliberately scatter/gather-free over the row axis: every
    per-row dynamic-index read is a one-hot masked reduction and every
    write a one-hot masked select. XLA lowers (row, col)-indexed scatters
    to a sequential per-update loop on TPU (~ms per iteration at R=8k,
    measured), while the one-hot forms are pure (R, C) elementwise VPU
    work (~µs)."""
    R, C = tok0.shape
    END = C  # sentinel column index meaning "none"
    cols = jnp.arange(C, dtype=jnp.int32)[None, :]
    lens = lengths[:, None]
    valid = cols < lens

    tok = tok0
    nxt = jnp.where(cols < (lens - 1), cols + 1, END)
    prv = jnp.where((cols > 0) & valid, cols - 1, END)
    pr = pr0

    def sel(arr, idx):
        """arr[r, idx[r]] per row via one-hot reduction; idx == END -> 0."""
        return jnp.sum(
            jnp.where(cols == idx[:, None], arr, 0), axis=1
        ).astype(jnp.int32)

    def cond(state):
        return jnp.any(state[3] != MAX_RANK)

    def body(state):
        tok, nxt, prv, pr = state
        v = jnp.min(pr, axis=1)                        # min pair rank per row
        b = jnp.argmin(pr, axis=1).astype(jnp.int32)   # leftmost occurrence
        act = v != MAX_RANK                            # rows still merging
        b2 = sel(nxt, b)                               # right part of the pair
        b3 = jnp.where(b2 >= END, END, sel(nxt, b2))   # part after the pair
        p = sel(prv, b)                                # part before the pair
        t3 = jnp.where(b3 >= END, -1, sel(tok, b3))
        tp = jnp.where(p >= END, -1, sel(tok, p))

        upd = act[:, None]
        oh_b = upd & (cols == b[:, None])
        oh_b2 = upd & (cols == b2[:, None])            # b2 == END -> no-op
        oh_b3 = upd & (cols == b3[:, None])
        oh_p = upd & (cols == p[:, None])

        tok = jnp.where(oh_b, v[:, None], tok)   # pair rank IS the merged id
        tok = jnp.where(oh_b2, -1, tok)          # right part consumed
        nxt = jnp.where(oh_b, b3[:, None], nxt)
        prv = jnp.where(oh_b3, b[:, None], prv)
        # refresh the two pairs adjacent to the merge site
        pr_b = pair_lookup(rows, mask, v, t3)
        pr_p = pair_lookup(rows, mask, tp, v)
        pr = jnp.where(oh_b2, MAX_RANK, pr)
        pr = jnp.where(oh_b, pr_b[:, None], pr)
        pr = jnp.where(oh_p, pr_p[:, None], pr)
        return tok, nxt, prv, pr

    tok, nxt, prv, pr = jax.lax.while_loop(cond, body, (tok, nxt, prv, pr))
    counts = jnp.sum(tok >= 0, axis=1, dtype=jnp.int32)
    return tok, counts


@partial(jax.jit, static_argnames=("mask",))
def merge_rows(byte_buf, lengths, byte_rank, rows, mask: int):
    """Jitted single-device entry point around :func:`merge_rows_local`."""
    return merge_rows_local(byte_buf, lengths, byte_rank, rows, mask=mask)
