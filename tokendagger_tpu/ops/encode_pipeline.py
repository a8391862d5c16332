"""Device encode pipeline stage 2: pack pretoken pieces and BPE-merge them.

Consumes the scan output (piece start/length arrays pointing into the raw
byte buffer that is already resident on device) and produces per-piece token
ids, without the bytes ever round-tripping to the host:

  gather_merge(data, starts, lens) :
      rows are gathered straight out of the byte stream (no host packing),
      then merged with the exact row-parallel kernel (ops/merge.py).

The host side only bins piece indices into width buckets (vectorized numpy)
and assembles the final flat id arrays; see engine.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .merge import merge_rows_from_state, merge_rows_local


@partial(jax.jit, static_argnames=("mask", "width", "use_pallas"))
def gather_merge(
    data: jnp.ndarray,       # (N,) uint8 raw byte stream (device-resident)
    starts: jnp.ndarray,     # (R,) int32 piece start byte offsets
    lens: jnp.ndarray,       # (R,) int32 piece byte lengths (<= width; 0 pads)
    byte_rank: jnp.ndarray,  # (256,) int32
    pair_rows: jnp.ndarray,  # (nb, 12) int32
    mask: int,
    width: int,
    pair_lut: jnp.ndarray | None = None,  # (256, 256) int32
    use_pallas: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (tok (R, width) int32 with -1 dead slots, counts (R,)).

    ``use_pallas`` is accepted for call-site compatibility but ignored:
    the former MXU one-hot first-round kernel (256-column unrolled
    dot_generals) was measured strictly worse than the flat pair-LUT
    gather on the v5e — it is exactly the giant-lowering program class
    that trips the remote runtime's degraded dispatch mode (docs/PERF.md
    "dispatch cliff") — and was removed per the no-unmeasured-kernels
    rule.
    """
    R = starts.shape[0]
    cols = jnp.arange(width, dtype=jnp.int32)[None, :]
    gidx = starts[:, None] + cols
    gidx = jnp.clip(gidx, 0, data.shape[0] - 1)
    buf = jnp.where(cols < lens[:, None], data[gidx], 0)
    return merge_rows_local(
        buf, lens, byte_rank, pair_rows, mask=mask, pair_lut=pair_lut
    )


@partial(jax.jit, static_argnames=("mask", "width", "use_pallas"))
def gather_merge_flat(
    data: jnp.ndarray,
    starts: jnp.ndarray,
    lens: jnp.ndarray,
    byte_rank: jnp.ndarray,
    pair_rows: jnp.ndarray,
    mask: int,
    width: int,
    pair_lut: jnp.ndarray | None = None,
    use_pallas: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Like gather_merge but flattens on device: returns
    (flat (R*width,) int32 — the live tokens of all rows concatenated in
    row order, -1 beyond `total` —, counts (R,), total scalar).

    The caller transfers only flat[:total] (host-side slice after syncing
    `total`), cutting device->host traffic by ~width/avg_tokens_per_piece.
    """
    R = starts.shape[0]
    tok, counts = gather_merge(
        data, starts, lens, byte_rank, pair_rows, mask, width,
        pair_lut, use_pallas,
    )
    live = tok >= 0
    out_pos = jnp.cumsum(counts) - counts  # exclusive
    col_rank = jnp.cumsum(live, axis=1) - 1
    cap = R * width
    flat_idx = jnp.where(live, out_pos[:, None] + col_rank, cap)
    flat = jnp.full((cap,), -1, jnp.int32).at[flat_idx.reshape(-1)].set(
        tok.reshape(-1), mode="drop"
    )
    total = jnp.sum(counts)
    return flat, counts, total
