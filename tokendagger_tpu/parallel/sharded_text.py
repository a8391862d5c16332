r"""Byte-stream sharding with halo reconciliation (sequence parallelism).

SURVEY §5's "long-context" axis for this workload: one text, split across
the mesh as contiguous byte shards, tokenized fully in parallel with exact
boundary semantics. The key decomposition:

* **Match lengths are forward-only**: len[i] depends only on text[i:], so
  every shard computes its lengths independently over (its bytes + a right
  halo of the next shard's prefix) — no backward dependence at all.
* **Only the chain of piece starts is sequential**, and it is sequential
  in a tiny way: shard d just needs its *entry position* (where the last
  piece of shard d-1 ended inside d's region). The entries are resolved
  with D-1 single-scalar `ppermute` handoffs — the per-shard work
  (pointer-doubling over the local jump array) stays data-parallel.
* Pieces starting inside a shard's own region belong to it, even when
  their bytes extend into the halo; the merge then runs shard-locally.

Exactness guards (any violation flags `overflow` and the caller falls
back to the host path):
* a kept piece must end at least SAFETY bytes before the halo end (its
  match length computation must not have been affected by the shard-local
  false end-of-text), and
* pieces must fit the merge row width.

This module is the design/dry-run implementation (validated on virtual CPU
meshes); `sharded_encode_step` in mesh.py remains the packed-rows DP path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.merge import merge_rows_local
from ..ops.pretokenize import match_lengths_jax, utf8_decode

DATA_AXIS = "data"
SAFETY = 64          # bytes of halo that must remain beyond any kept piece
MERGE_WIDTH = 32     # per-piece merge row width in the sharded kernel


def _local_tokenize(
    buf,            # (W+H,) uint8: my bytes + right halo
    nlocal,         # scalar int32: valid bytes in buf (clipped at text end)
    is_last,        # scalar bool: am I the final shard (true EOS)
    trim_after,     # scalar int32: drop pieces ending beyond this local
                    #   byte (multi-pass continuation safe-cut; big = none)
    my_index,       # scalar int32
    page_ids, pages, byte_rank, pair_rows,
    *, W: int, H: int, D: int, mask: int, profile: str,
):
    """Per-shard tokenization body (runs under shard_map)."""
    # shard_map delivers a leading axis of size 1 per device
    buf = buf.reshape(-1)
    nlocal = nlocal.reshape(())
    is_last = is_last.reshape(())
    trim_after = trim_after.reshape(())
    my_index = my_index.reshape(())
    WH = W + H
    idx = jnp.arange(WH, dtype=jnp.int32)

    cp, _, byte_of_char, m = utf8_decode(buf, nlocal)
    lens = match_lengths_jax(cp, m, page_ids, pages, profile=profile)

    # char-level jump array with doubling tables
    nxt = jnp.minimum(idx + jnp.maximum(lens, 1), WH)
    nxt = jnp.concatenate([nxt, jnp.full((1,), WH, jnp.int32)])
    levels = [nxt]
    n_levels = max(1, int(np.ceil(np.log2(WH))))
    for _ in range(n_levels):
        levels.append(levels[-1][levels[-1]])

    # byte offset of each char (padded with nlocal), and char index of the
    # first char at/after a byte offset
    boc = byte_of_char  # (WH,) char -> byte, padded with nlocal
    # char whose byte offset >= W  (first char of the next shard's region)
    W_char = jnp.searchsorted(boc, W)

    # --- entry handoff: D-1 rounds of single-scalar ppermute -------------
    def exit_from(entry_char):
        """First chain position (char) at/after W_char, following from
        entry_char; returns its byte offset relative to W."""
        pos = entry_char
        for lvl in reversed(levels):
            cand = lvl[jnp.clip(pos, 0, WH)]
            pos = jnp.where(cand < W_char, cand, pos)
        nxt_pos = levels[0][jnp.clip(pos, 0, WH)]
        # if the entry itself is already past W_char, it IS the exit
        exit_char = jnp.where(entry_char >= W_char, entry_char, nxt_pos)
        exit_byte = jnp.where(
            exit_char < WH, boc[jnp.clip(exit_char, 0, WH - 1)], nlocal
        )
        return exit_byte - W  # byte offset inside the next shard

    entry_byte = jnp.where(my_index == 0, 0, -1)  # -1 = not yet known
    for r in range(D - 1):
        entry_char = jnp.searchsorted(boc, jnp.maximum(entry_byte, 0))
        ex = exit_from(entry_char)
        ex = jnp.where(entry_byte >= 0, ex, -1)
        received = jax.lax.ppermute(ex, DATA_AXIS, [(i, i + 1) for i in range(D - 1)])
        entry_byte = jnp.where(
            (my_index == r + 1) & (entry_byte < 0), received, entry_byte
        )
    entry_byte = jnp.maximum(entry_byte, 0)
    entry_char = jnp.searchsorted(boc, entry_byte)

    # --- piece starts reachable from the entry ---------------------------
    mask_arr = jnp.zeros((WH + 1,), jnp.bool_).at[entry_char].set(True)
    jump = levels[0]
    for _ in range(n_levels + 1):
        hit = jnp.zeros((WH + 1,), jnp.bool_).at[jump].max(mask_arr)
        mask_arr = mask_arr | hit
        jump = jump[jump]
    starts = mask_arr[:WH] & (jnp.arange(WH) < m)

    start_byte = boc
    keep = starts & (start_byte < jnp.minimum(W, nlocal))
    piece_len_chars = jnp.where(keep, lens, 0)
    # piece end byte = byte of char (i + len)
    end_char = jnp.minimum(jnp.arange(WH) + piece_len_chars, WH - 1)
    end_byte = jnp.where(keep, boc[end_char], 0)
    end_byte = jnp.where(
        keep & (jnp.arange(WH) + piece_len_chars >= m), nlocal, end_byte
    )
    # multi-pass continuation: drop pieces past the safe-cut (they will be
    # re-scanned at the start of the next mesh pass)
    keep = keep & (end_byte <= trim_after)
    end_byte = jnp.where(keep, end_byte, 0)
    piece_len_chars = jnp.where(keep, piece_len_chars, 0)
    piece_bytes = jnp.where(keep, end_byte - start_byte, 0)
    consumed_end = jnp.max(jnp.where(keep, end_byte, 0))

    # overflow: a kept piece too close to the halo end (possible false-EOS
    # contamination) unless this is the last shard, or too wide to merge
    near_edge = keep & (end_byte > WH - SAFETY) & ~is_last
    too_wide = keep & (piece_bytes > MERGE_WIDTH)
    overflow = jnp.any(near_edge) | jnp.any(too_wide)

    # --- compact pieces and merge ----------------------------------------
    R = W  # static piece capacity
    pid = jnp.cumsum(keep.astype(jnp.int32)) - 1
    n_pieces = jnp.maximum(jnp.where(jnp.any(keep), pid[-1] + 1, 0), 0)
    tgt = jnp.where(keep, jnp.minimum(pid, R - 1), R)
    s_arr = jnp.zeros((R,), jnp.int32).at[tgt].set(
        jnp.where(keep, start_byte, 0), mode="drop"
    )
    l_arr = jnp.zeros((R,), jnp.int32).at[tgt].set(
        jnp.where(keep, piece_bytes, 0), mode="drop"
    )

    cols = jnp.arange(MERGE_WIDTH, dtype=jnp.int32)[None, :]
    gidx = jnp.clip(s_arr[:, None] + cols, 0, WH - 1)
    rows_buf = jnp.where(cols < l_arr[:, None], buf[gidx], 0)
    tok, counts = merge_rows_local(
        rows_buf, jnp.minimum(l_arr, MERGE_WIDTH), byte_rank, pair_rows,
        mask=mask,
    )

    # flatten local tokens
    live = tok >= 0
    out_pos = jnp.cumsum(counts) - counts
    col_rank = jnp.cumsum(live, axis=1) - 1
    cap = R * 4  # tokens never outnumber piece bytes; W/row cap is ample
    flat_idx = jnp.where(live, out_pos[:, None] + col_rank, cap)
    flat = jnp.full((cap,), -1, jnp.int32).at[flat_idx.reshape(-1)].set(
        tok.reshape(-1), mode="drop"
    )
    total = jnp.sum(counts)
    total_bytes = jax.lax.psum(jnp.sum(piece_bytes), DATA_AXIS)
    return (
        flat.reshape(1, -1),
        total.reshape(1),
        overflow.reshape(1),
        consumed_end.reshape(1),
        total_bytes,
    )


class ShardedTextEncoder:
    """Encode one byte stream data-parallel across a mesh with exact
    halo-reconciled boundaries. Falls back to the host path whenever the
    exactness guards trip."""

    def __init__(self, device_engine, mesh: Mesh, *, shard_bytes: int = 1 << 14,
                 halo: int = 1 << 12):
        if not device_engine.stream:
            raise ValueError(
                "ShardedTextEncoder requires a stream-capable DeviceEngine "
                "(supported pattern profile + merge-reachable vocab)"
            )
        self.eng = device_engine
        self.mesh = mesh
        self.D = mesh.devices.size
        self.W = shard_bytes
        self.H = halo
        eng = device_engine
        self._fn = jax.jit(
            jax.shard_map(
                partial(
                    _local_tokenize,
                    W=self.W, H=self.H, D=self.D,
                    mask=eng._pair_mask, profile=eng._profile,
                ),
                mesh=mesh,
                in_specs=(
                    P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                    P(DATA_AXIS),
                    P(None), P(None, None), P(None), P(None, None),
                ),
                out_specs=(
                    P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                    P(),
                ),
            )
        )

    def _one_pass(self, data: bytes, final: bool):
        """Tokenize up to D*W bytes; returns (ids or None-on-overflow,
        consumed_bytes)."""
        D, W, H = self.D, self.W, self.H
        n = len(data)
        buf = np.zeros((D, W + H), dtype=np.uint8)
        nloc = np.zeros(D, dtype=np.int32)
        for d in range(D):
            lo = d * W
            hi = min(n, lo + W + H)
            if lo < n:
                chunk = np.frombuffer(data[lo:hi], dtype=np.uint8)
                buf[d, : len(chunk)] = chunk
                nloc[d] = len(chunk)
        last = min((n - 1) // W, D - 1)
        is_last = np.zeros(D, dtype=bool)
        trim = np.full(D, 1 << 30, dtype=np.int32)
        if final:
            is_last[last] = True
        else:
            # the stream continues past this pass: the last shard's tail is
            # a false end-of-text; trim at its safe cut and resume there
            rs = self.eng._safe_cut_threshold(bytes(buf[last, : nloc[last]]))
            if rs <= 0:
                return None, 0  # single run spans the shard: fall back
            trim[last] = rs
        eng = self.eng
        jnp_ = eng._jnp
        flat, totals, overflow, cends, _ = self._fn(
            jnp_.asarray(buf),
            jnp_.asarray(nloc),
            jnp_.asarray(is_last),
            jnp_.asarray(trim),
            jnp_.asarray(np.arange(D, dtype=np.int32)),
            eng._page_ids, eng._pages, eng._byte_rank, eng._pair_rows,
        )
        if bool(np.asarray(overflow).any()):
            return None, 0
        flat = np.asarray(flat)
        totals = np.asarray(totals)
        cends = np.asarray(cends)
        ids = np.concatenate(
            [flat[d, : totals[d]] for d in range(D)]
        ).astype(np.int64)
        if final:
            return ids, n
        # resume point = global end of the last emitted piece (pieces are
        # contiguous, so this is the max over shards; a shard whose pieces
        # overhang into the next shard's region can exceed that shard's own
        # start when the next shard kept nothing)
        consumed = int(max(d * W + int(cends[d]) for d in range(D)))
        if consumed <= 0:
            return None, 0
        return ids, consumed

    def encode(self, data: bytes) -> np.ndarray:
        D, W = self.D, self.W
        n = len(data)
        if n == 0:
            return np.zeros(0, dtype=np.int64)
        out: list[np.ndarray] = []
        base = 0
        while base < n:
            final = (n - base) <= D * W
            ids, consumed = self._one_pass(data[base : base + D * W], final)
            if ids is None:
                # exactness guard tripped: windowed device path from here
                out.append(self.eng.encode_stream(data[base:]))
                base = n
                break
            out.append(ids)
            base += consumed
        return np.concatenate(out) if out else np.zeros(0, dtype=np.int64)
