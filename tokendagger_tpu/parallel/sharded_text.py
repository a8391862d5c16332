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

Exactness guards:
* **Safe-cut guard** (flags `overflow` -> caller falls back to the
  windowed host/device path): a kept piece may not end past the start of
  the character-class run touching the shard buffer's end (minus
  lookahead slack) unless the buffer ends at the true end of the text —
  the same run-aware analysis as engine._safe_cut_threshold, computed
  in-kernel. A piece ending inside that final run could have had its
  match length truncated by the shard-local false end-of-text.
* **Oversize pieces** (wider than MERGE_WIDTH) do NOT abandon the pass:
  the kernel emits a sentinel id in their flat slot plus the piece's
  (start, len), and the host splices in the exact sequential merge —
  only more than OVERSIZE_CAP such pieces in one shard overflows.

This module is the design/dry-run implementation (validated on virtual CPU
meshes); `sharded_encode_step` in mesh.py remains the packed-rows DP path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..engine import CUT_SLACK
from ..hostengine import byte_pair_merge
from ..ops.merge import merge_rows_local
from ..ops.pretokenize import _cls_lookup, match_lengths_jax, utf8_decode
from ..unicode_tables import LC, LETTER, NUM, UC, WS

DATA_AXIS = "data"
MERGE_WIDTH = 64     # per-piece merge row width in the sharded kernel
OVERSIZE_CAP = 256   # max host-spliced oversize pieces per shard per pass
SENTINEL = np.int32(2**31 - 2)  # flat-stream marker for an oversize piece


def _local_tokenize(
    buf,            # (W+H,) uint8: my bytes + right halo
    nlocal,         # scalar int32: valid bytes in buf (clipped at text end)
    true_eos,       # scalar bool: my buffer ends at the true end of text
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
    true_eos = true_eos.reshape(())
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

    # --- safe-cut exactness guard ----------------------------------------
    # Start of the coarse character-class run touching the end of valid
    # data (run-extent analysis, mirroring engine._safe_cut_threshold): a
    # kept piece ending past (run start - slack) may have been affected by
    # the shard-local false end-of-text, unless this buffer ends at the
    # true end of the text.
    cls = _cls_lookup(cp, page_ids, pages)
    c_ws = (cls & WS) != 0
    c_wd = (cls & (UC | LC | LETTER)) != 0
    c_num = ((cls & NUM) != 0) & ~c_wd
    co = jnp.where(c_ws, 0, jnp.where(c_num, 1, jnp.where(c_wd, 2, 3)))
    valid_char = idx < m
    last_co = co[jnp.clip(m - 1, 0, WH - 1)]
    diffpos = jnp.max(jnp.where(valid_char & (co != last_co), idx, -1))
    run_start_char = diffpos + 1  # 0 when the whole buffer is one run
    run_start_byte = boc[jnp.clip(run_start_char, 0, WH - 1)]
    safe_b = run_start_byte - CUT_SLACK
    unsafe = keep & (end_byte > safe_b) & ~true_eos
    overflow = jnp.any(unsafe)

    # --- compact pieces and merge ----------------------------------------
    R = W  # static piece capacity (pieces are >= 1 byte and start in [0, W))
    pid = jnp.cumsum(keep.astype(jnp.int32)) - 1
    n_pieces = jnp.maximum(jnp.where(jnp.any(keep), pid[-1] + 1, 0), 0)
    tgt = jnp.where(keep, jnp.minimum(pid, R - 1), R)
    s_arr = jnp.zeros((R,), jnp.int32).at[tgt].set(
        jnp.where(keep, start_byte, 0), mode="drop"
    )
    l_arr = jnp.zeros((R,), jnp.int32).at[tgt].set(
        jnp.where(keep, piece_bytes, 0), mode="drop"
    )

    # oversize pieces: merged on host, spliced in at a sentinel slot
    wide = l_arr > MERGE_WIDTH
    wpid = jnp.cumsum(wide.astype(jnp.int32)) - 1
    n_wide = jnp.maximum(jnp.where(jnp.any(wide), wpid[-1] + 1, 0), 0)
    overflow = overflow | (n_wide > OVERSIZE_CAP)
    wtgt = jnp.where(wide, jnp.minimum(wpid, OVERSIZE_CAP - 1), OVERSIZE_CAP)
    os_start = jnp.zeros((OVERSIZE_CAP,), jnp.int32).at[wtgt].set(
        jnp.where(wide, s_arr, 0), mode="drop"
    )
    os_len = jnp.zeros((OVERSIZE_CAP,), jnp.int32).at[wtgt].set(
        jnp.where(wide, l_arr, 0), mode="drop"
    )

    l_merge = jnp.where(wide, 0, l_arr)
    cols = jnp.arange(MERGE_WIDTH, dtype=jnp.int32)[None, :]
    gidx = jnp.clip(s_arr[:, None] + cols, 0, WH - 1)
    rows_buf = jnp.where(cols < l_merge[:, None], buf[gidx], 0)
    tok, counts = merge_rows_local(
        rows_buf, l_merge, byte_rank, pair_rows, mask=mask,
    )
    counts = jnp.where(wide, 1, counts)
    tok = tok.at[:, 0].set(jnp.where(wide, SENTINEL, tok[:, 0]))

    # flatten local tokens
    live = tok >= 0
    out_pos = jnp.cumsum(counts) - counts
    col_rank = jnp.cumsum(live, axis=1) - 1
    cap = W + H  # tokens never outnumber piece bytes (<= buffer bytes)
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
        os_start.reshape(1, -1),
        os_len.reshape(1, -1),
        n_wide.reshape(1),
        total_bytes,
    )


class ShardedTextEncoder:
    """Encode one byte stream data-parallel across a mesh with exact
    halo-reconciled boundaries. Falls back to the windowed single-device
    path whenever the exactness guards trip (counted in ``fallbacks`` /
    ``passes`` for observability)."""

    def __init__(self, device_engine, mesh: Mesh, *, shard_bytes: int = 1 << 17,
                 halo: int = 1 << 14):
        if not device_engine.stream:
            raise ValueError(
                "ShardedTextEncoder requires a stream-capable DeviceEngine "
                "(supported pattern profile, no rank-less bytes)"
            )
        if not device_engine.tables.all_reachable:
            # the sharded kernel is merge-only (no whole-piece join), which
            # matches tiktoken's lookup-then-merge only for reachable vocabs
            raise ValueError(
                "ShardedTextEncoder requires a merge-reachable vocab"
            )
        self.eng = device_engine
        self.mesh = mesh
        self.D = mesh.devices.size
        self.W = shard_bytes
        self.H = halo
        self.passes = 0     # mesh passes attempted
        self.fallbacks = 0  # passes abandoned to the single-device path
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
                    P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
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
        # a shard's buffer may end exactly at the true end of the text (its
        # halo absorbs the tail) — then its false-EOS guard must not fire
        true_eos = np.zeros(D, dtype=bool)
        trim = np.full(D, 1 << 30, dtype=np.int32)
        if final:
            true_eos = (nloc > 0) & (np.arange(D) * W + nloc == n)
        else:
            # the stream continues past this pass: the last shard's tail is
            # a false end-of-text; trim at its safe cut and resume there
            rs = self.eng._safe_cut_threshold(bytes(buf[last, : nloc[last]]))
            if rs <= 0:
                return None, 0  # single run spans the shard: fall back
            trim[last] = rs
        eng = self.eng
        jnp_ = eng._jnp
        flat, totals, overflow, cends, os_start, os_len, n_wide, _ = self._fn(
            jnp_.asarray(buf),
            jnp_.asarray(nloc),
            jnp_.asarray(true_eos),
            jnp_.asarray(trim),
            jnp_.asarray(np.arange(D, dtype=np.int32)),
            eng._page_ids, eng._pages, eng._byte_rank, eng._pair_rows,
        )
        if bool(np.asarray(overflow).any()):
            return None, 0
        flat = np.asarray(flat)
        totals = np.asarray(totals)
        cends = np.asarray(cends)
        os_start = np.asarray(os_start)
        os_len = np.asarray(os_len)
        n_wide = np.asarray(n_wide)
        shard_ids = []
        for d in range(D):
            sf = flat[d, : totals[d]]
            if n_wide[d]:
                sf = self._splice_oversize(
                    sf, data, d * W, os_start[d], os_len[d], int(n_wide[d])
                )
            shard_ids.append(sf)
        ids = np.concatenate(shard_ids).astype(np.int64)
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

    def _splice_oversize(self, shard_flat, data, base, os_start, os_len,
                         n_wide):
        """Replace each SENTINEL slot with the exact sequential merge of
        its oversize piece (sentinels and the compacted (start, len) spans
        are both in piece order)."""
        sent_pos = np.nonzero(shard_flat == SENTINEL)[0]
        assert len(sent_pos) == n_wide, (len(sent_pos), n_wide)
        parts = []
        prev = 0
        for j, p in enumerate(sent_pos):
            parts.append(shard_flat[prev:p])
            s0 = base + int(os_start[j])
            piece = data[s0 : s0 + int(os_len[j])]
            parts.append(
                np.asarray(byte_pair_merge(piece, self.eng.ranks),
                           dtype=shard_flat.dtype)
            )
            prev = p + 1
        parts.append(shard_flat[prev:])
        return np.concatenate(parts)

    def encode(self, data: bytes) -> np.ndarray:
        D, W = self.D, self.W
        n = len(data)
        if n == 0:
            return np.zeros(0, dtype=np.int64)
        out: list[np.ndarray] = []
        base = 0
        while base < n:
            final = (n - base) <= D * W
            self.passes += 1
            ids, consumed = self._one_pass(data[base : base + D * W], final)
            if ids is None:
                # exactness guard tripped: windowed device path from here
                self.fallbacks += 1
                out.append(self.eng.encode_stream(data[base:]))
                base = n
                break
            out.append(ids)
            base += consumed
        return np.concatenate(out) if out else np.zeros(0, dtype=np.int64)
