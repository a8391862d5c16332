r"""Fused device window resolver: join-first encode with merge fallback.

One jitted stage that takes the pretokenizer scan state (char-level piece
starts) plus the raw byte window and produces the final flat token ids on
device — no host round-trips between pretokenization and ids:

  piece keys (elementwise + monotone scatters, ops/join.py)
    -> whole-piece vocab lookup (hash probe by default; sort-join kept
       for runtimes with healthy device sorts) — ~100% of
       natural-language pieces hit
    -> misses compacted into width-bucketed rows (16/64/256), gathered
       from the stream and merged by the row-parallel loop (ops/merge.py)
    -> pieces wider than 256 bytes emit a SENTINEL id for host splicing
    -> flat assembly via cumsum + monotone scatters

Kernel-choice rule learned the hard way on this machine's remote-TPU
runtime: lax.sort, lax.associative_scan, and cumsum-feeding-gather
programs permanently degrade every subsequent dispatch (~400x); plain
gathers, scatters, reductions, elementwise chains, and while_loops are
fast and safe, so everything here is built from the latter set.

Trim semantics: pieces ending after ``trim`` (the windowed safe cut,
engine._safe_cut_threshold) are dropped on device and re-scanned by the
caller's next window; ``consumed`` reports the byte end of the last kept
piece.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .join import compact_piece_keys, vocab_join, vocab_probe8
from .merge import merge_rows_local

SENTINEL = np.int32(2**31 - 2)  # flat-stream marker for an oversize piece

# miss-bucket widths (single-piece merge rows)
W16, W64, W256 = 16, 64, 256


def caps_for(n: int, bytes_per_piece: float = 3.0) -> dict[str, int]:
    """Static capacities for a window of n bytes: piece slots and per-width
    miss-row capacities (merge arrays scale with these, so they are sized
    for realistic worst cases, with an overflow flag for the rest).

    ``bytes_per_piece`` sets the piece-slot capacity (probe/compact/
    finalize cost all scale with it). The default 3.0 covers code and
    short-word corpora (measured 3.7 B/piece on mixed prose+URLs;
    English averages ~4.3-4.5). A caller that knows its corpus density
    may size tighter (e.g. 4.0 for English) — a denser window sets the
    overflow flag and takes the exact fallback path, so a wrong guess
    costs time, never correctness."""
    return dict(
        # Rounded up to a lane multiple: misaligned minor dims cost ~2x
        # on the probe's gathered rows (relayout padding on v5e).
        p_cap=max(512, -(-int(n / bytes_per_piece) // 128) * 128),
        m16=max(256, n // 16),
        m64=max(64, n // 128),
        m256=max(32, n // 1024),
        os_cap=128,
    )


@partial(
    jax.jit,
    static_argnames=(
        "p_cap", "m16", "m64", "m256", "os_cap", "mask", "vhash_mask",
        "join_mode", "miss_mode",
    ),
)
def resolve_window(
    starts_char: jnp.ndarray,   # (N,) bool char-level piece starts
    byte_of_char: jnp.ndarray,  # (N,) int32 char -> byte offset
    data: jnp.ndarray,          # (N,) uint8
    nbytes: jnp.ndarray,        # scalar int32
    trim: jnp.ndarray,          # scalar int32: keep pieces ending <= trim
    byte_rank: jnp.ndarray,
    pair_rows: jnp.ndarray,
    pair_lut: jnp.ndarray,
    vk: jnp.ndarray, vlen: jnp.ndarray, vrank: jnp.ndarray,
    vhash_rows: jnp.ndarray,   # single-hash 8-slot table (vhash8_rows)
    *,
    p_cap: int, m16: int, m64: int, m256: int, os_cap: int, mask: int,
    vhash_mask: int, join_mode: str = "probe", miss_mode: str = "host",
):
    N = data.shape[0]
    bidx = jnp.arange(N, dtype=jnp.int32)
    pslot = jnp.arange(p_cap, dtype=jnp.int32)

    start_b, piece_len, k0, k1, k2, k3, n_pieces = compact_piece_keys(
        starts_char, byte_of_char, data, nbytes, p_cap
    )
    end_b = start_b + piece_len
    live = pslot < jnp.minimum(n_pieces, p_cap)
    kept = live & (end_b <= trim)
    n_kept = jnp.sum(kept.astype(jnp.int32))
    consumed = jnp.max(jnp.where(kept, end_b, 0))

    # whole-piece lookup: the hash probe is the default (2 exact row
    # gathers/piece); the sort-join is kept for runtimes with healthy
    # device sorts (this machine's remote-TPU tunnel degrades every
    # post-sort dispatch ~400x, so "probe" wins here).
    if join_mode == "sort":
        rank = vocab_join(k0, k1, k2, k3, piece_len, vk, vlen, vrank)
    else:
        rank = vocab_probe8(k0, k1, k2, k3, piece_len, vhash_rows,
                            vhash_mask)
    hit = kept & (rank >= 0)
    miss = kept & (rank < 0)

    if miss_mode == "host":
        # Device resolves hits only; every miss emits a SENTINEL slot plus
        # its byte span for exact host-side merging (the splice mechanism
        # used for >256-byte pieces in device mode). This keeps the whole
        # program inside the verified-fast/safe primitive set — the
        # device-merge variant's row packing and width-bucket merges are
        # among the big-lowering kernels that flip this machine's
        # remote-TPU runtime into its degraded dispatch mode.
        overflow = n_pieces > p_cap
        counts = jnp.where(kept, 1, 0)
        out_pos = jnp.cumsum(counts) - counts
        total = jnp.sum(counts)
        flat = jnp.full((N,), -1, jnp.int32)
        flat = flat.at[jnp.where(kept, out_pos, N)].set(
            jnp.where(hit, rank, SENTINEL), mode="drop"
        )
        mpid = jnp.cumsum(miss.astype(jnp.int32)) - 1
        n_ms = jnp.maximum(jnp.where(jnp.any(miss), mpid[-1] + 1, 0), 0)
        mtgt = jnp.where(miss, mpid, p_cap)
        ms_start = jnp.zeros((p_cap,), jnp.int32).at[mtgt].set(
            start_b, mode="drop"
        )
        ms_len = jnp.zeros((p_cap,), jnp.int32).at[mtgt].set(
            piece_len, mode="drop"
        )
        return (flat, total, n_pieces, n_kept, consumed, overflow,
                ms_start, ms_len, n_ms)

    f16 = miss & (piece_len <= W16)
    f64 = miss & (piece_len > W16) & (piece_len <= W64)
    f256 = miss & (piece_len > W64) & (piece_len <= W256)
    fos = miss & (piece_len > W256)

    overflow = n_pieces > p_cap

    # ---- pack miss rows ------------------------------------------------
    # Bucket compaction is scatter-based (monotone indices); the row bytes
    # are then gathered directly from the stream. Direct gathers are fast
    # on a healthy runtime — the formerly-clever byte-distribution pass
    # (piece-id cumsum + monotone gathers) triggered the remote-TPU
    # runtime's degraded dispatch mode, as do lax.sort/associative_scan.
    buckets = []
    for code, (flag, cap, width) in enumerate(
        [(f16, m16, W16), (f64, m64, W64), (f256, m256, W256)]
    ):
        bpid = jnp.cumsum(flag.astype(jnp.int32)) - 1
        nrows = jnp.maximum(jnp.where(jnp.any(flag), bpid[-1] + 1, 0), 0)
        overflow = overflow | (nrows > cap)
        btgt = jnp.where(flag, jnp.minimum(bpid, cap - 1), cap)
        lens_r = jnp.zeros((cap,), jnp.int32).at[btgt].set(
            piece_len, mode="drop"
        )
        s_r = jnp.zeros((cap,), jnp.int32).at[btgt].set(
            start_b, mode="drop"
        )
        src_r = jnp.full((cap,), p_cap, jnp.int32).at[btgt].set(
            pslot, mode="drop"
        )
        buckets.append(dict(cap=cap, width=width, btgt=btgt,
                            lens=lens_r, starts=s_r, src=src_r))

    row_bufs = []
    for b in buckets:
        width = b["width"]
        cols = jnp.arange(width, dtype=jnp.int32)[None, :]
        gidx = jnp.clip(b["starts"][:, None] + cols, 0, N - 1)
        rows_b = jnp.where(
            cols < jnp.minimum(b["lens"], width)[:, None], data[gidx], 0
        )
        row_bufs.append(rows_b)

    # ---- merge the miss rows -------------------------------------------
    merged = []
    for b, rows_buf in zip(buckets, row_bufs):
        tok, cnt = merge_rows_local(
            rows_buf, jnp.minimum(b["lens"], b["width"]), byte_rank,
            pair_rows, mask=mask, pair_lut=pair_lut,
        )
        merged.append((tok, cnt, b))

    # ---- counts and flat assembly --------------------------------------
    counts = jnp.where(hit | fos, 1, 0)
    for tok, cnt, b in merged:
        counts = counts.at[b["src"]].set(cnt, mode="drop")
    counts = jnp.where(kept, counts, 0)
    out_pos = jnp.cumsum(counts) - counts
    total = jnp.sum(counts)

    flat = jnp.full((N,), -1, jnp.int32)
    single = hit | fos
    flat = flat.at[jnp.where(single, out_pos, N)].set(
        jnp.where(fos, SENTINEL, rank), mode="drop"
    )
    def _row_prefix(live):
        """Exclusive within-row rank of live slots via log-shift adds
        (plain elementwise; avoids the axis-1 cumsum kernel)."""
        x = live.astype(jnp.int32)
        w = x.shape[1]
        sh = 1
        while sh < w:
            x = x + jnp.concatenate(
                [jnp.zeros((x.shape[0], sh), x.dtype), x[:, :-sh]], axis=1
            )
            sh *= 2
        return x - live.astype(jnp.int32)

    for tok, cnt, b in merged:
        row_out = jnp.zeros((b["cap"],), jnp.int32).at[b["btgt"]].set(
            out_pos, mode="drop"
        )
        live_tok = tok >= 0
        col_rank = _row_prefix(live_tok)
        fidx = jnp.where(live_tok, row_out[:, None] + col_rank, N)
        flat = flat.at[fidx.reshape(-1)].set(tok.reshape(-1), mode="drop")

    # ---- oversize spans for host splicing ------------------------------
    ospid = jnp.cumsum(fos.astype(jnp.int32)) - 1
    n_os = jnp.maximum(jnp.where(jnp.any(fos), ospid[-1] + 1, 0), 0)
    overflow = overflow | (n_os > os_cap)
    ostgt = jnp.where(fos, jnp.minimum(ospid, os_cap - 1), os_cap)
    os_start = jnp.zeros((os_cap,), jnp.int32).at[ostgt].set(
        start_b, mode="drop"
    )
    os_len = jnp.zeros((os_cap,), jnp.int32).at[ostgt].set(
        piece_len, mode="drop"
    )

    return (flat, total, n_pieces, n_kept, consumed, overflow,
            os_start, os_len, n_os)


@partial(jax.jit, static_argnames=("p_cap", "untrimmed"))
def finalize_host_sorted(
    start_b: jnp.ndarray,
    piece_len: jnp.ndarray,
    rank: jnp.ndarray,
    n_pieces: jnp.ndarray,
    trim: jnp.ndarray,
    *,
    p_cap: int,
    untrimmed: bool = False,
):
    """Sort-based :func:`finalize_host` (same contract): the two
    compactions (kept pieces -> flat id stream, misses -> splice spans)
    run as one small sort each instead of scatters — ~3x faster on v5e
    (tools/probe_prims.py; XLA lowers the scatters through sorts anyway).

    ``untrimmed``: caller guarantees trim >= nbytes (complete windows, no
    safe-cut drop) — then kept == live in slot order already and the flat
    compaction is the identity, so its sort is skipped entirely."""
    pslot = jnp.arange(p_cap, dtype=jnp.int32)
    end_b = start_b + piece_len
    live = pslot < jnp.minimum(n_pieces, p_cap)
    kept = live if untrimmed else (live & (end_b <= trim))
    n_kept = jnp.sum(kept.astype(jnp.int32))
    consumed = jnp.max(jnp.where(kept, end_b, 0))
    overflow = n_pieces > p_cap
    hit = kept & (rank >= 0)
    miss = kept & (rank < 0)
    total = n_kept

    if untrimmed:
        flat = jnp.where(kept, jnp.where(hit, rank, SENTINEL), -1)
    else:
        key = jnp.where(kept, pslot, p_cap + pslot)
        _, vals = jax.lax.sort(
            (key, jnp.where(hit, rank, SENTINEL)), num_keys=1
        )
        flat = jnp.where(pslot < total, vals, -1)

    keym = jnp.where(miss, pslot, p_cap + pslot)
    n_ms = jnp.sum(miss.astype(jnp.int32))
    _, ms_s, ms_l = jax.lax.sort(
        (keym, start_b, piece_len), num_keys=1
    )
    in_ms = pslot < n_ms
    ms_start = jnp.where(in_ms, ms_s, 0)
    ms_len = jnp.where(in_ms, ms_l, 0)
    return (flat, total, n_pieces, n_kept, consumed, overflow,
            ms_start, ms_len, n_ms)


@partial(jax.jit, static_argnames=("p_cap",))
def finalize_host(
    start_b: jnp.ndarray,    # (p_cap,) int32 piece starts (compact_piece_keys)
    piece_len: jnp.ndarray,  # (p_cap,) int32
    rank: jnp.ndarray,       # (p_cap,) int32 whole-piece rank or -1
    n_pieces: jnp.ndarray,   # scalar int32
    trim: jnp.ndarray,       # scalar int32
    n_flat: int | None = None,
    *,
    p_cap: int,
):
    """Final assembly for miss_mode="host", as its OWN dispatch.

    Stage separation is deliberate: fusing this with the key compaction
    and the vocab probe in one jit produces a program that compiles for
    minutes and flips the remote runtime into its degraded dispatch mode
    (docs/PERF.md "dispatch cliff"), even though each stage alone compiles
    in seconds and runs in ~0.1 ms.
    """
    if n_flat is None:
        n_flat = p_cap
    pslot = jnp.arange(p_cap, dtype=jnp.int32)
    end_b = start_b + piece_len
    live = pslot < jnp.minimum(n_pieces, p_cap)
    kept = live & (end_b <= trim)
    n_kept = jnp.sum(kept.astype(jnp.int32))
    consumed = jnp.max(jnp.where(kept, end_b, 0))
    overflow = n_pieces > p_cap
    hit = kept & (rank >= 0)
    miss = kept & (rank < 0)
    counts = jnp.where(kept, 1, 0)
    out_pos = jnp.cumsum(counts) - counts
    total = jnp.sum(counts)
    flat = jnp.full((p_cap,), -1, jnp.int32)
    flat = flat.at[jnp.where(kept, out_pos, p_cap)].set(
        jnp.where(hit, rank, SENTINEL), mode="drop"
    )
    mpid = jnp.cumsum(miss.astype(jnp.int32)) - 1
    n_ms = jnp.maximum(jnp.where(jnp.any(miss), mpid[-1] + 1, 0), 0)
    mtgt = jnp.where(miss, mpid, p_cap)
    ms_start = jnp.zeros((p_cap,), jnp.int32).at[mtgt].set(
        start_b, mode="drop"
    )
    ms_len = jnp.zeros((p_cap,), jnp.int32).at[mtgt].set(
        piece_len, mode="drop"
    )
    return (flat, total, n_pieces, n_kept, consumed, overflow,
            ms_start, ms_len, n_ms)
