r"""Whole-piece vocab lookup as a gather-free sort-merge join.

The reference resolves most pretokens with a single hash lookup of the
whole piece (/root/reference/src/tiktoken/tiktoken.cpp:210-215, mirroring
tiktoken's own ``piece in ranks`` fast path) — on natural language ~100%
of pieces are vocab tokens, so the BPE merge loop runs only on misses.

On TPU, hash probing is the wrong shape: random gathers are latency-bound
(~1e8 accesses/s measured on v5e, regardless of table size), while sorts
and scans stream at GB/s. This module therefore performs the lookup as a
**sort-merge join**, built entirely from TPU-fast primitives:

  1. pieces are keyed by their zero-padded first 16 bytes (4 uint32 words,
     computed by elementwise sliding-window packs + one monotone scatter
     per word — no gathers) plus the byte length;
  2. the query keys are concatenated with the precompiled vocab keys
     (tables.DeviceTables.vocab_keys) and sorted once (stable, vocab
     first);
  3. ranks propagate to equal-keyed queries with a segmented max-scan
     (jax.lax.associative_scan);
  4. a second small sort restores piece order.

Pieces that miss (rank -1) — non-vocab pieces and pieces > 16 bytes — go
to the row-parallel merge loop (ops/merge.py); byte-identical ids either
way, because a whole-piece hit is exactly what the sequential algorithm
would produce.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_PAY_SENTINEL = jnp.int32(0x7FFFFFFF)


def sliding_words(data: jnp.ndarray, nbytes: jnp.ndarray) -> tuple[jnp.ndarray, ...]:
    """Four (N,) uint32 arrays: w[j][i] = bytes i+4j .. i+4j+3 of the
    stream, little-endian, zero beyond ``nbytes``. Pure elementwise."""
    N = data.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    d = jnp.where(idx < nbytes, data, 0).astype(jnp.uint32)

    def shifted(k: int) -> jnp.ndarray:
        if k == 0:
            return d
        return jnp.concatenate([d[k:], jnp.zeros((k,), jnp.uint32)])

    w0 = d | (shifted(1) << 8) | (shifted(2) << 16) | (shifted(3) << 24)

    def word_at(j: int) -> jnp.ndarray:
        if j == 0:
            return w0
        return jnp.concatenate([w0[j:], jnp.zeros((j,), jnp.uint32)])

    return word_at(0), word_at(4), word_at(8), word_at(12)


def sliding_word0(data: jnp.ndarray, nbytes: jnp.ndarray) -> jnp.ndarray:
    """Just ``sliding_words``' first array: w0[i] = bytes i..i+3 LE,
    zero beyond ``nbytes``. The other three words are w0 shifted by
    4/8/12 slots — compact_tiles derives them IN-KERNEL from this one
    array (3 raster rolls + a halo row), so the 3x full-window int32
    materializations never touch HBM."""
    N = data.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    d = jnp.where(idx < nbytes, data, 0).astype(jnp.uint32)

    def shifted(k: int) -> jnp.ndarray:
        return jnp.concatenate([d[k:], jnp.zeros((k,), jnp.uint32)])

    return d | (shifted(1) << 8) | (shifted(2) << 16) | (shifted(3) << 24)


@partial(jax.jit, static_argnames=("p_cap",))
def compact_piece_keys(
    starts_char: jnp.ndarray,   # (N,) bool: char-level piece-start flags
    byte_of_char: jnp.ndarray,  # (N,) int32 char -> byte (padded with nbytes)
    data: jnp.ndarray,          # (N,) uint8 raw stream
    nbytes: jnp.ndarray,        # scalar int32
    p_cap: int,
):
    """Compact piece starts into fixed-capacity per-piece arrays, carrying
    the join key words along. Monotone scatters only.

    Returns (start_b, piece_len, k0..k3, n_pieces); slots >= n_pieces are
    padded with start_b = nbytes, len 0, keys 0xFFFFFFFF. If
    n_pieces > p_cap the caller must fall back (keys are truncated)."""
    N = starts_char.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)

    # byte-level start mask (char positions scatter to their byte offsets)
    tgt_b = jnp.where(starts_char, byte_of_char, N)
    is_start = (
        jnp.zeros((N,), jnp.bool_).at[tgt_b].set(True, mode="drop")
        & (idx < nbytes)
    )
    pid = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    n_pieces = jnp.maximum(pid[-1] + 1, 0)

    tgt = jnp.where(is_start, jnp.minimum(pid, p_cap - 1), p_cap)

    def comp(vals: jnp.ndarray, fill) -> jnp.ndarray:
        return jnp.full((p_cap,), fill, vals.dtype).at[tgt].set(
            vals, mode="drop"
        )

    start_b = comp(idx, 0x7FFFFFFF)
    w0, w4, w8, w12 = sliding_words(data, nbytes)
    k0 = comp(w0, jnp.uint32(0xFFFFFFFF))
    k1 = comp(w4, jnp.uint32(0xFFFFFFFF))
    k2 = comp(w8, jnp.uint32(0xFFFFFFFF))
    k3 = comp(w12, jnp.uint32(0xFFFFFFFF))

    # piece end = next piece's start (last piece ends at nbytes)
    pslot = jnp.arange(p_cap, dtype=jnp.int32)
    nxt_start = jnp.concatenate([start_b[1:], jnp.zeros((1,), start_b.dtype)])
    end_b = jnp.where(pslot == n_pieces - 1, nbytes, nxt_start)
    piece_len = jnp.where(pslot < n_pieces, end_b - start_b, 0)
    start_b = jnp.where(pslot < n_pieces, start_b, nbytes)

    # zero key bytes beyond the piece length (word j covers bytes 4j..4j+3)
    def mask_word(k: jnp.ndarray, j: int) -> jnp.ndarray:
        r = jnp.clip(piece_len - 4 * j, 0, 4)
        m = jnp.where(
            r >= 4,
            jnp.uint32(0xFFFFFFFF),
            (jnp.uint32(1) << (jnp.uint32(8) * r.astype(jnp.uint32)))
            - jnp.uint32(1),
        )
        return k & m

    k0 = mask_word(k0, 0)
    k1 = mask_word(k1, 1)
    k2 = mask_word(k2, 2)
    k3 = mask_word(k3, 3)
    return start_b, piece_len, k0, k1, k2, k3, n_pieces


@partial(jax.jit, static_argnames=("p_cap",))
def compact_piece_keys_sorted(
    starts_b: jnp.ndarray,      # (N,) bool: BYTE-level piece-start flags
    data: jnp.ndarray,          # (N,) uint8 raw stream
    nbytes: jnp.ndarray,        # scalar int32
    p_cap: int,
):
    """Sort-based variant of :func:`compact_piece_keys` taking byte-level
    start flags (ASCII windows: char == byte, so the scanner's flags feed
    straight in; general windows: see pretokenize.starts_to_bytes).

    Measured on v5e: XLA lowers the scatter-compaction to a sort anyway,
    but through a pathological path (~40 ms per (8,1M) scatter vs ~35 ms
    for ONE 5-operand sort doing the whole job — tools/probe_prims.py).
    The sort key is ``idx`` for starts and ``N + idx`` for non-starts:
    unique and order-preserving, so stability is irrelevant and the first
    ``n_pieces`` slots are exactly the piece starts in stream order.

    Returns the same tuple as compact_piece_keys."""
    N = starts_b.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    live_in = starts_b & (idx < nbytes)
    n_pieces = jnp.sum(live_in.astype(jnp.int32))

    w0, w4, w8, w12 = sliding_words(data, nbytes)
    key = jnp.where(live_in, idx, N + idx)
    ks, s0, s1, s2, s3 = jax.lax.sort(
        (key, w0, w4, w8, w12), num_keys=1
    )
    pslot = jnp.arange(p_cap, dtype=jnp.int32)
    live = pslot < jnp.minimum(n_pieces, p_cap)
    start_b = jnp.where(live, ks[:p_cap], nbytes)

    nxt_start = jnp.concatenate([start_b[1:], jnp.zeros((1,), start_b.dtype)])
    end_b = jnp.where(pslot == n_pieces - 1, nbytes, nxt_start)
    piece_len = jnp.where(live, end_b - start_b, 0)

    def mask_word(k: jnp.ndarray, j: int) -> jnp.ndarray:
        r = jnp.clip(piece_len - 4 * j, 0, 4)
        m = jnp.where(
            r >= 4,
            jnp.uint32(0xFFFFFFFF),
            (jnp.uint32(1) << (jnp.uint32(8) * r.astype(jnp.uint32)))
            - jnp.uint32(1),
        )
        # dead slots have piece_len 0 -> mask 0 -> key 0 (as the scatter
        # variant's masking produces)
        return k[:p_cap] & m

    k0 = mask_word(s0, 0)
    k1 = mask_word(s1, 1)
    k2 = mask_word(s2, 2)
    k3 = mask_word(s3, 3)
    return start_b, piece_len, k0, k1, k2, k3, n_pieces


def _vhash_ab_jnp(k0, k1, k2, k3, length):
    """Bit-identical jnp version of tables._vhash_ab."""
    a = (
        k0.astype(jnp.uint32) * jnp.uint32(0x85EBCA77)
        + k2.astype(jnp.uint32) * jnp.uint32(31)
        + length.astype(jnp.uint32) * jnp.uint32(131)
    )
    b = (
        k1.astype(jnp.uint32) * jnp.uint32(0xC2B2AE3D)
        + k3.astype(jnp.uint32) * jnp.uint32(31)
    )
    return a.astype(jnp.int32), b.astype(jnp.int32)


@partial(jax.jit, static_argnames=("vhash_mask",))
def vocab_probe(
    qk0: jnp.ndarray, qk1: jnp.ndarray, qk2: jnp.ndarray, qk3: jnp.ndarray,
    qlen: jnp.ndarray,          # (P,) int32 piece byte lengths
    vhash_rows: jnp.ndarray,    # (nb, 24) int32 (tables._build_vocab_hash)
    vhash_mask: int,            # static bucket mask
) -> jnp.ndarray:
    """Gather-based whole-piece lookup: rank or -1 per query.

    Exactly two 96-byte row gathers per piece with full key comparison —
    the alternative to :func:`vocab_join` for runtimes where device sorts
    are pathological (every post-sort dispatch on this machine's
    remote-TPU tunnel degrades ~400x, measured). Exact: a hit requires
    all 4 key words AND the length to match."""
    from .merge import _mix

    i0 = qk0.astype(jnp.int32)
    i1 = qk1.astype(jnp.int32)
    i2 = qk2.astype(jnp.int32)
    i3 = qk3.astype(jnp.int32)
    a, b = _vhash_ab_jnp(qk0, qk1, qk2, qk3, qlen)
    out = jnp.full(qk0.shape, -1, jnp.int32)
    for which in (0, 1):
        h = _mix(a, b, which, vhash_mask)
        # barrier: see vocab_probe8 (prevents gather rematerialization)
        r = jax.lax.optimization_barrier(vhash_rows[h])  # (P, 24)
        hit = (
            (r[:, 0:4] == i0[:, None])
            & (r[:, 4:8] == i1[:, None])
            & (r[:, 8:12] == i2[:, None])
            & (r[:, 12:16] == i3[:, None])
            & (r[:, 16:20] == qlen[:, None])
        )
        vals = jnp.max(jnp.where(hit, r[:, 20:24], -1), axis=1)
        out = jnp.where((out < 0) & (vals >= 0), vals, out)
    return out


@partial(jax.jit, static_argnames=("vhash8_mask",))
def vocab_probe8(
    qk0: jnp.ndarray, qk1: jnp.ndarray, qk2: jnp.ndarray, qk3: jnp.ndarray,
    qlen: jnp.ndarray,          # (P,) int32 piece byte lengths
    vhash8_rows: jnp.ndarray,   # (nb8, 48) int32 (tables._build_vocab_hash8)
    vhash8_mask: int,
) -> jnp.ndarray:
    """Single-gather whole-piece lookup: rank or -1 per query.

    ONE 192-byte row gather per piece (8 slots) — half the gather count
    of :func:`vocab_probe`, which dominates the resolver's on-chip time
    (the probe is gather-latency-bound). Misses can be deliberate: the
    table drops bucket-overflow entries, and every host splice does the
    oracle's whole-piece dict lookup first, so a false miss is exact."""
    from .merge import _mix

    i0 = qk0.astype(jnp.int32)
    i1 = qk1.astype(jnp.int32)
    i2 = qk2.astype(jnp.int32)
    i3 = qk3.astype(jnp.int32)
    a, b = _vhash_ab_jnp(qk0, qk1, qk2, qk3, qlen)
    h = _mix(a, b, 0, vhash8_mask)
    # barrier: r is consumed by 6 slice-compares; without it XLA
    # rematerializes the row gather into EACH consumer fusion (measured
    # 6x the single-gather cost on v5e — tools/probe_gather.py)
    r = jax.lax.optimization_barrier(vhash8_rows[h])  # (P, 48)
    hit = (
        (r[:, 0:8] == i0[:, None])
        & (r[:, 8:16] == i1[:, None])
        & (r[:, 16:24] == i2[:, None])
        & (r[:, 24:32] == i3[:, None])
        & (r[:, 32:40] == qlen[:, None])
    )
    return jnp.max(jnp.where(hit, r[:, 40:48], -1), axis=1)


def _probe8t_core(qk0, qk1, qk2, qk3, qlen, vhash8_rows, vhash8_mask: int):
    """Shared transposed-probe body (see vocab_probe8t)."""
    from .merge import _mix

    i0 = qk0.astype(jnp.int32)
    i1 = qk1.astype(jnp.int32)
    i2 = qk2.astype(jnp.int32)
    i3 = qk3.astype(jnp.int32)
    a, b = _vhash_ab_jnp(qk0, qk1, qk2, qk3, qlen)
    h = _mix(a, b, 0, vhash8_mask)
    # barrier: keeps the transposed gather result as ONE materialization
    # (40 slice consumers below would otherwise re-gather 40x)
    rT = jax.lax.optimization_barrier(
        jnp.swapaxes(vhash8_rows[h], -1, -2)
    )                                                # (48, P)
    out = jnp.full(qlen.shape, -1, jnp.int32)
    for s in range(8):
        hit = (
            (rT[..., s, :] == i0)
            & (rT[..., 8 + s, :] == i1)
            & (rT[..., 16 + s, :] == i2)
            & (rT[..., 24 + s, :] == i3)
            & (rT[..., 32 + s, :] == qlen)
        )
        out = jnp.maximum(
            out, jnp.where(hit, rT[..., 40 + s, :], -1)
        )
    return out


@partial(jax.jit, static_argnames=("vhash8_mask",))
def vocab_probe8t(
    qk0: jnp.ndarray, qk1: jnp.ndarray, qk2: jnp.ndarray, qk3: jnp.ndarray,
    qlen: jnp.ndarray,          # (P,) int32 piece byte lengths
    vhash8_rows: jnp.ndarray,   # (nb8, 48) int32 (tables._build_vocab_hash8)
    vhash8_mask: int,
) -> jnp.ndarray:
    """Transposed-compare whole-piece lookup: rank or -1 per query.

    Identical table and result to :func:`vocab_probe8`, but the gathered
    rows are materialized TRANSPOSED — (48, P) instead of (P, 48) — so
    every subsequent compare/select is a full-lane op on minor dim P.
    vocab_probe8's extra cost is not the gather or the materialization
    (barrier + sum == raw gather, 5.75 vs 5.74 ms at 2.8M rows on v5e)
    but its (P, 8)-shaped compare intermediates, which run at 8/128 lane
    utilization. Measured (tools/probe_gather.py, 2.8M pieces):
    probe8 15.94 ms -> probe8t 7.57 ms, vs the 5.69 ms issue-bound
    gather floor (491 Mrows/s regardless of row width)."""
    return _probe8t_core(qk0, qk1, qk2, qk3, qlen, vhash8_rows, vhash8_mask)


@partial(jax.jit, static_argnames=("vhash8_mask", "n_chunks"))
def vocab_probe8t_chunks(
    qk0: jnp.ndarray, qk1: jnp.ndarray, qk2: jnp.ndarray, qk3: jnp.ndarray,
    qlen: jnp.ndarray,          # (..., P) int32 piece byte lengths
    vhash8_rows: jnp.ndarray,   # (nb8, 48) int32
    vhash8_mask: int,
    n_chunks: int = 16,
) -> jnp.ndarray:
    """Statically chunked transposed probe: identical result to
    :func:`vocab_probe8t`, ~31% faster at pipeline scale.

    The monolithic probe materializes the transposed gather as ONE
    (48, P) array (537 MB at 8 windows x cap-3.0) whose write + 40
    slice-compare reads are HBM-bound on top of the issue-bound gather.
    Slicing the query into ``n_chunks`` static spans (no control flow —
    lax.cond/while bodies cost ~1.5 ms each on v5e, measured in
    tools/probe_chunked.py) keeps each materialization small enough to
    overlap with the neighbouring chunks' gathers. Chip sweep
    (results/probe_chunks_sweep.log, 2.8M rows): monolithic 8.92 ms,
    4 chunks 10.01, 8 -> 7.64, **16 -> 6.17**, 32 -> 6.38, 64 -> 6.28,
    vs the 5.65 ms raw-gather issue floor (491 Mrows/s at any table
    size/row width — tools/probe_gather_size.py)."""
    P = qk0.shape[-1]
    # ceil-split WITHOUT lane-aligning the span: rounding ch up to a
    # 128-multiple (so every (48, ch) materialization has an aligned
    # minor dim) was measured in-pipeline at 4681 µs vs 4559 µs for the
    # plain split at p_cap 240512 — the misaligned-minor-dim tax does
    # not apply to these concat slices, and the larger span loses more
    # to tail imbalance than alignment saves.
    ch = -(-P // n_chunks)
    outs = []
    for i in range(n_chunks):
        lo = i * ch
        hi = min(P, lo + ch)
        if lo >= hi:
            break
        sl = (Ellipsis, slice(lo, hi))
        outs.append(_probe8t_core(
            qk0[sl], qk1[sl], qk2[sl], qk3[sl], qlen[sl],
            vhash8_rows, vhash8_mask))
    return jnp.concatenate(outs, axis=-1)


@partial(jax.jit, static_argnames=("vhash8_mask", "chunk"))
def vocab_probe8t_chunked(
    qk0: jnp.ndarray, qk1: jnp.ndarray, qk2: jnp.ndarray, qk3: jnp.ndarray,
    qlen: jnp.ndarray,          # (P,) int32 piece byte lengths
    n_live: jnp.ndarray,        # scalar int32: live pieces (prefix of P)
    vhash8_rows: jnp.ndarray,   # (nb8, 48) int32
    vhash8_mask: int,
    chunk: int = 1 << 15,
) -> jnp.ndarray:
    """Live-prefix probe: gather cost scales with the ACTUAL piece count,
    not the padded capacity.

    The compacted piece arrays are live-prefix by construction (slots >=
    n_live are pads), yet :func:`vocab_probe8t` issues one row gather per
    CAPACITY slot — the probe is issue-bound (491 Mrows/s on v5e), so a
    worst-case-safe capacity (3.0 B/piece) paid ~40% more probe time than
    the corpus needed (English sits at ~4.3 B/piece). Here the probe runs
    as a fori_loop (-> while_loop, dynamic trip count) over chunk-sized
    prefix windows, stopping after ceil(n_live/chunk); pad slots beyond
    the probed prefix keep rank -1, which downstream masks by liveness.
    Under vmap the loop runs to the max chunk count in the batch.
    while_loop + plain 1-D row gathers are both in this runtime's
    safe-dispatch set (docs/PERF.md "dispatch cliff")."""
    P = qk0.shape[0]
    chunk = min(chunk, P)

    def body(i, acc):
        # clamp the final chunk to the array end: the overlap re-probes a
        # few already-probed slots with identical results
        s = jnp.minimum(i * chunk, P - chunk)

        def sl(x):
            return jax.lax.dynamic_slice_in_dim(x, s, chunk)

        r = _probe8t_core(sl(qk0), sl(qk1), sl(qk2), sl(qk3), sl(qlen),
                          vhash8_rows, vhash8_mask)
        return jax.lax.dynamic_update_slice_in_dim(acc, r, s, 0)

    n_iters = (jnp.maximum(n_live, 0) + chunk - 1) // chunk
    out0 = jnp.full((P,), -1, jnp.int32)
    return jax.lax.fori_loop(0, n_iters, body, out0)


def piece_key_words(piece: bytes) -> tuple[int, int, int, int, int]:
    """Host-side (k0, k1, k2, k3, len) of a piece — bit-identical to the
    device's compact_piece_keys key derivation (first 16 bytes LE,
    zero-padded; bytes beyond the length masked)."""
    b = piece[:16] + b"\0" * max(0, 16 - len(piece))
    return (
        int.from_bytes(b[0:4], "little"),
        int.from_bytes(b[4:8], "little"),
        int.from_bytes(b[8:12], "little"),
        int.from_bytes(b[12:16], "little"),
        len(piece),
    )


def vocab_probe_hot(
    qk0: jnp.ndarray, qk1: jnp.ndarray, qk2: jnp.ndarray, qk3: jnp.ndarray,
    qlen: jnp.ndarray,          # (B, P) int32 piece byte lengths (0 = pad)
    vhash8_rows: jnp.ndarray,   # (nb8, 48) int32
    vhash8_mask: int,
    *,
    hot_keys: tuple,            # static ((k0,k1,k2,k3,len), ...) <=16 B
    hot_ranks: tuple,           # static ranks (-1 = known non-vocab piece)
    u_cap: int,                 # static slots for compacted unknowns
    n_chunks: int = 48,
    tile_rows: int = 256,
    interpret: bool = False,
):
    """Whole-piece lookup with hot-piece pre-answering: rank or -1 per
    slot, plus a per-window overflow flag.

    The probe's row gather pays the chip's issue rate per SLOT and sits
    within ~8% of that floor at the flagship shape (docs/PERF.md) — the
    only remaining lever is gathering FEWER rows. Real corpora repeat a
    small piece set (" the", " of", …); pieces equal to a host-chosen
    hot key (full-lane compares, ~0.07 ms for 32 keys at 1.9M slots —
    tools/probe_starts5.py) are answered from baked constants (exact:
    the table stores only <=16-byte tokens, so (key16, len) equality is
    token identity; a hot rank of -1 reproduces the probe's miss for a
    common non-vocab piece). Only the remaining pieces ride the gather,
    compacted to a dense exact-counted ``u_cap`` prefix and distributed
    back by recorded-route inverse replay — the same machinery as
    bitplane.class_lookup_hot.

    P must be a multiple of 32 * tile_rows * 128 / 32 (32768 with the
    default tiles); u_cap a multiple of 128, >= the actual non-hot piece
    count (overflow flags the window for the exact fallback otherwise).
    """
    import jax

    from .compact_pallas import (
        LANES, compact_tiles_masked, degap_record, expand_tiles_replay,
        regap_replay,
    )

    B, P = qk0.shape
    hot = jnp.zeros(qk0.shape, jnp.bool_)
    rhot = jnp.full(qk0.shape, -1, jnp.int32)
    for (h0, h1, h2, h3, hl), r in zip(hot_keys, hot_ranks):
        m = (
            (qk0 == jnp.uint32(h0)) & (qk1 == jnp.uint32(h1))
            & (qk2 == jnp.uint32(h2)) & (qk3 == jnp.uint32(h3))
            & (qlen == jnp.int32(hl))
        )
        hot = hot | m
        rhot = jnp.where(m, jnp.int32(r), rhot)
    live = qlen > 0
    unknown = live & ~hot

    bc = jax.lax.bitcast_convert_type
    gapped, cnts, tile_takes = compact_tiles_masked(
        [bc(qk0, jnp.int32), bc(qk1, jnp.int32), bc(qk2, jnp.int32),
         bc(qk3, jnp.int32), qlen],
        unknown, out_cap=u_cap, tile_rows=tile_rows, interpret=interpret,
    )
    dense, degap_takes = degap_record(
        list(gapped), cnts, p_rows=u_cap // LANES, interpret=interpret,
    )
    d0, d1, d2, d3, dl = [d.reshape(B, u_cap) for d in dense]
    r_u = vocab_probe8t_chunks(
        bc(d0, jnp.uint32), bc(d1, jnp.uint32), bc(d2, jnp.uint32),
        bc(d3, jnp.uint32), dl, vhash8_rows, vhash8_mask,
        n_chunks=n_chunks,
    )
    gap_r = regap_replay(
        r_u, degap_takes, cnts.shape[1] * LANES, interpret=interpret,
    )
    r_back = expand_tiles_replay(
        gap_r, unknown, tile_takes, cnts, tile_rows=tile_rows,
        interpret=interpret,
    )
    rank = jnp.where(hot, rhot, jnp.where(unknown, r_back, -1))
    rank = jnp.where(live, rank, -1)
    overflow = jnp.sum(cnts, axis=1) > u_cap
    return rank, overflow


def vocab_probe8_np(qk, qlen, vhash8_rows, vhash8_mask):
    """Numpy reference of vocab_probe8 (for tests)."""
    from ..tables import _mix_hash, _vhash_ab

    a, b = _vhash_ab(qk[:, 0], qk[:, 1], qk[:, 2], qk[:, 3], qlen)
    h = _mix_hash(a, b, 0, vhash8_mask)
    r = vhash8_rows[h]
    ik = qk.view(np.int32).reshape(len(qlen), 4)
    hit = (
        (r[:, 0:8] == ik[:, 0:1]) & (r[:, 8:16] == ik[:, 1:2])
        & (r[:, 16:24] == ik[:, 2:3]) & (r[:, 24:32] == ik[:, 3:4])
        & (r[:, 32:40] == qlen[:, None])
    )
    return np.where(hit, r[:, 40:48], -1).max(axis=1)


def vocab_probe_np(qk, qlen, vhash_rows, vhash_mask):
    """Numpy reference of vocab_probe (for tests)."""
    from ..tables import _mix_hash, _vhash_ab

    a, b = _vhash_ab(qk[:, 0], qk[:, 1], qk[:, 2], qk[:, 3], qlen)
    out = np.full(len(qlen), -1, np.int32)
    ik = qk.view(np.int32).reshape(len(qlen), 4)
    for which in (0, 1):
        h = _mix_hash(a, b, which, vhash_mask)
        r = vhash_rows[h]
        hit = (
            (r[:, 0:4] == ik[:, 0:1]) & (r[:, 4:8] == ik[:, 1:2])
            & (r[:, 8:12] == ik[:, 2:3]) & (r[:, 12:16] == ik[:, 3:4])
            & (r[:, 16:20] == qlen[:, None])
        )
        vals = np.where(hit, r[:, 20:24], -1).max(axis=1)
        out = np.where((out < 0) & (vals >= 0), vals, out)
    return out


def _seg_fill_op(x, y):
    """Segmented forward max-fill: (break, value) pairs; a break discards
    everything to its left. Associative."""
    bx, vx = x
    by, vy = y
    return bx | by, jnp.where(by != 0, vy, jnp.maximum(vx, vy))


@jax.jit
def vocab_join(
    qk0: jnp.ndarray, qk1: jnp.ndarray, qk2: jnp.ndarray, qk3: jnp.ndarray,
    qlen: jnp.ndarray,          # (P,) int32 piece byte lengths
    vk: jnp.ndarray,            # (V, 4) uint32 vocab key words
    vlen: jnp.ndarray,          # (V,) int32
    vrank: jnp.ndarray,         # (V,) int32
) -> jnp.ndarray:
    """Rank of each query piece's exact whole-bytes vocab match, -1 on
    miss. One stable 7-operand sort + segmented scan + one 2-operand sort;
    no random gathers."""
    P = qk0.shape[0]
    V = vk.shape[0]

    k0 = jnp.concatenate([vk[:, 0], qk0])
    k1 = jnp.concatenate([vk[:, 1], qk1])
    k2 = jnp.concatenate([vk[:, 2], qk2])
    k3 = jnp.concatenate([vk[:, 3], qk3])
    kl = jnp.concatenate([vlen, qlen]).astype(jnp.int32)
    val = jnp.concatenate([vrank, jnp.full((P,), -1, jnp.int32)])
    pay = jnp.concatenate(
        [jnp.full((V,), _PAY_SENTINEL), jnp.arange(P, dtype=jnp.int32)]
    )

    k0s, k1s, k2s, k3s, kls, vals, pays = jax.lax.sort(
        (k0, k1, k2, k3, kl, val, pay), num_keys=5, is_stable=True
    )

    def neq_prev(a):
        return jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), a[1:] != a[:-1]]
        )

    brk = (
        neq_prev(k0s) | neq_prev(k1s) | neq_prev(k2s) | neq_prev(k3s)
        | neq_prev(kls)
    ).astype(jnp.int32)

    _, filled = jax.lax.associative_scan(_seg_fill_op, (brk, vals))

    # restore piece order: query payloads are unique 0..P-1, vocab entries
    # carry the sentinel and sort to the back
    _, res = jax.lax.sort((pays, filled), num_keys=1)
    return res[:P]
