"""Device table compilation.

Compiles a mergeable-ranks vocabulary into fixed-shape integer arrays the
TPU kernels consume:

* **Pair-merge table** — the key insight that makes BPE merging a pure
  integer problem on device: during a BPE merge every part is itself a
  vocab token, so the reference's byte-slice rank lookup
  (/root/reference/src/tiktoken/tiktoken.cpp:282-296, which hashes the raw
  bytes spanning two parts) is equivalent to a lookup keyed by the *pair of
  token ids* ``(a, b) -> rank(bytes(a) + bytes(b))``. The full relation is
  enumerated at build time from every 2-split of every vocab token, then
  packed into a two-choice bucketed hash table with a guaranteed
  2-gather lookup.
* **byte→rank table** — initial token ids for single bytes.
* **decode table** — rank → (offset, length) into a concatenated byte blob.

All arrays are plain numpy; jax conversion happens in the ops layer.
Compiled tables are cached on disk keyed by a content hash of the vocab.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass
from pathlib import Path

import numpy as np

MAX_RANK = np.int32(0x7FFFFFFF)
BUCKET = 4  # slots per hash bucket

# Distinct multiplicative mixing constants for the two hash choices.
_MIX = (
    (0x9E3779B1, 0x85EBCA77, 0x7FEB352D),
    (0xC2B2AE3D, 0x27D4EB2F, 0x165667B1),
)


def _mix_hash(a: np.ndarray, b: np.ndarray, which: int, mask: int) -> np.ndarray:
    """32-bit multiply-xor mix of a token-id pair. uint32 wraparound
    arithmetic — must stay bit-identical to the jax version in ops/merge.py."""
    c1, c2, c3 = _MIX[which]
    h = a.astype(np.uint32) * np.uint32(c1) + b.astype(np.uint32) * np.uint32(c2)
    h ^= h >> np.uint32(16)
    h *= np.uint32(c3)
    h ^= h >> np.uint32(15)
    return (h & np.uint32(mask)).astype(np.int64)


@dataclass
class PairTable:
    """Two-choice bucketed hash table for (a, b) -> merged rank.

    ``rows`` has shape (nbuckets, 12) int32: per bucket 4 slots laid out as
    [ka0..ka3, kb0..kb3, val0..val3]; empty slots have ka == -1.
    A lookup gathers exactly two rows (h1, h2) and compares 8 slots.
    """

    rows: np.ndarray
    mask: int  # nbuckets - 1
    n_keys: int

    @staticmethod
    def build(pairs_a: np.ndarray, pairs_b: np.ndarray, vals: np.ndarray) -> "PairTable":
        n = len(pairs_a)
        nbuckets = 1 << max(10, int(np.ceil(np.log2(max(1, n) / 1.5))))
        for _attempt in range(3):
            mask = nbuckets - 1
            ka = np.full((nbuckets, BUCKET), -1, dtype=np.int32)
            kb = np.zeros((nbuckets, BUCKET), dtype=np.int32)
            va = np.zeros((nbuckets, BUCKET), dtype=np.int32)
            fill = np.zeros(nbuckets, dtype=np.int64)

            remaining = np.arange(n)
            ok = True
            for which in (0, 1):
                if len(remaining) == 0:
                    break
                h = _mix_hash(pairs_a[remaining], pairs_b[remaining], which, mask)
                # stable group-by bucket; rank within group
                order = np.argsort(h, kind="stable")
                hs = h[order]
                group_start = np.r_[0, np.flatnonzero(np.diff(hs)) + 1]
                rank_in_group = np.arange(len(hs)) - np.repeat(
                    group_start, np.diff(np.r_[group_start, len(hs)])
                )
                slot = fill[hs] + rank_in_group
                accept = slot < BUCKET
                idx = remaining[order][accept]
                bkt = hs[accept]
                sl = slot[accept]
                ka[bkt, sl] = pairs_a[idx]
                kb[bkt, sl] = pairs_b[idx]
                va[bkt, sl] = vals[idx]
                np.add.at(fill, hs[accept], 1)
                remaining = remaining[order][~accept]
            if len(remaining) == 0 and ok:
                rows = np.concatenate([ka, kb, va], axis=1)  # (nb, 12)
                return PairTable(rows=rows, mask=mask, n_keys=n)
            nbuckets <<= 1  # overflow (astronomically rare): grow and retry
        raise RuntimeError("pair hash table build failed after growth retries")

    def lookup_np(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """Numpy reference lookup (for tests)."""
        out = np.full(a.shape, MAX_RANK, dtype=np.int32)
        for which in (0, 1):
            h = _mix_hash(a, b, which, self.mask)
            rows = self.rows[h]
            hit = (rows[..., 0:4] == a[..., None]) & (rows[..., 4:8] == b[..., None])
            anyhit = hit.any(-1)
            vals = np.where(hit, rows[..., 8:12], -1).max(-1)
            out = np.where(anyhit & (out == MAX_RANK), vals, out)
        return out


@dataclass
class DeviceTables:
    pair: PairTable
    pair_lut: np.ndarray         # (256, 256) int32: rank of 2-byte token, MAX if none
    byte_rank: np.ndarray        # (256,) int32, -1 if byte has no rank
    decode_offsets: np.ndarray   # (n_ids,) int64 into decode_blob
    decode_lengths: np.ndarray   # (n_ids,) int32, -1 for unknown id
    decode_blob: np.ndarray      # (total_bytes,) uint8
    n_vocab: int
    # True iff byte_pair_merge(token_bytes) == [rank] for every vocab token.
    # When it holds, a merge-only encode is bit-identical to tiktoken's
    # whole-piece-lookup-then-merge; when it doesn't, merge-only paths must
    # be disabled (tiktoken's fast path would win on unreachable tokens).
    all_reachable: bool
    # Whole-piece sort-join keys: every vocab token of <= 16 bytes, packed
    # as 4 little-endian uint32 words (zero-padded) + byte length + rank.
    # The device join (ops/join.py) sorts query pieces against these —
    # random-gather-free, which is what the TPU wants (sorts stream at
    # GB/s; gathers are latency-bound at ~1e8/s, measured on v5e).
    vocab_keys: np.ndarray       # (V, 4) uint32
    vocab_lens: np.ndarray       # (V,) int32
    vocab_ranks: np.ndarray      # (V,) int32
    # Two-choice bucketed hash over the same whole-piece keys: rows of
    # 4 slots x [k0,k1,k2,k3,len,rank] (24 int32). A lookup gathers two
    # 96-byte rows and compares exactly — the gather-based alternative to
    # the sort-join for runtimes where device sorts are pathological
    # (the remote-TPU tunnel here degrades every post-sort dispatch).
    vhash_rows: np.ndarray       # (nb, 24) int32
    vhash_mask: int
    # Single-hash bucketed variant: 8 slots per bucket in ONE row, so a
    # lookup is ONE 192-byte row gather instead of two 96-byte ones — the
    # probe is gather-latency-bound, so this halves its cost. Entries
    # whose bucket overflows are DROPPED (a deliberate false miss): exact
    # because every host splice does the oracle's whole-piece dict lookup
    # before merging (engine._splice_oversize / _merge_unique).
    vhash8_rows: np.ndarray      # (nb8, 48) int32
    vhash8_mask: int
    vhash8_dropped: int


def _vocab_digest(ranks: dict[bytes, int], special_tokens: dict[str, int]) -> str:
    h = hashlib.sha256()
    for tb in sorted(ranks):
        h.update(tb)
        h.update(ranks[tb].to_bytes(4, "little"))
    for s in sorted(special_tokens):
        h.update(s.encode())
        h.update(special_tokens[s].to_bytes(4, "little"))
    return h.hexdigest()[:16]


def _cache_dir() -> Path:
    from .utils.cachedir import cache_dir

    return cache_dir()


def _vhash_ab(k0: np.ndarray, k1: np.ndarray, k2: np.ndarray,
              k3: np.ndarray, length: np.ndarray):
    """Fold the 4 key words + length into the (a, b) pair fed to
    _mix_hash. uint32 wraparound; must stay bit-identical to the jnp
    version in ops/join.py."""
    a = (k0.astype(np.uint32) * np.uint32(0x85EBCA77)
         + k2.astype(np.uint32) * np.uint32(31)
         + length.astype(np.uint32) * np.uint32(131))
    b = (k1.astype(np.uint32) * np.uint32(0xC2B2AE3D)
         + k3.astype(np.uint32) * np.uint32(31))
    return a.astype(np.int32), b.astype(np.int32)


def _build_vocab_hash(vocab_keys: np.ndarray, vocab_lens: np.ndarray,
                      vocab_ranks: np.ndarray):
    """Two-choice bucketed hash over whole-piece keys; same insertion
    strategy as PairTable.build. Rows: 4 slots x [k0,k1,k2,k3,len,rank],
    empty slots have len == -1."""
    n = len(vocab_lens)
    a_all, b_all = _vhash_ab(
        vocab_keys[:, 0], vocab_keys[:, 1], vocab_keys[:, 2],
        vocab_keys[:, 3], vocab_lens,
    )
    nbuckets = 1 << max(10, int(np.ceil(np.log2(max(1, n) / 1.5))))
    for _attempt in range(3):
        mask = nbuckets - 1
        slots = np.zeros((nbuckets, 4, 6), dtype=np.int32)
        slots[:, :, 4] = -1  # len == -1 marks empty
        fill = np.zeros(nbuckets, dtype=np.int64)
        remaining = np.arange(n)
        for which in (0, 1):
            if len(remaining) == 0:
                break
            h = _mix_hash(a_all[remaining], b_all[remaining], which, mask)
            order = np.argsort(h, kind="stable")
            hs = h[order]
            group_start = np.r_[0, np.flatnonzero(np.diff(hs)) + 1]
            rank_in_group = np.arange(len(hs)) - np.repeat(
                group_start, np.diff(np.r_[group_start, len(hs)])
            )
            slot = fill[hs] + rank_in_group
            accept = slot < 4
            idx = remaining[order][accept]
            bkt = hs[accept]
            sl = slot[accept]
            slots[bkt, sl, 0:4] = vocab_keys[idx].view(np.int32)
            slots[bkt, sl, 4] = vocab_lens[idx]
            slots[bkt, sl, 5] = vocab_ranks[idx]
            np.add.at(fill, hs[accept], 1)
            remaining = remaining[order][~accept]
        if len(remaining) == 0:
            # (nb, 24): slot-major [k0 x4][k1 x4][k2 x4][k3 x4][len x4][rank x4]
            rows = slots.transpose(0, 2, 1).reshape(nbuckets, 24).copy()
            return rows, mask
        nbuckets <<= 1
    raise RuntimeError("vocab hash table build failed after growth retries")


def _build_vocab_hash8(vocab_keys: np.ndarray, vocab_lens: np.ndarray,
                       vocab_ranks: np.ndarray):
    """Single-hash bucketed table: 8 slots x [k0,k1,k2,k3,len,rank] per
    row (48 int32 = 192 B). Entries that do not fit their bucket are
    dropped (returned count) — lookups of those tokens become exact false
    misses resolved by the host's whole-piece dict lookup. Rows are
    slot-major like the two-choice table: [k0 x8][k1 x8]...[rank x8]."""
    n = len(vocab_lens)
    a_all, b_all = _vhash_ab(
        vocab_keys[:, 0], vocab_keys[:, 1], vocab_keys[:, 2],
        vocab_keys[:, 3], vocab_lens,
    )
    nbuckets = 1 << max(10, int(np.ceil(np.log2(max(1, n) / 1.5))))
    mask = nbuckets - 1
    slots = np.zeros((nbuckets, 8, 6), dtype=np.int32)
    slots[:, :, 4] = -1  # len == -1 marks empty
    h = _mix_hash(a_all, b_all, 0, mask)
    order = np.argsort(h, kind="stable")
    hs = h[order]
    group_start = np.r_[0, np.flatnonzero(np.diff(hs)) + 1]
    rank_in_group = np.arange(len(hs)) - np.repeat(
        group_start, np.diff(np.r_[group_start, len(hs)])
    )
    accept = rank_in_group < 8
    idx = order[accept]
    bkt = hs[accept]
    sl = rank_in_group[accept]
    slots[bkt, sl, 0:4] = vocab_keys[idx].view(np.int32)
    slots[bkt, sl, 4] = vocab_lens[idx]
    slots[bkt, sl, 5] = vocab_ranks[idx]
    rows = slots.transpose(0, 2, 1).reshape(nbuckets, 48).copy()
    return rows, mask, int(n - accept.sum())


def build_tables(
    ranks: dict[bytes, int],
    special_tokens: dict[str, int] | None = None,
    *,
    use_cache: bool = True,
) -> DeviceTables:
    special_tokens = special_tokens or {}
    # v7: added single-hash 8-slot vocab table (bump on schema changes)
    cache_path = _cache_dir() / f"tables_v7_{_vocab_digest(ranks, special_tokens)}.npz"
    if use_cache and cache_path.exists():
        z = np.load(cache_path)
        return DeviceTables(
            pair=PairTable(rows=z["pair_rows"], mask=int(z["pair_mask"]), n_keys=int(z["pair_n"])),
            pair_lut=z["pair_lut"],
            byte_rank=z["byte_rank"],
            decode_offsets=z["decode_offsets"],
            decode_lengths=z["decode_lengths"],
            decode_blob=z["decode_blob"],
            n_vocab=int(z["n_vocab"]),
            all_reachable=bool(z["all_reachable"]),
            vocab_keys=z["vocab_keys"],
            vocab_lens=z["vocab_lens"],
            vocab_ranks=z["vocab_ranks"],
            vhash_rows=z["vhash_rows"],
            vhash_mask=int(z["vhash_mask"]),
            vhash8_rows=z["vhash8_rows"],
            vhash8_mask=int(z["vhash8_mask"]),
            vhash8_dropped=int(z["vhash8_dropped"]),
        )

    # --- pair-merge relation: every 2-split of every vocab token -----------
    pa: list[int] = []
    pb: list[int] = []
    pv: list[int] = []
    for tb, rank in ranks.items():
        if len(tb) < 2:
            continue
        for i in range(1, len(tb)):
            ra = ranks.get(tb[:i])
            rb = ranks.get(tb[i:])
            if ra is not None and rb is not None:
                pa.append(ra)
                pb.append(rb)
                pv.append(rank)
    pair = PairTable.build(
        np.asarray(pa, dtype=np.int32),
        np.asarray(pb, dtype=np.int32),
        np.asarray(pv, dtype=np.int32),
    )

    # --- byte -> rank -------------------------------------------------------
    byte_rank = np.full(256, -1, dtype=np.int32)
    for i in range(256):
        r = ranks.get(bytes([i]))
        if r is not None:
            byte_rank[i] = r

    # --- 2-byte pair LUT (first merge round; MXU one-hot lookups) ----------
    pair_lut = np.full((256, 256), MAX_RANK, dtype=np.int32)
    for tb, rank in ranks.items():
        if len(tb) == 2:
            pair_lut[tb[0], tb[1]] = rank

    # --- decode tables (ordinary + special ids in one address space) -------
    max_id = max(max(ranks.values()), max(special_tokens.values(), default=0))
    n_ids = max_id + 1
    decode_lengths = np.full(n_ids, -1, dtype=np.int32)
    decode_offsets = np.zeros(n_ids, dtype=np.int64)
    blob_parts: list[bytes] = []
    off = 0
    for tb, rank in ranks.items():
        decode_offsets[rank] = off
        decode_lengths[rank] = len(tb)
        blob_parts.append(tb)
        off += len(tb)
    for s, rank in special_tokens.items():
        sb = s.encode("utf-8")
        decode_offsets[rank] = off
        decode_lengths[rank] = len(sb)
        blob_parts.append(sb)
        off += len(sb)
    decode_blob = np.frombuffer(b"".join(blob_parts), dtype=np.uint8).copy()

    # --- whole-piece join keys (tokens <= 16 bytes; covers ~97% of the
    # Llama-4 vocab and ~100% of natural-language pieces) ------------------
    short = [(tb, rank) for tb, rank in ranks.items() if len(tb) <= 16]
    V = len(short)
    kbuf = np.zeros((V, 16), dtype=np.uint8)
    vocab_lens = np.zeros(V, dtype=np.int32)
    vocab_ranks = np.zeros(V, dtype=np.int32)
    for i, (tb, rank) in enumerate(short):
        kbuf[i, : len(tb)] = np.frombuffer(tb, dtype=np.uint8)
        vocab_lens[i] = len(tb)
        vocab_ranks[i] = rank
    vocab_keys = kbuf.view("<u4").reshape(V, 4)
    vhash_rows, vhash_mask = _build_vocab_hash(
        vocab_keys, vocab_lens, vocab_ranks
    )
    vhash8_rows, vhash8_mask, vhash8_dropped = _build_vocab_hash8(
        vocab_keys, vocab_lens, vocab_ranks
    )

    # --- merge-reachability audit ------------------------------------------
    from .hostengine import byte_pair_encode

    all_reachable = True
    for tb, rank in ranks.items():
        if len(tb) < 2:
            continue
        if any(byte_rank[b] < 0 for b in tb) or byte_pair_encode(tb, ranks) != [rank]:
            all_reachable = False
            break

    tables = DeviceTables(
        pair=pair,
        pair_lut=pair_lut,
        byte_rank=byte_rank,
        decode_offsets=decode_offsets,
        decode_lengths=decode_lengths,
        decode_blob=decode_blob,
        n_vocab=n_ids,
        all_reachable=all_reachable,
        vocab_keys=vocab_keys,
        vocab_lens=vocab_lens,
        vocab_ranks=vocab_ranks,
        vhash_rows=vhash_rows,
        vhash_mask=vhash_mask,
        vhash8_rows=vhash8_rows,
        vhash8_mask=vhash8_mask,
        vhash8_dropped=vhash8_dropped,
    )
    if use_cache:
        tmp = cache_path.with_suffix(f".tmp{os.getpid()}.npz")
        np.savez_compressed(
            tmp,
            pair_rows=pair.rows,
            pair_mask=pair.mask,
            pair_n=pair.n_keys,
            pair_lut=pair_lut,
            byte_rank=byte_rank,
            decode_offsets=decode_offsets,
            decode_lengths=decode_lengths,
            decode_blob=decode_blob,
            n_vocab=n_ids,
            all_reachable=all_reachable,
            vocab_keys=vocab_keys,
            vocab_lens=vocab_lens,
            vocab_ranks=vocab_ranks,
            vhash_rows=vhash_rows,
            vhash_mask=vhash_mask,
            vhash8_rows=vhash8_rows,
            vhash8_mask=vhash8_mask,
            vhash8_dropped=vhash8_dropped,
        )
        os.replace(tmp, cache_path)
    return tables
