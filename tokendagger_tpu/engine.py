"""Device tokenization engine: batch orchestration around the TPU kernels.

Pipeline (host-pretokenized path):

  texts --host regex/special scan--> pretoken pieces
        --dedupe + whole-piece vocab fast path--> unresolved pieces
        --length-bucketed packing--> (R, C) uint8 buffers
        --ops.merge.merge_rows on device--> token ids per piece
        --reassembly--> per-text id lists

The whole-piece direct-lookup fast path mirrors the reference's encode()
fast path (/root/reference/src/tiktoken/tiktoken.cpp:210-215) and is exact.
Deduplication is a pure memoization: identical pieces always produce
identical ids, so each distinct piece is merged once per batch.

The device-DFA pretokenizer (ops/dfa_scan) replaces the host regex split on
the pure-device path; this module routes between them.
"""

from __future__ import annotations

from typing import AbstractSet, Sequence

import numpy as np

from .hostengine import HostEngine, byte_pair_merge
from .tables import build_tables

# Length buckets for packed merge rows. Pieces longer than the last bucket
# take the exact host merge fallback (pretokens that long are vanishingly
# rare: the split pattern bounds most pieces to words/short runs).
BUCKET_WIDTHS = (16, 64, 256)
MAX_ROWS = 1 << 16


def _next_pow2(n: int) -> int:
    return 1 << max(7, (n - 1).bit_length())


class DeviceEngine:
    def __init__(
        self,
        pattern: str,
        mergeable_ranks: dict[bytes, int],
        special_tokens: dict[str, int],
        *,
        vocab_fastpath: bool = True,
    ):
        import jax.numpy as jnp  # lazy so host-only users never pay for jax

        self._jnp = jnp
        self.host = HostEngine(pattern, mergeable_ranks, special_tokens)
        self.ranks = self.host.ranks
        self.tables = build_tables(mergeable_ranks, special_tokens)
        self.vocab_fastpath = vocab_fastpath

        self._byte_rank = jnp.asarray(self.tables.byte_rank)
        self._pair_rows = jnp.asarray(self.tables.pair.rows)
        self._pair_mask = int(self.tables.pair.mask)
        self._missing_bytes = bool((self.tables.byte_rank < 0).any())

    # ------------------------------------------------------------------
    # Piece-level encoding (the device hot path)
    # ------------------------------------------------------------------
    def encode_pieces(self, pieces: list[bytes]) -> list[list[int]]:
        """Encode a list of pretoken byte strings, exactly.

        Routing per piece: empty -> [], single byte / whole-piece vocab hit
        -> direct id, oversized or rank-less bytes -> host merge, otherwise
        device merge (bucketed)."""
        results: list[list[int] | None] = [None] * len(pieces)
        todo: dict[bytes, list[int]] = {}  # piece -> indices needing merge

        for i, piece in enumerate(pieces):
            if not piece:
                results[i] = []
                continue
            if self.vocab_fastpath or len(piece) == 1:
                r = self.ranks.get(piece)
                if r is not None:
                    results[i] = [r]
                    continue
            todo.setdefault(piece, []).append(i)

        unique = list(todo.keys())
        merged = self._merge_unique(unique)
        for piece, ids in zip(unique, merged):
            for i in todo[piece]:
                results[i] = ids
        return results  # type: ignore[return-value]

    def _merge_unique(self, pieces: list[bytes]) -> list[list[int]]:
        jnp = self._jnp
        from .ops.merge import merge_rows

        out: list[list[int] | None] = [None] * len(pieces)
        by_bucket: dict[int, list[int]] = {w: [] for w in BUCKET_WIDTHS}
        for i, piece in enumerate(pieces):
            if len(piece) > BUCKET_WIDTHS[-1] or (
                self._missing_bytes
                and any(self.tables.byte_rank[b] < 0 for b in piece)
            ):
                out[i] = byte_pair_merge(piece, self.ranks)  # exact fallback
                continue
            for w in BUCKET_WIDTHS:
                if len(piece) <= w:
                    by_bucket[w].append(i)
                    break

        for w, idxs in by_bucket.items():
            for lo in range(0, len(idxs), MAX_ROWS):
                chunk = idxs[lo : lo + MAX_ROWS]
                R = _next_pow2(len(chunk))
                buf = np.zeros((R, w), dtype=np.uint8)
                lens = np.zeros(R, dtype=np.int32)
                for row, i in enumerate(chunk):
                    p = pieces[i]
                    buf[row, : len(p)] = np.frombuffer(p, dtype=np.uint8)
                    lens[row] = len(p)
                tok, counts = merge_rows(
                    jnp.asarray(buf),
                    jnp.asarray(lens),
                    self._byte_rank,
                    self._pair_rows,
                    self._pair_mask,
                )
                tok_np = np.asarray(tok)
                for row, i in enumerate(chunk):
                    ids = tok_np[row]
                    out[i] = ids[ids >= 0].tolist()
        return out  # type: ignore[return-value]

    # ------------------------------------------------------------------
    # Text-level encoding
    # ------------------------------------------------------------------
    def encode_ordinary_batch(self, texts: list[str]) -> list[list[int]]:
        pieces: list[bytes] = []
        spans: list[tuple[int, int]] = []  # (start, end) into pieces per text
        for text in texts:
            s = len(pieces)
            pieces.extend(m.group().encode("utf-8") for m in self.host._re.finditer(text))
            spans.append((s, len(pieces)))
        encoded = self.encode_pieces(pieces)
        out = []
        for s, e in spans:
            ids: list[int] = []
            for j in range(s, e):
                ids.extend(encoded[j])
            out.append(ids)
        return out

    def encode_batch(
        self, texts: list[str], allowed_special: AbstractSet[str]
    ) -> list[list[int]]:
        """Full encode semantics (special-token scan on host, merge on
        device), batched across all texts' ordinary segments."""
        # Per text: alternating plan of ("seg", piece_range) / ("sp", id)
        pieces: list[bytes] = []
        plans: list[list[tuple[str, object]]] = []
        for text in texts:
            plan: list[tuple[str, object]] = []
            for seg_text, special_id in self._split_specials(text, allowed_special):
                if special_id is not None:
                    plan.append(("sp", special_id))
                else:
                    s = len(pieces)
                    pieces.extend(
                        m.group().encode("utf-8")
                        for m in self.host._re.finditer(seg_text)
                    )
                    plan.append(("seg", (s, len(pieces))))
            plans.append(plan)
        encoded = self.encode_pieces(pieces)
        out = []
        for plan in plans:
            ids: list[int] = []
            for kind, payload in plan:
                if kind == "sp":
                    ids.append(payload)  # type: ignore[arg-type]
                else:
                    s, e = payload  # type: ignore[misc]
                    for j in range(s, e):
                        ids.extend(encoded[j])
            out.append(ids)
        return out

    def _split_specials(self, text: str, allowed: AbstractSet[str]):
        """Yield (segment_text, None) and ("", special_id) in order, using
        the host engine's cached-position scan semantics."""
        for tok in allowed:
            if tok not in self.host.special_tokens:
                raise KeyError(f"Unknown special token: {tok!r}")
        allowed_sorted = [t for t in self.host._specials_by_len if t in allowed]
        cache: dict[str, int] = {}
        start = 0
        n = len(text)
        while start <= n:
            pos, tok = self.host._find_next_special(text, start, allowed_sorted, cache)
            end = pos if pos != -1 else n
            if start < end:
                yield text[start:end], None
            if tok is None:
                return
            yield "", self.host.special_tokens[tok]
            start = end + len(tok)
