"""Device tokenization engine: batch orchestration around the TPU kernels.

Three device paths:

**Stream path** (patterns in the supported tiktoken family): long byte
segments run through fixed-shape windows with the join-first resolver
(ops/fused.py) — device scan (ops/pretokenize.py), key compaction +
whole-piece vocab probe (ops/join.py), finalize; misses emit SENTINEL
slots spliced exactly on the host. Safe-cut logic drops window-edge
pieces for re-scan in the next window.

**Batched grid path** (ops/batched.py): many short complete segments
pack into (rows, width) grids resolved a-batch-per-dispatch via vmapped
scan stages; no windowing or safe cuts apply.

**Piece path** (fallback for arbitrary regex patterns): host regex split,
pieces packed into bucketed rows, device merge. Exact for any pattern.

Both paths produce ids byte-identical to the host oracle / tiktoken.
The whole-piece vocab fast path of the reference
(/root/reference/src/tiktoken/tiktoken.cpp:210-215) is semantically a no-op
for well-formed vocabs (its encode_ordinary skips it, tiktoken.cpp:162);
the stream path relies on merge exactness instead of replicating it.
"""

from __future__ import annotations

from typing import AbstractSet, Iterator

import numpy as np

from .hostengine import HostEngine, byte_pair_merge
from .tables import build_tables
from .vocab import classify_pattern

# Width buckets for packed merge rows. Pieces longer than the last bucket
# take the exact host merge fallback (rare: pattern alternatives bound most
# pieces to words/short runs; only pathological punct/whitespace runs exceed).
BUCKET_WIDTHS = (16, 64, 256)

# All device calls use a small FIXED set of shapes: scan windows of
# SCAN_SIZES bytes and merge batches of MERGE_ROWS rows. Fixed shapes bound
# XLA compile time (CPU-backend compile scales with shape and is flaky at
# huge shapes), maximize jit-cache reuse across arbitrary input sizes, and
# let long segments stream through the same compiled programs.
SCAN_SIZES = (1 << 12, 1 << 16, 1 << 20, 1 << 22, 1 << 24)
MERGE_ROWS = 1 << 13
# windows grow up to this size when a single class run spans the current
# window (no safe cut); only beyond it does the host fallback engage
MAX_WINDOW = SCAN_SIZES[-1]

# Lookahead slack past a run boundary that a match decision can inspect
# (contraction suffix <= 3 chars + the (?!\S) peek; chars <= 4 bytes).
CUT_SLACK = 16


def _pow2(n: int, lo: int = 128) -> int:
    return max(lo, 1 << max(0, (n - 1).bit_length()))


_CACHE_ENABLED = False


def _enable_persistent_compile_cache(jax_mod) -> None:
    """Persist XLA compiles across processes (fixed-shape programs make
    this a near-perfect cache)."""
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    _CACHE_ENABLED = True
    try:
        from .utils.cachedir import cache_dir

        d = cache_dir("xla_cache")
        jax_mod.config.update("jax_compilation_cache_dir", str(d))
        jax_mod.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # noqa: BLE001 - cache is best-effort
        pass


class DeviceEngine:
    def __init__(
        self,
        pattern: str,
        mergeable_ranks: dict[bytes, int],
        special_tokens: dict[str, int],
        *,
        vocab_fastpath: bool = True,
        stream: bool | None = None,
    ):
        import jax
        import jax.numpy as jnp  # lazy so host-only users never pay for jax

        self._jax = jax
        self._jnp = jnp
        self.host = HostEngine(pattern, mergeable_ranks, special_tokens)
        self.ranks = self.host.ranks
        self.tables = build_tables(mergeable_ranks, special_tokens)
        self.vocab_fastpath = vocab_fastpath

        self._byte_rank = jnp.asarray(self.tables.byte_rank)
        self._pair_rows = jnp.asarray(self.tables.pair.rows)
        self._pair_mask = int(self.tables.pair.mask)
        self._pair_lut = jnp.asarray(self.tables.pair_lut)
        self._missing_bytes = bool((self.tables.byte_rank < 0).any())
        # gates only the blockwise Pallas UTF-8 decode (ops/pallas_scan);
        # the former MXU LUT merge kernel was measured out (docs/PERF.md)
        self._use_pallas = jax.default_backend() == "tpu"

        kind = classify_pattern(pattern)
        if stream is None:
            # The stream path is join-first (ops/fused.py): whole-piece
            # vocab hits reproduce tiktoken's own fast path and misses take
            # the merge loop, so merge-reachability of the vocab is NOT
            # required (unlike the legacy merge-only piece batching).
            stream = kind is not None and not self._missing_bytes
        self.stream = stream
        self._contractions = kind != "nocontract"
        self._profile = kind or "llama4"
        if self.stream:
            from .unicode_tables import get_two_level_tables

            _enable_persistent_compile_cache(jax)
            page_ids, pages = get_two_level_tables()
            self._page_ids = jnp.asarray(page_ids)
            self._pages = jnp.asarray(pages)
            self._vk = jnp.asarray(self.tables.vocab_keys)
            self._vlen = jnp.asarray(self.tables.vocab_lens)
            self._vrank = jnp.asarray(self.tables.vocab_ranks)
            self._vhash_rows = jnp.asarray(self.tables.vhash8_rows)
            self.join_mode = "probe"
            # "host": device resolves whole-piece hits, misses splice on
            # host (all-safe kernels; right for this rig's remote runtime
            # and for miss rates of a few %). "device": misses merge on
            # device (width-bucketed row merges inside the same program).
            self.miss_mode = "host"
            # the CPU backend's compile time scales with shape; keep its
            # scan windows small (the CPU device path exists for tests) and
            # never grow them (a 1 MB-shape CPU compile can take minutes) —
            # runs longer than the window take the host-advance path.
            if jax.default_backend() == "cpu":
                self._window = SCAN_SIZES[1]
                self._max_window = SCAN_SIZES[1]
            else:
                # 4 MB: the largest window whose butterfly-compaction
                # degap arrays fit VMEM (the fast kernels beat the saved
                # per-window syncs; see docs/PERF.md)
                self._window = SCAN_SIZES[3]
                self._max_window = MAX_WINDOW

    # ==================================================================
    # Stream path (fixed-shape windowed scanning)
    # ==================================================================
    def _safe_cut_threshold(self, window: bytes) -> int:
        """Largest byte offset rs such that every piece ending <= rs is
        unaffected by bytes beyond the window (see module docstring of
        ops/pretokenize.py): rs = start of the character-class run touching
        the window edge, minus lookahead slack.

        The run start must be found exactly: if the decoded tail is one
        unbroken class run, the run may begin before the tail, so the
        backward search extends until a class change is found (or the
        window start is reached, in which case there is no safe cut)."""
        from .unicode_tables import LC, LETTER, NUM, UC, WS, get_tables

        classes, _ = get_tables()

        def coarse(c: np.ndarray) -> np.ndarray:
            ws = (c & WS) != 0
            wd = (c & (UC | LC | LETTER)) != 0
            num = (c & NUM) != 0
            return np.where(ws, 0, np.where(num & ~wd, 1, np.where(wd, 2, 3)))

        tail_n = 8192
        while True:
            t0 = max(0, len(window) - tail_n)
            at_start = t0 == 0
            # align to a char boundary
            while t0 < len(window) and (window[t0] & 0xC0) == 0x80:
                t0 += 1
            tail = window[t0:].decode("utf-8", errors="ignore")
            if not tail:
                if at_start:
                    return 0
                tail_n *= 4
                continue
            cps = np.frombuffer(tail.encode("utf-32-le"), dtype=np.uint32)
            co = coarse(classes[cps.astype(np.int64)])
            # last index where the class differs -> run start is one past it
            diff = np.nonzero(co != co[-1])[0]
            if len(diff) == 0:
                if at_start:
                    return 0  # whole window is one run: no safe cut
                tail_n *= 4  # run may start before the tail: look further back
                continue
            run_start_char = int(diff[-1]) + 1
            # byte offset of run_start_char within the tail
            run_start_b = t0 + len(tail[:run_start_char].encode("utf-8"))
            return max(0, run_start_b - CUT_SLACK)

    def _host_advance(self, data: bytes, base: int) -> tuple[np.ndarray, int]:
        """Exact host fallback when a single class run outgrows the largest
        device window: host-encode the maximal *finalized* prefix (pieces
        ending at or before a safe cut found in a geometrically grown host
        window) and return (ids, consumed_bytes) so the caller resumes the
        device path right after the run."""
        from .streaming import _safe_cut_chars

        n = len(data)
        wsize = max(self._max_window, 1 << 16) * 4
        while True:
            end = min(n, base + wsize)
            while end < n and (data[end] & 0xC0) == 0x80:
                end += 1  # align to a char boundary
            text = data[base:end].decode("utf-8", errors="strict")
            if end >= n:
                ids = self.host.encode_ordinary(text)
                return np.asarray(ids, dtype=np.int64), n - base
            rs_c = _safe_cut_chars(text)
            last_end_c = 0
            if rs_c > 0:
                for mt in self.host._re.finditer(text):
                    if mt.end() > rs_c:
                        break
                    last_end_c = mt.end()
            if last_end_c == 0:
                wsize *= 4  # run still spans the host window: keep growing
                continue
            prefix = text[:last_end_c]
            ids = self.host.encode_ordinary(prefix)
            return np.asarray(ids, dtype=np.int64), len(prefix.encode("utf-8"))

    def _fused_window(self, window: bytes, trim: int):
        """Run the join-first resolver (ops/fused.py) on one window.
        Returns (flat ids | None on cap overflow, consumed_bytes).

        With miss_mode="host" (default) the window runs as a chain of
        SMALL separate dispatches — scan stages, key compaction, vocab
        probe, finalize — because fusing them into one program triggers
        minute-long compiles and the remote runtime's degraded dispatch
        mode (docs/PERF.md); each stage alone runs in ~0.1 ms/MB."""
        jnp = self._jnp
        from .ops import pretokenize as PT
        from .ops.fused import (
            caps_for, finalize_host, finalize_host_sorted, resolve_window,
        )
        from .ops.join import compact_piece_keys, vocab_join, vocab_probe8t

        n = len(window)
        N = next(s for s in SCAN_SIZES if s >= n)
        buf = np.zeros(N, dtype=np.uint8)
        buf[:n] = np.frombuffer(window, dtype=np.uint8)
        dev = jnp.asarray(buf)
        nb = jnp.int32(n)
        cp, cob, boc, m = PT._utf8_decode_j(
            dev, nb, use_pallas=self._use_pallas
        )
        starts = PT.compute_starts(
            cp, m, self._page_ids, self._pages,
            contractions=self._contractions, profile=self._profile,
        )
        if self.miss_mode == "host":
            p_cap = caps_for(N)["p_cap"]
            if (self._use_pallas and N % (128 * 128) == 0
                    and N <= (1 << 22)):
                # real TPU: butterfly compaction + sorted trim-aware
                # finalize (the scatter forms lower pathologically on v5e
                # — docs/PERF.md)
                from .ops.compact_pallas import (
                    compact_piece_keys_butterfly,
                )

                stb = PT._starts_to_bytes_j(starts, cob, dev, nb)
                tile_rows = min(256, N // 128)
                sb, pl, k0, k1, k2, k3, npc = (
                    o[0] for o in compact_piece_keys_butterfly(
                        stb[None], dev[None], nb[None], p_cap,
                        tile_rows=tile_rows,
                    )
                )
                fin = finalize_host_sorted
            else:
                sb, pl, k0, k1, k2, k3, npc = compact_piece_keys(
                    starts, boc, dev, nb, p_cap
                )
                fin = finalize_host
            if self.join_mode == "sort":
                rank = vocab_join(k0, k1, k2, k3, pl, self._vk,
                                  self._vlen, self._vrank)
            else:
                # transposed-compare probe: 2.1x the (P, 48) barrier
                # form on v5e (ops/join.vocab_probe8t docstring)
                rank = vocab_probe8t(k0, k1, k2, k3, pl, self._vhash_rows,
                                     self.tables.vhash8_mask)
            (flat, total, _n_pieces, _n_kept, consumed, overflow,
             os_s, os_l, n_os) = fin(
                sb, pl, rank, npc, jnp.int32(trim), p_cap=p_cap
            )
        else:
            (flat, total, _n_pieces, _n_kept, consumed, overflow,
             os_s, os_l, n_os) = resolve_window(
                starts, boc, dev, nb, jnp.int32(trim),
                self._byte_rank, self._pair_rows, self._pair_lut,
                self._vk, self._vlen, self._vrank, self._vhash_rows,
                mask=self._pair_mask,
                vhash_mask=self.tables.vhash8_mask,
                join_mode=self.join_mode, miss_mode=self.miss_mode,
                **caps_for(N),
            )
        if bool(overflow):
            return None, 0
        total_i = int(total)
        ids = np.asarray(flat[:total_i]).astype(np.int64)
        n_os_i = int(n_os)
        if n_os_i:
            ids = self._splice_oversize(ids, window, np.asarray(os_s),
                                        np.asarray(os_l), n_os_i)
        return ids, int(consumed)

    def _splice_oversize(self, ids: np.ndarray, window: bytes,
                         os_s: np.ndarray, os_l: np.ndarray,
                         n_os: int) -> np.ndarray:
        """Replace SENTINEL slots with the exact sequential merge of each
        >256-byte piece (both are in piece order)."""
        from .ops.fused import SENTINEL

        sent_pos = np.nonzero(ids == SENTINEL)[0]
        assert len(sent_pos) == n_os, (len(sent_pos), n_os)
        parts = []
        prev = 0
        for j, p in enumerate(sent_pos):
            parts.append(ids[prev:p])
            piece = window[int(os_s[j]) : int(os_s[j]) + int(os_l[j])]
            # whole-piece lookup FIRST, like the oracle (hostengine
            # encode_ordinary): a probe miss on device may be a deliberate
            # false miss (token dropped from the device hash table), and
            # merge(piece) == [rank] is a vocab property, not a guarantee
            r = self.ranks.get(piece)
            parts.append(np.asarray(
                [r] if r is not None else byte_pair_merge(piece, self.ranks),
                dtype=ids.dtype,
            ))
            prev = p + 1
        parts.append(ids[prev:])
        return np.concatenate(parts)

    def encode_stream(self, data: bytes) -> np.ndarray:
        """Ordinary-encode one byte segment via the windowed device
        pipeline (join-first fused resolver). Arbitrary length; all device
        calls use fixed shapes."""
        out: list[np.ndarray] = []
        base = 0
        n = len(data)
        win = self._window
        while base < n:
            window = data[base : base + win]
            is_final = base + len(window) >= n
            if is_final:
                trim = len(window)
            else:
                trim = self._safe_cut_threshold(window)
            result = (None, 0)
            if trim > 0:
                result = self._fused_window(window, trim)
                if result[0] is None:
                    # capacity overflow (pathological piece mix): exact
                    # host fallback for a bounded prefix, then resume
                    ids, adv = self._host_advance(data, base)
                    out.append(ids)
                    base += adv
                    win = self._window
                    continue
            ids, consumed = result
            if consumed == 0:
                # no piece is final inside this window (a single class run
                # spans it). Grow the window (fixed shapes, backend cap)...
                if win < self._max_window and win < n - base:
                    win = min(win * 4, self._max_window)
                    continue
                # ...then runs longer than the cap take the exact host
                # fallback, but only past the run — the device path resumes.
                ids, adv = self._host_advance(data, base)
                out.append(ids)
                base += adv
                win = self._window
                continue
            out.append(ids)
            base += consumed
            win = self._window
        if not out:
            return np.zeros(0, dtype=np.int64)
        return np.concatenate(out)

    def encode_streams(self, segments: list[bytes]) -> list[np.ndarray]:
        """Ordinary-encode each byte segment via the device pipeline.

        Short segments are packed into fixed-shape (rows, width) grids and
        resolved many-per-dispatch (ops/batched.py — vmapped scan stages +
        flattened vocab probe); long segments take the windowed stream
        path. Both are bit-exact, so routing is purely a batching choice."""
        from .ops.batched import ROW_WIDTHS

        out: list[np.ndarray | None] = [None] * len(segments)
        small: list[tuple[int, bytes]] = []
        for i, s in enumerate(segments):
            if not s:
                out[i] = np.zeros(0, dtype=np.int64)
            elif len(s) <= ROW_WIDTHS[-1]:
                small.append((i, s))
        if len(small) >= 4:  # grids only pay off with several rows
            self._encode_small_batched(small, out)
        # (fewer: out[i] stays None and the stream path below takes them)
        for i, s in enumerate(segments):
            if out[i] is None:
                out[i] = self.encode_stream(s)
        return out  # type: ignore[return-value]

    def _encode_small_batched(
        self,
        items: list[tuple[int, bytes]],
        out: list[np.ndarray | None],
    ) -> None:
        """Resolve (index, segment) pairs through (B, W) grids, bucketed by
        width; results land in ``out`` at each segment's index."""
        from .ops.batched import ROW_WIDTHS, grid_rows, resolve_grid

        by_width: dict[int, list[tuple[int, bytes]]] = {
            w: [] for w in ROW_WIDTHS
        }
        for i, s in items:
            for w in ROW_WIDTHS:
                if len(s) <= w:
                    by_width[w].append((i, s))
                    break
        for w, group in by_width.items():
            if not group:
                continue
            B = grid_rows(w)
            for lo in range(0, len(group), B):
                batch = group[lo : lo + B]
                buf = np.zeros((B, w), dtype=np.uint8)
                lens = np.zeros(B, dtype=np.int32)
                for r, (_, s) in enumerate(batch):
                    buf[r, : len(s)] = np.frombuffer(s, dtype=np.uint8)
                    lens[r] = len(s)
                flat, total, ms_s, ms_l, n_ms = resolve_grid(
                    buf, lens,
                    page_ids=self._page_ids, pages=self._pages,
                    vhash_rows=self._vhash_rows,
                    vhash_mask=self.tables.vhash8_mask,
                    contractions=self._contractions, profile=self._profile,
                )
                for r, (i, s) in enumerate(batch):
                    ids = flat[r, : total[r]].astype(np.int64)
                    k = int(n_ms[r])
                    if k:
                        ids = self._splice_oversize(
                            ids, s, ms_s[r], ms_l[r], k
                        )
                    out[i] = ids

    # ==================================================================
    # Piece path (host split fallback; exact for any pattern)
    # ==================================================================
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
            r = self.ranks.get(piece)
            if r is not None:
                # oracle semantics: whole-piece lookup before any merge
                # (covers probe false-misses and unreachable vocab tokens)
                out[i] = [r]
                continue
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
            for lo in range(0, len(idxs), MERGE_ROWS):
                chunk = idxs[lo : lo + MERGE_ROWS]
                R = _pow2(len(chunk))
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

    # ==================================================================
    # Text-level encoding
    # ==================================================================
    def encode_ordinary_batch(self, texts: list[str]) -> list[list[int]]:
        if self.stream:
            flats = self.encode_streams([t.encode("utf-8") for t in texts])
            return [f.tolist() for f in flats]
        pieces: list[bytes] = []
        spans: list[tuple[int, int]] = []  # (start, end) into pieces per text
        for text in texts:
            s = len(pieces)
            pieces.extend(
                m.group().encode("utf-8") for m in self.host._re.finditer(text)
            )
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
        """Full encode semantics (special-token scan on host, split+merge on
        device), batched across all texts' ordinary segments."""
        if self.stream:
            return self._encode_batch_stream(texts, allowed_special)
        return self._encode_batch_pieces(texts, allowed_special)

    def _encode_batch_stream(
        self, texts: list[str], allowed_special: AbstractSet[str]
    ) -> list[list[int]]:
        segments: list[bytes] = []
        plans: list[list[tuple[str, object]]] = []
        for text in texts:
            plan: list[tuple[str, object]] = []
            for seg_text, special_id in self._split_specials(text, allowed_special):
                if special_id is not None:
                    plan.append(("sp", special_id))
                else:
                    plan.append(("seg", len(segments)))
                    segments.append(seg_text.encode("utf-8"))
            plans.append(plan)
        flats = self.encode_streams(segments)
        out = []
        for plan in plans:
            ids: list[int] = []
            for kind, payload in plan:
                if kind == "sp":
                    ids.append(payload)  # type: ignore[arg-type]
                else:
                    ids.extend(flats[payload].tolist())  # type: ignore[index]
            out.append(ids)
        return out

    def _encode_batch_pieces(
        self, texts: list[str], allowed_special: AbstractSet[str]
    ) -> list[list[int]]:
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

    def _split_specials(
        self, text: str, allowed: AbstractSet[str]
    ) -> Iterator[tuple[str, int | None]]:
        return self.host.split_specials(text, allowed)
