"""tiktoken-compatible public API.

This is the conformance surface: a drop-in for both ``tiktoken.Encoding``
and the reference's ``tokendagger.Tokenizer`` (behavioral spec:
/root/reference/tokendagger/wrapper.py:28-395). On top of the reference API
it adds a TPU device backend: large inputs and batches are tokenized on the
accelerator (DFA pretokenizer scan + parallel BPE merge), tiny inputs stay
on the exact host engine. Both paths emit identical token ids.
"""

from __future__ import annotations

import functools
import json
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import AbstractSet, Collection, Literal, Sequence

import numpy as np

from . import vocab as _vocab
from .hostengine import HostEngine


class TokenDaggerError(Exception):
    """Base exception (mirrors reference wrapper.py:23-25)."""


class Tokenizer:
    """High-level tokenizer with tiktoken-compatible API.

    Args mirror the reference (`pattern`/`pat_str`, `vocab`/`mergeable_ranks`,
    `special_tokens`, `vocab_file`, `special_tokens_file`), plus:

    backend: "auto" (default) routes per-call between the exact host engine
        (tiny inputs) and the TPU pipeline (large inputs / batches);
        "host" forces the host engine; "tpu" forces the device pipeline.
    """

    def __init__(
        self,
        name: str,
        *,
        pattern: str | None = None,
        pat_str: str | None = None,
        vocab: list[dict] | dict[bytes, int] | None = None,
        mergeable_ranks: dict[bytes, int] | None = None,
        special_tokens: dict[str, int] | None = None,
        vocab_file: str | Path | None = None,
        special_tokens_file: str | Path | None = None,
        backend: Literal["auto", "host", "tpu"] = "auto",
    ):
        self.name = name
        if pat_str is not None:
            pattern = pat_str
        if pattern is None:
            raise ValueError("A split pattern ('pattern' or 'pat_str') is required")
        self.pattern = pattern
        self.backend = backend

        if mergeable_ranks is not None:
            vocab = mergeable_ranks
        if vocab_file:
            with open(Path(vocab_file), "r", encoding="utf-8") as f:
                vocab = json.load(f)
        if vocab is None:
            raise ValueError(
                "Either 'vocab', 'mergeable_ranks', or 'vocab_file' must be provided"
            )
        if isinstance(vocab, dict):
            ranks = dict(vocab)
        else:
            ranks = _vocab.vocab_list_to_ranks(vocab)

        if special_tokens_file:
            with open(Path(special_tokens_file), "r", encoding="utf-8") as f:
                special_tokens = json.load(f)
        if special_tokens is None:
            special_tokens = {}

        self._mergeable_ranks = ranks
        self._special_tokens = dict(special_tokens)
        self.max_token_value = max(
            max(ranks.values()),
            max(special_tokens.values()) if special_tokens else 0,
        )

        try:
            self._host = HostEngine(pattern, ranks, special_tokens)
        except Exception as e:  # noqa: BLE001 - mirror reference error wrapping
            raise TokenDaggerError(f"Failed to initialize engine: {e}") from e

        self._device = None  # built lazily on first TPU-path call
        self._device_broken = False  # auto mode: device probe failed, use host
        self._device_ms = None  # measured dispatch latency, lazy (auto mode)
        self._native = None  # C++ host engine, built lazily
        self._native_tried = False
        self._tables = None  # compiled vocab tables (tables.py), lazy
        self._unstable_aux = None  # encode_with_unstable tables, lazy
        self._decode_dev = None  # device-resident decode tables, lazy
        # frozenset identity marks the common "disallow all specials" case
        # so the bigram prefilter groups are computed once
        self._all_specials_frozen = frozenset(self._special_tokens)
        self._disallowed_all_groups: dict[str, list[str]] | None = None

    # ------------------------------------------------------------------
    # Backend routing
    # ------------------------------------------------------------------
    # Below this many input bytes the device round-trip dominates and the
    # host engine wins; chosen from single-chip microbenchmarks.
    _DEVICE_MIN_BYTES = 16384

    def _get_device(self):
        if self._device is None:
            from .engine import DeviceEngine  # lazy: keeps host path jax-free

            self._device = DeviceEngine(
                self.pattern, self._mergeable_ranks, self._special_tokens
            )
        return self._device

    def _get_native(self):
        """The C++ host fast path (native/tdnative.cpp): pattern-family
        scanner + vocab-hash fast path + exact merge. None if the pattern
        is outside the supported family or no toolchain is available."""
        if not self._native_tried:
            self._native_tried = True
            try:
                from .native import NativeEngine
                from .vocab import classify_pattern

                kind = classify_pattern(self.pattern)
                if kind is not None:
                    tables = self._get_tables()
                    self._native = NativeEngine(
                        tables.pair.rows,
                        tables.pair.mask,
                        tables.byte_rank,
                        profile=kind,
                        ranks=self._mergeable_ranks,
                    )
                    if self._special_tokens:
                        # single-pass byte-space special scan (exact
                        # find_all_specials semantics; ~60x the Python
                        # scan on special-dense text — docs/PERF.md,
                        # artifacts/specials_bench.json)
                        self._native.set_specials(self._special_tokens)
            except Exception:  # noqa: BLE001 - any failure => pure-Python path
                self._native = None
        return self._native

    # Single texts at least this long are split at provable piece
    # boundaries and encoded across cores (intra-text parallelism — a
    # capability the sequential reference engine cannot offer).
    _SPLIT_MIN_BYTES = 4 << 20

    def _host_encode_ordinary(self, text: str) -> list[int]:
        """Ordinary-encode on the host: native engine if available."""
        native = self._get_native()
        if native is not None:
            data = text.encode("utf-8")
            if len(data) >= self._SPLIT_MIN_BYTES:
                lst = self._encode_split_parallel(native, data)
                if lst is not None:
                    return lst
            lst = native.encode_list(data)  # C-extension: builds the PyList
            if lst is not None:
                return lst
            ids = native.encode(data)
            if ids is not None:
                return ids.tolist()
        return self._host.encode_ordinary(text)

    def _encode_split_parallel(self, native, data: bytes) -> list[int] | None:
        """Encode ONE long text across cores by cutting it at provable
        piece boundaries (intra-text parallelism — a capability the
        reference's sequential engine has no analogue for).

        Two byte-local cut predicates, each provable against all four
        supported scanner profiles (vocab.py:31-82):

        A) data[p] is an ASCII letter and data[p-1] is \\r or \\n.
           Every profile's letter alternative excludes \\r\\n from its
           optional one-char prefix, so no piece can span the newline
           into the letter; the piece covering the newline (\\s-run or
           punct run with its [\\r\\n/]* suffix) must end before a
           letter. The letter therefore starts a fresh piece whose
           derivation matches a fresh text.

        B) data[p] == ' ', data[p-1] is an ASCII letter or digit, and
           data[p+1] is an ASCII letter. The letter/number piece ending
           at p cannot absorb a space; " Y..." is matched by the
           space-prefixed letter alternative identically at text start
           and mid-text (a \\s-run cannot reach p from the left because
           data[p-1] is not whitespace).

        Encoding the chunks independently is therefore byte-identical
        to encoding the whole; merges never cross piece boundaries.
        """
        import os

        n = len(data)
        # Leave one core for the main thread: it materializes finished
        # chunks into PyLists (GIL-bound) while workers encode ahead.
        nthreads = min(16, (os.cpu_count() or 4) - 1)
        k = nthreads * 4  # chunks > threads: schedule(dynamic) balances
        if nthreads < 2:
            return None
        a = np.frombuffer(data, dtype=np.uint8)
        # Only ~k cuts are needed; probing a small window after each
        # target avoids materializing full-length boolean temporaries
        # (which would cost as much as the encode itself).
        window = 1 << 16
        cuts_set = set()
        for i in range(1, k):
            t = i * (n // k)
            stop = min(t + 16 * window, n - 2)  # bounded probe per target
            while t < stop:
                w = a[max(t - 1, 0) : min(t - 1 + window, n)]
                letter = ((w >= 65) & (w <= 90)) | ((w >= 97) & (w <= 122))
                rule_a = ((w[:-2] == 0x0A) | (w[:-2] == 0x0D)) & letter[1:-1]
                rule_b = (
                    (letter[:-2] | ((w[:-2] >= 48) & (w[:-2] <= 57)))
                    & (w[1:-1] == 0x20)
                    & letter[2:]
                )
                hits = np.nonzero(rule_a | rule_b)[0]
                if len(hits):
                    cuts_set.add(t - 1 + int(hits[0]) + 1)
                    break
                t += window - 2
        if not cuts_set:
            return None
        cuts = np.array(sorted(cuts_set), dtype=np.int64)
        offs = np.empty(len(cuts) + 2, dtype=np.int64)
        offs[0] = 0
        offs[1:-1] = cuts
        offs[-1] = n
        lists = native.encode_slices_lists(data, offs, num_threads=nthreads)
        if lists is None:
            return None
        out = lists[0]
        for l in lists[1:]:
            out.extend(l)
        return out

    def _host_encode(self, text: str, allowed: AbstractSet[str]) -> list[int]:
        """Full encode on the host: special scan + native segments."""
        native = self._get_native()
        if native is None:
            tokens, _ = self._host.encode(text, allowed)
            return tokens
        if allowed and len(allowed) == len(self._special_tokens):
            # full-allowed set: the native single-pass scan (exact
            # find_all_specials selection; byte-space matching is
            # char-exact on valid UTF-8 — lead/continuation byte ranges
            # are disjoint, and a same-position tie's shorter token is a
            # byte-prefix of the longer, so byte- and char-length
            # tie-breaks agree). Subsets keep the Python scan (a
            # non-allowed match must stay ordinary text AND not shadow
            # an allowed one). Same-position ties (one special a strict
            # prefix of another — no real vocab has these) resolve
            # longest-first, deterministically, in BOTH scans; tiktoken's
            # own resolution there is regex-alternation order over a
            # HashMap iteration, i.e. implementation-defined — see
            # hostengine.find_all_specials.
            data = text.encode("utf-8")
            import os

            if len(data) < self._SPLIT_MIN_BYTES:
                # one-call C path: scan + GIL-free parallel segment
                # encode + interleaved list (special-dense chat text has
                # ~30k tiny segments/MB; per-segment calls pay µs each).
                # Larger texts keep the scan-then-segments route below so
                # multi-MB ordinary segments ride the intra-text parallel
                # split (_encode_split_parallel).
                lst = native.encode_with_specials(
                    data,
                    num_threads=self._effective_threads(
                        min(8, os.cpu_count() or 4)),
                )
                if lst is not None:
                    return lst
            found = native.find_specials(data)
            if found is not None:
                pos, ids = found
                if not len(pos):
                    return self._encode_ordinary_bytes(native, data)
                sp_len = self._special_id_byte_lens()
                # interleave plan: segment indices alternate with special
                # ids (encoded as -1 - id so they never collide)
                segs: list[bytes] = []
                plan: list[int] = []
                prev = 0
                for p, sid in zip(pos.tolist(), ids.tolist()):
                    if prev < p:
                        plan.append(len(segs))
                        segs.append(data[prev:p])
                    plan.append(-1 - sid)
                    prev = p + sp_len[sid]
                if prev < len(data):
                    plan.append(len(segs))
                    segs.append(data[prev:])
                out = []
                for item in plan:
                    if item < 0:
                        out.append(-1 - item)
                    else:
                        out.extend(
                            self._encode_ordinary_bytes(native, segs[item])
                        )
                return out
        out = []
        for seg, special_id in self._host.split_specials(text, allowed):
            if special_id is not None:
                out.append(special_id)
            else:
                out.extend(self._host_encode_ordinary(seg))
        return out

    def _special_id_byte_lens(self) -> dict[int, int]:
        """id -> UTF-8 byte length of the special's text (cached)."""
        m = getattr(self, "_sp_id_lens", None)
        if m is None:
            m = {
                i: len(t.encode("utf-8"))
                for t, i in self._special_tokens.items()
            }
            self._sp_id_lens = m
        return m

    def _encode_ordinary_bytes(self, native, data: bytes) -> list[int]:
        """Ordinary-encode a UTF-8 byte segment (native fast paths; the
        byte-level twin of _host_encode_ordinary)."""
        if not data:
            return []
        if len(data) >= self._SPLIT_MIN_BYTES:
            lst = self._encode_split_parallel(native, data)
            if lst is not None:
                return lst
        lst = native.encode_list(data)
        if lst is not None:
            return lst
        ids = native.encode(data)
        if ids is not None:
            return ids.tolist()
        return self._host.encode_ordinary(data.decode("utf-8"))

    @staticmethod
    def _nbytes(text: str) -> int:
        """UTF-8 byte length (the unit _DEVICE_MIN_BYTES is tuned in);
        str.isascii() keeps the common case O(n) over bytes without an
        encode pass."""
        return len(text) if text.isascii() else len(text.encode("utf-8"))

    # auto mode routes to the accelerator only for workloads at least
    # this large AND a measured-healthy runtime (see _device_dispatch_ms)
    _DEVICE_AUTO_MIN_BYTES = 4 << 20
    _DEVICE_HEALTHY_MS = 1.0

    def _device_dispatch_ms(self) -> float:
        """One-time measured post-sync dispatch latency of the
        accelerator runtime. The device pipeline beats the native host
        engine only when dispatches are cheap (co-located chips:
        microseconds). Remote/proxied runtimes degrade to tens of ms per
        dispatch after the first device->host read — the probe does such
        a read first so it measures the latency the encode path will
        actually see. CPU-backend jax is never preferred over the native
        engine (same silicon, more overhead)."""
        if self._device_ms is None:
            try:
                import time

                import jax
                import jax.numpy as jnp

                if jax.default_backend() == "cpu":
                    self._device_ms = float("inf")
                else:
                    f = jax.jit(lambda x: (x * 3 + 1).sum())
                    x = jnp.arange(1024, dtype=jnp.int32)
                    int(f(x))  # compile + the degradation-triggering read
                    t0 = time.perf_counter()
                    for _ in range(5):
                        int(f(x))
                    self._device_ms = (time.perf_counter() - t0) / 5 * 1e3
            except Exception:  # noqa: BLE001 - no usable accelerator
                self._device_ms = float("inf")
        return self._device_ms

    def _use_device(self, nbytes: int) -> bool:
        if self.backend == "host":
            return False
        if self.backend == "tpu":
            return True  # forced: let device errors propagate to the caller
        if self._device_broken:
            return False
        if nbytes < self._DEVICE_MIN_BYTES:
            return False
        # auto mode with a native engine present: the device pipeline wins
        # only for large workloads on a co-located accelerator (707 MB/s
        # per v5e chip vs ~200-500 MB/s native host on 4 cores); through a
        # high-latency proxied runtime the per-dispatch overhead makes it
        # a net loss, so route on the measured latency.
        if self._get_native() is not None:
            return (
                nbytes >= self._DEVICE_AUTO_MIN_BYTES
                and self._device_dispatch_ms() < self._DEVICE_HEALTHY_MS
            )
        if self._device is None:
            # probe the device engine once; if it can't come up (no
            # accelerator, unsupported pattern, ...) stick to host.
            try:
                self._get_device()
            except Exception:  # noqa: BLE001
                self._device_broken = True
                return False
        return True

    def __repr__(self) -> str:
        return f"<TokenDagger {self.name!r}>"

    # ------------------------------------------------------------------
    # Encoding (reference wrapper.py:145-235)
    # ------------------------------------------------------------------
    def encode_ordinary(self, text: str) -> list[int]:
        try:
            if self._use_device(self._nbytes(text)):
                return self._get_device().encode_ordinary_batch([text])[0]
            return self._host_encode_ordinary(text)
        except Exception as e:  # noqa: BLE001
            raise TokenDaggerError(f"Encoding failed: {e}") from e

    def encode(
        self,
        text: str,
        *,
        allowed_special: Literal["all"] | AbstractSet[str] = set(),
        disallowed_special: Literal["all"] | Collection[str] = "all",
    ) -> list[int]:
        allowed, disallowed = self._resolve_special(allowed_special, disallowed_special)
        self._check_disallowed(text, disallowed)
        try:
            if self._use_device(self._nbytes(text)):
                return self._get_device().encode_batch([text], allowed)[0]
            return self._host_encode(text, allowed)
        except ValueError:
            raise
        except Exception as e:  # noqa: BLE001
            raise TokenDaggerError(f"Encoding failed: {e}") from e

    def encode_with_special_tokens(self, text: str) -> list[int]:
        try:
            return self.encode(text, allowed_special="all")
        except TokenDaggerError:
            raise
        except Exception as e:  # noqa: BLE001
            raise TokenDaggerError(f"Encoding failed: {e}") from e

    @staticmethod
    def _effective_threads(num_threads: int) -> int:
        """Worker count capped at the machine's core count: thread
        oversubscription measurably regresses this workload (docs/PERF.md
        "16->32-thread regression" — the GIL-free OpenMP encode loses up
        to 66% under 8x oversubscription, and no path here can gain from
        more threads than cores). Values below the core count are honored
        as given. tiktoken honors any requested worker count; callers who
        deliberately want oversubscription (e.g. to benchmark it) can set
        ``TOKENDAGGER_NO_THREAD_CAP=1`` to opt out of the clamp."""
        import os

        if os.environ.get("TOKENDAGGER_NO_THREAD_CAP"):
            return max(1, num_threads)
        return max(1, min(num_threads, os.cpu_count() or num_threads))

    def encode_batch(
        self,
        text: Sequence[str],
        *,
        num_threads: int = 8,
        allowed_special: Literal["all"] | AbstractSet[str] = set(),
        disallowed_special: Literal["all"] | Collection[str] = "all",
    ) -> list[list[int]]:
        """Batch encode. On the TPU backend the whole batch is tokenized in
        one fused device pipeline (the analogue of the reference's
        ThreadPoolExecutor fan-out, wrapper.py:212-235); ``num_threads`` is
        honored on the host path (capped at the core count, see
        :meth:`_effective_threads`)."""
        num_threads = self._effective_threads(num_threads)
        allowed, disallowed = self._resolve_special(allowed_special, disallowed_special)
        for t in text:
            self._check_disallowed(t, disallowed)
        total = sum(self._nbytes(t) for t in text)
        if self._use_device(total):
            return self._get_device().encode_batch(list(text), allowed)
        native = self._get_native()
        if native is not None and not allowed and native._py is not None:
            import os

            datas = [t.encode("utf-8") for t in text]
            # Fewer huge texts than cores: per-text batch parallelism
            # can't saturate, so encode each sequentially through the
            # intra-text split path (full-core parallelism per text).
            if len(datas) < (os.cpu_count() or 4) and any(
                len(d) >= self._SPLIT_MIN_BYTES for d in datas
            ):
                out: list[list[int]] | None = []
                for d in datas:
                    lst = (
                        self._encode_split_parallel(native, d)
                        if len(d) >= self._SPLIT_MIN_BYTES
                        else None
                    )
                    if lst is None:
                        lst = native.encode_list(d)
                    if lst is None:
                        out = None
                        break
                    out.append(lst)
                if out is not None:
                    return out
            # one extension call: OpenMP GIL-free encode of every text +
            # single-pass list materialization from the shared PyLong cache
            lists = native.encode_batch_lists(datas, num_threads)
            if lists is not None:
                return lists
            with ThreadPoolExecutor(num_threads) as e:
                lists = list(e.map(native.encode_list, datas))
            if all(x is not None for x in lists):
                return lists  # type: ignore[return-value]
        arrays = self._encode_batch_host_np(text, allowed, num_threads)
        if arrays is not None:
            return [a.tolist() for a in arrays]
        encoder = functools.partial(
            self.encode,
            allowed_special=allowed_special,
            disallowed_special=disallowed_special,
        )
        with ThreadPoolExecutor(num_threads) as e:
            return list(e.map(encoder, text))

    def _encode_batch_host_np(
        self, text: Sequence[str], allowed: AbstractSet[str], num_threads: int
    ) -> list[np.ndarray] | None:
        """Native-engine batch path: worker threads run only the GIL-free
        C++ encode (ctypes releases the GIL), producing int32 arrays; any
        Python-object work stays in the caller's thread. None => caller
        must take the generic path."""
        native = self._get_native()
        if native is None:
            return None
        if allowed:
            # specials present: split on the host, encode segments natively
            plans = []
            segs: list[bytes] = []
            for t in text:
                plan = []
                for seg, special_id in self._host.split_specials(t, allowed):
                    if special_id is not None:
                        plan.append(("sp", special_id))
                    else:
                        plan.append(("seg", len(segs)))
                        segs.append(seg.encode("utf-8"))
                plans.append(plan)
            with ThreadPoolExecutor(num_threads) as e:
                enc = list(e.map(native.encode, segs))
            if any(a is None for a in enc):
                return None
            out = []
            for plan in plans:
                parts = []
                for kind, payload in plan:
                    if kind == "sp":
                        parts.append(np.asarray([payload], dtype=np.int32))
                    else:
                        parts.append(enc[payload])
                out.append(
                    np.concatenate(parts) if parts else np.empty(0, np.int32)
                )
            return out
        # Python threads over per-text GIL-free native calls measure faster
        # than the C++-side OpenMP batch (native/__init__.py encode_batch):
        # per-text output allocation parallelizes and no blob concat is paid.
        datas = [t.encode("utf-8") for t in text]
        with ThreadPoolExecutor(num_threads) as e:
            arrays = list(e.map(native.encode, datas))
        if any(a is None for a in arrays):
            return None
        return arrays

    def encode_batch_np(
        self,
        text: Sequence[str],
        *,
        num_threads: int = 8,
        allowed_special: Literal["all"] | AbstractSet[str] = set(),
        disallowed_special: Literal["all"] | Collection[str] = "all",
    ) -> list[np.ndarray]:
        """Batch encode returning numpy int arrays (framework-native API;
        avoids the Python-list materialization cost of ``encode_batch``)."""
        num_threads = self._effective_threads(num_threads)
        allowed, disallowed = self._resolve_special(allowed_special, disallowed_special)
        for t in text:
            self._check_disallowed(t, disallowed)
        total = sum(self._nbytes(t) for t in text)
        if self._use_device(total):
            return [
                np.asarray(ids, dtype=np.int64)
                for ids in self._get_device().encode_batch(list(text), allowed)
            ]
        arrays = self._encode_batch_host_np(text, allowed, num_threads)
        if arrays is not None:
            return arrays
        return [
            np.asarray(self._host_encode(t, allowed), dtype=np.int64)
            for t in text
        ]

    def encode_ordinary_batch(
        self, text: Sequence[str], *, num_threads: int = 8
    ) -> list[list[int]]:
        """tiktoken-compatible batch encode ignoring special tokens."""
        return self.encode_batch(
            text, num_threads=num_threads,
            allowed_special=set(), disallowed_special=(),
        )

    def decode_batch(
        self,
        tokens: Sequence[Sequence[int]],
        *,
        num_threads: int = 8,
        errors: str = "replace",
    ) -> list[str]:
        decoder = functools.partial(self.decode, errors=errors)
        if self._decode_batch_serial():
            return [decoder(t) for t in tokens]
        with ThreadPoolExecutor(self._effective_threads(num_threads)) as e:
            return list(e.map(decoder, tokens))

    def decode_bytes_batch(
        self, tokens: Sequence[Sequence[int]], *, num_threads: int = 8
    ) -> list[bytes]:
        """tiktoken-compatible batch of :meth:`decode_bytes`."""
        if self._decode_batch_serial():
            return [self.decode_bytes(t) for t in tokens]
        with ThreadPoolExecutor(self._effective_threads(num_threads)) as e:
            return list(e.map(self.decode_bytes, tokens))

    def _decode_batch_serial(self) -> bool:
        """When the native decode is available, batch decode runs as a
        plain serial loop: td_decode parallelizes its fill internally
        with OpenMP, and everything else per item is GIL-bound, so a
        ThreadPoolExecutor adds only overhead (measured: 4096 x ~2k-id
        items decode at 244 MB/s serial vs 82-105 through the executor
        at ANY worker count — docs/PERF.md "Decode"). Without the native
        lib, keep the executor (numpy fancy-indexing releases the GIL
        for stretches)."""
        from . import native as _native

        return _native.get_pymod() is not None

    def encode_to_numpy(
        self,
        text: str,
        *,
        allowed_special: Literal["all"] | AbstractSet[str] = set(),
        disallowed_special: Literal["all"] | Collection[str] = "all",
    ) -> np.ndarray:
        """tiktoken-compatible: encode straight to a uint32 array."""
        ids = self.encode(
            text,
            allowed_special=allowed_special,
            disallowed_special=disallowed_special,
        )
        return np.asarray(ids, dtype=np.uint32)

    # Unicode White_Space codepoints (Rust char::is_whitespace semantics;
    # Python str.isspace() additionally accepts U+001C..001F, which would
    # diverge from tiktoken here)
    _WHITE_SPACE = frozenset(
        [0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x20, 0x85, 0xA0, 0x1680]
        + list(range(0x2000, 0x200B)) + [0x2028, 0x2029, 0x202F, 0x205F,
                                         0x3000]
    )

    def _get_unstable_aux(self):
        """(sorted vocab byte-strings, rank->bytes dict), lazily built for
        encode_with_unstable."""
        if self._unstable_aux is None:
            self._unstable_aux = (
                sorted(self._mergeable_ranks),
                {v: k for k, v in self._mergeable_ranks.items()},
            )
        return self._unstable_aux

    def encode_with_unstable(
        self,
        text: str,
        *,
        allowed_special: Literal["all"] | AbstractSet[str] = set(),
        disallowed_special: Literal["all"] | Collection[str] = "all",
    ) -> tuple[list[int], list[list[int]]]:
        """tiktoken-compatible unstable-token analysis: the stable prefix
        of ``encode(text)`` plus every token sequence the unstable tail
        could begin with if more text were appended.

        Semantics follow tiktoken's ``encode_with_unstable`` (the
        correctness oracle; differential test
        tests/test_unstable.py): the unstable region is the last
        pretoken's tokens, widened across trailing all-space tokens
        (whitespace regex splits move as text grows); completions are
        (a) every vocab token extending the unstable bytes and (b) for
        each split point, re-encodings of unstable-prefix + any vocab
        token extending the suffix, truncated once they cover the
        unstable bytes; plus the whitespace boundary re-split case."""
        import bisect

        allowed, disallowed = self._resolve_special(
            allowed_special, disallowed_special
        )
        self._check_disallowed(text, disallowed)
        tokens, lptl = self._host.encode(text, allowed)
        stb, dec = self._get_unstable_aux()
        ranks = self._mergeable_ranks

        def all_space(tid: int) -> bool:
            b = dec.get(tid)
            return b is not None and all(c in b" \n\t" for c in b)

        if lptl > 0 and all_space(tokens[len(tokens) - lptl]):
            while (lptl < len(tokens)
                   and all_space(tokens[len(tokens) - lptl - 1])):
                lptl += 1
        if lptl == 0:
            return tokens, []
        unstable = b"".join(dec[t] for t in tokens[len(tokens) - lptl:])
        stable = tokens[: len(tokens) - lptl]
        if not unstable:
            return stable, []
        completions: set[tuple[int, ...]] = set()

        # (a) single vocab tokens that extend (or equal) the unstable bytes
        i = bisect.bisect_left(stb, unstable)
        while i < len(stb) and stb[i].startswith(unstable):
            completions.add((ranks[stb[i]],))
            i += 1

        # (b) a token may straddle any internal position of the unstable
        # bytes: complete the suffix with every vocab token extending it,
        # re-encode, and keep the sequence prefix covering unstable
        from .hostengine import byte_pair_merge

        for k in range(1, len(unstable)):
            prefix, suffix = unstable[:k], unstable[k:]
            i = bisect.bisect_left(stb, suffix)
            while i < len(stb) and stb[i].startswith(suffix):
                candidate = prefix + stb[i]
                try:
                    enc_ids = self._host.encode_ordinary(
                        candidate.decode("utf-8")
                    )
                except UnicodeDecodeError:
                    enc_ids = byte_pair_merge(candidate, ranks)
                seq: list[int] = []
                covered = 0
                for tid in enc_ids:
                    seq.append(tid)
                    covered += len(dec[tid])
                    if covered >= len(unstable):
                        break
                completions.add(tuple(seq))
                i += 1

        # whitespace boundary instability: if the unstable bytes end in a
        # complete whitespace character with content before it, the regex
        # may re-split there as text grows
        if len(unstable) > 1:
            ch, w = None, 0
            for k in (1, 2, 3, 4):
                if k > len(unstable):
                    break
                try:
                    s = unstable[len(unstable) - k:].decode("utf-8")
                except UnicodeDecodeError:
                    continue
                if len(s) == 1:
                    ch, w = s, k
                    break
            if (ch is not None and len(unstable) - w > 0
                    and ord(ch) in self._WHITE_SPACE):
                re_enc = byte_pair_merge(unstable[: len(unstable) - w], ranks)
                re_enc += byte_pair_merge(unstable[len(unstable) - w:], ranks)
                completions.add(tuple(re_enc))

        return stable, sorted(list(c) for c in completions)

    # ------------------------------------------------------------------
    # Decoding (reference wrapper.py:262-290)
    # ------------------------------------------------------------------
    # Above this many ids, decode via the native GIL-free fill (or the
    # vectorized-gather fallback) from the compiled rank->bytes tables
    # instead of the per-id dict loop. Crossover measured at ~20 ids on
    # this VM (host dict 1.3 us at 16 ids vs native 1.6; 4.2 vs 2.0 at
    # 64 — docs/PERF.md "Decode").
    _DECODE_VEC_MIN = 24

    def _get_tables(self):
        if self._tables is None:
            from .tables import build_tables

            self._tables = build_tables(self._mergeable_ranks, self._special_tokens)
        return self._tables

    def _decode_bytes_vec(self, ids: np.ndarray) -> bytes:
        t = self._get_tables()
        if ids.size and (ids.min() < 0 or ids.max() >= t.n_vocab):
            bad = ids[(ids < 0) | (ids >= t.n_vocab)][0]
            raise KeyError(f"Unknown token id: {int(bad)}")
        lens = t.decode_lengths[ids]
        if (lens < 0).any():
            bad = ids[lens < 0][0]
            raise KeyError(f"Unknown token id: {int(bad)}")
        offs = t.decode_offsets[ids]
        lens = lens.astype(np.int64)
        total = int(lens.sum())
        pos = np.repeat(offs, lens) + (
            np.arange(total, dtype=np.int64)
            - np.repeat(np.cumsum(lens) - lens, lens)
        )
        return t.decode_blob[pos].tobytes()

    def _decode_bytes_device(self, ids: np.ndarray) -> bytes:
        """Device decode (`ops/decode.decode_ids`): the rank->bytes gather
        runs on the accelerator against device-resident decode tables.
        Ids are validated host-side first (the kernel requires
        pre-validated ids — reference errors on unknown ids,
        /root/reference/src/tiktoken/tiktoken.cpp:236-255); output caps are
        power-of-two buckets so the program set stays small."""
        import jax.numpy as jnp

        from .ops.decode import decode_ids

        t = self._get_tables()
        if ids.size and (ids.min() < 0 or ids.max() >= t.n_vocab):
            bad = ids[(ids < 0) | (ids >= t.n_vocab)][0]
            raise KeyError(f"Unknown token id: {int(bad)}")
        lens = t.decode_lengths[ids]
        if (lens < 0).any():
            bad = ids[lens < 0][0]
            raise KeyError(f"Unknown token id: {int(bad)}")
        total = int(lens.astype(np.int64).sum())
        if total == 0:
            return b""
        if self._decode_dev is None:
            self._decode_dev = (
                jnp.asarray(t.decode_offsets),
                jnp.asarray(t.decode_lengths),
                jnp.asarray(t.decode_blob),
            )
        offs_d, lens_d, blob_d = self._decode_dev
        cap = 1 << max(12, (total - 1).bit_length())
        out, tot = decode_ids(
            jnp.asarray(ids.astype(np.int32)), offs_d, lens_d, blob_d, cap
        )
        return np.asarray(out)[: int(tot)].tobytes()

    def decode_bytes(self, tokens: Sequence[int]) -> bytes:
        try:
            if len(tokens) >= self._DECODE_VEC_MIN:
                # ~4 output bytes/id: route large decodes with the same
                # policy as encode (device only when it actually wins)
                if self._use_device(len(tokens) * 4):
                    ids = np.asarray(tokens, dtype=np.int64)
                    try:
                        return self._decode_bytes_device(ids)
                    except KeyError:
                        raise  # unknown id: same error either path
                    except Exception:  # noqa: BLE001 - exact host fallback
                        pass
                    return self._decode_bytes_vec(ids)
                # native C++ paths: list ids go straight to the tdpy
                # extension (no numpy conversion, GIL-free OpenMP fill —
                # measured 5x the numpy repeat/fancy-index machinery at
                # corpus scale, docs/PERF.md "decode"); arrays take the
                # ctypes fill. Both raise the vec path's exact KeyError
                # on unknown ids; absent native lib falls back to vec.
                from . import native as _native

                t = self._get_tables()
                if isinstance(tokens, np.ndarray):
                    ids = np.ascontiguousarray(tokens, dtype=np.int64)
                    out = _native.decode_ids(
                        ids, t.decode_offsets, t.decode_lengths,
                        t.decode_blob)
                    if out is not None:
                        return out
                    return self._decode_bytes_vec(ids)
                out = _native.decode_list(
                    tokens if isinstance(tokens, (list, tuple))
                    else list(tokens),
                    t.decode_offsets, t.decode_lengths, t.decode_blob)
                if out is not None:
                    return out
                return self._decode_bytes_vec(
                    np.asarray(tokens, dtype=np.int64))
            return self._host.decode_bytes(list(tokens))
        except Exception as e:  # noqa: BLE001
            raise TokenDaggerError(f"Decoding failed: {e}") from e

    def decode(self, tokens: Sequence[int], errors: str = "replace") -> str:
        try:
            return self.decode_bytes(tokens).decode("utf-8", errors=errors)
        except TokenDaggerError:
            raise
        except Exception as e:  # noqa: BLE001
            raise TokenDaggerError(f"Decoding failed: {e}") from e

    # ------------------------------------------------------------------
    # Utility (reference wrapper.py:296-326)
    # ------------------------------------------------------------------
    def special_tokens(self) -> list[str]:
        return list(self._special_tokens.keys())

    def decode_tokens_bytes(self, tokens: Sequence[int]) -> list[bytes]:
        """tiktoken-compatible: per-token byte strings."""
        return [self.decode_single_token_bytes(t) for t in tokens]

    def decode_with_offsets(
        self, tokens: Sequence[int]
    ) -> tuple[str, list[int]]:
        """tiktoken-compatible: decoded text plus the starting character
        offset of each token (UTF-8 continuation-aware, matching
        tiktoken's convention)."""
        token_bytes = self.decode_tokens_bytes(tokens)
        text_len, offsets = 0, []
        for tb in token_bytes:
            offsets.append(max(0, text_len - (0x80 <= tb[0] < 0xC0)))
            text_len += sum(1 for b in tb if not 0x80 <= b < 0xC0)
        text = b"".join(token_bytes).decode("utf-8", errors="strict")
        return text, offsets

    # -- tiktoken single-token utilities --------------------------------
    def decode_single_token_bytes(self, token: int) -> bytes:
        """tiktoken-compatible: the bytes of one token id (raises on
        unknown ids)."""
        try:
            return self._host.decode_bytes([token])
        except KeyError as e:
            raise KeyError(token) from e

    def encode_single_token(self, text_or_bytes: str | bytes) -> int:
        """tiktoken-compatible: the id of an exact token (ordinary or
        special); raises KeyError if the input is not a single token."""
        if isinstance(text_or_bytes, str):
            r = self._special_tokens.get(text_or_bytes)
            if r is not None:
                return r
            text_or_bytes = text_or_bytes.encode("utf-8")
        r = self._mergeable_ranks.get(text_or_bytes)
        if r is None:
            # tiktoken's core also resolves special-token BYTES: on an
            # encoder miss it decodes the bytes and probes the special
            # encoder (verified: tiktoken returns 200000 for
            # b"<|begin_of_text|>" where rank-order lookup alone raises)
            try:
                r = self._special_tokens.get(text_or_bytes.decode("utf-8"))
            except UnicodeDecodeError:
                r = None
            if r is None:
                raise KeyError(text_or_bytes)
        return r

    def token_byte_values(self) -> list[bytes]:
        """tiktoken-compatible: all ordinary token byte strings, sorted
        lexicographically — tiktoken returns its Rust core's
        `sorted_token_bytes` (the array its unstable-token search binary-
        searches), not rank order; verified element-identical against
        tiktoken on the Llama-4 vocab. Returns a copy of the cached
        sorted list (callers may mutate their copy)."""
        return list(self._get_unstable_aux()[0])

    @property
    def eot_token(self) -> int:
        """tiktoken-compatible end-of-text id (strictly '<|endoftext|>',
        raising KeyError otherwise — exactly as tiktoken does)."""
        return self._special_tokens["<|endoftext|>"]

    @property
    def special_tokens_set(self) -> set[str]:
        return set(self._special_tokens.keys())

    @property
    def n_vocab(self) -> int:
        return self.max_token_value + 1

    def is_special_token(self, token: int) -> bool:
        return token in self._special_tokens.values()

    # ------------------------------------------------------------------
    # Internals
    # ------------------------------------------------------------------
    def _resolve_special(self, allowed, disallowed):
        if allowed == "all":
            # the host engine's canonical frozenset: passing this exact
            # object downstream skips per-call re-validation of all 1,134
            # Llama-4 specials
            allowed = self._host.all_specials
        else:
            # tiktoken semantics (the oracle): names that are not special
            # tokens of this encoding are silently inert — tiktoken
            # encodes `"<|zzz|>"` as ordinary text under
            # allowed_special={"<|zzz|>"} (verified; the reference C++
            # instead throws, tiktoken.cpp:177-182 — tiktoken wins)
            allowed = set(allowed) & self._special_tokens.keys()
        if disallowed == "all":
            if allowed is self._host.all_specials:
                disallowed = frozenset()
            elif allowed:
                disallowed = set(self._special_tokens.keys()) - allowed
            else:
                disallowed = self._all_specials_frozen
        return allowed, disallowed

    def _check_disallowed(self, text: str, disallowed) -> None:
        """Disallowed-special check (reference semantics: substring scan,
        wrapper.py:182-188), accelerated by an exact bigram prefilter: a
        token can only occur if its leading bigram occurs, so one scan per
        distinct bigram (typically just "<|") replaces one scan per token."""
        if not disallowed:
            return
        if disallowed is self._all_specials_frozen:
            groups = self._disallowed_all_groups
            if groups is None:
                # build fully, then publish with one atomic assignment so
                # concurrent encodes never see a partially built dict
                fresh: dict[str, list[str]] = {}
                for token in disallowed:
                    fresh.setdefault(token[:2], []).append(token)
                self._disallowed_all_groups = groups = fresh
        else:
            groups = {}
            for token in disallowed:
                groups.setdefault(token[:2], []).append(token)
        for bigram, tokens in groups.items():
            if bigram in text:
                for token in tokens:
                    if token in text:
                        # tiktoken's exact message (raise_disallowed_
                        # special_token), so callers matching on it are
                        # drop-in portable
                        raise ValueError(
                            f"Encountered text corresponding to disallowed"
                            f" special token {token!r}.\n"
                            f"If you want this text to be encoded as a"
                            f" special token, pass it to `allowed_special`,"
                            f" e.g. `allowed_special={{{token!r}, ...}}`.\n"
                            f"If you want this text to be encoded as normal"
                            f" text, disable the check for this token by"
                            f" passing `disallowed_special=(enc."
                            f"special_tokens_set - {{{token!r}}})`.\n"
                            f"To disable this check for all special tokens,"
                            f" pass `disallowed_special=()`.\n"
                        )


# ----------------------------------------------------------------------
# Convenience factories (reference wrapper.py:333-395)
# ----------------------------------------------------------------------
def load_tokenizer(
    name: str,
    vocab_file: str | Path,
    pattern: str,
    special_tokens_file: str | Path | None = None,
) -> Tokenizer:
    return Tokenizer(
        name=name,
        pattern=pattern,
        vocab_file=vocab_file,
        special_tokens_file=special_tokens_file,
    )


def create_tokenizer(
    name: str,
    pattern: str,
    vocab: list[dict],
    special_tokens: dict[str, int] | None = None,
) -> Tokenizer:
    return Tokenizer(
        name=name, pattern=pattern, vocab=vocab, special_tokens=special_tokens
    )


def Encoding(
    name: str,
    *,
    pat_str: str,
    mergeable_ranks: dict[bytes, int],
    special_tokens: dict[str, int] | None = None,
    explicit_n_vocab: int | None = None,
) -> Tokenizer:
    """tiktoken-compatible factory (reference wrapper.py:382-395).

    ``explicit_n_vocab`` mirrors tiktoken's constructor check: when
    given, the vocab (ordinary + special) must have exactly that many
    entries and the max token id must be ``explicit_n_vocab - 1``
    (AssertionError otherwise, exactly as tiktoken raises)."""
    tok = Tokenizer(
        name=name,
        pat_str=pat_str,
        mergeable_ranks=mergeable_ranks,
        special_tokens=special_tokens or {},
    )
    if explicit_n_vocab:
        assert (
            len(mergeable_ranks) + len(special_tokens or {})
            == explicit_n_vocab
        )
        assert tok.max_token_value == explicit_n_vocab - 1
    return tok
