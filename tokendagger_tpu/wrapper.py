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

    def _use_device(self, nbytes: int) -> bool:
        if self.backend == "host":
            return False
        if self.backend == "tpu":
            return True  # forced: let device errors propagate to the caller
        if self._device_broken:
            return False
        if nbytes < self._DEVICE_MIN_BYTES:
            return False
        if self._device is None:
            # In auto mode, probe the device engine once; if it can't come
            # up (no accelerator, unsupported pattern, ...) stick to host.
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
            if self._use_device(len(text)):
                return self._get_device().encode_ordinary_batch([text])[0]
            return self._host.encode_ordinary(text)
        except Exception as e:  # noqa: BLE001
            raise TokenDaggerError(f"Encoding failed: {e}") from e

    def encode(
        self,
        text: str,
        *,
        allowed_special: Literal["all"] | AbstractSet[str] = set(),
        disallowed_special: Literal["all"] | Collection[str] = set(),
    ) -> list[int]:
        allowed, disallowed = self._resolve_special(allowed_special, disallowed_special)
        self._check_disallowed(text, disallowed)
        try:
            if self._use_device(len(text)):
                return self._get_device().encode_batch([text], allowed)[0]
            tokens, _ = self._host.encode(text, allowed)
            return tokens
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

    def encode_batch(
        self,
        text: Sequence[str],
        *,
        num_threads: int = 8,
        allowed_special: Literal["all"] | AbstractSet[str] = set(),
        disallowed_special: Literal["all"] | Collection[str] = set(),
    ) -> list[list[int]]:
        """Batch encode. On the TPU backend the whole batch is tokenized in
        one fused device pipeline (the analogue of the reference's
        ThreadPoolExecutor fan-out, wrapper.py:212-235); ``num_threads`` is
        honored on the host path."""
        allowed, disallowed = self._resolve_special(allowed_special, disallowed_special)
        for t in text:
            self._check_disallowed(t, disallowed)
        total = sum(len(t) for t in text)
        if self._use_device(total):
            return self._get_device().encode_batch(list(text), allowed)
        encoder = functools.partial(
            self.encode,
            allowed_special=allowed_special,
            disallowed_special=disallowed_special,
        )
        with ThreadPoolExecutor(num_threads) as e:
            return list(e.map(encoder, text))

    def decode_batch(
        self,
        tokens: Sequence[Sequence[int]],
        *,
        num_threads: int = 8,
        errors: str = "replace",
    ) -> list[str]:
        decoder = functools.partial(self.decode, errors=errors)
        with ThreadPoolExecutor(num_threads) as e:
            return list(e.map(decoder, tokens))

    # ------------------------------------------------------------------
    # Decoding (reference wrapper.py:262-290)
    # ------------------------------------------------------------------
    def decode_bytes(self, tokens: Sequence[int]) -> bytes:
        try:
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
            allowed = set(self._special_tokens.keys())
        else:
            allowed = set(allowed)
        if disallowed == "all":
            disallowed = set(self._special_tokens.keys()) - allowed
        return allowed, disallowed

    def _check_disallowed(self, text: str, disallowed) -> None:
        # Plain substring scan, faithful to the reference (wrapper.py:182-188).
        for token in disallowed:
            if token in text:
                raise ValueError(
                    f"Encountered disallowed special token {token!r}. "
                    f"Pass it to allowed_special to encode it as a special token."
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
) -> Tokenizer:
    """tiktoken-compatible factory (reference wrapper.py:382-395)."""
    return Tokenizer(
        name=name,
        pat_str=pat_str,
        mergeable_ranks=mergeable_ranks,
        special_tokens=special_tokens or {},
    )
