"""Pretokenizer scanner correctness: numpy reference vs `regex` oracle, and
jax device scan vs the numpy reference."""

import numpy as np
import pytest
import regex

from tokendagger_tpu.scanner_ref import split_spans
from tokendagger_tpu.vocab import LLAMA4_PATTERN

from fuzz_scanner import EDGE_TEXTS, PAT, PAT_NC, oracle_spans, run_fuzz


class TestScannerRef:
    @pytest.mark.parametrize("i", range(len(EDGE_TEXTS)))
    def test_edge(self, i):
        text = EDGE_TEXTS[i]
        assert split_spans(text) == oracle_spans(PAT, text)
        assert split_spans(text, contractions=False) == oracle_spans(PAT_NC, text)

    def test_fuzz(self):
        assert run_fuzz(trials=150, seed=7, verbose=True) == 0

    def test_corpus_lorem(self, corpus_lorem):
        assert split_spans(corpus_lorem) == oracle_spans(PAT, corpus_lorem)

    @pytest.mark.slow
    def test_corpus_emoji(self, corpus_emoji):
        assert split_spans(corpus_emoji) == oracle_spans(PAT, corpus_emoji)


def _device_spans(text: str, contractions: bool = True) -> list[tuple[int, int]]:
    """Byte-offset spans from the jax scan."""
    import jax.numpy as jnp

    from tokendagger_tpu.ops.pretokenize import scan_bytes
    from tokendagger_tpu.unicode_tables import get_two_level_tables

    page_ids, pages = get_two_level_tables()
    data = text.encode("utf-8")
    n = len(data)
    N = max(64, 1 << (n - 1).bit_length()) if n else 64
    buf = np.zeros(N, dtype=np.uint8)
    buf[:n] = np.frombuffer(data, dtype=np.uint8)
    start_b, piece_len, n_pieces = scan_bytes(
        jnp.asarray(buf),
        jnp.int32(n),
        jnp.asarray(page_ids),
        jnp.asarray(pages),
        contractions=contractions,
    )
    k = int(n_pieces)
    s = np.asarray(start_b)[:k]
    l = np.asarray(piece_len)[:k]
    return [(int(a), int(a + b)) for a, b in zip(s, l)]


def _byte_spans(text: str, pat) -> list[tuple[int, int]]:
    """Oracle char spans converted to byte offsets."""
    enc = text.encode("utf-8")
    # byte offset of each char
    offs = np.cumsum([0] + [len(c.encode("utf-8")) for c in text])
    return [(int(offs[s]), int(offs[e])) for s, e in oracle_spans(pat, text)]


class TestScannerDevice:
    @pytest.mark.parametrize("i", range(len(EDGE_TEXTS)))
    def test_edge(self, i):
        text = EDGE_TEXTS[i]
        assert _device_spans(text) == _byte_spans(text, PAT)

    def test_no_contractions(self):
        for text in ["it's", "IT'S", "a'll b", "x 're"]:
            assert _device_spans(text, contractions=False) == _byte_spans(
                text, PAT_NC
            )

    def test_fuzz_device(self):
        from fuzz_scanner import random_text
        import random

        rng = random.Random(99)
        for _ in range(40):
            t = random_text(rng)
            assert _device_spans(t) == _byte_spans(t, PAT), repr(t[:80])

    def test_corpus_lorem(self, corpus_lorem):
        text = corpus_lorem[:65536]
        assert _device_spans(text) == _byte_spans(text, PAT)
