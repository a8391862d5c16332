"""Device-path exactness: the TPU pipeline must emit the same ids as the
host oracle (and therefore tiktoken) for every input."""

import numpy as np
import pytest

from tokendagger_tpu import LLAMA4_PATTERN
from tokendagger_tpu.engine import DeviceEngine
from tokendagger_tpu.hostengine import HostEngine, byte_pair_encode

from test_hostengine import EDGE_CASES


@pytest.fixture(scope="module")
def tiny_engines(tiny_vocab):
    ranks, specials = tiny_vocab
    dev = DeviceEngine(LLAMA4_PATTERN, ranks, specials)
    host = HostEngine(LLAMA4_PATTERN, ranks, specials)
    return dev, host


@pytest.fixture(scope="module")
def llama_engines(llama4_assets):
    pattern, ranks, specials = llama4_assets
    dev = DeviceEngine(pattern, ranks, specials)
    host = HostEngine(pattern, ranks, specials)
    return dev, host


class TestMergeKernel:
    def test_pieces_tiny(self, tiny_engines):
        dev, host = tiny_engines
        pieces = [
            b"hello", b"the", b"and", b"x", b"", b"hellohello",
            b"abcdefghijklmnop", b"a" * 16, b"a" * 63, b"!" * 10,
            bytes(range(256))[:64],
        ]
        got = dev.encode_pieces(pieces)
        want = [byte_pair_encode(p, host.ranks) if p else [] for p in pieces]
        assert got == want

    def test_pieces_no_fastpath(self, tiny_vocab):
        # force every multi-byte piece through the device merge kernel
        ranks, specials = tiny_vocab
        dev = DeviceEngine(LLAMA4_PATTERN, ranks, specials, vocab_fastpath=False)
        host = HostEngine(LLAMA4_PATTERN, ranks, specials)
        pieces = [b"hello", b"the", b" there", b"is", b"ing", b"anding"]
        got = dev.encode_pieces(pieces)
        want = [byte_pair_encode(p, host.ranks) for p in pieces]
        assert got == want

    def test_pieces_llama_random(self, llama_engines):
        dev, host = llama_engines
        rng = np.random.default_rng(42)
        pieces = []
        for _ in range(300):
            n = int(rng.integers(1, 40))
            pieces.append(bytes(rng.integers(0, 256, n, dtype=np.uint8)))
        # force merge path: random bytes rarely hit whole-piece vocab
        got = dev.encode_pieces(pieces)
        want = [byte_pair_encode(p, host.ranks) for p in pieces]
        assert got == want

    def test_pieces_llama_no_fastpath_words(self, llama4_assets):
        pattern, ranks, specials = llama4_assets
        dev = DeviceEngine(pattern, ranks, specials, vocab_fastpath=False)
        host = HostEngine(pattern, ranks, specials)
        pieces = [
            b" the", b" tokenizer", b" antidisestablishmentarianism",
            b"'s", b" 123", b"\n\n", b"    ", b" \xf0\x9f\x99\x82",
            b" caf\xc3\xa9", b"supercalifragilisticexpialidocious",
        ]
        got = dev.encode_pieces(pieces)
        want = [byte_pair_encode(p, host.ranks) for p in pieces]
        assert got == want

    def test_oversize_piece_fallback(self, llama_engines):
        dev, host = llama_engines
        pieces = [b"x" * 300, b"-" * 1000]  # beyond largest bucket
        got = dev.encode_pieces(pieces)
        want = [byte_pair_encode(p, host.ranks) for p in pieces]
        assert got == want


class TestDeviceTextPath:
    def test_edge_cases(self, tiny_engines):
        dev, host = tiny_engines
        got = dev.encode_ordinary_batch(list(EDGE_CASES))
        want = [host.encode_ordinary(t) for t in EDGE_CASES]
        assert got == want

    def test_edge_cases_llama(self, llama_engines):
        dev, host = llama_engines
        got = dev.encode_ordinary_batch(list(EDGE_CASES))
        want = [host.encode_ordinary(t) for t in EDGE_CASES]
        assert got == want

    def test_lorem_chunks(self, llama_engines, corpus_lorem):
        dev, host = llama_engines
        chunks = [corpus_lorem[i : i + 4096] for i in range(0, 40960, 4096)]
        got = dev.encode_ordinary_batch(chunks)
        want = [host.encode_ordinary(t) for t in chunks]
        assert got == want

    def test_emoji_chunk(self, llama_engines, corpus_emoji):
        dev, host = llama_engines
        chunks = [corpus_emoji[:5000]]
        got = dev.encode_ordinary_batch(chunks)
        want = [host.encode_ordinary(t) for t in chunks]
        assert got == want

    def test_specials(self, tiny_engines):
        dev, host = tiny_engines
        texts = [
            "<|bos|>hello world<|eos|>",
            "no specials here",
            "<|bos|><|bos|>x<|pad|>",
            "",
        ]
        allowed = set(host.special_tokens)
        got = dev.encode_batch(texts, allowed)
        want = [host.encode(t, allowed)[0] for t in texts]
        assert got == want

    def test_wrapper_tpu_backend(self, tiny_vocab):
        from tokendagger_tpu import Encoding

        ranks, specials = tiny_vocab
        enc = Encoding("t", pat_str=LLAMA4_PATTERN, mergeable_ranks=ranks,
                       special_tokens=specials)
        enc.backend = "tpu"
        host = HostEngine(LLAMA4_PATTERN, ranks, specials)
        text = "hello world " * 50
        assert enc.encode(text) == host.encode(text, set())[0]
        assert enc.encode_batch(["a b c", text]) == [
            host.encode("a b c", set())[0],
            host.encode(text, set())[0],
        ]


class TestGiantClassRuns:
    """Regression (ADVICE r1): the windowed safe cut must find the true
    start of a class run even when the run is longer than the backward-
    search tail (8192 bytes) or the whole scan window."""

    def test_ws_run_crossing_window_cut(self):
        # ws merges make a mis-finalized '\s*[\r\n]+' piece change the ids
        ranks = {bytes([i]): i for i in range(256)}
        ranks[b"\n "] = 256
        ranks[b"  "] = 257
        ranks[b" \n"] = 258
        dev = DeviceEngine(LLAMA4_PATTERN, ranks, {})
        host = HostEngine(LLAMA4_PATTERN, ranks, {})
        text = "x" * 56000 + "\n" + " " * 12000 + "\n" + "b"
        want = host.encode_ordinary(text)
        got = dev.encode_stream(text.encode())
        assert got.tolist() == want

    def test_runs_longer_than_window(self, tiny_engines):
        dev, host = tiny_engines
        cases = [
            "hello " * 100 + " " * 70000 + "\n" + "tail",
            " " * 140000 + "\nx",                      # run spans everything
            "a" * 100000 + " done",                    # letters run
            " " * 90000 + "\n" + "the quick brown fox " * 40,
            "b" * 70000 + " " * 70000 + "9" * 70000 + "." * 70000,
            "　" * 30000 + "\nx y z",              # unicode whitespace
        ]
        for text in cases:
            want = host.encode_ordinary(text)
            got = dev.encode_stream(text.encode())
            assert got.tolist() == want, text[:40]
