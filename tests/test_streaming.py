"""Streaming encoder: any chunking must reproduce the one-shot encode."""

import random

import pytest

from tokendagger_tpu import Tokenizer
from tokendagger_tpu.streaming import StreamingEncoder
from tokendagger_tpu.vocab import LLAMA4_PATTERN

from fuzz_scanner import EDGE_TEXTS, random_text


@pytest.fixture(scope="module")
def tok(tiny_vocab):
    ranks, specials = tiny_vocab
    return Tokenizer(
        "stream", pattern=LLAMA4_PATTERN, mergeable_ranks=ranks,
        special_tokens=specials, backend="host",
    )


def stream_encode(tok, text, chunks, allowed=frozenset()):
    enc = StreamingEncoder(tok, allowed_special=allowed)
    out = []
    for c in chunks:
        out.extend(enc.feed(c))
    out.extend(enc.flush())
    return out


def random_chunking(rng, text):
    chunks = []
    i = 0
    while i < len(text):
        k = rng.randint(1, 12)
        chunks.append(text[i : i + k])
        i += k
    return chunks


class TestStreaming:
    def test_edge_texts_char_by_char(self, tok):
        for text in EDGE_TEXTS:
            want = tok.encode(text, disallowed_special=())
            got = stream_encode(tok, text, list(text))
            assert got == want, repr(text[:50])

    def test_random_chunkings(self, tok):
        rng = random.Random(3)
        for _ in range(60):
            text = random_text(rng)
            want = tok.encode(text, disallowed_special=())
            got = stream_encode(tok, text, random_chunking(rng, text))
            assert got == want, repr(text[:60])

    def test_specials_split_across_chunks(self, tok):
        text = "hello <|bos|> world <|eos|>x"
        want = tok.encode(text, allowed_special={"<|bos|>", "<|eos|>"})
        # split in the middle of the special tokens
        chunks = ["hello <|b", "os|> wor", "ld <|e", "os|", ">x"]
        assert "".join(chunks) == text
        got = stream_encode(tok, text, chunks, allowed={"<|bos|>", "<|eos|>"})
        assert got == want

    def test_long_run_held_back(self, tok):
        enc = StreamingEncoder(tok)
        assert enc.feed(" " * 100) == []  # open whitespace run: all held
        out = enc.feed("x")
        out += enc.flush()
        assert out == tok.encode(" " * 100 + "x", disallowed_special=())

    def test_run_longer_than_safecut_tail(self):
        # Regression (ADVICE r1): a class run longer than the 8192-char
        # safe-cut tail must be held back entirely, not finalized at the
        # truncation point — the '\n' must stay joined to the space run.
        ranks = {bytes([i]): i for i in range(256)}
        ranks[b"\n "] = 256
        ranks[b"  "] = 257
        ranks[b" \n"] = 258
        tok = Tokenizer("ws", pattern=LLAMA4_PATTERN, mergeable_ranks=ranks,
                        special_tokens={}, backend="host")
        text = "a\n" + " " * 9000 + "\nb"
        want = tok.encode(text, disallowed_special=())
        got = stream_encode(tok, text, ["a\n" + " " * 9000, "\nb"])
        assert got == want
        # newline buried mid-run, fed in uneven chunks
        text2 = "x" * 20 + " " * 8500 + "\n" + " " * 700 + "\nend"
        want2 = tok.encode(text2, disallowed_special=())
        got2 = stream_encode(
            tok, text2, [text2[:4000], text2[4000:8600], text2[8600:]]
        )
        assert got2 == want2

    def test_unknown_special_raises(self, tok):
        with pytest.raises(KeyError):
            StreamingEncoder(tok, allowed_special={"<|nope|>"})

    def test_emits_incrementally(self, tok):
        enc = StreamingEncoder(tok)
        a = enc.feed("hello world, this is a sentence. ")
        assert len(a) > 0  # completed words are emitted before flush
        b = enc.feed("more text here. ")
        c = enc.flush()
        assert a + b + c == tok.encode(
            "hello world, this is a sentence. more text here. ",
            disallowed_special=(),
        )


def test_unsupported_pattern_refused(tiny_vocab):
    ranks, specials = tiny_vocab
    weird = Tokenizer("w", pattern=r"\w+|\s+|.", mergeable_ranks=ranks,
                      special_tokens=specials, backend="host")
    with pytest.raises(ValueError, match="supported pattern profile"):
        StreamingEncoder(weird)
