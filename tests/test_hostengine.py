"""Differential tests of the host oracle engine vs the real tiktoken package.

This mirrors the reference's core test strategy: tiktoken is the correctness
oracle (see /root/reference/tests/test_tokendagger_vs_tiktoken.py behavior).
"""

import pytest

import tiktoken

from tokendagger_tpu import Encoding, LLAMA4_PATTERN

EDGE_CASES = [
    "",
    " ",
    "  ",
    "\n",
    "\r\n\r\n",
    "hello world",
    "Hello, World!",
    "   leading spaces",
    "trailing spaces   ",
    "The quick brown fox jumps over the lazy dog.",
    "I'm can't won't it's we're you've they'll I'd",
    "I'M CAN'T WON'T",
    "123 4567 12345678901234567890",
    "3.14159 1,000,000 $42.00 100%",
    "foo_bar-baz.qux(a, b) => { return a ** b; } // comment",
    "    def f(x):\n        return x + 1\n\n",
    "¡Hola! ¿Cómo estás? Ça va très bien. Übermäßig schön.",
    "日本語のテキスト 中文文本 한국어 텍스트",
    "Здравствуйте мир! Γειά σου Κόσμε! שלום עולם",
    "🙂🙃 👩‍👩‍👧‍👦 🇺🇸🇯🇵 👍🏽 🏳️‍🌈",
    "mixed 🙂 text with émojis 🎉 and ünïcödé",
    "a" * 100,
    " " * 50,
    "!" * 37,
    "ab" * 64,
    "\t\t\tindented\n    code\n",
    "word" + " " * 30 + "word",
    "é̂̃ combining marks à",
    "\x00\x01\x02 control bytes \x7f",
    "ends with space ",
    "ends with newline\n",
]


def build_pair(pattern, ranks, specials):
    ours = Encoding(
        "test", pat_str=pattern, mergeable_ranks=ranks, special_tokens=specials
    )
    ours.backend = "host"
    theirs = tiktoken.Encoding(
        "test", pat_str=pattern, mergeable_ranks=ranks, special_tokens=specials
    )
    return ours, theirs


class TestTinyVocab:
    def test_edge_cases_ordinary(self, tiny_vocab):
        ranks, specials = tiny_vocab
        ours, theirs = build_pair(LLAMA4_PATTERN, ranks, specials)
        for text in EDGE_CASES:
            assert ours.encode_ordinary(text) == theirs.encode_ordinary(text), text

    def test_roundtrip(self, tiny_vocab):
        ranks, specials = tiny_vocab
        ours, _ = build_pair(LLAMA4_PATTERN, ranks, specials)
        for text in EDGE_CASES:
            ids = ours.encode_ordinary(text)
            assert ours.decode(ids) == text

    def test_special_tokens(self, tiny_vocab):
        ranks, specials = tiny_vocab
        ours, theirs = build_pair(LLAMA4_PATTERN, ranks, specials)
        text = "<|bos|>hello world<|eos|> and <|pad|> the end"
        assert ours.encode(text, allowed_special="all") == theirs.encode(
            text, allowed_special="all"
        )
        # subset allowed: others treated as ordinary text
        sub = {"<|bos|>"}
        assert ours.encode(
            text, allowed_special=sub, disallowed_special=set()
        ) == theirs.encode(text, allowed_special=sub, disallowed_special=set())

    def test_specials_at_boundaries(self, tiny_vocab):
        ranks, specials = tiny_vocab
        ours, theirs = build_pair(LLAMA4_PATTERN, ranks, specials)
        for text in [
            "<|bos|>",
            "<|bos|><|eos|>",
            "<|bos|>x",
            "x<|eos|>",
            "<|bos|> <|bos|> <|bos|>",
            "a<|pad|>b<|pad|>c",
        ]:
            assert ours.encode(text, allowed_special="all") == theirs.encode(
                text, allowed_special="all"
            ), text

    def test_disallowed_raises(self, tiny_vocab):
        ranks, specials = tiny_vocab
        ours, _ = build_pair(LLAMA4_PATTERN, ranks, specials)
        with pytest.raises(ValueError):
            ours.encode("hi <|eos|>", disallowed_special="all")
        # allowed wins over "all"-disallowed
        out = ours.encode(
            "hi <|eos|>", allowed_special={"<|eos|>"}, disallowed_special="all"
        )
        assert specials["<|eos|>"] in out

    def test_decode_errors(self, tiny_vocab):
        ranks, specials = tiny_vocab
        ours, _ = build_pair(LLAMA4_PATTERN, ranks, specials)
        # lone continuation byte -> replacement char under errors="replace"
        ids = ours.encode_ordinary("é")
        assert ours.decode(ids[:1]) == "�"

    def test_api_surface(self, tiny_vocab):
        ranks, specials = tiny_vocab
        ours, _ = build_pair(LLAMA4_PATTERN, ranks, specials)
        assert ours.n_vocab == max(specials.values()) + 1
        assert ours.special_tokens_set == set(specials)
        assert sorted(ours.special_tokens()) == sorted(specials)
        assert ours.is_special_token(specials["<|bos|>"])
        assert not ours.is_special_token(0)
        batch = ["hello world", "the end", ""]
        assert ours.encode_batch(batch) == [ours.encode(t) for t in batch]
        ids = [ours.encode_ordinary(t) for t in batch]
        assert ours.decode_batch(ids) == batch


class TestLlama4Vocab:
    def test_edge_cases(self, llama4_assets):
        pattern, ranks, specials = llama4_assets
        ours, theirs = build_pair(pattern, ranks, specials)
        for text in EDGE_CASES:
            assert ours.encode_ordinary(text) == theirs.encode_ordinary(text), text

    def test_lorem_prefix(self, llama4_assets, corpus_lorem):
        pattern, ranks, specials = llama4_assets
        ours, theirs = build_pair(pattern, ranks, specials)
        text = corpus_lorem[:20000]
        assert ours.encode_ordinary(text) == theirs.encode_ordinary(text)

    def test_emoji_prefix(self, llama4_assets, corpus_emoji):
        pattern, ranks, specials = llama4_assets
        ours, theirs = build_pair(pattern, ranks, specials)
        text = corpus_emoji[:8000]
        assert ours.encode_ordinary(text) == theirs.encode_ordinary(text)

    def test_specials_real(self, llama4_assets):
        pattern, ranks, specials = llama4_assets
        ours, theirs = build_pair(pattern, ranks, specials)
        text = "<|begin_of_text|>The quick brown fox<|eot|>done<|end_of_text|>"
        assert ours.encode(text, allowed_special="all") == theirs.encode(
            text, allowed_special="all"
        )

    def test_decode_real(self, llama4_assets):
        pattern, ranks, specials = llama4_assets
        ours, theirs = build_pair(pattern, ranks, specials)
        ids = [200000, 3957, 120, 11, 2312, 76674, 200008]
        assert ours.decode(ids) == theirs.decode(ids)

    @pytest.mark.slow
    def test_lorem_full(self, llama4_assets, corpus_lorem):
        pattern, ranks, specials = llama4_assets
        ours, theirs = build_pair(pattern, ranks, specials)
        assert ours.encode_ordinary(corpus_lorem) == theirs.encode_ordinary(
            corpus_lorem
        )

    @pytest.mark.slow
    def test_emoji_full(self, llama4_assets, corpus_emoji):
        pattern, ranks, specials = llama4_assets
        ours, theirs = build_pair(pattern, ranks, specials)
        assert ours.encode_ordinary(corpus_emoji) == theirs.encode_ordinary(
            corpus_emoji
        )
