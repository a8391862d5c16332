"""Vocab/config loader tests: tiktoken .model, HF special tokens, and the
Tekken JSON convention (the reference's tekken.json is stripped from the
mount, so a synthetic config exercises the loader — format documented at
/root/reference/tests/test_tokendagger_vs_tiktoken.py:61-105)."""

import base64
import json

import pytest

from tokendagger_tpu import vocab


def test_load_tiktoken_model(tmp_path):
    p = tmp_path / "test.model"
    entries = {b"a": 0, b"b": 1, b"ab": 2, b"\x00\xff": 3}
    lines = [
        base64.b64encode(k) + b" " + str(v).encode() for k, v in entries.items()
    ]
    p.write_bytes(b"\n".join(lines) + b"\n\n")
    assert vocab.load_tiktoken_model(p) == entries


def test_load_hf_special_tokens(tmp_path):
    p = tmp_path / "tokenizer_config.json"
    p.write_text(json.dumps({
        "added_tokens_decoder": {
            "200000": {"content": "<|begin_of_text|>"},
            "200001": {"content": "<|end_of_text|>"},
        },
        "other_field": True,
    }))
    assert vocab.load_hf_special_tokens(p) == {
        "<|begin_of_text|>": 200000,
        "<|end_of_text|>": 200001,
    }


@pytest.fixture
def tekken_file(tmp_path):
    """Synthetic tekken.json following the Mistral layout: vocab entries are
    rank-ordered, the first `default_num_special_tokens` ids are specials,
    ordinary entry i maps to id i + num_special, and the vocab list is
    truncated to default_vocab_size - num_special entries."""
    num_special = 3
    raw_vocab = [bytes([i]) for i in range(256)] + [b"ab", b"bc", b"abc"]
    cfg = {
        "config": {
            "pattern": vocab.TEKKEN_PATTERN,
            "default_vocab_size": 256 + 2 + num_special,  # truncates "abc"
            "default_num_special_tokens": num_special,
            "version": "v3",
        },
        "vocab": [
            {"rank": i, "token_bytes": base64.b64encode(tb).decode(),
             "token_str": None}
            for i, tb in enumerate(raw_vocab)
        ],
        "special_tokens": [
            {"rank": 0, "token_str": "<unk>", "is_control": True},
            {"rank": 1, "token_str": "<s>", "is_control": True},
            {"rank": 2, "token_str": "</s>", "is_control": True},
        ],
    }
    p = tmp_path / "tekken.json"
    p.write_text(json.dumps(cfg))
    return p, num_special


def test_load_tekken(tekken_file):
    p, num_special = tekken_file
    out = vocab.load_tekken(p)
    ranks = out["mergeable_ranks"]
    # ordinary entry i -> id i + num_special
    assert ranks[b"a"] == ord("a") + num_special
    assert ranks[b"ab"] == 256 + num_special
    assert ranks[b"bc"] == 257 + num_special
    # truncated past default_vocab_size - num_special
    assert b"abc" not in ranks
    assert out["special_tokens"] == {"<unk>": 0, "<s>": 1, "</s>": 2}
    assert out["pattern"] == vocab.TEKKEN_PATTERN


def test_tekken_tokenizer_roundtrip(tekken_file):
    """A Tokenizer built from a Tekken config encodes/decodes exactly
    (differential vs the host oracle with the same offset vocab)."""
    from tokendagger_tpu import Tokenizer
    from tokendagger_tpu.hostengine import HostEngine

    p, _ = tekken_file
    out = vocab.load_tekken(p)
    tok = Tokenizer(
        "tekken",
        pattern=out["pattern"],
        mergeable_ranks=out["mergeable_ranks"],
        special_tokens=out["special_tokens"],
        backend="host",
    )
    host = HostEngine(out["pattern"], out["mergeable_ranks"], out["special_tokens"])
    for text in ["abab bcbc", "hello", "it's", "a b c"]:
        assert tok.encode_ordinary(text) == host.encode_ordinary(text)
        assert tok.decode(tok.encode_ordinary(text)) == text


def test_classify_pattern():
    assert vocab.classify_pattern(vocab.LLAMA4_PATTERN) == "llama4"
    assert vocab.classify_pattern(vocab.TEKKEN_PATTERN) == "nocontract"
    assert vocab.classify_pattern(r"\w+|\s+") is None


def test_vocab_list_roundtrip():
    ranks = {b"a": 1, b"xyz": 7}
    lst = vocab.ranks_to_vocab_list(ranks)
    assert vocab.vocab_list_to_ranks(lst) == ranks
