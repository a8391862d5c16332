"""API smoke test — port of the reference's synthetic-vocab demo
(/root/reference/tests/autogenned_test.py behavior: small vocab + specials,
decode roundtrip, special-token encode with explicit allowed set, and
disallowed specials raising ValueError)."""

import pytest

from tokendagger_tpu import (
    Encoding,
    Tokenizer,
    TokenDaggerError,
    create_tokenizer,
    load_tokenizer,
    vocab as vocab_mod,
)
from tokendagger_tpu.vocab import LLAMA4_PATTERN


@pytest.fixture(scope="module")
def tok(tiny_vocab):
    ranks, specials = tiny_vocab
    return Tokenizer(
        "smoke",
        pattern=LLAMA4_PATTERN,
        mergeable_ranks=ranks,
        special_tokens=specials,
        backend="host",
    )


class TestSmoke:
    def test_roundtrip(self, tok):
        for text in ["hello world", "the and is", "it's x", "", "  a  b  "]:
            ids = tok.encode_ordinary(text)
            assert tok.decode(ids) == text

    def test_special_encode_with_allowed(self, tok):
        ids = tok.encode("<|bos|>hello<|eos|>", allowed_special={"<|bos|>", "<|eos|>"})
        assert ids[0] == 5000 and ids[-1] == 5001
        assert tok.decode(ids) == "<|bos|>hello<|eos|>"

    def test_encode_with_special_tokens(self, tok):
        ids = tok.encode_with_special_tokens("<|pad|>x")
        assert ids[0] == 5002

    def test_disallowed_raises(self, tok):
        with pytest.raises(ValueError, match="bos"):
            tok.encode("x <|bos|> y", disallowed_special="all")

    def test_disallowed_is_default(self, tok):
        # tiktoken parity: encode() raises on special-looking text unless
        # explicitly allowed or disallowed_special is relaxed
        with pytest.raises(ValueError, match="bos"):
            tok.encode("x <|bos|> y")
        assert tok.encode("x <|bos|> y", disallowed_special=())
        with pytest.raises(ValueError, match="bos"):
            tok.encode_batch(["x <|bos|> y"])

    def test_unknown_allowed_is_inert(self, tok):
        """tiktoken semantics (the oracle, verified on the real vocab):
        names in allowed_special that are not special tokens of this
        encoding are silently ignored — tiktoken encodes the text
        ordinarily, it does NOT raise. (The reference C++ raises,
        tiktoken.cpp:177-182; tiktoken wins per the project contract.)"""
        assert tok.encode("x", allowed_special={"<|nope|>"},
                          disallowed_special=()) == tok.encode_ordinary("x")

    def test_batch_roundtrip(self, tok):
        texts = ["hello", "the store", ""]
        batches = tok.encode_batch(texts)
        assert tok.decode_batch(batches) == texts

    def test_utility_surface(self, tok, tiny_vocab):
        ranks, specials = tiny_vocab
        assert tok.n_vocab == tok.max_token_value + 1
        assert set(tok.special_tokens()) == set(specials)
        assert tok.special_tokens_set == set(specials)
        assert tok.is_special_token(5000)
        assert not tok.is_special_token(0)

    def test_decode_unknown_raises(self, tok):
        with pytest.raises(TokenDaggerError):
            tok.decode_bytes([10**7])

    def test_single_token_utilities(self, tok, tiny_vocab):
        ranks, specials = tiny_vocab
        assert tok.decode_single_token_bytes(ranks[b"hello"]) == b"hello"
        assert tok.encode_single_token(b"hello") == ranks[b"hello"]
        assert tok.encode_single_token("<|bos|>") == specials["<|bos|>"]
        with pytest.raises(KeyError):
            tok.encode_single_token(b"not-a-token-xyz")
        with pytest.raises(KeyError):
            tok.decode_single_token_bytes(10**7)
        assert b"hello" in tok.token_byte_values()

    def test_decode_errors_replace(self, tok):
        # token 200 is a lone continuation byte -> U+FFFD under "replace"
        s = tok.decode([200], errors="replace")
        assert s == "�"
        with pytest.raises(TokenDaggerError):
            tok.decode([200], errors="strict")


class TestFactories:
    def test_encoding_factory(self, tiny_vocab):
        ranks, specials = tiny_vocab
        enc = Encoding("f", pat_str=LLAMA4_PATTERN, mergeable_ranks=ranks,
                       special_tokens=specials)
        assert enc.encode_ordinary("hello")

    def test_create_tokenizer(self, tiny_vocab):
        ranks, specials = tiny_vocab
        t = create_tokenizer(
            "c", LLAMA4_PATTERN, vocab_mod.ranks_to_vocab_list(ranks), specials
        )
        assert t.encode_ordinary("hello")

    def test_load_tokenizer(self, tiny_vocab, tmp_path):
        import json

        ranks, specials = tiny_vocab
        vf = tmp_path / "vocab.json"
        vf.write_text(json.dumps(vocab_mod.ranks_to_vocab_list(ranks)))
        sf = tmp_path / "specials.json"
        sf.write_text(json.dumps(specials))
        t = load_tokenizer("l", vf, LLAMA4_PATTERN, sf)
        assert t.encode("x <|bos|>", allowed_special="all")[-1] == 5000

    def test_missing_pattern_raises(self):
        with pytest.raises(ValueError):
            Tokenizer("x", vocab={b"a": 0})  # type: ignore[arg-type]

    def test_missing_vocab_raises(self):
        with pytest.raises(ValueError):
            Tokenizer("x", pattern=LLAMA4_PATTERN)


class TestAutoRouting:
    """Auto mode routes by measured dispatch health (wrapper._use_device):
    large workloads go to the accelerator only when a one-time probe
    shows co-located-class dispatch latency."""

    def _tok(self, tiny_vocab):
        ranks, specials = tiny_vocab
        return Tokenizer(
            "route", pattern=LLAMA4_PATTERN, mergeable_ranks=ranks,
            special_tokens=specials, backend="auto",
        )

    def test_small_inputs_stay_host(self, tiny_vocab):
        t = self._tok(tiny_vocab)
        assert not t._use_device(1024)

    def test_large_healthy_device_wins(self, tiny_vocab, monkeypatch):
        t = self._tok(tiny_vocab)
        if t._get_native() is None:
            pytest.skip("native engine unavailable")
        monkeypatch.setattr(t, "_device_dispatch_ms", lambda: 0.05)
        assert t._use_device(t._DEVICE_AUTO_MIN_BYTES)
        assert not t._use_device(t._DEVICE_AUTO_MIN_BYTES - 1)

    def test_large_degraded_runtime_stays_host(self, tiny_vocab, monkeypatch):
        t = self._tok(tiny_vocab)
        if t._get_native() is None:
            pytest.skip("native engine unavailable")
        monkeypatch.setattr(t, "_device_dispatch_ms", lambda: 30.0)
        assert not t._use_device(64 << 20)

    def test_cpu_backend_probe_is_unhealthy(self, tiny_vocab):
        # the suite pins jax to CPU (conftest): the real probe must
        # report inf so auto never prefers CPU-jax over the native engine
        t = self._tok(tiny_vocab)
        assert t._device_dispatch_ms() == float("inf")
