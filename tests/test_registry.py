"""Named-encoding registry."""

import base64
import json

import pytest

import tokendagger_tpu as td


@pytest.fixture
def model_file(tmp_path, tiny_vocab):
    ranks, specials = tiny_vocab
    model = tmp_path / "tok.model"
    model.write_bytes(
        b"\n".join(
            base64.b64encode(k) + b" " + str(v).encode()
            for k, v in ranks.items()
        )
    )
    config = tmp_path / "cfg.json"
    config.write_text(json.dumps({
        "added_tokens_decoder": {str(v): {"content": k}
                                 for k, v in specials.items()}
    }))
    return model, config


def test_register_and_get(model_file):
    model, config = model_file
    td.register_encoding("unit-test-enc", vocab_file=model, config_file=config)
    enc = td.get_encoding("unit-test-enc")
    assert enc.encode_ordinary("hello")
    assert enc.encode("<|bos|>", allowed_special="all") == [5000]
    assert td.get_encoding("unit-test-enc") is enc  # cached
    assert "unit-test-enc" in td.list_encodings()


def test_env_builtin(model_file, monkeypatch):
    model, config = model_file
    monkeypatch.setenv("TOKENDAGGER_LLAMA4_MODEL", str(model))
    monkeypatch.setenv("TOKENDAGGER_LLAMA4_CONFIG", str(config))
    from tokendagger_tpu import registry
    registry._CACHE.pop("llama4", None)
    enc = td.get_encoding("llama4")
    assert enc.encode_ordinary("the")
    registry._CACHE.pop("llama4", None)


def test_unknown_raises():
    with pytest.raises(ValueError, match="Unknown encoding"):
        td.get_encoding("definitely-not-registered")


def test_custom_loader(tiny_vocab):
    ranks, specials = tiny_vocab

    def loader():
        return td.Tokenizer("c", pattern=td.LLAMA4_PATTERN,
                            mergeable_ranks=ranks, special_tokens=specials)

    td.register_encoding("loader-enc", loader=loader)
    assert td.get_encoding("loader-enc").encode_ordinary("x")


def test_standard_tiktoken_names_registered():
    """The standard tiktoken names resolve via tiktoken's own vocab data
    when available; offline they raise a ValueError pointing at the
    fetch script (never an opaque failure)."""
    import pytest

    import tokendagger_tpu as td

    try:
        enc = td.get_encoding("cl100k_base")
    except ValueError as e:
        assert "fetch_real_vocabs" in str(e)
        pytest.skip("tiktoken vocab data unavailable offline")
    import tiktoken

    tk = tiktoken.get_encoding("cl100k_base")
    t = "hello world don't 12345"
    assert enc.encode_ordinary(t) == tk.encode_ordinary(t)
