"""CLI driver coverage (tokendagger_tpu.cli)."""

import base64
import json

import pytest

from tokendagger_tpu import cli


@pytest.fixture
def model_files(tmp_path, tiny_vocab):
    ranks, specials = tiny_vocab
    model = tmp_path / "tok.model"
    lines = [
        base64.b64encode(k) + b" " + str(v).encode() for k, v in ranks.items()
    ]
    model.write_bytes(b"\n".join(lines))
    config = tmp_path / "config.json"
    config.write_text(json.dumps({
        "added_tokens_decoder": {
            str(v): {"content": k} for k, v in specials.items()
        }
    }))
    return model, config


def test_encode_cmd(capsys, model_files):
    model, config = model_files
    rc = cli.main([
        "encode", "--model", str(model), "--config", str(config),
        "--backend", "host", "--text", "hello world",
    ])
    assert rc == 0
    ids = json.loads(capsys.readouterr().out.strip())
    assert isinstance(ids, list) and ids


def test_encode_cmd_specials(capsys, model_files):
    model, config = model_files
    rc = cli.main([
        "encode", "--model", str(model), "--config", str(config),
        "--backend", "host", "--allow-special", "--text", "<|bos|>x",
    ])
    assert rc == 0
    ids = json.loads(capsys.readouterr().out.strip())
    assert ids[0] == 5000


def test_bench_cmd(capsys, model_files):
    model, _ = model_files
    rc = cli.main([
        "bench", "--model", str(model), "--backend", "host",
        "--warmup", "1", "--iterations", "50", "--text", "quick test",
    ])
    assert rc == 0
    doc = json.loads(capsys.readouterr().out.strip())
    assert doc["iterations"] == 50 and doc["tokens"] > 0


def test_requires_model():
    with pytest.raises(SystemExit):
        cli.main(["encode", "--text", "x"])
