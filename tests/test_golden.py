"""Golden-output regression: encode the conformance corpus and compare to
checked-in Llama-4 digests (tests/golden_llama4.json — the analogue of the
reference's tests/output fixtures, generated against tiktoken and stored as
sha256-of-ids + count + head/tail so the repo carries no megabyte id dumps).
Catches silent scanner/vocab drift without needing the oracle at runtime."""

import hashlib
import json
from pathlib import Path

import pytest

FIXTURE = Path(__file__).parent / "golden_llama4.json"
FIXTURE_TEKKEN = Path(__file__).parent / "golden_tekken.json"


def _check_golden(name: str, ids: list[int], fixture: Path = FIXTURE) -> None:
    golden = json.loads(fixture.read_text())[name]
    assert len(ids) == golden["count"]
    assert ids[:8] == golden["head"]
    assert ids[-8:] == golden["tail"]
    blob = ",".join(map(str, ids)).encode()
    assert hashlib.sha256(blob).hexdigest() == golden["sha256"]


@pytest.fixture(scope="module")
def enc(llama4_assets):
    import tokendagger_tpu as td

    pattern, ranks, specials = llama4_assets
    e = td.Encoding("golden", pat_str=pattern, mergeable_ranks=ranks,
                    special_tokens=specials)
    e.backend = "host"
    return e


def test_lorem_golden(enc, corpus_lorem):
    _check_golden("lorem", enc.encode_ordinary(corpus_lorem))


@pytest.mark.slow
def test_emoji_golden(enc, corpus_emoji):
    _check_golden("emoji", enc.encode_ordinary(corpus_emoji))


def test_lorem_golden_device(llama4_assets, corpus_lorem):
    import tokendagger_tpu as td

    pattern, ranks, specials = llama4_assets
    e = td.Encoding("golden-dev", pat_str=pattern, mergeable_ranks=ranks,
                    special_tokens=specials)
    e.backend = "tpu"
    _check_golden("lorem", e.encode_ordinary(corpus_lorem))


# --- Tekken-config goldens (reference's tests/output/{lorem,emoji}.txt are
# Tekken-encoded dumps; the real tekken.json is stripped from the mount, so
# these digests are for the stand-in config — tools/tekken_standin.py —
# including the mistral-driver BOS/[INST] wrap convention,
# /root/reference/src/mistral_main.cpp:63-74) -------------------------------


@pytest.fixture(scope="module")
def enc_tekken(llama4_assets, tmp_path_factory):
    import tokendagger_tpu as td
    from tokendagger_tpu import vocab
    from tools.tekken_standin import write_standin

    tek = vocab.load_tekken(
        write_standin(tmp_path_factory.mktemp("tg") / "tekken.json")
    )
    e = td.Encoding("golden-tek", pat_str=tek["pattern"],
                    mergeable_ranks=tek["mergeable_ranks"],
                    special_tokens=tek["special_tokens"])
    e.backend = "host"
    return e


def test_tekken_lorem_golden(enc_tekken, corpus_lorem):
    ids = enc_tekken.encode_ordinary(corpus_lorem)
    _check_golden("lorem", ids, FIXTURE_TEKKEN)
    golden = json.loads(FIXTURE_TEKKEN.read_text())["lorem"]
    wrapped = [1, 3] + ids + [4]
    assert wrapped[:8] == golden["wrapped_head"]
    blob = ",".join(map(str, wrapped)).encode()
    assert hashlib.sha256(blob).hexdigest() == golden["wrapped_sha256"]


@pytest.mark.slow
def test_tekken_emoji_golden(enc_tekken, corpus_emoji):
    _check_golden("emoji", enc_tekken.encode_ordinary(corpus_emoji),
                  FIXTURE_TEKKEN)
