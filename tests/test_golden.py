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


def _check_golden(name: str, ids: list[int]) -> None:
    golden = json.loads(FIXTURE.read_text())[name]
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
