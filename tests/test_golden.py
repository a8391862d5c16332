"""Golden-output regression: encode the conformance corpus and compare to
checked-in Llama-4 id dumps (tests/output/*_llama4.txt — the analogue of
the reference's tests/output fixtures, regenerated against tiktoken).
Catches silent scanner/vocab drift without needing the oracle at runtime."""

from pathlib import Path

import pytest

OUT = Path(__file__).parent / "output"


def _golden(name: str) -> list[int]:
    p = OUT / f"{name}_llama4.txt"
    if not p.exists():
        pytest.skip(f"golden fixture {p.name} missing")
    return [int(x) for x in p.read_text().split()]


@pytest.fixture(scope="module")
def enc(llama4_assets):
    import tokendagger_tpu as td

    pattern, ranks, specials = llama4_assets
    e = td.Encoding("golden", pat_str=pattern, mergeable_ranks=ranks,
                    special_tokens=specials)
    e.backend = "host"
    return e


def test_lorem_golden(enc, corpus_lorem):
    assert enc.encode_ordinary(corpus_lorem) == _golden("lorem")


@pytest.mark.slow
def test_emoji_golden(enc, corpus_emoji):
    assert enc.encode_ordinary(corpus_emoji) == _golden("emoji")


def test_lorem_golden_device(llama4_assets, corpus_lorem):
    import tokendagger_tpu as td

    pattern, ranks, specials = llama4_assets
    e = td.Encoding("golden-dev", pat_str=pattern, mergeable_ranks=ranks,
                    special_tokens=specials)
    e.backend = "tpu"
    assert e.encode_ordinary(corpus_lorem) == _golden("lorem")
