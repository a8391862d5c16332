"""Skip-guarded differential over REAL cl100k_base / gpt2 ranks
(VERDICT r3 item 8).

tiktoken fetches these vocabularies from openaipublic blob storage; this
environment has zero egress and ships no cache, so the tests skip with a
recorded reason here. In any environment where `tiktoken.get_encoding`
succeeds (cache present or network available), they run a full
differential: our wrapper built from tiktoken's OWN mergeable_ranks /
pattern / specials must produce identical ids on edge cases + random
text. Real-vocab-SIZED synthetic coverage for the same profiles lives in
tests/test_profiles_fullvocab.py.
"""

import random

import pytest

from fuzz_scanner import EDGE_TEXTS, random_text


def _get_real(name: str):
    import tiktoken

    try:
        return tiktoken.get_encoding(name)
    except Exception as e:  # noqa: BLE001 - no network/cache
        pytest.skip(
            f"real {name} vocab unavailable offline "
            f"({type(e).__name__}: {str(e)[:100]})"
        )


@pytest.mark.parametrize("name", ["cl100k_base", "gpt2", "o200k_base"])
def test_real_vocab_differential(name):
    tk = _get_real(name)
    import tokendagger_tpu as td

    enc = td.Encoding(
        name,
        pat_str=tk._pat_str,
        mergeable_ranks=tk._mergeable_ranks,
        special_tokens=tk._special_tokens,
    )
    cases = EDGE_TEXTS + [
        "'s 'S 'll 'LL 've 'd 'M", "can't we'll", "a1b2", "   \r x",
        "def f(x):\n    return x ** 2\n", "日本語 🙂🇺🇸 mixed",
    ]
    rng = random.Random(99)
    cases += [random_text(rng) for _ in range(200)]
    for t in cases:
        assert enc.encode_ordinary(t) == tk.encode_ordinary(t), repr(t[:60])
        ids = tk.encode_ordinary(t)
        assert enc.decode(ids) == tk.decode(ids)
