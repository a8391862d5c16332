"""encode_with_unstable / encode_to_numpy / decode_bytes_batch vs the
tiktoken oracle.

tiktoken's ``encode_with_unstable`` is the semantics spec (reference
TokenDagger does not implement it; this is a drop-in-extra): stable
prefix + every completion sequence the unstable tail could begin. The
comparison is exact — same stable tokens, same completion SET.
"""

import random

import numpy as np
import pytest

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def pair(llama4_assets):
    import tiktoken

    import tokendagger_tpu as td

    _, ranks, specials = llama4_assets
    enc = td.Encoding("llama4-unstable", pat_str=td.LLAMA4_PATTERN,
                      mergeable_ranks=ranks, special_tokens=specials)
    tk = tiktoken.Encoding("llama4-unstable", pat_str=td.LLAMA4_PATTERN,
                           mergeable_ranks=ranks, special_tokens=specials)
    return enc, tk


CASES = [
    "hello wor", "x   ", "the quick bro", "don'", "  \n\n  ",
    "café au lai", "a", "", "123,45", "def f(x", "наприм", "🙂", "é",
    "word  ", "tab\t\t", "x \n", "I'v", "HELLO WO", "snake_cas",
    "http://exa", " ", "\n", "...", "a ", "x ",
]


def _cmp(enc, tk, text):
    t1, c1 = enc.encode_with_unstable(text)
    t2, c2 = tk.encode_with_unstable(text)
    assert t1 == t2, (text, t1, t2)
    assert sorted(map(tuple, c1)) == sorted(map(tuple, c2)), (
        text, len(c1), len(c2))


def test_unstable_cases(pair):
    enc, tk = pair
    for c in CASES:
        _cmp(enc, tk, c)


def test_unstable_allowed_special(pair):
    enc, tk = pair
    sp = next(iter(enc.special_tokens_set))
    for text in (f"a {sp}", f"a {sp} tra", f"{sp}", f"{sp}  "):
        t1, c1 = enc.encode_with_unstable(text, allowed_special="all")
        t2, c2 = tk.encode_with_unstable(text, allowed_special="all")
        assert t1 == t2
        assert sorted(map(tuple, c1)) == sorted(map(tuple, c2))


@pytest.mark.slow
def test_unstable_fuzz_corpora(pair):
    enc, tk = pair
    rng = random.Random(11)
    for path in ("tests/input/lorem.txt", "tests/input/emoji.txt"):
        corpus = open(f"{REFERENCE}/{path}", encoding="utf-8").read()
        for _ in range(120):
            i = rng.randrange(0, len(corpus) - 60)
            _cmp(enc, tk, corpus[i : i + rng.randrange(1, 50)])


def test_encode_to_numpy(pair):
    enc, tk = pair
    for text in ("hello world", "", "🙂 mixed café 123"):
        a = enc.encode_to_numpy(text)
        b = tk.encode_to_numpy(text)
        assert a.dtype == b.dtype == np.uint32
        assert a.tolist() == b.tolist()


def test_decode_bytes_batch(pair):
    enc, tk = pair
    batches = [[100, 200, 300], [], [5000]]
    assert enc.decode_bytes_batch(batches) == tk.decode_bytes_batch(batches)
