"""Intra-text parallel encode (wrapper._encode_split_parallel).

One long text is cut at provable piece boundaries and encoded across
cores; the result must be byte-identical to the serial encode for every
supported scanner profile. The reference has no analogue (its engine is
strictly sequential per text, /root/reference/src/tiktoken.cpp); this is
a capability test plus a differential conformance test over inputs that
stress each cut rule's edge cases.
"""

import numpy as np
import pytest

from tokendagger_tpu import vocab, wrapper

# Fragments chosen to place cut candidates next to every construct that
# could span a boundary: punct runs absorbing [\r\n/]*, contractions,
# space runs, \r\n pairs, digit pieces, non-ASCII letters.
TRICKY = (
    "alpha\nbeta gamma.\nDelta?!\nepsilon x/\nyellow\r\nword "
    "it's\nthey're CAN'T\nSHOUTING ABC\nDEF 1234567 abc 42 x "
    "café\nétude naïve\nz 1,234.56 €99 ...!!!???\nq "
    "x         y tab\tsep\na.b.c a-b-c snake_case camelCase "
    "\n\n\nblank lines\n\n\nend 日本語\nascii mix𝒳\ny "
)


def _mk(profile, llama4_assets):
    pattern = {
        "llama4": vocab.LLAMA4_PATTERN,
        "tekken": vocab.TEKKEN_PATTERN,
        "cl100k": vocab.CL100K_PATTERN,
        "gpt2": vocab.GPT2_PATTERN,
    }[profile]
    _, full_ranks, specials = llama4_assets
    if profile == "llama4":
        ranks = full_ranks
    else:  # merge-closed rank prefix keeps BPE validity at reduced size
        ranks = {tb: r for tb, r in full_ranks.items() if r < 50_256}
        specials = {"<|endoftext|>": 50_256}
    tok = wrapper.Tokenizer(profile, pattern=pattern, vocab=ranks,
                            special_tokens=specials, backend="host")
    if tok._get_native() is None:
        pytest.skip("native engine unavailable")
    return tok


@pytest.fixture(scope="module", params=["llama4", "tekken", "cl100k", "gpt2"])
def tok(request, llama4_assets):
    return _mk(request.param, llama4_assets)


def test_split_matches_serial(tok, monkeypatch):
    text = TRICKY * 400  # ~250 KB: dozens of chunks at the test threshold
    data = text.encode("utf-8")
    native = tok._get_native()
    got = tok._encode_split_parallel(native, data)
    assert got is not None, "split path unexpectedly fell back"
    assert got == tok._host.encode_ordinary(text)


def test_split_triggers_from_encode_ordinary(tok, monkeypatch):
    monkeypatch.setattr(type(tok), "_SPLIT_MIN_BYTES", 1 << 16)
    text = TRICKY * 400
    assert tok.encode_ordinary(text) == tok._host.encode_ordinary(text)


def test_no_cut_candidates_falls_back(tok):
    # No ASCII letter is ever preceded by \r/\n or letter-space, so both
    # rules find nothing and the split declines (bounded probe).
    data = ("🙂🇺🇸👍🏽" * 20000).encode("utf-8")
    assert tok._encode_split_parallel(tok._get_native(), data) is None


def test_space_run_never_cut(tok):
    # Rule B requires a letter/digit immediately before the space, so a
    # run of spaces can only be cut... never: interior spaces have a
    # space predecessor. The whole run must land in one chunk.
    text = ("edge" + " " * 5000 + "word\n") * 100
    data = text.encode("utf-8")
    got = tok._encode_split_parallel(tok._get_native(), data)
    assert got is not None
    assert got == tok._host.encode_ordinary(text)


def test_slices_lists_equals_batch_lists(tok):
    native = tok._get_native()
    chunks = [t.encode("utf-8") for t in (TRICKY, TRICKY * 3, "x", "", TRICKY)]
    offs = np.zeros(len(chunks) + 1, dtype=np.int64)
    np.cumsum([len(c) for c in chunks], out=offs[1:])
    blob = b"".join(chunks)
    a = native.encode_slices_lists(blob, offs, num_threads=3)
    b = native.encode_batch_lists(chunks, num_threads=3)
    if a is None or b is None:
        pytest.skip("extension module unavailable")
    assert a == b


def test_encode_batch_few_huge_texts(tok, monkeypatch):
    monkeypatch.setattr(type(tok), "_SPLIT_MIN_BYTES", 1 << 16)
    texts = [TRICKY * 400, "small one", TRICKY * 150]
    got = tok.encode_batch(texts)
    assert got == [tok._host.encode_ordinary(t) for t in texts]


def test_split_fuzz_random_mix(llama4_assets):
    """Randomized cut-placement fuzz: dense mixes of every character
    class around potential cut points, split result vs host oracle."""
    import random

    tok = _mk("llama4", llama4_assets)
    rng = random.Random(20260817)
    atoms = [
        "a", "B", "z", "9", "42", " ", "  ", "\n", "\r\n", "\t", "'s",
        "'T", "?", "?!", "/", "//", ".", ",", "é", "日", "🙂", "́",
        "\r", "\n\n", " x", "1a", "don't",
    ]
    text = "".join(rng.choice(atoms) for _ in range(60_000))
    data = text.encode("utf-8")
    got = tok._encode_split_parallel(tok._get_native(), data)
    if got is None:
        pytest.skip("no cut candidates in fuzz text (unexpected)")
    assert got == tok._host.encode_ordinary(text)
