"""Tekken-vocab conformance on the reference corpus (BASELINE config 2).

The reference's real tekken.json is stripped from the mount
(.MISSING_LARGE_BLOBS), so this builds a stand-in at the REAL Tekken
scale (VERDICT r1 item 7): a merge-closed 130,000-rank prefix of the
real Llama-4 vocab (any rank prefix of a BPE vocab is merge-closed,
because BPE builds bottom-up), re-encoded in the Tekken JSON layout with
its +1000 id-offset convention and 1,000 special tokens — the real
Mistral control names plus multi-byte UTF-8 specials — then verified
bit-exact against tiktoken over the conformance corpus, including
special-token handling.

Layout spec: /root/reference/tests/test_tokendagger_vs_tiktoken.py:61-105.
"""

import pytest

from tokendagger_tpu import vocab  # noqa: F401 - re-exported for tests
from tools.tekken_standin import (
    NUM_SPECIAL,
    special_names as _special_names,
    write_standin,
)


@pytest.fixture(scope="module")
def tekken_setup(tmp_path_factory, llama4_assets):
    # TEKKEN_JSON=/path/to/real/tekken.json runs this whole module
    # against the REAL Mistral vocab (tools/fetch_real_vocabs.py closure
    # path); otherwise the shared stand-in builder
    # (tools/tekken_standin.py) — same config the bench harnesses'
    # --tokenizer mistral flag drives
    import os

    real = os.environ.get("TEKKEN_JSON")
    if real and os.path.exists(real):
        return vocab.load_tekken(real)
    p = write_standin(tmp_path_factory.mktemp("tekken") / "tekken.json")
    return vocab.load_tekken(p)


@pytest.fixture(scope="module")
def tekken_pair(tekken_setup):
    import tiktoken

    import tokendagger_tpu as td

    ours = td.Encoding(
        "tekken", pat_str=tekken_setup["pattern"],
        mergeable_ranks=tekken_setup["mergeable_ranks"],
        special_tokens=tekken_setup["special_tokens"],
    )
    oracle = tiktoken.Encoding(
        "tekken", pat_str=tekken_setup["pattern"],
        mergeable_ranks=tekken_setup["mergeable_ranks"],
        special_tokens=tekken_setup["special_tokens"],
    )
    return ours, oracle


class TestTekkenConformance:
    def test_offset_convention(self, tekken_setup):
        ranks = tekken_setup["mergeable_ranks"]
        assert min(ranks.values()) == NUM_SPECIAL
        assert tekken_setup["special_tokens"]["<unk>"] == 0

    def test_inline(self, tekken_pair):
        ours, oracle = tekken_pair
        for text in ["hello world", "it's the THE", "123 456", "日本語",
                     "   \r\n  x", "", " ", "café"]:
            assert ours.encode_ordinary(text) == oracle.encode_ordinary(text), text

    def test_corpus_lorem(self, tekken_pair, corpus_lorem):
        ours, oracle = tekken_pair
        assert ours.encode_ordinary(corpus_lorem) == oracle.encode_ordinary(
            corpus_lorem
        )

    @pytest.mark.slow
    def test_corpus_emoji(self, tekken_pair, corpus_emoji):
        ours, oracle = tekken_pair
        assert ours.encode_ordinary(corpus_emoji) == oracle.encode_ordinary(
            corpus_emoji
        )

    def test_specials(self, tekken_pair):
        ours, oracle = tekken_pair
        text = ("<s>[INST]hello[/INST]</s> plain <SPECIAL_5> "
                "⟦控制⟧ mixed «spécial» and 🛑STOP🛑 near-miss [INST "
                "<SPECIAL_999x>")
        assert ours.encode(text, allowed_special="all") == oracle.encode(
            text, allowed_special="all"
        )
        with pytest.raises(ValueError):
            ours.encode(text, disallowed_special="all")

    def test_specials_dense(self, tekken_pair):
        import random

        ours, oracle = tekken_pair
        rng = random.Random(11)
        names = _special_names()
        parts = []
        for _ in range(300):
            parts.append("word text " * rng.randint(1, 5))
            parts.append(rng.choice(names))
        text = "".join(parts)
        assert ours.encode(text, allowed_special="all") == oracle.encode(
            text, allowed_special="all"
        )

    def test_roundtrip(self, tekken_pair, corpus_lorem):
        ours, _ = tekken_pair
        text = corpus_lorem[:20000]
        assert ours.decode(ours.encode_ordinary(text)) == text

    def test_device_backend(self, tekken_pair, corpus_lorem):
        ours, oracle = tekken_pair
        ours_dev_ids = None
        text = corpus_lorem[:30000]
        old = ours.backend
        try:
            ours.backend = "tpu"
            ours_dev_ids = ours.encode_ordinary(text)
        finally:
            ours.backend = old
        assert ours_dev_ids == oracle.encode_ordinary(text)
