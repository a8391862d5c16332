"""Tekken-vocab conformance on the reference corpus (BASELINE config 2).

The reference's real tekken.json is stripped from the mount
(.MISSING_LARGE_BLOBS), so this builds a realistic stand-in: a
merge-closed 40960-rank prefix of the real Llama-4 vocab, re-encoded in
the Tekken JSON layout with its id-offset convention and special tokens,
then verified bit-exact against tiktoken over the conformance corpus —
including special-token handling.
"""

import base64
import json

import pytest

from tokendagger_tpu import vocab

N_PREFIX = 40960
NUM_SPECIAL = 10


@pytest.fixture(scope="module")
def tekken_setup(tmp_path_factory, llama4_assets):
    _, full_ranks, _ = llama4_assets
    prefix = {tb: r for tb, r in full_ranks.items() if r < N_PREFIX}
    # Tekken layout: vocab list is rank-ordered; entry i gets id
    # i + NUM_SPECIAL; specials take ids 0..NUM_SPECIAL-1
    ordered = sorted(prefix.items(), key=lambda kv: kv[1])
    cfg = {
        "config": {
            "pattern": vocab.TEKKEN_PATTERN,
            "default_vocab_size": N_PREFIX + NUM_SPECIAL,
            "default_num_special_tokens": NUM_SPECIAL,
            "version": "v3",
        },
        "vocab": [
            {"rank": i, "token_bytes": base64.b64encode(tb).decode(),
             "token_str": None}
            for i, (tb, _) in enumerate(ordered)
        ],
        "special_tokens": [
            {"rank": i, "token_str": f"<extra_{i}>" if i > 2 else
             ["<unk>", "<s>", "</s>"][i], "is_control": True}
            for i in range(NUM_SPECIAL)
        ],
    }
    p = tmp_path_factory.mktemp("tekken") / "tekken.json"
    p.write_text(json.dumps(cfg))
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
        text = "<s>hello</s> plain <extra_5>"
        assert ours.encode(text, allowed_special="all") == oracle.encode(
            text, allowed_special="all"
        )
        with pytest.raises(ValueError):
            ours.encode(text, disallowed_special="all")

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
