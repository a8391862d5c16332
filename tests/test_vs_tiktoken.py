"""Differential conformance vs the real `tiktoken` package (the oracle).

Port of the reference's flagship test
(/root/reference/tests/test_tokendagger_vs_tiktoken.py — behavior spec:
build both tokenizers from identical pat_str/mergeable_ranks/special_tokens,
compare token ids on corpus files + inline edge cases, decode fixed id
lists, and roundtrip). Runs as pytest or as a CLI:

    python tests/test_vs_tiktoken.py [--tokenizer llama] [--backend host|tpu]

Exit code 0 iff zero mismatches (reference behavior :487,502).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REFERENCE = Path("/root/reference")

INLINE_CASES = [
    "",
    " ",
    "hello world",
    "Hello, World! How are you?",
    "The quick brown fox jumps over the lazy dog.",
    "1234567890 42 3.14159",
    "it's don't we'll they've I'm you'd",
    "ALLCAPS MixedCase lowercase",
    "unicode: café naïve résumé 日本語 русский العربية",
    "emoji: 🙂🙃 👍🏽 🇺🇸 👩‍👩‍👧‍👧",
    "code: def f(x):\n    return x**2  # comment\n",
    "whitespace:   \t\n  \r\n   end",
    "punct: !@#$%^&*()_+-=[]{}|;':\",./<>?",
    "<|begin_of_text|> special-looking text <|eot|>",
]


def load_llama():
    import tokendagger_tpu as td

    model = REFERENCE / "src" / "tokenizer.model"
    config = REFERENCE / "src" / "tokenizer_config.json"
    ranks = td.load_tiktoken_model(model)
    specials = td.load_hf_special_tokens(config)
    return td.LLAMA4_PATTERN, ranks, specials


def load_mistral():
    """Tekken-layout stand-in (the real tekken.json is stripped from the
    reference mount; see tools/tekken_standin.py)."""
    from tools.tekken_standin import load_standin

    tek = load_standin()
    return tek["pattern"], tek["mergeable_ranks"], tek["special_tokens"]


def build_pair(pattern, ranks, specials, backend="auto"):
    import tiktoken

    import tokendagger_tpu as td

    ours = td.Encoding(
        "conformance", pat_str=pattern, mergeable_ranks=ranks,
        special_tokens=specials,
    )
    ours.backend = backend
    oracle = tiktoken.Encoding(
        "conformance", pat_str=pattern, mergeable_ranks=ranks,
        special_tokens=specials,
    )
    return ours, oracle


def compare_encodings(ours, oracle, texts, *, with_special=False):
    mismatches = []
    for text in texts:
        if with_special:
            got = ours.encode(text, allowed_special="all")
            want = oracle.encode(text, allowed_special="all")
        else:
            got = ours.encode_ordinary(text)
            want = oracle.encode_ordinary(text)
        if got != want:
            mismatches.append((text[:80], got[:10], want[:10]))
    return mismatches


# ---------------------------------------------------------------------------
# pytest interface
# ---------------------------------------------------------------------------
import pytest  # noqa: E402


@pytest.fixture(scope="module")
def pair(llama4_assets):
    return build_pair(*llama4_assets)


class TestConformance:
    def test_inline_cases(self, pair):
        ours, oracle = pair
        assert compare_encodings(ours, oracle, INLINE_CASES) == []

    def test_inline_with_specials(self, pair):
        ours, oracle = pair
        assert compare_encodings(ours, oracle, INLINE_CASES, with_special=True) == []

    def test_corpus_lorem(self, pair, corpus_lorem):
        ours, oracle = pair
        assert ours.encode_ordinary(corpus_lorem) == oracle.encode_ordinary(
            corpus_lorem
        )

    @pytest.mark.slow
    def test_corpus_emoji(self, pair, corpus_emoji):
        ours, oracle = pair
        assert ours.encode_ordinary(corpus_emoji) == oracle.encode_ordinary(
            corpus_emoji
        )

    def test_attribute_surface_parity(self, pair):
        """Every small public surface must agree with tiktoken on the
        real vocab, including exception behavior (audit that caught the
        token_byte_values ordering and encode_single_token special-bytes
        bugs)."""
        ours, oracle = pair

        def tryget(f):
            try:
                return ("val", f())
            except Exception as e:  # noqa: BLE001
                return ("exc", type(e).__name__)

        assert ours.n_vocab == oracle.n_vocab
        assert ours.max_token_value == oracle.max_token_value
        assert tryget(lambda: ours.eot_token) == tryget(
            lambda: oracle.eot_token)
        assert ours.special_tokens_set == oracle.special_tokens_set
        ids = ours.encode_ordinary("hello world test \U0001f642")
        assert ours.decode_tokens_bytes(ids) == oracle.decode_tokens_bytes(ids)
        bad = ours.encode_ordinary("héllo")[:1]  # split multibyte char
        for errors in ("replace", "ignore"):
            assert ours.decode(bad, errors=errors) == oracle.decode(
                bad, errors=errors)
        # tiktoken resolves special-token BYTES in encode_single_token
        for probe in (b"<|begin_of_text|>", "<|begin_of_text|>", b"hello",
                      b"\xff\xfe", b"<|not_a_special|>"):
            assert tryget(lambda: ours.encode_single_token(probe)) == tryget(
                lambda: oracle.encode_single_token(probe)), probe

    def test_token_byte_values_order(self, pair):
        """tiktoken's token_byte_values is its Rust core's
        sorted_token_bytes (lexicographic), NOT rank order — the rank
        order of this vocab starts b'\\xc0' while tiktoken returns
        b'\\x00' first. Must be element-identical."""
        ours, oracle = pair
        assert ours.token_byte_values() == oracle.token_byte_values()

    def test_decode_fixed_ids(self, pair):
        ours, oracle = pair
        id_lists = [
            [0, 1, 2, 3],
            list(range(1000, 1100)),
            list(range(100000, 100050)),
            [199999],
        ]
        for ids in id_lists:
            assert ours.decode(ids) == oracle.decode(ids)
            assert ours.decode_bytes(ids) == oracle.decode_bytes(ids)

    def test_decode_vectorized_path(self, pair):
        ours, oracle = pair
        ids = list(range(5000, 9000))  # above _DECODE_VEC_MIN
        assert ours.decode_bytes(ids) == oracle.decode_bytes(ids)

    def test_roundtrip(self, pair, corpus_lorem):
        ours, _ = pair
        for text in INLINE_CASES + [corpus_lorem[:5000]]:
            if "<|" in text:
                continue
            assert ours.decode(ours.encode_ordinary(text)) == text

    def test_encode_batch_matches(self, pair):
        ours, oracle = pair
        texts = INLINE_CASES * 3
        got = ours.encode_batch(texts, disallowed_special=())
        want = [oracle.encode(t, disallowed_special=()) for t in texts]
        assert got == want

    def test_special_token_api(self, pair):
        ours, oracle = pair
        assert ours.n_vocab == oracle.n_vocab
        assert ours.max_token_value == oracle.max_token_value
        assert set(ours.special_tokens_set) == set(oracle.special_tokens_set)

    def test_decode_extras(self, pair):
        ours, oracle = pair
        for text in ["hello world, it's 123", "日本語のテキスト 🙂 ok"]:
            ids = oracle.encode_ordinary(text)
            assert ours.decode_tokens_bytes(ids) == oracle.decode_tokens_bytes(ids)
            assert ours.decode_with_offsets(ids) == oracle.decode_with_offsets(ids)
            assert ours.decode_batch([ids]) == [text]


# ---------------------------------------------------------------------------
# CLI interface (reference-style)
# ---------------------------------------------------------------------------
def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokenizer", default="llama",
                    choices=["llama", "mistral"])
    ap.add_argument("--backend", default="auto", choices=["auto", "host", "tpu"])
    args = ap.parse_args()

    pattern, ranks, specials = (
        load_mistral() if args.tokenizer == "mistral" else load_llama()
    )
    ours, oracle = build_pair(pattern, ranks, specials, args.backend)

    total_mismatches = 0
    texts = list(INLINE_CASES)
    for name in ["lorem.txt", "emoji.txt"]:
        p = REFERENCE / "tests" / "input" / name
        if p.exists():
            texts.append(p.read_text())

    mm = compare_encodings(ours, oracle, texts)
    mm += compare_encodings(ours, oracle, texts, with_special=True)
    for text, got, want in mm:
        print(f"MISMATCH: {text!r}: got {got} want {want}")
    total_mismatches += len(mm)

    for text in texts:
        ids = ours.encode_ordinary(text)
        if ours.decode(ids) != text:
            print(f"ROUNDTRIP FAIL: {text[:60]!r}")
            total_mismatches += 1

    print(f"{'PASS' if total_mismatches == 0 else 'FAIL'}: "
          f"{len(texts) * 2} comparisons, {total_mismatches} mismatches")
    return 0 if total_mismatches == 0 else 1


if __name__ == "__main__":
    sys.exit(main())


class TestSpecialScanFast:
    """Single-pass special scanner (VERDICT r1 item 8): exact vs tiktoken
    on special-dense and near-miss text, and not pathologically slower
    than encode_ordinary."""

    def test_sprinkled_specials_match_tiktoken(self, llama4_assets):
        import random

        import tiktoken

        import tokendagger_tpu as td

        pattern, ranks, specials = llama4_assets
        enc = td.Encoding("s", pat_str=pattern, mergeable_ranks=ranks,
                          special_tokens=specials)
        tk = tiktoken.Encoding("s", pat_str=pattern, mergeable_ranks=ranks,
                               special_tokens=specials)
        rng = random.Random(5)
        names = list(specials)
        base = "word soup text here. " * 2000
        parts, i = [], 0
        while i < len(base):
            j = i + rng.randint(50, 400)
            parts.append(base[i:j])
            parts.append(rng.choice(
                [rng.choice(names), "<|", "<|nope|>", "<|end", "||", "<"]
            ))
            i = j
        text = "".join(parts)
        assert (enc.encode(text, allowed_special="all")
                == tk.encode(text, allowed_special="all"))
        # subset-allowed: remaining specials are ordinary text
        subset = set(names[:5])
        assert (enc.encode(text, allowed_special=subset,
                           disallowed_special=())
                == tk.encode(text, allowed_special=subset,
                             disallowed_special=()))

    @pytest.mark.slow
    def test_allowed_all_overhead_bounded(self, llama4_assets):
        import time

        import tokendagger_tpu as td

        pattern, ranks, specials = llama4_assets
        enc = td.Encoding("s", pat_str=pattern, mergeable_ranks=ranks,
                          special_tokens=specials)
        text = "the quick brown fox jumps over the lazy dog. " * 20000
        enc.encode_ordinary(text[:500])
        enc.encode(text[:500], allowed_special="all")
        t0 = time.perf_counter()
        a = enc.encode_ordinary(text)
        t_ord = time.perf_counter() - t0
        t0 = time.perf_counter()
        b = enc.encode(text, allowed_special="all")
        t_all = time.perf_counter() - t0
        assert a == b
        # 1,134 specials must not multiply the scan cost (was O(n_specials
        # * text)); generous 2x bound to stay robust on loaded machines
        assert t_all < 2.0 * t_ord + 0.05
