"""Oracle-calibrated Unicode classes (round-5 soak finding).

The `regex` module, CPython's unicodedata, and the Rust regex crate
vendored by tiktoken each carry a different Unicode version; they
disagree on ~10k codepoints (new assignments + re-categorizations).
tiktoken is THE conformance oracle, so divergent codepoints carry
checked-in per-codepoint class overrides calibrated by direct
behavioral differential (tools/calibrate_unicode.py). These tests pin
the overlay: every calibrated codepoint's neighborhood must encode
id-identically to tiktoken through the public API (which routes the
native engine) AND through the host oracle."""

import random

import pytest

from tokendagger_tpu.unicode_tables import get_override_cps


@pytest.fixture(scope="module")
def pair(llama4_assets):
    import tiktoken

    import tokendagger_tpu as td

    pattern, ranks, _ = llama4_assets
    enc = td.Encoding("llama4", pat_str=pattern, mergeable_ranks=ranks,
                      special_tokens={})
    tk = tiktoken.Encoding("llama4", pat_str=pattern,
                           mergeable_ranks=ranks, special_tokens={})
    return enc, tk


def _battery(c: str) -> list[str]:
    return [c, "a" + c + "b", c + "'s", "1" + c + "2", " " + c + " ",
            "." + c + "/a", "A" + c + "'st", c + "1111", c + "́a"]


def test_known_regression(pair):
    enc, tk = pair
    t = "\U000187fe's"  # the round-5 soak's minimal failing case
    assert enc.encode_ordinary(t) == tk.encode_ordinary(t)


def test_calibrated_sample_matches_tiktoken(pair):
    enc, tk = pair
    cps = sorted(get_override_cps())
    assert len(cps) > 1000, "override table missing/empty"
    rng = random.Random(42)
    sample = rng.sample(cps, min(300, len(cps)))
    for cp in sample:
        for t in _battery(chr(cp)):
            assert enc.encode_ordinary(t) == tk.encode_ordinary(t), \
                (hex(cp), repr(t))


@pytest.mark.slow
def test_calibrated_full_set_matches_tiktoken(pair, llama4_assets):
    enc, tk = pair
    from tokendagger_tpu.hostengine import HostEngine

    pattern, ranks, _ = llama4_assets
    host = HostEngine(pattern, ranks, {})
    for cp in sorted(get_override_cps()):
        c = chr(cp)
        for t in _battery(c):
            want = tk.encode_ordinary(t)
            assert enc.encode_ordinary(t) == want, (hex(cp), repr(t))
            assert host.encode_ordinary(t) == want, (hex(cp), repr(t))


def test_host_oracle_uses_calibrated_scanner(llama4_assets):
    """The host oracle's split must ride the calibrated scanner for
    supported profiles (the regex engine disagrees on calibrated cps)."""
    import tiktoken

    from tokendagger_tpu.hostengine import HostEngine

    pattern, ranks, _ = llama4_assets
    host = HostEngine(pattern, ranks, {})
    tk = tiktoken.Encoding("llama4", pat_str=pattern,
                           mergeable_ranks=ranks, special_tokens={})
    for t in ("\U000187fe's", "a\U000187feb", "x ᫐y"):
        assert host.encode_ordinary(t) == tk.encode_ordinary(t), repr(t)


@pytest.mark.slow
def test_device_general_path_on_calibrated_cps(llama4_assets):
    """The device resident pipeline (general path, hot class routing) on
    windows stuffed with calibrated codepoints — ids verified against
    the host oracle by run_resident AND against tiktoken directly."""
    import random

    import numpy as np
    import tiktoken

    from tokendagger_tpu.hostengine import HostEngine
    from tokendagger_tpu.resident import run_resident

    pattern, ranks, _ = llama4_assets
    rng = random.Random(9)
    ov = sorted(get_override_cps())
    parts = []
    for _ in range(4000):
        r = rng.random()
        if r < 0.4:
            parts.append(chr(rng.choice(ov)))
        elif r < 0.7:
            parts.append(rng.choice(["word ", "don't ", "12345 ", ". "]))
        else:
            parts.append(rng.choice(["é", "🙂", "日本", " "]))
    corpus = ("".join(parts) * 8).encode("utf-8")

    res = run_resident(ranks, {}, pattern, corpus,
                       window=1 << 15, n_windows=2, reps=1, batch=2,
                       starts_impl="bits-pallas", compact_impl="butterfly",
                       probe_impl="chunks", cap_bytes_per_piece=0,
                       overlap_trial=False)
    assert res.impl == "general"
    assert res.match_host          # device == host oracle
    assert res.overflow_windows == 0

    # and the host oracle == tiktoken on the same windows
    tk = tiktoken.Encoding("llama4", pat_str=pattern,
                           mergeable_ranks=ranks, special_tokens={})
    host = HostEngine(pattern, ranks, {})
    from tokendagger_tpu.utils.windows import tile_windows

    wins, nbs = tile_windows(corpus, 1 << 15, 2)
    for b in range(2):
        t = bytes(wins[b, : nbs[b]]).decode("utf-8")
        assert host.encode_ordinary(t) == tk.encode_ordinary(t)
