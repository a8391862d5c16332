"""Native single-pass special-token scanner (td_find_specials) vs the
Python scan and the tiktoken oracle.

The native scan must reproduce hostengine.find_all_specials selection
exactly (leftmost match, longest at same-position ties, non-overlap) in
byte space, and the wrapper's full-allowed fast path must stay
id-identical to tiktoken's encode(allowed_special="all")."""

import random

import numpy as np
import pytest


@pytest.fixture(scope="module")
def enc_pair(llama4_assets):
    import tiktoken

    import tokendagger_tpu as td

    pattern, ranks, specials = llama4_assets
    ours = td.Encoding("llama4", pat_str=pattern, mergeable_ranks=ranks,
                       special_tokens=specials)
    oracle = tiktoken.Encoding("llama4", pat_str=pattern,
                               mergeable_ranks=ranks,
                               special_tokens=specials)
    return ours, oracle, specials


def test_native_scan_matches_python(llama4_assets):
    from tokendagger_tpu.hostengine import HostEngine

    pattern, ranks, specials = llama4_assets
    host = HostEngine(pattern, ranks, specials)
    import tokendagger_tpu as td

    enc = td.Encoding("llama4", pat_str=pattern, mergeable_ranks=ranks,
                      special_tokens=specials)
    native = enc._get_native()
    if native is None or not getattr(native, "_sp_ok", False):
        pytest.skip("native scanner unavailable")

    names = list(specials)
    rng = random.Random(11)
    fillers = ["hello ", "<", "|", "<|", "|>", "<|eot", "日本語", "🙂",
               " x ", "\n", "<|header_start|", "|end_of_text|>"]
    for trial in range(300):
        parts = []
        for _ in range(rng.randrange(0, 30)):
            if rng.random() < 0.4:
                parts.append(rng.choice(names))
            else:
                parts.append(rng.choice(fillers))
        text = "".join(parts)
        want = host.find_all_specials(text, set(specials))
        data = text.encode("utf-8")
        pos, ids = native.find_specials(data)
        # convert python char positions/tokens to byte (pos, id) pairs
        want_b = []
        cum = np.cumsum([0] + [len(c.encode("utf-8")) for c in text])
        for p, tok in want:
            want_b.append((int(cum[p]), specials[tok]))
        got = list(zip(pos.tolist(), ids.tolist()))
        assert got == want_b, (trial, text[:80])


def test_full_allowed_encode_matches_tiktoken(enc_pair):
    ours, oracle, specials = enc_pair
    names = list(specials)
    rng = random.Random(7)
    for trial in range(60):
        parts = []
        for _ in range(rng.randrange(0, 20)):
            parts.append(rng.choice(names) if rng.random() < 0.5
                         else rng.choice(["text ", "émoji🙂", "<|", "|>",
                                          "\n\n", "12345 ", "don't "]))
        text = "".join(parts)
        assert ours.encode(text, allowed_special="all") == \
            oracle.encode(text, allowed_special="all"), text[:80]

    # special-dense chat-log shape (the scan's worst case)
    msg = ("<|header_start|>user<|header_end|>\n\nhello<|eot|>" * 500)
    assert ours.encode(msg, allowed_special="all") == \
        oracle.encode(msg, allowed_special="all")

    # subset allowed keeps the python scan — still identical
    subset = {"<|eot|>", "<|header_start|>"}
    t = "<|header_start|>x<|header_end|>y<|eot|>"
    assert ours.encode(t, allowed_special=subset, disallowed_special=()) \
        == oracle.encode(t, allowed_special=subset, disallowed_special=())


def test_prefix_tied_specials_deterministic(llama4_assets):
    """Adversarial special sets (1-byte tokens, strict prefix ties,
    shared prefixes): the native scan must agree with the Python scan
    exactly, and prefix ties must resolve longest-first in both (the
    documented deterministic choice — tiktoken's own pick there is
    HashMap-order-defined; no real vocab has prefix-tied specials)."""
    from tokendagger_tpu.hostengine import HostEngine
    from tokendagger_tpu.native import NativeEngine
    from tokendagger_tpu.tables import build_tables

    pattern, ranks, _ = llama4_assets
    specials = {
        "<|eot|>": 200000, "<|eot|>x": 200001, "@": 200002,
        "@@": 200003, "<|a|>": 200004, "<|ab|>": 200005, "#": 200006,
    }
    host = HostEngine(pattern, ranks, specials)
    tables = build_tables(ranks, specials)
    native = NativeEngine(tables.pair.rows, tables.pair.mask,
                          tables.byte_rank, profile="llama4", ranks=ranks)
    assert native.set_specials(specials)

    texts = [
        "<|eot|>x", "x<|eot|>xy", "@@@", "@@", "@", "a@b@@c", "#@#",
        "<|a|><|ab|>", "<|ab|><|a|>", "pre<|eot|>", "<|eot|>",
        "@<|eot|>x@@", "#", "", "@#@@#<|eot|>x#",
    ]
    for t in texts:
        want = host.find_all_specials(t, set(specials))
        pos, ids = native.find_specials(t.encode())
        want_b = [(p, specials[tok]) for p, tok in want]  # ASCII: byte==char
        assert list(zip(pos.tolist(), ids.tolist())) == want_b, t
    # the documented longest-first tie resolution, explicitly
    assert host.find_all_specials("<|eot|>x", set(specials)) == \
        [(0, "<|eot|>x")]
    assert host.find_all_specials("@@", set(specials)) == [(0, "@@")]
