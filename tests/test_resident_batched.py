"""Batched device-resident pipeline (resident.py batch>1).

The batched mode vmaps every stage over a leading window axis so one
dispatch covers `batch` windows (amortizing the remote runtime's flat
per-dispatch cost). It must produce ids bit-identical to the host oracle
for every window in the batch, exactly like the single-window mode.
Runs on the CPU backend (conftest pins jax to cpu); jit compiles make it
slow-marked.
"""

import pathlib

import pytest

pytestmark = pytest.mark.slow


def test_batched_matches_host(llama4_assets):
    from tokendagger_tpu.resident import run_resident

    pattern, ranks, specials = llama4_assets
    lor = pathlib.Path("/root/reference/tests/input/lorem.txt")
    if not lor.exists():
        pytest.skip("lorem corpus unavailable")
    corpus = (lor.read_bytes() * 10)[: 1 << 19]
    res = run_resident(ranks, specials, pattern, corpus,
                       window=1 << 16, n_windows=3, reps=1, batch=3)
    assert res.match_host          # checks all 3 windows in the batch
    assert res.batch == 3
    assert res.total_tokens > 0

    res1 = run_resident(ranks, specials, pattern, corpus,
                        window=1 << 16, n_windows=1, reps=1, batch=1)
    assert res1.match_host
    # batch of 3 distinct windows tokenizes ~3x window 0's stream
    assert res.total_tokens != res1.total_tokens


def test_batched_fused_ascii_matches_host(llama4_assets):
    """The flagship ASCII config (bits-pallas starts + butterfly compact):
    the decode stage is fused into the starts jit (resident.py fuse_dec),
    so the pipeline runs starts -> compact -> probe -> finalize with no
    codepoint round-trip. Must stay bit-exact."""
    from tokendagger_tpu.resident import run_resident

    pattern, ranks, specials = llama4_assets
    lor = pathlib.Path("/root/reference/tests/input/lorem.txt")
    if not lor.exists():
        pytest.skip("lorem corpus unavailable")
    corpus = (lor.read_bytes() * 10)[: 1 << 19]
    res = run_resident(ranks, specials, pattern, corpus,
                       window=1 << 16, n_windows=2, reps=1, batch=2,
                       starts_impl="bits-pallas", compact_impl="butterfly",
                       probe_impl="chunks", overlap_trial=False)
    assert res.impl == "ascii-sort"
    assert res.match_host
    assert res.total_tokens > 0


def test_batched_general_nonascii_matches_host(llama4_assets):
    """The general (non-ASCII) batch path: butterfly UTF-8 decode ->
    bit-plane starts (class gathers) -> inverse-butterfly char->byte
    expansion -> butterfly compaction -> chunked probe. Bit-exact on the
    reference emoji corpus (ZWJ sequences, flags, skin tones), with
    host-routed char capacity."""
    from tokendagger_tpu.resident import run_resident

    pattern, ranks, specials = llama4_assets
    emo = pathlib.Path("/root/reference/tests/input/emoji.txt")
    if not emo.exists():
        pytest.skip("emoji corpus unavailable")
    corpus = emo.read_bytes()[: 1 << 17]
    res = run_resident(ranks, specials, pattern, corpus,
                       window=1 << 15, n_windows=2, reps=1, batch=2,
                       starts_impl="bits-pallas", compact_impl="butterfly",
                       probe_impl="chunks", overlap_trial=False)
    assert res.impl == "general"
    assert res.match_host
    assert res.total_tokens > 0

    # mixed ascii+emoji windows also route through the general path
    lor = pathlib.Path("/root/reference/tests/input/lorem.txt")
    if lor.exists():
        corpus2 = lor.read_bytes()[: 1 << 15] + emo.read_bytes()[: 1 << 16]
        res2 = run_resident(ranks, specials, pattern, corpus2,
                            window=1 << 15, n_windows=2, reps=1, batch=2,
                            starts_impl="bits-pallas",
                            compact_impl="butterfly",
                            probe_impl="chunks", overlap_trial=False)
        assert res2.impl == "general"
        assert res2.match_host


def test_auto_cap_resolution(llama4_assets):
    """cap_bytes_per_piece=0 (auto) sizes the piece capacity TIGHT from
    the exact host piece count (lane-aligned, 2% headroom) and stays
    bit-exact — no overflow fallback may trigger."""
    from tokendagger_tpu.hostengine import HostEngine
    from tokendagger_tpu.resident import run_resident

    pattern, ranks, specials = llama4_assets
    lor = pathlib.Path("/root/reference/tests/input/lorem.txt")
    if not lor.exists():
        pytest.skip("lorem corpus unavailable")
    corpus = (lor.read_bytes() * 10)[: 1 << 18]
    res = run_resident(ranks, specials, pattern, corpus,
                       window=1 << 16, n_windows=2, reps=1, batch=2,
                       cap_bytes_per_piece=0, overlap_trial=False)
    assert res.match_host
    # reported cap is the tight slot count expressed as bytes/piece:
    # it must cover the densest window (with headroom) and not be the
    # worst-case default
    h = HostEngine(pattern, ranks, specials)
    win0 = corpus[: 1 << 16].decode("utf-8", errors="ignore")
    n_pieces = len(h.split_spans(win0))
    p_cap = (1 << 16) / res.cap_bpp
    assert p_cap >= n_pieces
    # tightness: within ~2 lanes + 2% of the exact count
    assert p_cap <= n_pieces * 1.02 + 8 + 256


@pytest.mark.parametrize("profile", ["cl100k", "gpt2"])
def test_batched_cl100k_gpt2_flagship(llama4_assets, profile):
    """cl100k and gpt2 ride the SAME flagship pipeline (bits-pallas
    starts + butterfly compaction + chunked probe) as the o200k family
    — VERDICT r4 item 3. Vocab: merge-closed Llama-4 rank prefix at the
    true sizes (tests/test_profiles_fullvocab.py convention); pattern:
    the real cl100k_base / gpt2 pat_str."""
    from tokendagger_tpu import vocab as V
    from tokendagger_tpu.resident import run_resident

    _, full_ranks, _ = llama4_assets
    if profile == "cl100k":
        n, pattern, specials = 100_256, V.CL100K_PATTERN, {"<|endoftext|>": 100257}
    else:
        n, pattern, specials = 50_256, V.GPT2_PATTERN, {"<|endoftext|>": 50256}
    ranks = {tb: r for tb, r in full_ranks.items() if r < n}

    lor = pathlib.Path("/root/reference/tests/input/lorem.txt")
    if not lor.exists():
        pytest.skip("lorem corpus unavailable")
    corpus = (lor.read_bytes() * 10)[: 1 << 18]
    res = run_resident(ranks, specials, pattern, corpus,
                       window=1 << 16, n_windows=2, reps=1, batch=2,
                       starts_impl="bits-pallas", compact_impl="butterfly",
                       probe_impl="chunks", cap_bytes_per_piece=0,
                       profile=profile, overlap_trial=False)
    assert res.impl == "ascii-sort"
    assert res.match_host
    assert res.overflow_windows == 0
    assert res.total_tokens > 0

    # the general (non-ASCII) path with the same profiles
    emo = pathlib.Path("/root/reference/tests/input/emoji.txt")
    if emo.exists():
        corpus2 = lor.read_bytes()[: 1 << 15] + emo.read_bytes()[: 1 << 16]
        res2 = run_resident(ranks, specials, pattern, corpus2,
                            window=1 << 15, n_windows=2, reps=1, batch=2,
                            starts_impl="bits-pallas",
                            compact_impl="butterfly",
                            probe_impl="chunks", cap_bytes_per_piece=0,
                            profile=profile, overlap_trial=False)
        assert res2.impl == "general"
        assert res2.match_host


def test_hot_probe_auto_cap(llama4_assets):
    """Auto-cap + chunks probe engages the hot-piece probe routing
    (ops/join.vocab_probe_hot): top staged pieces answered by compares,
    the rest via a compacted gather — bit-exact, no overflow."""
    from tokendagger_tpu.resident import run_resident

    pattern, ranks, specials = llama4_assets
    lor = pathlib.Path("/root/reference/tests/input/lorem.txt")
    if not lor.exists():
        pytest.skip("lorem corpus unavailable")
    corpus = (lor.read_bytes() * 10)[: 1 << 18]
    res = run_resident(ranks, specials, pattern, corpus,
                       window=1 << 16, n_windows=2, reps=1, batch=2,
                       starts_impl="bits-pallas", compact_impl="butterfly",
                       probe_impl="chunks", cap_bytes_per_piece=0,
                       overlap_trial=False)
    assert res.probe_impl == "hot"
    assert res.probe_hot is not None and res.probe_hot["coverage"] > 0.3
    assert res.match_host
    assert res.overflow_windows == 0
