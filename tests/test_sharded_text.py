"""Byte-stream sharding with halo reconciliation: exactness on the
virtual 8-device mesh, including pieces and UTF-8 chars straddling shard
boundaries, and guard-triggered fallbacks."""

import numpy as np
import pytest

import jax

from tokendagger_tpu.engine import DeviceEngine
from tokendagger_tpu.hostengine import HostEngine
from tokendagger_tpu.parallel.mesh import get_mesh
from tokendagger_tpu.parallel.sharded_text import ShardedTextEncoder
from tokendagger_tpu.vocab import LLAMA4_PATTERN


@pytest.fixture(scope="module")
def setup(tiny_vocab):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    ranks, specials = tiny_vocab
    eng = DeviceEngine(LLAMA4_PATTERN, ranks, specials)
    host = HostEngine(LLAMA4_PATTERN, ranks, specials)
    mesh = get_mesh(8)
    st = ShardedTextEncoder(eng, mesh, shard_bytes=2048, halo=512)
    return st, host


def _check(st, host, text):
    got = st.encode(text.encode())
    want = host.encode_ordinary(text)
    assert got.tolist() == want, (got[:20].tolist(), want[:20])


class TestShardedText:
    def test_english(self, setup):
        st, host = setup
        import sys
        sys.path.insert(0, ".")
        from bench import make_corpus

        for seed in (5, 9, 13):
            _check(st, host, make_corpus(14000, seed=seed))

    def test_word_straddles_boundary(self, setup):
        st, host = setup
        # long words positioned so pieces cross the 2048-byte shard edges
        text = ("w" * 100 + " ").join(str(i) for i in range(400))
        _check(st, host, text)

    def test_multibyte_straddles_boundary(self, setup):
        st, host = setup
        # 3-byte chars everywhere: shard edges land mid-character
        text = "日本語のテキストです。" * 800
        _check(st, host, text)

    def test_short_input(self, setup):
        st, host = setup
        _check(st, host, "hello world")
        assert st.encode(b"").tolist() == []

    def test_overflow_falls_back(self, setup):
        st, host = setup
        # a run longer than MERGE_WIDTH trips the guard -> host fallback,
        # still exact
        text = "start " + "=" * 500 + " end " + "hello " * 2000
        _check(st, host, text)

    def test_multi_pass(self, setup):
        st, host = setup
        text = "the and is " * 3000  # > 8 * 2048 bytes: several mesh passes
        _check(st, host, text)

    def test_multi_pass_large(self, setup):
        import sys
        sys.path.insert(0, ".")
        from bench import make_corpus

        st, host = setup
        _check(st, host, make_corpus(100_000, seed=4))

    def test_multi_pass_cjk(self, setup):
        st, host = setup
        _check(st, host, "日本語のテキストです。" * 4000)

    def test_oversize_piece_spliced_not_fallback(self, setup):
        st, host = setup
        st.passes = st.fallbacks = 0
        # runs longer than MERGE_WIDTH are host-spliced, not a mesh abort
        text = ("hello " * 300 + "=" * 500 + " mid " + "#" * 200 + " "
                + "world " * 1500)
        _check(st, host, text)
        assert st.fallbacks == 0, "oversize pieces must not abandon the pass"

    def test_halo_run_extent_guard(self, tiny_vocab):
        # Regression (ADVICE r1): a \s*[\r\n]+ piece ending inside the halo
        # while its whitespace run continues past the halo end must not be
        # finalized with a truncated match; ws merges expose the corruption.
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        ranks = {bytes([i]): i for i in range(256)}
        ranks[b"\n "] = 256
        ranks[b"  "] = 257
        ranks[b" \n"] = 258
        eng = DeviceEngine(LLAMA4_PATTERN, ranks, {})
        host = HostEngine(LLAMA4_PATTERN, ranks, {})
        mesh = get_mesh(8)
        st = ShardedTextEncoder(eng, mesh, shard_bytes=2048, halo=512)
        # run starts before W=2048, spans the whole halo, newline beyond it
        for gap in (300, 600, 900):
            text = "a" * 2000 + "\n" + " " * gap + "\n" + "b" * 4000
            _check(st, host, text)

    def test_fallback_rate_real_corpora(self, llama4_assets, corpus_lorem):
        # VERDICT r1 item 4: the mesh path must survive real corpora
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from pathlib import Path

        pattern, ranks, specials = llama4_assets
        eng = DeviceEngine(pattern, ranks, specials)
        host = HostEngine(pattern, ranks, specials)
        mesh = get_mesh(8)
        st = ShardedTextEncoder(eng, mesh, shard_bytes=4096, halo=1024)
        repo = Path(__file__).resolve().parent.parent / "tokendagger_tpu"
        code = "\n".join(
            p.read_text() for p in sorted(repo.rglob("*.py"))
        )[:120_000]
        for text in (corpus_lorem, code):
            _check(st, host, text)
        assert st.passes > 0
        rate = st.fallbacks / st.passes
        assert rate < 0.05, f"mesh fallback rate {rate:.1%} (passes={st.passes})"
