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
