"""Batched multi-segment device path (ops/batched.py): many short texts
resolved per dispatch must be bit-identical to the host oracle, including
vocab misses (host-spliced), empties, and rows at bucket width edges."""

import random

import numpy as np
import pytest

from tokendagger_tpu import LLAMA4_PATTERN
from tokendagger_tpu.engine import DeviceEngine
from tokendagger_tpu.hostengine import HostEngine
from tokendagger_tpu.ops.batched import ROW_WIDTHS


@pytest.fixture(scope="module")
def engines(llama4_assets):
    pattern, ranks, specials = llama4_assets
    dev = DeviceEngine(pattern, ranks, specials)
    host = HostEngine(pattern, ranks, specials)
    return dev, host


def _check(dev, host, texts):
    segs = [t.encode("utf-8") for t in texts]
    got = dev.encode_streams(segs)
    for t, ids in zip(texts, got):
        assert ids.tolist() == host.encode_ordinary(t), repr(t[:60])


class TestBatchedSegments:
    def test_mixed_corpus_segments(self, engines, corpus_lorem, corpus_emoji):
        dev, host = engines
        lorem, emoji = corpus_lorem, corpus_emoji
        rng = random.Random(11)
        texts = []
        for _ in range(120):
            src = lorem if rng.random() < 0.7 else emoji
            n = rng.randint(0, 700)
            p = rng.randint(0, max(0, len(src) - n - 4))
            texts.append(src[p : p + n])
        _check(dev, host, texts)

    def test_width_edges_and_misses(self, engines):
        dev, host = engines
        texts = [
            "", " ", "don't", "can't won't it's",
            "züx qwzyx blorptastic frobnicate",   # vocab misses
            "x" * ROW_WIDTHS[0], "x" * (ROW_WIDTHS[0] + 1),
            "y" * ROW_WIDTHS[-1],                  # widest bucket, full row
            "z" * (ROW_WIDTHS[-1] + 1),            # stream path
            "🙂" * 60, "é" * 200, "\n\n  \t " * 40,
            "word " * 30 + "  trailing   ",
            "12345 6789 " * 25,
        ] * 2  # >= 4 small segments guaranteed
        _check(dev, host, texts)

    def test_batch_of_one_thousand(self, engines):
        dev, host = engines
        rng = random.Random(5)
        words = "the quick brown fox don't 42 naïve    café!".split()
        texts = [
            " ".join(rng.choice(words) for _ in range(rng.randint(0, 30)))
            for _ in range(1000)
        ]
        segs = [t.encode("utf-8") for t in texts]
        got = dev.encode_streams(segs)
        # spot-check a sample exactly; full-batch lengths must be plausible
        for i in range(0, 1000, 37):
            assert got[i].tolist() == host.encode_ordinary(texts[i])
        assert sum(len(g) for g in got) == sum(
            len(host.encode_ordinary(t)) for t in texts
        )

    def test_cl100k_profile_grid(self, llama4_assets):
        from tokendagger_tpu import vocab

        _, full_ranks, _ = llama4_assets
        pattern = vocab.CL100K_PATTERN
        ranks = {tb: r for tb, r in full_ranks.items() if r < 100_256}
        dev = DeviceEngine(pattern, ranks, {})
        host = HostEngine(pattern, ranks, {})
        rng = random.Random(3)
        words = "hello WORLD 123 456789 don't    mixedCase!? \n\n".split(" ")
        texts = [
            " ".join(rng.choice(words) for _ in range(rng.randint(1, 25)))
            for _ in range(40)
        ]
        _check(dev, host, texts)
