"""gpt2/r50k/p50k profile across all three engines vs the host oracle."""

import random

import pytest

from tokendagger_tpu.hostengine import HostEngine
from tokendagger_tpu.tables import build_tables
from tokendagger_tpu.vocab import GPT2_PATTERN, classify_pattern

from fuzz_scanner import EDGE_TEXTS, random_text

G2_CASES = EDGE_TEXTS + [
    "'s 'S 'll 'LL 've 'd",   # case-sensitive: only lowercase match G1
    "can't we'll it's", "'x", "' s", " 'll", "a'd B'D",
    "12345678901234567890", " 42000000", "word  word",
]


def test_classify():
    assert classify_pattern(GPT2_PATTERN) == "gpt2"


@pytest.fixture(scope="module")
def engines(tiny_vocab):
    ranks, specials = tiny_vocab
    host = HostEngine(GPT2_PATTERN, ranks, specials)
    tables = build_tables(ranks, specials)
    return ranks, specials, host, tables


def test_native_gpt2(engines):
    from tokendagger_tpu.native import NativeEngine, get_lib

    ranks, specials, host, tables = engines
    if get_lib() is None:
        pytest.skip("no toolchain")
    ne = NativeEngine(
        tables.pair.rows, tables.pair.mask, tables.byte_rank,
        profile="gpt2", ranks=ranks,
    )
    for t in G2_CASES:
        assert ne.encode(t.encode()).tolist() == host.encode_ordinary(t), repr(t[:50])
    rng = random.Random(31)
    for _ in range(80):
        t = random_text(rng)
        assert ne.encode(t.encode()).tolist() == host.encode_ordinary(t), repr(t[:60])


def test_device_gpt2(engines):
    from tokendagger_tpu.engine import DeviceEngine

    ranks, specials, host, tables = engines
    dev = DeviceEngine(GPT2_PATTERN, ranks, specials)
    assert dev.stream
    for t in G2_CASES:
        assert dev.encode_ordinary_batch([t])[0] == host.encode_ordinary(t), repr(t[:50])


def test_wrapper_gpt2(engines):
    from tokendagger_tpu import Tokenizer

    ranks, specials, host, _ = engines
    tok = Tokenizer("g2", pattern=GPT2_PATTERN, mergeable_ranks=ranks,
                    special_tokens=specials, backend="host")
    for t in G2_CASES:
        assert tok.encode_ordinary(t) == host.encode_ordinary(t), repr(t[:50])
