"""cl100k (GPT-4 pattern) profile: all three engines vs the host oracle."""

import random

import pytest

from tokendagger_tpu.hostengine import HostEngine
from tokendagger_tpu.tables import build_tables
from tokendagger_tpu.vocab import CL100K_PATTERN, classify_pattern

from fuzz_scanner import EDGE_TEXTS, random_text

CL_CASES = EDGE_TEXTS + [
    "'s 'S 'll 'LL 've 'd 'M", "can't we'll", "'x 'ſ", "x'", "''",
    " !punct\r\n", "a1b2", "   \r x",
]


def test_classify():
    assert classify_pattern(CL100K_PATTERN) == "cl100k"


@pytest.fixture(scope="module")
def engines(tiny_vocab):
    ranks, specials = tiny_vocab
    host = HostEngine(CL100K_PATTERN, ranks, specials)
    tables = build_tables(ranks, specials)
    return ranks, specials, host, tables


def test_native_cl100k(engines):
    from tokendagger_tpu.native import NativeEngine, get_lib

    ranks, specials, host, tables = engines
    if get_lib() is None:
        pytest.skip("no toolchain")
    ne = NativeEngine(
        tables.pair.rows, tables.pair.mask, tables.byte_rank,
        profile="cl100k", ranks=ranks,
    )
    for t in CL_CASES:
        assert ne.encode(t.encode()).tolist() == host.encode_ordinary(t), repr(t[:50])
    rng = random.Random(13)
    for _ in range(60):
        t = random_text(rng)
        assert ne.encode(t.encode()).tolist() == host.encode_ordinary(t), repr(t[:60])


def test_device_cl100k(engines):
    from tokendagger_tpu.engine import DeviceEngine

    ranks, specials, host, tables = engines
    dev = DeviceEngine(CL100K_PATTERN, ranks, specials)
    assert dev.stream
    for t in CL_CASES:
        assert dev.encode_ordinary_batch([t])[0] == host.encode_ordinary(t), repr(t[:50])


def test_wrapper_cl100k(engines):
    from tokendagger_tpu import Tokenizer

    ranks, specials, host, _ = engines
    tok = Tokenizer("cl", pattern=CL100K_PATTERN, mergeable_ranks=ranks,
                    special_tokens=specials, backend="host")
    for t in CL_CASES:
        assert tok.encode_ordinary(t) == host.encode_ordinary(t), repr(t[:50])
