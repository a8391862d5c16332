"""Property fuzz: random BPE vocabs x random texts — every engine must
agree with the host oracle (and the oracle with tiktoken where available)."""

import random

import pytest

from tokendagger_tpu.hostengine import HostEngine
from tokendagger_tpu.tables import build_tables
from tokendagger_tpu.vocab import LLAMA4_PATTERN

from fuzz_scanner import random_text


def random_bpe_vocab(rng: random.Random, n_merges: int) -> dict[bytes, int]:
    """A random but VALID merge-built vocab: children always precede the
    merged token, so every token is merge-reachable."""
    ranks: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    tokens = list(ranks)
    nxt = 256
    for _ in range(n_merges):
        a, b = rng.choice(tokens), rng.choice(tokens)
        tb = a + b
        if tb in ranks or len(tb) > 32:
            continue
        ranks[tb] = nxt
        tokens.append(tb)
        nxt += 1
    return ranks


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_native_random_vocabs(seed):
    from tokendagger_tpu.native import NativeEngine, get_lib

    if get_lib() is None:
        pytest.skip("no toolchain")
    rng = random.Random(seed)
    ranks = random_bpe_vocab(rng, 400)
    tables = build_tables(ranks, {}, use_cache=False)
    assert tables.all_reachable
    host = HostEngine(LLAMA4_PATTERN, ranks, {})
    ne = NativeEngine(
        tables.pair.rows, tables.pair.mask, tables.byte_rank,
        profile="llama4", ranks=ranks,
    )
    for _ in range(40):
        t = random_text(rng)
        assert ne.encode(t.encode()).tolist() == host.encode_ordinary(t), repr(t[:60])


@pytest.mark.parametrize("seed", [3, 11])
def test_device_random_vocabs(seed):
    from tokendagger_tpu.engine import DeviceEngine

    rng = random.Random(seed)
    ranks = random_bpe_vocab(rng, 300)
    host = HostEngine(LLAMA4_PATTERN, ranks, {})
    dev = DeviceEngine(LLAMA4_PATTERN, ranks, {})
    texts = [random_text(rng) for _ in range(12)]
    got = dev.encode_ordinary_batch(texts)
    for t, g in zip(texts, got):
        assert g == host.encode_ordinary(t), repr(t[:60])


def test_window_growth_on_cpu(tiny_vocab):
    """A single class run larger than the CPU scan window must grow the
    window (fixed-shape ladder) and still produce exact ids."""
    from tokendagger_tpu.engine import DeviceEngine

    ranks, specials = tiny_vocab
    dev = DeviceEngine(LLAMA4_PATTERN, ranks, specials)
    host = HostEngine(LLAMA4_PATTERN, ranks, specials)
    # 100 KB of '=' then text: the punct run spans the 64 KB CPU window
    text = "=" * 100_000 + " trailing words here"
    ids = dev.encode_stream(text.encode())
    assert ids.tolist() == host.encode_ordinary(text)
