"""Native C++ host engine: exactness vs the Python host oracle."""

import numpy as np
import pytest

from tokendagger_tpu.hostengine import HostEngine
from tokendagger_tpu.tables import build_tables
from tokendagger_tpu.vocab import LLAMA4_PATTERN, TEKKEN_PATTERN

from fuzz_scanner import EDGE_TEXTS, random_text


def test_native_builds_when_toolchain_present():
    """A broken tdnative.cpp must FAIL the suite, not silently skip (the
    graceful fallback would otherwise hide compile errors)."""
    import shutil

    from tokendagger_tpu.native import get_lib, get_pymod

    if shutil.which("g++") is None:
        pytest.skip("no g++")
    assert get_lib() is not None, "native library failed to build"
    assert get_pymod() is not None, "CPython extension failed to build"


def _make_native(ranks, specials, contractions=True):
    from tokendagger_tpu.native import NativeEngine, get_lib

    if get_lib() is None:
        pytest.skip("no C++ toolchain")
    tables = build_tables(ranks, specials)
    return NativeEngine(
        tables.pair.rows,
        tables.pair.mask,
        tables.byte_rank,
        contractions=contractions,
        ranks=ranks,
    )


@pytest.fixture(scope="module")
def tiny_native(tiny_vocab):
    ranks, specials = tiny_vocab
    return _make_native(ranks, specials), HostEngine(LLAMA4_PATTERN, ranks, specials)


class TestNativeEncode:
    def test_edge_texts(self, tiny_native):
        ne, host = tiny_native
        for t in EDGE_TEXTS:
            got = ne.encode(t.encode("utf-8"))
            assert got is not None
            assert got.tolist() == host.encode_ordinary(t), repr(t[:60])

    def test_fuzz(self, tiny_native):
        import random

        ne, host = tiny_native
        rng = random.Random(1234)
        for _ in range(100):
            t = random_text(rng)
            got = ne.encode(t.encode("utf-8"))
            assert got.tolist() == host.encode_ordinary(t), repr(t[:60])

    def test_scan_offsets(self, tiny_native):
        ne, host = tiny_native
        for t in ["hello world, it's 123!", "  x\r\n", "ǅungla 'S"]:
            st = ne.scan(t.encode("utf-8"))
            # reconstruct byte spans from host regex
            offs = np.cumsum([0] + [len(c.encode("utf-8")) for c in t])
            want = [int(offs[m.start()]) for m in host._re.finditer(t)]
            assert st[:-1].tolist() == want
            assert st[-1] == len(t.encode("utf-8"))

    def test_tekken_mode(self, tiny_vocab):
        ranks, specials = tiny_vocab
        ne = _make_native(ranks, specials, contractions=False)
        host = HostEngine(TEKKEN_PATTERN, ranks, specials)
        for t in ["it's there", "you'll 'RE x", "a'd"]:
            assert ne.encode(t.encode()).tolist() == host.encode_ordinary(t)


@pytest.mark.slow
class TestNativeLlama:
    def test_lorem_exact(self, llama4_assets, corpus_lorem):
        pattern, ranks, specials = llama4_assets
        ne = _make_native(ranks, specials)
        host = HostEngine(pattern, ranks, specials)
        got = ne.encode(corpus_lorem.encode("utf-8"))
        assert got.tolist() == host.encode_ordinary(corpus_lorem)

    def test_emoji_exact(self, llama4_assets, corpus_emoji):
        pattern, ranks, specials = llama4_assets
        ne = _make_native(ranks, specials)
        host = HostEngine(pattern, ranks, specials)
        text = corpus_emoji[:100000]
        got = ne.encode(text.encode("utf-8"))
        assert got.tolist() == host.encode_ordinary(text)


class TestWrapperIntegration:
    def test_host_backend_uses_native(self, tiny_vocab):
        from tokendagger_tpu import Tokenizer

        ranks, specials = tiny_vocab
        tok = Tokenizer(
            "tiny",
            pattern=LLAMA4_PATTERN,
            mergeable_ranks=ranks,
            special_tokens=specials,
            backend="host",
        )
        host = HostEngine(LLAMA4_PATTERN, ranks, specials)
        text = "hello world <|bos|> it's 123"
        assert tok.encode_ordinary(text) == host.encode_ordinary(text)
        got = tok.encode(text, allowed_special="all")
        want, _ = host.encode(text, set(specials))
        assert got == want
