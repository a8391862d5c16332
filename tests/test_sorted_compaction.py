"""Differential tests for the sort-based compaction variants.

The sorted implementations (utf8_decode_sorted / utf8_decode_ascii /
compact_piece_keys_sorted / finalize_host_sorted) must be bit-identical
to the scatter-based originals on every input — they are pure
re-formulations chosen for TPU performance (tools/probe_prims.py).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tokendagger_tpu.ops import pretokenize as PT
from tokendagger_tpu.ops.fused import caps_for, finalize_host, finalize_host_sorted
from tokendagger_tpu.ops.join import compact_piece_keys, compact_piece_keys_sorted
from tokendagger_tpu.unicode_tables import get_two_level_tables

N = 1 << 12


def _windows():
    rng = np.random.default_rng(7)
    lorem = (b"Lorem ipsum dolor sit amet, consectetur 123 adipiscing elit. "
             b"Sed do eiusmod tempor!\n\n  incididunt ut labore.") * 40
    emoji = ("hello \U0001f600\U0001f3fd world éè€ "
             "你好\n tail").encode("utf-8") * 60
    rand_ascii = bytes(rng.integers(1, 127, 3000, dtype=np.uint8))
    mixed = bytes(np.frombuffer(
        ("a bé c" * 300).encode("utf-8"), dtype=np.uint8))
    return {
        "lorem": lorem[: N - 7],
        "emoji": emoji[:N],
        "rand_ascii": rand_ascii,
        "mixed": mixed[: N - 3],
        "empty": b"",
        "one": b"x",
    }


def _pad(b: bytes):
    buf = np.zeros(N, dtype=np.uint8)
    buf[: len(b)] = np.frombuffer(b, dtype=np.uint8)
    return jnp.asarray(buf), jnp.int32(len(b))


def _trim_to_char(b: bytes) -> bytes:
    while b and (b[-1] & 0xC0) == 0x80:
        b = b[:-1]
    return b


@pytest.mark.parametrize("name", list(_windows().keys()))
def test_decode_sorted_matches_scatter(name):
    raw = _trim_to_char(_windows()[name])
    dev, nb = _pad(raw)
    ref = PT.utf8_decode(dev, nb)
    got = PT.utf8_decode_sorted(dev, nb)
    for r, g, label in zip(ref, got, ("cp", "cob", "boc", "m")):
        assert np.array_equal(np.asarray(r), np.asarray(g)), (name, label)


@pytest.mark.parametrize("name", ["lorem", "rand_ascii", "empty", "one"])
def test_decode_ascii_matches_general(name):
    raw = _windows()[name]
    assert max(raw, default=0) < 0x80
    dev, nb = _pad(raw)
    ref = PT.utf8_decode(dev, nb)
    got = PT.utf8_decode_ascii(dev, nb)
    for r, g, label in zip(ref, got, ("cp", "cob", "boc", "m")):
        assert np.array_equal(np.asarray(r), np.asarray(g)), (name, label)


@pytest.mark.parametrize("name", list(_windows().keys()))
def test_compact_sorted_matches_scatter(name):
    raw = _trim_to_char(_windows()[name])
    dev, nb = _pad(raw)
    cp, cob, boc, m = PT.utf8_decode(dev, nb)
    page_ids, pages = map(jnp.asarray, get_two_level_tables())
    starts = PT.compute_starts(cp, m, page_ids, pages,
                               contractions=True, profile="llama4")
    p_cap = caps_for(N)["p_cap"]
    ref = compact_piece_keys(starts, boc, dev, nb, p_cap)
    stb = PT.starts_to_bytes(starts, cob, dev, nb)
    got = compact_piece_keys_sorted(stb, dev, nb, p_cap)
    n_pieces = int(ref[6])
    assert n_pieces == int(got[6]), name
    if n_pieces > p_cap:
        return  # overflow: caller discards the window (slots are garbage)
    labels = ("start_b", "piece_len", "k0", "k1", "k2", "k3", "n_pieces")
    for r, g, label in zip(ref, got, labels):
        assert np.array_equal(np.asarray(r), np.asarray(g)), (name, label)


def test_finalize_sorted_matches_scatter():
    rng = np.random.default_rng(3)
    p_cap = 512
    n_pieces = 301
    start_b = np.sort(rng.choice(4096, size=p_cap, replace=False)).astype(
        np.int32)
    lens = rng.integers(1, 12, p_cap).astype(np.int32)
    start_b[n_pieces:] = 4096
    lens[n_pieces:] = 0
    rank = np.where(rng.random(p_cap) < 0.9,
                    rng.integers(0, 20000, p_cap), -1).astype(np.int32)
    for trim in (4096, int(start_b[n_pieces // 2]) + 3):
        args = (jnp.asarray(start_b), jnp.asarray(lens), jnp.asarray(rank),
                jnp.int32(n_pieces), jnp.int32(trim))
        ref = finalize_host(*args, p_cap=p_cap)
        got = finalize_host_sorted(*args, p_cap=p_cap)
        labels = ("flat", "total", "n_pieces", "n_kept", "consumed",
                  "overflow", "ms_start", "ms_len", "n_ms")
        for r, g, label in zip(ref, got, labels):
            assert np.array_equal(np.asarray(r), np.asarray(g)), (trim, label)


def test_resident_pipeline_impls_match_oracle():
    """End-to-end: run_resident with each impl on tiny windows (CPU) must
    be bit-identical to the host oracle (match_host=True)."""
    from tests.conftest import make_tiny_vocab

    from tokendagger_tpu.resident import run_resident
    from tokendagger_tpu.vocab import LLAMA4_PATTERN

    ranks, specials = make_tiny_vocab()
    corpus = (b"The quick brown fox! jumps over 42 lazy dogs.  \n"
              b"Hello world's end; they'll don't CamelCase URLs "
              b"http://x.y/z?a=1 tail  ") * 80
    for impl in ("scatter", "sort", "ascii-sort"):
        res = run_resident(
            dict(ranks), dict(specials), LLAMA4_PATTERN, corpus,
            window=1 << 12, n_windows=2, reps=2, batch=2, impl=impl,
        )
        assert res.match_host, impl
        assert res.impl == impl
