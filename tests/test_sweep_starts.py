"""Differential tests for the Pallas sweep piece-start derivation.

Chain of custody: piece_starts_jax is the fuzz-verified device reference
(itself locked to scanner_ref / the regex oracle); piece_starts_jnp_passes
is the pass decomposition on full arrays; piece_starts_sweep is the same
pass bodies on Pallas tiles (interpret mode here; real-TPU runs in
tests/test_tpu_hardware.py)."""

import random
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent))
from fuzz_scanner import EDGE_TEXTS, random_text  # noqa: E402

from tokendagger_tpu.ops import pretokenize as PT  # noqa: E402
from tokendagger_tpu.ops import sweep_starts as SS  # noqa: E402
from tokendagger_tpu.unicode_tables import get_two_level_tables  # noqa: E402


@pytest.fixture(scope="module")
def tables():
    page_ids, pages = map(jnp.asarray, get_two_level_tables())
    return page_ids, pages


def _pad(text, N):
    cps = np.array([ord(c) for c in text], dtype=np.int32)
    assert len(cps) <= N
    row = np.zeros(N, np.int32)
    row[: len(cps)] = cps
    return jnp.asarray(row), jnp.int32(len(cps))


def _ref(cp, m, tables, profile):
    page_ids, pages = tables
    return np.asarray(
        PT.piece_starts_jax(cp, m, page_ids, pages, profile=profile)
    )


@pytest.mark.parametrize("profile", ["llama4", "nocontract"])
def test_jnp_twin_edge_texts(tables, profile):
    page_ids, pages = tables
    for text in EDGE_TEXTS:
        cp, m = _pad(text, 256)
        want = _ref(cp, m, tables, profile)
        got = np.asarray(
            SS.piece_starts_jnp_passes(
                cp, m, page_ids, pages, profile=profile
            )
        )
        assert np.array_equal(want, got), repr(text)


@pytest.mark.parametrize("profile", ["llama4", "nocontract"])
def test_jnp_twin_fuzz(tables, profile):
    page_ids, pages = tables
    rng = random.Random(20250817)
    ref = jax.jit(
        lambda cp, m: PT.piece_starts_jax(
            cp, m, page_ids, pages, profile=profile
        )
    )
    twin = jax.jit(
        lambda cp, m: SS.piece_starts_jnp_passes(
            cp, m, page_ids, pages, profile=profile
        )
    )
    for _ in range(150):
        text = random_text(rng)
        if len(text) > 512:
            continue
        cp, m = _pad(text, 512)
        assert np.array_equal(
            np.asarray(ref(cp, m)), np.asarray(twin(cp, m))
        ), repr(text)


@pytest.mark.parametrize("profile", ["llama4", "nocontract"])
def test_pallas_interpret_single(tables, profile):
    page_ids, pages = tables
    text = (
        "it's can't   WON'T I'll we're 123,456  hello World!! "
        "a/b//c   \n\n  x café ÇÖĞ "
    ) * 25
    cp, m = _pad(text, 4096)
    want = _ref(cp, m, tables, profile)
    got = np.asarray(
        SS.piece_starts_sweep(
            cp, m, page_ids, pages, profile=profile, R=8, interpret=True
        )
    )
    assert np.array_equal(want, got)


def test_pallas_interpret_batched(tables):
    page_ids, pages = tables
    rng = random.Random(3)
    texts = [
        "hello  World " * 50,
        "it's ''' a//b \n\n " * 40,
        "",
        random_text(rng) * 5,
    ]
    N = 2048
    rows, ms = [], []
    for t in texts:
        cps = np.array([ord(c) for c in t], dtype=np.int32)[:N]
        row = np.zeros(N, np.int32)
        row[: len(cps)] = cps
        rows.append(row)
        ms.append(len(cps))
    cp = jnp.asarray(np.stack(rows))
    m = jnp.asarray(np.array(ms, np.int32))
    want = np.stack(
        [_ref(cp[i], m[i], tables, "llama4") for i in range(len(texts))]
    )
    got = np.asarray(
        SS.piece_starts_sweep(
            cp, m, page_ids, pages, profile="llama4", R=4, interpret=True
        )
    )
    assert np.array_equal(want, got)


@pytest.mark.slow
def test_pallas_interpret_fuzz(tables):
    page_ids, pages = tables
    rng = random.Random(99)
    sweep = jax.jit(
        lambda cp, m: SS.piece_starts_sweep(
            cp, m, page_ids, pages, profile="llama4", R=2, interpret=True
        )
    )
    ref = jax.jit(
        lambda cp, m: PT.piece_starts_jax(
            cp, m, page_ids, pages, profile="llama4"
        )
    )
    for _ in range(40):
        text = random_text(rng)
        if len(text) > 512:
            continue
        cp, m = _pad(text, 512)
        assert np.array_equal(
            np.asarray(ref(cp, m)), np.asarray(sweep(cp, m))
        ), repr(text)
