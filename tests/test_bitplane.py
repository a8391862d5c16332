"""Tests for the bit-plane piece-start derivation (ops/bitplane.py).

Two layers: the word-algebra primitives against per-char numpy
references, and the full derivation against piece_starts_jax (the
fuzz-verified device reference, itself locked to scanner_ref and the
regex oracle)."""

import random
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent))
from fuzz_scanner import EDGE_TEXTS, random_text  # noqa: E402

from tokendagger_tpu.ops import bitplane as BP  # noqa: E402
from tokendagger_tpu.ops import pretokenize as PT  # noqa: E402
from tokendagger_tpu.unicode_tables import get_two_level_tables  # noqa: E402


@pytest.fixture(scope="module")
def tables():
    page_ids, pages = map(jnp.asarray, get_two_level_tables())
    return page_ids, pages


# ===========================================================================
# Primitives vs per-char numpy references
# ===========================================================================


def _rand_mask(rng, n):
    return np.array([rng.random() < 0.4 for _ in range(n)], dtype=bool)


def _pk(mask):
    return BP.pack_mask(jnp.asarray(mask))


def _un(w, n):
    return np.asarray(BP.unpack_mask(w))[:n]


@pytest.mark.parametrize("n", [32, 64, 96, 320, 1024])
def test_pack_roundtrip(n):
    rng = random.Random(n)
    m = _rand_mask(rng, n)
    assert np.array_equal(_un(_pk(m), n), m)


@pytest.mark.parametrize("k", [1, 2, 3, 5, 31, 32, 33, 64, 97, 10_000])
def test_shifts(k):
    rng = random.Random(k)
    n = 320
    x = _rand_mask(rng, n)
    w = _pk(x)
    want_prev = np.zeros(n, bool)
    if k < n:
        want_prev[k:] = x[: n - k]
    want_next = np.zeros(n, bool)
    if k < n:
        want_next[: n - k] = x[k:]
    assert np.array_equal(_un(BP.prevk(w, k), n), want_prev), f"prevk {k}"
    assert np.array_equal(_un(BP.nxtk(w, k), n), want_next), f"nxtk {k}"


def _seg_or_fwd_ref(x, r):
    out = np.zeros_like(x)
    s = False
    for i in range(len(x)):
        s = (s and not r[i]) or x[i]
        out[i] = s
    return out


def _seg_or_rev_ref(x, r):
    out = np.zeros_like(x)
    s = False
    for i in reversed(range(len(x))):
        out[i] = s or x[i]
        s = out[i] and (i == 0 or not r[i])
    # careful: out[i] = x[i] | (s_after & ~r[i+1]); recompute cleanly
    s = False
    for i in reversed(range(len(x))):
        nr = r[i + 1] if i + 1 < len(x) else False
        s = x[i] or (s and not nr)
        out[i] = s
    return out


@pytest.mark.parametrize("n", [32, 64, 352, 2048])
def test_seg_scans(n):
    rng = random.Random(n * 7)
    for trial in range(20):
        x = _rand_mask(rng, n)
        r = np.array([rng.random() < 0.15 for _ in range(n)], dtype=bool)
        wx, wr = _pk(x), _pk(r)
        assert np.array_equal(
            _un(BP.seg_or_fwd(wx, wr), n), _seg_or_fwd_ref(x, r)
        )
        assert np.array_equal(
            _un(BP.seg_or_rev(wx, wr), n), _seg_or_rev_ref(x, r)
        )
        assert np.array_equal(
            _un(BP.or_scan_fwd(wx), n), np.logical_or.accumulate(x)
        )
        assert np.array_equal(
            _un(BP.xor_scan_fwd(wx), n), np.logical_xor.accumulate(x)
        )


def test_ffill_bool():
    rng = random.Random(11)
    n = 352
    for _ in range(20):
        sample = _rand_mask(rng, n)
        x = _rand_mask(rng, n)
        want = np.zeros(n, bool)
        cur = False
        for i in range(n):
            if sample[i]:
                cur = x[i]
            want[i] = cur
        got = _un(BP.ffill_bool(_pk(sample), _pk(x)), n)
        assert np.array_equal(got, want)


def test_stride_marks():
    rng = random.Random(5)
    n = 512
    for _ in range(20):
        carrier = np.array(
            [rng.random() < 0.7 for _ in range(n)], dtype=bool
        )
        # seeds at carrier-run starts
        seed = carrier & ~np.concatenate([[False], carrier[:-1]])
        want = np.zeros(n, bool)
        run_start = -1
        for i in range(n):
            if carrier[i]:
                if run_start < 0:
                    run_start = i
                want[i] = (i - run_start) % 3 == 0
            else:
                run_start = -1
        got = _un(BP.stride_marks(_pk(seed), _pk(carrier), 3, n), n)
        assert np.array_equal(got, want)


# ===========================================================================
# Full derivation vs piece_starts_jax
# ===========================================================================


def _pad(text, n):
    cps = np.array([ord(c) for c in text], dtype=np.int32)
    assert len(cps) <= n
    row = np.zeros(n, np.int32)
    row[: len(cps)] = cps
    return jnp.asarray(row), jnp.int32(len(cps))


@pytest.mark.parametrize("profile", ["llama4", "nocontract", "cl100k", "gpt2"])
def test_bits_edge_texts(tables, profile):
    page_ids, pages = tables
    for text in EDGE_TEXTS:
        cp, m = _pad(text, 256)
        want = np.asarray(
            PT.piece_starts_jax(cp, m, page_ids, pages, profile=profile)
        )
        got = np.asarray(
            BP.piece_starts_bits(cp, m, page_ids, pages, profile=profile)
        )
        assert np.array_equal(want, got), repr(text)


@pytest.mark.parametrize("profile", ["llama4", "nocontract", "cl100k", "gpt2"])
def test_bits_fuzz(tables, profile):
    page_ids, pages = tables
    rng = random.Random(20260818)
    ref = jax.jit(
        lambda cp, m: PT.piece_starts_jax(
            cp, m, page_ids, pages, profile=profile
        )
    )
    bits = jax.jit(
        lambda cp, m: BP.piece_starts_bits(
            cp, m, page_ids, pages, profile=profile
        )
    )
    for _ in range(150):
        text = random_text(rng)
        if len(text) > 512:
            continue
        cp, m = _pad(text, 512)
        assert np.array_equal(
            np.asarray(ref(cp, m)), np.asarray(bits(cp, m))
        ), repr(text)


def test_bits_nonmultiple_of_32(tables):
    page_ids, pages = tables
    text = "it's can't 123,456 a//b  \n\n x" * 3
    for n in (97, 130, 255):
        cp, m = _pad(text[: n - 5], n)
        want = np.asarray(
            PT.piece_starts_jax(cp, m, page_ids, pages, profile="llama4")
        )
        got = np.asarray(
            BP.piece_starts_bits(cp, m, page_ids, pages, profile="llama4")
        )
        assert np.array_equal(want, got), n


def test_bits_corpus_slices(tables):
    page_ids, pages = tables
    ref_dir = Path("/root/reference/tests/input")
    texts = []
    for name in ("lorem.txt", "emoji.txt"):
        p = ref_dir / name
        if p.exists():
            texts.append(p.read_text(encoding="utf-8")[:8000])
    texts.append(Path(__file__).read_text(encoding="utf-8")[:8000])
    N = 8192
    ref = jax.jit(
        lambda cp, m: PT.piece_starts_jax(
            cp, m, page_ids, pages, profile="llama4"
        )
    )
    bits = jax.jit(
        lambda cp, m: BP.piece_starts_bits(
            cp, m, page_ids, pages, profile="llama4"
        )
    )
    for t in texts:
        cp, m = _pad(t[:N], N)
        assert np.array_equal(np.asarray(ref(cp, m)), np.asarray(bits(cp, m)))


def test_bits_pallas_interpret(tables):
    page_ids, pages = tables
    rng = random.Random(8)
    texts = ["it's can't   WON'T I'll we're 123,456  hello World!! " * 70,
             "a/b//c   \n\n  x café ÇÖĞ " * 120, "", random_text(rng)]
    N = 8192  # pallas tile layout needs N % (32*128) == 0
    rows, ms = [], []
    for t in texts:
        cps = np.array([ord(c) for c in t], dtype=np.int32)[:N]
        row = np.zeros(N, np.int32)
        row[: len(cps)] = cps
        rows.append(row)
        ms.append(min(len(cps), N))
    cp = jnp.asarray(np.stack(rows))
    m = jnp.asarray(np.array(ms, np.int32))
    for profile in ("llama4", "nocontract", "cl100k", "gpt2"):
        got = np.asarray(
            BP.piece_starts_bits_pallas(
                cp, m, page_ids, pages, profile=profile, interpret=True
            )
        )
        for b in range(len(texts)):
            want = np.asarray(
                PT.piece_starts_jax(cp[b], m[b], page_ids, pages,
                                    profile=profile)
            )
            assert np.array_equal(want, got[b]), (profile, texts[b][:40])


def test_bits_vmap_batch(tables):
    page_ids, pages = tables
    rng = random.Random(3)
    texts = ["hello  World " * 20, "it's ''' a//b \n\n " * 16, "",
             random_text(rng)]
    N = 1024
    rows, ms = [], []
    for t in texts:
        cps = np.array([ord(c) for c in t], dtype=np.int32)[:N]
        row = np.zeros(N, np.int32)
        row[: len(cps)] = cps
        rows.append(row)
        ms.append(min(len(cps), N))
    cp = jnp.asarray(np.stack(rows))
    m = jnp.asarray(np.array(ms, np.int32))
    got = np.asarray(
        jax.jit(
            jax.vmap(
                lambda c, mm: BP.piece_starts_bits(
                    c, mm, page_ids, pages, profile="llama4"
                )
            )
        )(cp, m)
    )
    for b in range(len(texts)):
        want = np.asarray(
            PT.piece_starts_jax(cp[b], m[b], page_ids, pages,
                                profile="llama4")
        )
        assert np.array_equal(want, got[b]), texts[b][:40]


# ===========================================================================
# Plane-space ASCII mask construction (_char_masks_planes)
# ===========================================================================


def _ascii_row(rng, n, m):
    """Valid ASCII bytes in [0, m), arbitrary garbage (incl. >= 128) after."""
    row = rng.integers(0, 256, n).astype(np.uint8)
    row[:m] = rng.integers(1, 128, m).astype(np.uint8)
    # sprinkle structure so every class fires
    for i, ch in enumerate(b"it's WON'T I'll 123,456 a//b \r\n\t  Zz0"):
        if i < m:
            row[i] = ch
    return row


@pytest.mark.parametrize("contractions", [True, False])
def test_plane_masks_equal_char_masks(contractions):
    page_ids, pages = get_two_level_tables()
    rng = np.random.default_rng(42)
    n = 2048
    for m in (0, 1, 31, 32, 33, 100, n - 5, n):
        by = _ascii_row(rng, n, m)
        cp = jnp.asarray(np.where(np.arange(n) < m, by, 0).astype(np.int32))
        want = {
            k: np.asarray(BP.pack_mask(v))
            for k, v in BP._char_masks(
                cp, jnp.int32(m), jnp.asarray(page_ids),
                jnp.asarray(pages), contractions=contractions,
                ascii_fast=True,
            ).items()
        }
        got = {
            k: np.asarray(v)
            for k, v in BP._char_masks_planes(
                jnp.asarray(by), jnp.int32(m), contractions=contractions
            ).items()
        }
        assert set(want) == set(got)
        for k in want:
            assert np.array_equal(want[k], got[k]), (k, m, contractions)


def test_bits_ascii_planes_end_to_end(tables):
    page_ids, pages = tables
    texts = [
        "it's can't   WON'T I'll we're 123,456  hello World!! " * 30,
        "a/b//c   \r\n\n\t  x 999999999 ...ABC...xyz '''' " * 40,
        "", " ", "'s", "I'm o'clock o''clock dont't''ve",
    ]
    for text in texts:
        n = max(32, -(-len(text) // 32) * 32)
        cp, m = _pad(text, n)
        want = np.asarray(
            PT.piece_starts_jax(cp, m, page_ids, pages, profile="llama4")
        )
        got = np.asarray(
            BP.piece_starts_bits(cp, m, page_ids, pages, profile="llama4",
                                 ascii_fast=True)
        )
        assert np.array_equal(want, got), repr(text[:40])


def test_bits_pallas_ascii_planes_uint8(tables):
    """The fused resident handoff: raw uint8 windows with garbage tails."""
    page_ids, pages = tables
    rng = np.random.default_rng(7)
    N = 8192
    texts = ["it's  WON'T I'll 123,456 hello World!! a//b \r\n " * 60,
             "x" * N, ""]
    rows, ms = [], []
    for t in texts:
        m = min(len(t), N)
        row = _ascii_row(rng, N, 0)  # all garbage
        row[:m] = np.frombuffer(t.encode()[:m], np.uint8)
        rows.append(row)
        ms.append(m)
    by = jnp.asarray(np.stack(rows))
    m = jnp.asarray(np.array(ms, np.int32))
    got = np.asarray(
        BP.piece_starts_bits_pallas(
            by, m, page_ids, pages, profile="llama4", ascii_fast=True,
            interpret=True,
        )
    )
    for b, t in enumerate(texts):
        cp, mm = _pad(t[:N], N)
        want = np.asarray(
            PT.piece_starts_jax(cp, mm, page_ids, pages, profile="llama4")
        )
        assert np.array_equal(want, got[b]), t[:40]


def test_class_lookup_hot_exact(tables):
    """class_lookup_hot (hot-codepoint compare + compacted-unknown gather
    + replay expand) must equal the plain class gather on valid slots,
    and flag overflow instead of corrupting when u_cap is too small."""
    page_ids, pages = tables
    rng = random.Random(3)
    B, C = 2, 32768
    pool = [0x20, 0x200D, 0xFE0F, 0x1F3FB, ord("a"), ord("!"), 0x65E5,
            0x1F600, 0x301, 0x41F]
    rows, ms = [], []
    for b in range(B):
        m = rng.randrange(C // 2, C)
        row = [rng.choice(pool) if rng.random() < 0.8
               else rng.randrange(1, 0x2FFFF) for _ in range(m)]
        rows.append(row + [0] * (C - m))
        ms.append(m)
    cp = jnp.asarray(np.asarray(rows, np.int32))
    m = jnp.asarray(np.asarray(ms, np.int32))
    hot = tuple(pool[:6])
    cls, ovf = BP.class_lookup_hot(
        cp, m, page_ids, pages, hot_cps=hot, u_cap=C // 2, interpret=True,
    )
    assert not bool(np.asarray(ovf).any())
    want = np.asarray(PT._cls_lookup(cp, page_ids, pages))
    got = np.asarray(cls)
    for b in range(B):
        assert np.array_equal(got[b, : ms[b]], want[b, : ms[b]])

    # undersized u_cap must raise the overflow flag (exact-fallback
    # contract), not silently truncate
    _, ovf2 = BP.class_lookup_hot(
        cp, m, page_ids, pages, hot_cps=(0x200D,), u_cap=4096,
        interpret=True,
    )
    assert bool(np.asarray(ovf2).all())
