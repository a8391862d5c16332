"""Pallas MXU kernel correctness (interpret mode on CPU): the one-hot
first-round lookup must match the hash-gather init exactly, and the merge
from its state must equal the standard merge."""

import numpy as np
import pytest

import jax.numpy as jnp

from tokendagger_tpu.ops.merge import merge_rows_from_state, merge_rows_local
from tokendagger_tpu.ops.pallas_lut import MAX_RANK, lut_init
from tokendagger_tpu.tables import build_tables


@pytest.fixture(scope="module")
def packed(tiny_vocab):
    ranks, sp = tiny_vocab
    t = build_tables(ranks, sp)
    words = [b"hello", b"the and", b"this then", b"a", b"", b"zzzz",
             bytes([200, 201, 202]), b"hellohello ab", b" " * 15]
    R, C = 256, 16
    buf = np.zeros((R, C), np.uint8)
    lens = np.zeros(R, np.int32)
    for r in range(R):
        w = words[r % len(words)]
        buf[r, : len(w)] = np.frombuffer(w, np.uint8)
        lens[r] = len(w)
    return t, buf, lens


def test_lut_init_exact(packed):
    t, buf, lens = packed
    tok0, pr0 = lut_init(
        jnp.asarray(buf), jnp.asarray(lens),
        jnp.asarray(t.byte_rank), jnp.asarray(t.pair_lut),
        interpret=True,
    )
    tok0, pr0 = np.asarray(tok0), np.asarray(pr0)
    R, C = buf.shape
    want_tok = np.where(
        np.arange(C)[None, :] < lens[:, None], t.byte_rank[buf.astype(int)], -1
    )
    want_pr = np.full((R, C), int(MAX_RANK), np.int64)
    for r in range(R):
        for c in range(lens[r] - 1):
            want_pr[r, c] = t.pair_lut[buf[r, c], buf[r, c + 1]]
    assert (tok0 == want_tok).all()
    assert (pr0 == want_pr).all()


def test_merge_from_pallas_state_matches(packed):
    t, buf, lens = packed
    tok0, pr0 = lut_init(
        jnp.asarray(buf), jnp.asarray(lens),
        jnp.asarray(t.byte_rank), jnp.asarray(t.pair_lut),
        interpret=True,
    )
    tok_a, cnt_a = merge_rows_from_state(
        tok0, pr0, jnp.asarray(lens), jnp.asarray(t.pair.rows),
        mask=t.pair.mask,
    )
    tok_b, cnt_b = merge_rows_local(
        jnp.asarray(buf), jnp.asarray(lens),
        jnp.asarray(t.byte_rank), jnp.asarray(t.pair.rows),
        mask=t.pair.mask,
    )
    assert (np.asarray(cnt_a) == np.asarray(cnt_b)).all()
    assert (np.asarray(tok_a) == np.asarray(tok_b)).all()
