"""Butterfly stream compaction (ops/compact_pallas) vs the sorted path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tokendagger_tpu.ops.compact_pallas import (
    compact_piece_keys_butterfly,
)
from tokendagger_tpu.ops.fused import caps_for
from tokendagger_tpu.ops.join import compact_piece_keys_sorted


def _compare(starts, data, nbytes, p_cap):
    got = compact_piece_keys_butterfly(
        jnp.asarray(starts), jnp.asarray(data), jnp.asarray(nbytes),
        p_cap, interpret=True,
    )
    names = ["start_b", "piece_len", "k0", "k1", "k2", "k3", "n_pieces"]
    for b in range(starts.shape[0]):
        want = compact_piece_keys_sorted(
            jnp.asarray(starts[b]), jnp.asarray(data[b]),
            jnp.int32(nbytes[b]), p_cap,
        )
        for nm, w, g in zip(names, want, [o[b] for o in got]):
            assert np.array_equal(np.asarray(w), np.asarray(g)), (b, nm)


def test_butterfly_matches_sorted_random():
    rng = np.random.default_rng(1)
    B, N = 3, 1 << 16
    p_cap = caps_for(N)["p_cap"]
    data = rng.integers(32, 127, (B, N)).astype(np.uint8)
    starts = rng.random((B, N)) < 0.22
    starts[:, 0] = True
    nbytes = np.array([N, N - 1000, 333], np.int32)
    _compare(starts, data, nbytes, p_cap)


def test_butterfly_edge_densities():
    rng = np.random.default_rng(2)
    B, N = 4, 1 << 15
    p_cap = caps_for(N)["p_cap"]
    data = rng.integers(32, 127, (B, N)).astype(np.uint8)
    starts = np.zeros((B, N), bool)
    starts[0, :] = False                  # no pieces
    starts[1, 0] = True                   # one piece spanning the window
    starts[2, :] = rng.random(N) < 0.02   # sparse
    # dense-but-within-cap (p_cap is N//3, so every 3rd would overflow
    # by one — an unspecified regime for both impls)
    starts[3, ::4] = True
    nbytes = np.array([N, N, N, N], np.int32)
    _compare(starts, data, nbytes, p_cap)


def test_butterfly_overflow_flagged():
    # denser than p_cap: counts must reveal the overflow so the caller
    # can fall back (values in the truncated tail are unspecified)
    rng = np.random.default_rng(3)
    B, N = 1, 1 << 15
    p_cap = caps_for(N)["p_cap"]
    data = rng.integers(32, 127, (B, N)).astype(np.uint8)
    starts = np.ones((B, N), bool)        # every byte a piece
    nbytes = np.array([N], np.int32)
    got = compact_piece_keys_butterfly(
        jnp.asarray(starts), jnp.asarray(data), jnp.asarray(nbytes),
        p_cap, interpret=True,
    )
    n_pieces = int(np.asarray(got[6])[0])
    assert n_pieces == N > p_cap


def test_butterfly_packed_flags_match_bool():
    """packed=True (plane-major words straight from the bitplane starts
    kernel) must equal the bool-flag path at the flagship window size
    (N == 32 * blk is the packed-mode shape requirement)."""
    import jax.numpy as jnp

    from tokendagger_tpu.ops.bitplane import pack_mask

    rng = np.random.default_rng(11)
    B, N = 1, 1 << 20
    p_cap = caps_for(N)["p_cap"]
    data = rng.integers(32, 127, (B, N)).astype(np.uint8)
    starts = rng.random((B, N)) < 0.22
    starts[:, 0] = True
    nbytes = np.array([N], np.int32)

    want = compact_piece_keys_butterfly(
        jnp.asarray(starts), jnp.asarray(data), jnp.asarray(nbytes),
        p_cap, interpret=True,
    )
    words = jax.vmap(pack_mask)(jnp.asarray(starts))
    got = compact_piece_keys_butterfly(
        words, jnp.asarray(data), jnp.asarray(nbytes),
        p_cap, interpret=True, packed=True,
    )
    for i, (w, g) in enumerate(zip(want, got)):
        assert np.array_equal(np.asarray(w), np.asarray(g)), i


def test_starts_packed_out_matches_unpacked():
    from tokendagger_tpu.ops.bitplane import (
        piece_starts_bits_pallas, unpack_mask,
    )
    from tokendagger_tpu.unicode_tables import get_two_level_tables

    page_ids, pages = map(jnp.asarray, get_two_level_tables())
    rng = np.random.default_rng(12)
    B, N = 2, 1 << 13
    cp = rng.integers(1, 127, (B, N)).astype(np.int32)
    m = np.array([N, N - 321], np.int32)
    plain = piece_starts_bits_pallas(
        jnp.asarray(cp), jnp.asarray(m), page_ids, pages, interpret=True,
    )
    packed = piece_starts_bits_pallas(
        jnp.asarray(cp), jnp.asarray(m), page_ids, pages, interpret=True,
        packed_out=True,
    )
    unp = jax.vmap(unpack_mask)(packed)
    assert np.array_equal(np.asarray(plain), np.asarray(unp))
