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
