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


def test_tiles_masked_matches_numpy_compaction():
    """compact_tiles_masked + degap_record == stable numpy compaction
    (the wedge-free decomposition of compact_by_mask, VERDICT r3 #2)."""
    from tokendagger_tpu.ops.compact_pallas import (
        compact_tiles_masked, degap_record,
    )

    rng = np.random.default_rng(7)
    B, N = 2, 1 << 16          # G = 2 tiles of 32768
    C = 1 << 15                # out_cap < N: live counts stay below it
    vals = rng.integers(0, 1 << 21, (B, N)).astype(np.int32)
    mask = rng.random((B, N)) < 0.4
    mask[1, : N // 2] = False  # heavily skewed tile occupancy

    gapped, cnts, takes = compact_tiles_masked(
        [jnp.asarray(vals)], jnp.asarray(mask), out_cap=C, interpret=True,
    )
    (dense,), _ = degap_record(
        list(gapped), cnts, p_rows=C // 128, interpret=True,
    )
    dense = np.asarray(dense).reshape(B, C)
    assert np.array_equal(
        np.asarray(cnts).sum(axis=1), mask.sum(axis=1)
    )
    for b in range(B):
        want = vals[b][mask[b]]
        assert np.array_equal(dense[b, : len(want)], want), b


def test_expand_starts_replay_matches_semantics():
    """Recorded-route expansion: byte flag j == lead[j] &
    starts_char[rank(j)] — vs direct numpy, over random UTF-8-like
    lead masks and random char flags."""
    from tokendagger_tpu.ops.pretokenize import (
        expand_starts_replay, utf8_decode_tiles,
    )

    rng = np.random.default_rng(8)
    B, N = 2, 1 << 16
    C = 1 << 15
    # synthesize windows with mixed 1..4-byte sequences
    data = np.zeros((B, N), np.uint8)
    for b in range(B):
        i = 0
        while i < N:
            w = rng.choice([1, 2, 3, 4, 4])  # ~2.8 B/char: chars < C
            w = min(w, N - i)
            s = {1: "a", 2: "é", 3: "€", 4: "🙂"}.get(w, "a").encode()
            data[b, i : i + len(s)] = np.frombuffer(s, np.uint8)
            i += len(s)
    nbytes = np.array([N, N - 7], np.int32)
    # char-align window 1's trimmed tail like resident.py does
    while nbytes[1] > 0 and (data[1, nbytes[1] - 1] & 0xC0) == 0xC0:
        nbytes[1] -= 1

    cp, lead, n_chars, route = utf8_decode_tiles(
        jnp.asarray(data), jnp.asarray(nbytes), c_cap=C, interpret=True,
    )
    lead_np = np.asarray(lead)
    nch = np.asarray(n_chars)
    assert (nch <= C).all()
    flags = rng.random((B, C)) < 0.3
    flags[:, 0] = True
    got = np.asarray(expand_starts_replay(
        jnp.asarray(flags), lead, route, interpret=True,
    ))
    for b in range(B):
        want = np.zeros(N, bool)
        ranks = np.flatnonzero(lead_np[b])
        want[ranks] = flags[b, : len(ranks)]
        assert np.array_equal(got[b], want), b
        # and the decoded codepoints match a straight python decode
        txt = bytes(data[b, : nbytes[b]]).decode("utf-8")
        want_cp = np.array([ord(c) for c in txt], np.int32)
        assert np.array_equal(np.asarray(cp)[b, : len(want_cp)], want_cp), b
