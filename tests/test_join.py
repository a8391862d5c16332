"""Whole-piece lookup (sort-join + hash probe) vs the dict oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from tokendagger_tpu import LLAMA4_PATTERN
from tokendagger_tpu.engine import DeviceEngine
from tokendagger_tpu.hostengine import HostEngine
from tokendagger_tpu.ops.join import (
    vocab_join,
    vocab_probe,
    vocab_probe_np,
)
from tokendagger_tpu.tables import build_tables


def _keys_for(pieces: list[bytes]):
    P = len(pieces)
    buf = np.zeros((P, 16), np.uint8)
    lens = np.zeros(P, np.int32)
    for i, p in enumerate(pieces):
        buf[i, : min(16, len(p))] = np.frombuffer(p[:16], np.uint8)
        lens[i] = len(p)
    return buf.view("<u4").reshape(P, 4), lens


@pytest.fixture(scope="module")
def llama_tables(llama4_assets):
    _, ranks, specials = llama4_assets
    return ranks, build_tables(ranks, specials)


def _query_pieces(ranks):
    rng = np.random.default_rng(7)
    vocab_list = list(ranks)
    pieces = [vocab_list[int(i)] for i in rng.integers(0, len(ranks), 400)]
    pieces += [b"zzqxj", b"\x00", b"a\x00", b"a\x00b", b" \x00",
               bytes(rng.integers(0, 256, 7, dtype=np.uint8)),
               b"x" * 17, b"hello world this is long"]
    # trailing-NUL ambiguity probes: piece == vocab token + b"\0"
    pieces += [vocab_list[3] + b"\x00", vocab_list[100][:1] + b"\x00"]
    return pieces


def test_probe_matches_dict_and_numpy(llama_tables):
    ranks, t = llama_tables
    pieces = _query_pieces(ranks)
    qk, qlens = _keys_for(pieces)
    want = np.array(
        [ranks.get(p, -1) if len(p) <= 16 else -1 for p in pieces],
        np.int32,
    )
    got_np = vocab_probe_np(qk, qlens, t.vhash_rows, t.vhash_mask)
    assert (got_np == want).all()
    got = np.asarray(vocab_probe(
        jnp.asarray(qk[:, 0]), jnp.asarray(qk[:, 1]), jnp.asarray(qk[:, 2]),
        jnp.asarray(qk[:, 3]), jnp.asarray(qlens),
        jnp.asarray(t.vhash_rows), t.vhash_mask,
    ))
    assert (got == want).all()


def test_probe8_matches_dict_and_numpy(llama_tables):
    from tokendagger_tpu.ops.join import vocab_probe8, vocab_probe8_np

    ranks, t = llama_tables
    pieces = _query_pieces(ranks)
    qk, qlens = _keys_for(pieces)
    # the single-hash table may deliberately drop bucket-overflow entries
    # (a false miss is exact: host splices do the dict lookup first) —
    # a result must be either the true rank or -1, never a wrong rank
    want = np.array(
        [ranks.get(p, -1) if len(p) <= 16 else -1 for p in pieces],
        np.int32,
    )
    got_np = vocab_probe8_np(qk, qlens, t.vhash8_rows, t.vhash8_mask)
    ok = (got_np == want) | (got_np == -1)
    assert ok.all()
    # dropped entries are bounded and rare
    assert t.vhash8_dropped <= max(16, len(ranks) // 10_000)
    assert (got_np == -1).sum() <= (want == -1).sum() + t.vhash8_dropped
    got = np.asarray(vocab_probe8(
        jnp.asarray(qk[:, 0]), jnp.asarray(qk[:, 1]), jnp.asarray(qk[:, 2]),
        jnp.asarray(qk[:, 3]), jnp.asarray(qlens),
        jnp.asarray(t.vhash8_rows), t.vhash8_mask,
    ))
    assert (got == got_np).all()


def test_probe8t_matches_probe8(llama_tables):
    """The transposed-compare probe is pointwise identical to
    vocab_probe8 (same table, same deliberate false misses), both
    unbatched and vmapped."""
    import jax

    from tokendagger_tpu.ops.join import vocab_probe8t, vocab_probe8_np

    ranks, t = llama_tables
    pieces = _query_pieces(ranks)
    # plus adversarial junk: random keys/lens exercise empty slots and
    # every mismatch pattern
    rng = np.random.default_rng(11)
    qk, qlens = _keys_for(pieces)
    qk = np.concatenate(
        [qk, rng.integers(0, 2**32, (300, 4), dtype=np.uint32)]
    )
    qlens = np.concatenate(
        [qlens, rng.integers(0, 17, 300).astype(np.int32)]
    )
    rows = jnp.asarray(t.vhash8_rows)
    want = vocab_probe8_np(qk, qlens, t.vhash8_rows, t.vhash8_mask)
    args = (
        jnp.asarray(qk[:, 0]), jnp.asarray(qk[:, 1]), jnp.asarray(qk[:, 2]),
        jnp.asarray(qk[:, 3]), jnp.asarray(qlens),
    )
    got = np.asarray(vocab_probe8t(*args, rows, t.vhash8_mask))
    assert (got == want).all()
    vp = jax.vmap(
        lambda a, b, c, d, e: vocab_probe8t(a, b, c, d, e, rows,
                                            t.vhash8_mask)
    )
    got_b = np.asarray(vp(*[x[None].repeat(2, 0) for x in args]))
    assert (got_b == want[None]).all()


def test_probe8t_chunks_matches_full(llama_tables):
    """The static-chunked probe (the resident default) is pointwise
    identical to vocab_probe8t, for chunk counts that do and don't divide
    P, unbatched and vmapped."""
    import jax

    from tokendagger_tpu.ops.join import (
        vocab_probe8t, vocab_probe8t_chunks,
    )

    ranks, t = llama_tables
    pieces = _query_pieces(ranks)
    rng = np.random.default_rng(17)
    qk, qlens = _keys_for(pieces)
    qk = np.concatenate(
        [qk, rng.integers(0, 2**32, (500 - len(qk), 4), dtype=np.uint32)]
    )
    qlens = np.concatenate(
        [qlens, rng.integers(0, 17, 500 - len(qlens)).astype(np.int32)]
    )
    rows = jnp.asarray(t.vhash8_rows)
    args = (
        jnp.asarray(qk[:, 0]), jnp.asarray(qk[:, 1]), jnp.asarray(qk[:, 2]),
        jnp.asarray(qk[:, 3]), jnp.asarray(qlens),
    )
    full = np.asarray(vocab_probe8t(*args, rows, t.vhash8_mask))
    for nch in (1, 3, 16, 499, 500):
        got = np.asarray(vocab_probe8t_chunks(
            *args, rows, t.vhash8_mask, n_chunks=nch))
        assert (got == full).all(), nch
    vp = jax.vmap(
        lambda a, b, c, d, e: vocab_probe8t_chunks(
            a, b, c, d, e, rows, t.vhash8_mask)
    )
    got_b = np.asarray(vp(*[x[None].repeat(2, 0) for x in args]))
    assert (got_b == full[None]).all()


def test_probe8t_chunked_matches_full(llama_tables):
    """The live-prefix chunked probe equals the full transposed probe on
    every live slot, for any n_live (0, partial chunks, full), unbatched
    and under vmap with per-window live counts."""
    import jax

    from tokendagger_tpu.ops.join import (
        vocab_probe8t, vocab_probe8t_chunked,
    )

    ranks, t = llama_tables
    pieces = _query_pieces(ranks)
    rng = np.random.default_rng(13)
    qk, qlens = _keys_for(pieces)
    qk = np.concatenate(
        [qk, rng.integers(0, 2**32, (600 - len(qk), 4), dtype=np.uint32)]
    )
    qlens = np.concatenate(
        [qlens, rng.integers(0, 17, 600 - len(qlens)).astype(np.int32)]
    )
    rows = jnp.asarray(t.vhash8_rows)
    args = (
        jnp.asarray(qk[:, 0]), jnp.asarray(qk[:, 1]), jnp.asarray(qk[:, 2]),
        jnp.asarray(qk[:, 3]), jnp.asarray(qlens),
    )
    full = np.asarray(vocab_probe8t(*args, rows, t.vhash8_mask))
    P = len(qlens)
    for n_live in (0, 1, 63, 64, 100, P - 1, P):
        got = np.asarray(vocab_probe8t_chunked(
            *args, jnp.int32(n_live), rows, t.vhash8_mask, chunk=64,
        ))
        assert (got[:n_live] == full[:n_live]).all(), n_live
        # beyond the probed prefix (chunk-quantized) everything is a miss
        probed = min(P, -(-n_live // 64) * 64) if n_live else 0
        assert (got[probed:] == -1).all(), n_live
    vp = jax.vmap(
        lambda a, b, c, d, e, n: vocab_probe8t_chunked(
            a, b, c, d, e, n, rows, t.vhash8_mask, chunk=64,
        )
    )
    n_lives = np.asarray([0, 70, 600], np.int32)
    got_b = np.asarray(vp(
        *[x[None].repeat(3, 0) for x in args], jnp.asarray(n_lives)
    ))
    for i, n_live in enumerate(n_lives):
        assert (got_b[i, :n_live] == full[:n_live]).all(), n_live


def test_sort_join_matches_dict(llama_tables):
    ranks, t = llama_tables
    pieces = _query_pieces(ranks)
    qk, qlens = _keys_for(pieces)
    want = np.array(
        [ranks.get(p, -1) if len(p) <= 16 else -1 for p in pieces],
        np.int32,
    )
    got = np.asarray(vocab_join(
        jnp.asarray(qk[:, 0]), jnp.asarray(qk[:, 1]), jnp.asarray(qk[:, 2]),
        jnp.asarray(qk[:, 3]), jnp.asarray(qlens),
        jnp.asarray(t.vocab_keys), jnp.asarray(t.vocab_lens),
        jnp.asarray(t.vocab_ranks),
    ))
    assert (got == want).all()


@pytest.mark.parametrize("mode", ["probe", "sort"])
def test_stream_both_join_modes(llama4_assets, mode):
    pattern, ranks, specials = llama4_assets
    eng = DeviceEngine(pattern, ranks, specials)
    eng.join_mode = mode
    host = HostEngine(pattern, ranks, specials)
    text = ("The quick brown fox. " * 200
            + "unusualqzident_42 __x9 " * 30
            + "=" * 300 + "\n日本語 🙂 " * 50)
    got = eng.encode_stream(text.encode())
    assert got.tolist() == host.encode_ordinary(text)


@pytest.mark.parametrize("mm", ["host", "device"])
def test_stream_both_miss_modes(llama4_assets, mm):
    pattern, ranks, specials = llama4_assets
    eng = DeviceEngine(pattern, ranks, specials)
    eng.miss_mode = mm
    host = HostEngine(pattern, ranks, specials)
    text = ("plain words here. " * 150
            + "qzx_miss_42 wvut_9 __dunder__ " * 40   # many misses
            + "#" * 500 + " tail 🙂")                 # oversize + unicode
    got = eng.encode_stream(text.encode())
    assert got.tolist() == host.encode_ordinary(text)
