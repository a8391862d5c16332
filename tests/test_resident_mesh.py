"""The flagship join-first pipeline under shard_map on a virtual
8-device mesh: per-window ids bit-identical to the host oracle, psum
counters equal to global totals on every shard.

Covers the full impl/profile configuration surface (VERDICT r4 item 4 —
the mesh form must be as input-agnostic as the reference's thread DP):
ASCII flagship (llama4 + nocontract profiles) and the general non-ASCII
tiled path (emoji corpus, llama4 + nocontract profiles).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tokendagger_tpu.parallel.mesh import get_mesh


WINDOW = 1 << 15  # 32 KB: multiple of the butterfly block and bit tile


def _build(ranks, specials, **kw):
    from tokendagger_tpu.ops.fused import caps_for
    from tokendagger_tpu.parallel.resident_mesh import (
        mesh_resident_pipeline,
    )
    from tokendagger_tpu.tables import build_tables
    from tokendagger_tpu.unicode_tables import get_two_level_tables

    tables = build_tables(ranks, specials)
    page_ids, pages = map(jnp.asarray, get_two_level_tables())
    mesh = get_mesh(8)
    p_cap = caps_for(WINDOW)["p_cap"]
    return mesh_resident_pipeline(
        mesh, tables, page_ids, pages,
        window=WINDOW, p_cap=p_cap, interpret=True, **kw,
    )


def _stage_windows(corpus: bytes, B: int):
    """B char-aligned WINDOW-byte windows tiled over the corpus."""
    from tokendagger_tpu.utils.windows import tile_windows

    return tile_windows(corpus, WINDOW, B)


def _verify(fn, shardings, wins, nbs, ranks, specials, pattern):
    from tokendagger_tpu.hostengine import HostEngine, byte_pair_merge
    from tokendagger_tpu.ops.fused import SENTINEL

    B = wins.shape[0]
    devs = jax.device_put(jnp.asarray(wins), shardings[0])
    nbsj = jax.device_put(jnp.asarray(nbs), shardings[1])
    out = fn(devs, nbsj)
    (flat, n_kept, _np_, _nk2, _cons, overflow,
     ms_s, ms_l, n_ms, total_tokens, total_bytes) = out

    assert not bool(np.asarray(overflow).any())
    assert int(total_bytes) == int(nbs.sum())
    assert int(total_tokens) == int(np.asarray(n_kept).sum())

    host = HostEngine(pattern, ranks, specials)
    rdict = dict(ranks)
    for b in range(B):
        ids = np.asarray(flat[b][: int(n_kept[b])])
        window_b = bytes(wins[b, : nbs[b]])
        k = int(np.asarray(n_ms)[b])
        if k:
            sp_s = np.asarray(ms_s[b])
            sp_l = np.asarray(ms_l[b])
            parts, prev = [], 0
            for j, p in enumerate(np.nonzero(ids == SENTINEL)[0]):
                parts.append(ids[prev:p])
                piece = window_b[int(sp_s[j]) : int(sp_s[j]) + int(sp_l[j])]
                r = rdict.get(piece)
                parts.append(np.asarray(
                    [r] if r is not None
                    else byte_pair_merge(piece, rdict),
                    dtype=ids.dtype,
                ))
                prev = p + 1
            parts.append(ids[prev:])
            ids = np.concatenate(parts)
        want = host.encode_ordinary(window_b.decode("utf-8"))
        assert ids.tolist() == want, f"window {b} mismatch"


@pytest.fixture(scope="module")
def assets(llama4_assets):
    _, ranks, specials = llama4_assets
    return ranks, specials


def test_sharded_pipeline_bit_exact(assets, corpus_lorem):
    from tokendagger_tpu.vocab import LLAMA4_PATTERN

    ranks, specials = assets
    fn, shardings = _build(ranks, specials)
    wins, nbs = _stage_windows(corpus_lorem.encode(), 8)
    _verify(fn, shardings, wins, nbs, ranks, specials, LLAMA4_PATTERN)


def test_sharded_pipeline_nocontract(assets, corpus_lorem):
    """The Tekken scanner profile (nocontract) under shard_map — same
    ASCII flagship form, different boundary rules."""
    from tokendagger_tpu.vocab import TEKKEN_PATTERN

    ranks, specials = assets
    fn, shardings = _build(ranks, specials, profile="nocontract")
    wins, nbs = _stage_windows(corpus_lorem.encode(), 8)
    _verify(fn, shardings, wins, nbs, ranks, specials, TEKKEN_PATTERN)


@pytest.mark.parametrize("profile,pattern_name", [
    ("llama4", "LLAMA4_PATTERN"),
    ("nocontract", "TEKKEN_PATTERN"),
])
def test_sharded_pipeline_general_emoji(assets, profile, pattern_name):
    """The general (non-ASCII) tiled path under shard_map: butterfly
    UTF-8 decode, class-gather starts, recorded-route char->byte
    expansion — bit-exact on the reference emoji corpus."""
    import pathlib

    from tokendagger_tpu import vocab as V

    emo = pathlib.Path("/root/reference/tests/input/emoji.txt")
    if not emo.exists():
        pytest.skip("emoji corpus unavailable")
    ranks, specials = assets
    fn, shardings = _build(
        ranks, specials, impl="general", profile=profile,
        c_cap=WINDOW // 2,
    )
    wins, nbs = _stage_windows(emo.read_bytes(), 8)
    _verify(fn, shardings, wins, nbs, ranks, specials,
            getattr(V, pattern_name))


def test_sharded_pipeline_hot_routing(assets, corpus_lorem):
    """The round-5 hot-set routings under shard_map: hot-piece probe on
    an ASCII batch, and hot-codepoint classes + hot probe on the general
    path — bit-exact, zero overflow (mesh/single-chip lockstep)."""
    from collections import Counter

    from tokendagger_tpu.hostengine import HostEngine
    from tokendagger_tpu.ops.join import piece_key_words
    from tokendagger_tpu.vocab import LLAMA4_PATTERN

    ranks, specials = assets
    corpus = corpus_lorem.encode()
    wins, nbs = _stage_windows(corpus, 8)

    # host staging analysis (the resident.py recipe)
    host = HostEngine(LLAMA4_PATTERN, ranks, specials)
    pc: Counter = Counter()
    win_pieces = []
    for b in range(8):
        txt = bytes(wins[b, : nbs[b]]).decode("utf-8")
        pieces = [txt[a:e].encode() for a, e in host.split_spans(txt)]
        win_pieces.append(pieces)
        pc.update(p for p in pieces if len(p) <= 16)
    hot = [p for p, _ in pc.most_common(64)]
    hot_set = frozenset(hot)
    max_unknown = max(sum(1 for p in ps if p not in hot_set)
                      for ps in win_pieces)
    rd = dict(ranks)
    probe_cfg = dict(
        hot_keys=tuple(piece_key_words(p) for p in hot),
        hot_ranks=tuple(rd.get(p, -1) for p in hot),
        u_cap=max(4096, -(-(max_unknown + 128) // 128) * 128),
    )
    fn, shardings = _build(ranks, specials, probe_hot_cfg=probe_cfg)
    _verify(fn, shardings, wins, nbs, ranks, specials, LLAMA4_PATTERN)

    # general path with hot classes (emoji corpus)
    import pathlib

    emo = pathlib.Path("/root/reference/tests/input/emoji.txt")
    if not emo.exists():
        pytest.skip("emoji corpus unavailable")
    wins_e, nbs_e = _stage_windows(emo.read_bytes(), 8)
    hist: Counter = Counter()
    for b in range(8):
        vals, cnts = np.unique(
            np.frombuffer(
                bytes(wins_e[b, : nbs_e[b]]).decode("utf-8")
                .encode("utf-32-le"), np.uint32,
            ).astype(np.int32), return_counts=True)
        hist.update(dict(zip(vals.tolist(), cnts.tolist())))
    hot_cps = [v for v, _ in hist.most_common(32)]
    cls_cfg = dict(hot_cps=tuple(hot_cps), u_cap=WINDOW)
    fn2, sh2 = _build(ranks, specials, impl="general",
                      c_cap=WINDOW, class_hot_cfg=cls_cfg)
    _verify(fn2, sh2, wins_e, nbs_e, ranks, specials, LLAMA4_PATTERN)
