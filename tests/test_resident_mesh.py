"""The flagship join-first pipeline under shard_map on a virtual
8-device mesh: per-window ids bit-identical to the host oracle, psum
counters equal to global totals on every shard."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tokendagger_tpu.parallel.mesh import get_mesh


WINDOW = 1 << 15  # 32 KB: multiple of the butterfly block and bit tile


@pytest.fixture(scope="module")
def setup(llama4_assets):
    from tokendagger_tpu.ops.fused import caps_for
    from tokendagger_tpu.parallel.resident_mesh import (
        mesh_resident_pipeline,
    )
    from tokendagger_tpu.tables import build_tables
    from tokendagger_tpu.unicode_tables import get_two_level_tables

    _, ranks, specials = llama4_assets
    tables = build_tables(ranks, specials)
    page_ids, pages = map(jnp.asarray, get_two_level_tables())
    mesh = get_mesh(8)
    p_cap = caps_for(WINDOW)["p_cap"]
    fn, shardings = mesh_resident_pipeline(
        mesh, tables, page_ids, pages,
        window=WINDOW, p_cap=p_cap, interpret=True,
    )
    return ranks, specials, fn, shardings


def test_sharded_pipeline_bit_exact(setup, corpus_lorem):
    from tokendagger_tpu.hostengine import HostEngine, byte_pair_merge
    from tokendagger_tpu.ops.fused import SENTINEL
    from tokendagger_tpu.vocab import LLAMA4_PATTERN

    ranks, specials, fn, shardings = setup
    corpus = corpus_lorem.encode()
    B = 8
    wins = np.zeros((B, WINDOW), np.uint8)
    nbs = np.zeros((B,), np.int32)
    for b in range(B):
        lo = (b * WINDOW) % max(1, len(corpus) - WINDOW)
        chunk = corpus[lo : lo + WINDOW]
        wins[b, : len(chunk)] = np.frombuffer(chunk, np.uint8)
        nbs[b] = len(chunk)

    devs = jax.device_put(jnp.asarray(wins), shardings[0])
    nbsj = jax.device_put(jnp.asarray(nbs), shardings[1])
    out = fn(devs, nbsj)
    (flat, n_kept, _np_, _nk2, _cons, overflow,
     ms_s, ms_l, n_ms, total_tokens, total_bytes) = out

    assert not bool(np.asarray(overflow).any())
    assert int(total_bytes) == int(nbs.sum())
    assert int(total_tokens) == int(np.asarray(n_kept).sum())

    host = HostEngine(LLAMA4_PATTERN, ranks, specials)
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
