"""Distribution layer: sharded merge over a virtual 8-device CPU mesh must
equal the single-device kernel, and psum counters must be globally correct
(SURVEY.md §4 multi-node testing strategy)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tokendagger_tpu.hostengine import byte_pair_encode
from tokendagger_tpu.parallel.mesh import (
    get_mesh,
    shard_merge_rows,
    shard_rows,
    sharded_encode_step,
)
from tokendagger_tpu.tables import build_tables


@pytest.fixture(scope="module")
def problem(tiny_vocab):
    ranks, specials = tiny_vocab
    tables = build_tables(ranks, specials)
    words = [b"hello", b"the and", b"to the store", b"is it", b"ar", b"x",
             b"hellohello", b"and and and"]
    R, C = 64, 32
    buf = np.zeros((R, C), dtype=np.uint8)
    lens = np.zeros(R, dtype=np.int32)
    for r in range(R):
        w = words[r % len(words)]
        buf[r, : len(w)] = np.frombuffer(w, dtype=np.uint8)
        lens[r] = len(w)
    return ranks, tables, buf, lens, words


def _expected(ranks, words, R):
    out = []
    for r in range(R):
        out.append(byte_pair_encode(words[r % len(words)], ranks))
    return out


class TestShardedMerge:
    def test_matches_host(self, problem):
        ranks, tables, buf, lens, words = problem
        n_dev = min(8, len(jax.devices()))
        mesh = get_mesh(n_dev)
        fn = shard_merge_rows(mesh)
        bb, ln = shard_rows(mesh, jnp.asarray(buf), jnp.asarray(lens))
        tok, counts = fn(
            bb, ln, jnp.asarray(tables.byte_rank),
            jnp.asarray(tables.pair.rows), mask=tables.pair.mask,
        )
        tok_np = np.asarray(tok)
        want = _expected(ranks, words, buf.shape[0])
        for r in range(buf.shape[0]):
            got = tok_np[r][tok_np[r] >= 0].tolist()
            assert got == want[r], r

    def test_psum_counters(self, problem):
        ranks, tables, buf, lens, words = problem
        n_dev = min(8, len(jax.devices()))
        mesh = get_mesh(n_dev)
        step = sharded_encode_step(mesh)
        bb, ln = shard_rows(mesh, jnp.asarray(buf), jnp.asarray(lens))
        tok, counts, total_bytes, total_tokens = step(
            bb, ln, jnp.asarray(tables.byte_rank),
            jnp.asarray(tables.pair.rows), mask=tables.pair.mask,
        )
        want = _expected(ranks, words, buf.shape[0])
        assert int(total_bytes) == int(lens.sum())
        assert int(total_tokens) == sum(len(w) for w in want)

    def test_uses_multiple_devices(self):
        assert len(jax.devices()) >= 8, (
            "conftest must provide 8 virtual CPU devices"
        )

    def test_2d_mesh_step(self, problem):
        from tokendagger_tpu.parallel.mesh import (
            get_mesh_2d, sharded_encode_step_2d,
        )
        from jax.sharding import NamedSharding, PartitionSpec as P

        ranks, tables, buf, lens, words = problem
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        mesh = get_mesh_2d(2, 4)  # 2 "hosts" x 4 "chips"
        step = sharded_encode_step_2d(mesh)
        sh = NamedSharding(mesh, P(("hosts", "chips"), None))
        shl = NamedSharding(mesh, P(("hosts", "chips")))
        bb = jax.device_put(jnp.asarray(buf), sh)
        ln = jax.device_put(jnp.asarray(lens), shl)
        tok, counts, total_bytes, total_tokens = step(
            bb, ln, jnp.asarray(tables.byte_rank),
            jnp.asarray(tables.pair.rows), mask=tables.pair.mask,
        )
        want = _expected(ranks, words, buf.shape[0])
        assert int(total_bytes) == int(lens.sum())
        assert int(total_tokens) == sum(len(w) for w in want)
        tok_np = np.asarray(tok)
        for r in range(buf.shape[0]):
            assert tok_np[r][tok_np[r] >= 0].tolist() == want[r]
