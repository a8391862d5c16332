"""Device decode kernel vs the host decoder."""

import numpy as np
import pytest

import jax.numpy as jnp

from tokendagger_tpu.hostengine import HostEngine
from tokendagger_tpu.ops.decode import decode_ids
from tokendagger_tpu.tables import build_tables
from tokendagger_tpu.vocab import LLAMA4_PATTERN


@pytest.fixture(scope="module")
def setup(tiny_vocab):
    ranks, specials = tiny_vocab
    t = build_tables(ranks, specials)
    host = HostEngine(LLAMA4_PATTERN, ranks, specials)
    return t, host


def _device_decode(t, ids):
    if not len(ids):
        return b""
    need = int(t.decode_lengths[np.asarray(ids)].sum())
    cap = 1 << max(8, (need - 1).bit_length())
    out, total = decode_ids(
        jnp.asarray(np.asarray(ids, dtype=np.int32)),
        jnp.asarray(t.decode_offsets),
        jnp.asarray(t.decode_lengths),
        jnp.asarray(t.decode_blob),
        cap,
    )
    return np.asarray(out)[: int(total)].tobytes()


class TestDeviceDecode:
    def test_roundtrip_texts(self, setup):
        t, host = setup
        for text in ["hello world", "the and is", "it's 123!", "", "x"]:
            ids = host.encode_ordinary(text)
            if not ids:
                continue
            assert _device_decode(t, ids) == host.decode_bytes(ids)

    def test_specials_decode(self, setup, tiny_vocab):
        t, host = setup
        _, specials = tiny_vocab
        ids = list(specials.values())
        assert _device_decode(t, ids) == host.decode_bytes(ids)

    def test_random_ids(self, setup, tiny_vocab):
        import random

        t, host = setup
        ranks, _ = tiny_vocab
        pool = list(ranks.values())
        rng = random.Random(5)
        ids = [rng.choice(pool) for _ in range(500)]
        assert _device_decode(t, ids) == host.decode_bytes(ids)


class TestWrapperDeviceDecode:
    """decode_bytes routes large decodes through ops/decode.decode_ids when
    the workload routes to the device backend (wrapper._decode_bytes_device)."""

    def test_routed_device_decode_matches_host(self, tiny_vocab):
        from tokendagger_tpu.wrapper import Tokenizer

        ranks, specials = tiny_vocab
        tok = Tokenizer(
            "dev-decode", pattern=LLAMA4_PATTERN, mergeable_ranks=ranks,
            special_tokens=specials, backend="tpu",
        )
        text = "the and is it store hello to 123! " * 120
        ids = tok._host.encode_ordinary(text)
        assert len(ids) >= tok._DECODE_VEC_MIN
        assert tok.decode_bytes(ids) == text.encode("utf-8")
        # the device tables were materialized => the kernel path really ran
        assert tok._decode_dev is not None

    def test_unknown_id_errors(self, tiny_vocab):
        from tokendagger_tpu.wrapper import Tokenizer, TokenDaggerError

        ranks, specials = tiny_vocab
        tok = Tokenizer(
            "dev-decode2", pattern=LLAMA4_PATTERN, mergeable_ranks=ranks,
            special_tokens=specials, backend="tpu",
        )
        with pytest.raises(TokenDaggerError):
            tok.decode_bytes([10**7] * 600)
