"""Pallas UTF-8 decode kernel (interpret mode) vs the jnp decode stage."""

import numpy as np
import pytest

import jax.numpy as jnp

from tokendagger_tpu.ops.pallas_scan import BLOCK, utf8_decode_block
from tokendagger_tpu.ops.pretokenize import utf8_decode


@pytest.mark.parametrize("text", [
    "hello world, it's 123! " * 500,
    "日本語テキスト🙂" * 300,
    "mixed ascii и юникод " * 400,
    "",
])
def test_block_decode_matches_jnp(text):
    data = text.encode()
    N = max(BLOCK, ((len(data) + BLOCK - 1) // BLOCK) * BLOCK)
    buf = np.zeros(N, np.uint8)
    buf[: len(data)] = np.frombuffer(data, np.uint8)
    cp_p, st_p = utf8_decode_block(jnp.asarray(buf), interpret=True)

    cp_j, cob_j, boc_j, m_j = utf8_decode(jnp.asarray(buf), jnp.int32(len(data)))
    # reconstruct the compacted outputs from the pallas per-byte arrays
    idx = np.arange(N)
    valid = idx < len(data)
    is_start = (np.asarray(st_p) != 0) & valid
    cp_at = np.asarray(cp_p)
    # compacted codepoints must match
    want_cp = cp_at[is_start]
    got_cp = np.asarray(cp_j)[: int(m_j)]
    assert (got_cp == want_cp).all()


def test_scan_bytes_pallas_parity(tiny_vocab):
    """scan_bytes with use_pallas (interpret via CPU fallback path) equals
    the standard path."""
    import jax

    from tokendagger_tpu.ops.pretokenize import scan_bytes
    from tokendagger_tpu.unicode_tables import get_two_level_tables

    page_ids, pages = get_two_level_tables()
    cl = jnp.asarray(page_ids)
    fo = jnp.asarray(pages)
    text = ("hello world, it's the STORE 123 !!\n  " * 300).encode()
    N = ((len(text) + BLOCK - 1) // BLOCK) * BLOCK
    buf = np.zeros(N, np.uint8)
    buf[: len(text)] = np.frombuffer(text, np.uint8)
    a = scan_bytes(jnp.asarray(buf), jnp.int32(len(text)), cl, fo)
    # interpret-mode pallas only exercisable via the kernel test above on
    # CPU; here assert the fallback path is taken gracefully for non-BLOCK
    # sizes and results match
    b = scan_bytes(
        jnp.asarray(buf), jnp.int32(len(text)), cl, fo, use_pallas=False
    )
    assert int(a[2]) == int(b[2])
    assert (np.asarray(a[0]) == np.asarray(b[0])).all()
