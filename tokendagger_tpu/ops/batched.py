"""Batched multi-segment device resolution: many texts per dispatch.

Many independent short segments (chat turns, per-document corpus records,
the ordinary spans between special tokens) are resolved as a (B, W) grid
in a handful of fixed-shape dispatches — the TPU analogue of the
reference's ThreadPoolExecutor fan-out over texts
(/root/reference/tokendagger/wrapper.py:234-235). Rows never interact and
the scanner derivation is row-local by construction, so `jax.vmap` turns
the verified single-window stages (utf8 decode -> piece starts -> key
compaction -> finalize) into batched ones without re-deriving any of
them; the whole-piece vocab probe is elementwise over pieces and runs on
the flattened grid directly.

Each segment must be a COMPLETE text (it ends where the text ends), so
rows need no safe-cut/halo logic: trim = row length, every piece is
final. Misses and oversize pieces emit SENTINEL slots spliced exactly on
the host (same contract as ops/fused.py miss_mode="host").

Stage separation (separate small jits, not one fused program) follows
docs/PERF.md "dispatch cliff": each stage compiles in seconds and runs in
~0.1 ms; fusing them produces minute-long compiles on the remote runtime.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import pretokenize as PT
from .fused import finalize_host
from .join import compact_piece_keys, vocab_probe8t

# (rows, width) grids are padded to these shapes; bounded variants keep
# compile count small and the XLA persistent cache hot.
ROW_WIDTHS = (256, 1024, 4096)
MAX_GRID_BYTES = 1 << 20  # cap B*W per dispatch


def grid_rows(width: int) -> int:
    return max(1, MAX_GRID_BYTES // width)


def _row_starts(cp, m, page_ids, pages, *, contractions, profile):
    """compute_starts for one row (un-jitted: the batched wrapper jits)."""
    eff = profile or ("llama4" if contractions else "nocontract")
    if eff in ("llama4", "nocontract"):
        return PT.piece_starts_jax(
            cp, m, page_ids, pages, contractions=contractions, profile=profile
        )
    lens = PT.match_lengths_jax(
        cp, m, page_ids, pages, contractions=contractions, profile=profile
    )
    return PT.chain_starts(lens, m)


@jax.jit
def _decode_g(data, nbytes):
    """(B, W) uint8 + (B,) int32 -> per-row (cp, byte_of_char, n_chars)."""

    def row(d, n):
        cp, _, boc, m = PT.utf8_decode(d, n)
        return cp, boc, m

    return jax.vmap(row)(data, nbytes)


@partial(jax.jit, static_argnames=("contractions", "profile"))
def _starts_g(cp, m, page_ids, pages, *, contractions, profile):
    def row(c, mm):
        return _row_starts(
            c, mm, page_ids, pages, contractions=contractions, profile=profile
        )

    return jax.vmap(row)(cp, m)


@partial(jax.jit, static_argnames=("p_cap",))
def _compact_g(starts, boc, data, nbytes, *, p_cap):
    def row(s, b, d, n):
        return compact_piece_keys(s, b, d, n, p_cap)

    return jax.vmap(row)(starts, boc, data, nbytes)


# transposed-compare probe: 2.1x the (P, 48) barrier form on v5e
_probe_flat = jax.jit(vocab_probe8t, static_argnames=("vhash8_mask",))


@partial(jax.jit, static_argnames=("p_cap",))
def _final_g(start_b, piece_len, rank, n_pieces, trim, *, p_cap):
    def row(sb, pl, rk, npc, tr):
        return finalize_host(sb, pl, rk, npc, tr, p_cap=p_cap)

    return jax.vmap(row)(start_b, piece_len, rank, n_pieces, trim)


def resolve_grid(
    buf: np.ndarray,        # (B, W) uint8, 0-padded rows
    lens: np.ndarray,       # (B,) int32 row byte lengths
    *,
    page_ids,
    pages,
    vhash_rows,
    vhash_mask: int,
    contractions: bool = True,
    profile: str | None = None,
):
    """Resolve B complete segments in 5 staged dispatches.

    Returns numpy (flat (B, p_cap) int32 with SENTINEL at miss slots,
    total (B,), ms_start (B, p_cap), ms_len (B, p_cap), n_ms (B,)).
    """
    B, W = buf.shape
    p_cap = W  # a W-byte row can never exceed W pieces: no overflow path
    data = jnp.asarray(buf)
    nb = jnp.asarray(lens.astype(np.int32))
    cp, boc, m = _decode_g(data, nb)
    starts = _starts_g(
        cp, m, page_ids, pages, contractions=contractions, profile=profile
    )
    sb, pl, k0, k1, k2, k3, npc = _compact_g(starts, boc, data, nb, p_cap=p_cap)
    rank = _probe_flat(
        k0.reshape(-1), k1.reshape(-1), k2.reshape(-1), k3.reshape(-1),
        pl.reshape(-1), vhash_rows, vhash_mask,
    ).reshape(B, p_cap)
    flat, total, _np_, _nk, _cons, _ovf, ms_s, ms_l, n_ms = _final_g(
        sb, pl, rank, npc, nb, p_cap=p_cap
    )
    # one sync for the small arrays, then slice the id grid to the widest
    # row actually produced before pulling it to host
    total_np = np.asarray(total)
    n_ms_np = np.asarray(n_ms)
    k = int(total_np.max()) if B else 0
    flat_np = np.asarray(flat[:, :k]) if k else np.zeros((B, 0), np.int32)
    if int(n_ms_np.max()) if B else 0:
        ms_s_np = np.asarray(ms_s)
        ms_l_np = np.asarray(ms_l)
    else:
        ms_s_np = ms_l_np = np.zeros((B, 0), np.int32)
    return flat_np, total_np, ms_s_np, ms_l_np, n_ms_np
