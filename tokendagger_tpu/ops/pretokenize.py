r"""Device pretokenizer: the regex split as a data-parallel TPU program.

Mirrors scanner_ref.py (the fuzz-verified numpy reference for the tiktoken
pattern family — see that module's docstring for the per-alternative
derivation; reference behavior: /root/reference/src/tiktoken/tiktoken.cpp:70-128)
in pure jnp so XLA fuses the whole scan into a handful of elementwise +
scan + gather kernels:

  bytes (N,) u8
    → UTF-8 decode (per-byte lead/continuation classify, codepoint gather)
    → compact codepoints to char positions (cumsum + scatter)
    → class bitmask gather from the replicated 1.1 MB table
    → run-length arrays via reverse cummin, prev-member via cummax
    → per-position match length (elementwise alternative logic)
    → match-start chaining via pointer doubling (log2 N gather rounds)
    → piece start/length arrays (byte units, compacted)

Everything is fixed-shape: callers pad `data` to a bucket size N and pass
the true byte count `nbytes`; outputs are padded with sentinels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..unicode_tables import LC, LETTER, NUM, RN, UC, WS

# contraction fold-letter ids (match scanner_ref._FOLD_ORDER)
_S, _T, _R, _E, _V, _M, _L, _D = range(8)

MAXI = jnp.int32(0x7FFFFFFF)


def _runlen(mask: jnp.ndarray, idx: jnp.ndarray, n: int) -> jnp.ndarray:
    """r[i] = consecutive True at/after i. mask (n,) bool."""
    nf = jnp.where(mask, n, idx)
    nf = jax.lax.cummin(nf, axis=0, reverse=True)
    return nf - idx


def _prevpos(mask: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """p[i] = largest j <= i with mask[j], else -1."""
    return jax.lax.cummax(jnp.where(mask, idx, -1), axis=0)


def _cls_lookup(cp: jnp.ndarray, page_ids: jnp.ndarray, pages: jnp.ndarray):
    """Class bitmask per codepoint.

    Expanded to a flat single-level int32 table inside the program (the
    expansion is 0x1100 cheap row gathers, ~4 µs), then looked up as a
    16-int32 ROW gather by cp>>4 with a fused one-hot lane select:
    element gathers run at ~140 Mchars/s on v5e while row gathers are
    issue-bound at ~491 Mrows/s regardless of width, so fetching the
    16-entry row containing the codepoint and selecting the lane inside
    the gather's single consumer fusion is 2.9x faster (60 -> 20.9 ms
    per 8M chars; width sweep in results/probe_cls3.log — row4 loses,
    row8/16/32 saturate). The barrier keeps the fused gather+select from
    being rematerialized into the 6+ mask consumer fusions."""
    flat = pages[page_ids.astype(jnp.int32)].astype(jnp.int32).reshape(-1)
    tab = flat.reshape(-1, 16)
    r = tab[cp >> 4]                                  # (N, 16) row gather
    lane = (cp & 15)[..., None]
    iot = jax.lax.broadcasted_iota(jnp.int32, (1,) * cp.ndim + (16,), cp.ndim)
    cls = jnp.where(iot == lane, r, 0).sum(axis=-1)
    return jax.lax.optimization_barrier(cls)


_FOLD_CPS: dict[int, "np.ndarray"] | None = None


def _fold_is(cp: jnp.ndarray, letter_id: int) -> jnp.ndarray:
    """cp case-folds to the given contraction letter. The fold sets are a
    couple dozen codepoints total, so elementwise compares against embedded
    constants beat any table gather."""
    global _FOLD_CPS
    if _FOLD_CPS is None:
        from ..scanner_ref import _FOLD_ORDER
        from ..unicode_tables import get_tables

        _, folds = get_tables()
        _FOLD_CPS = {i: folds[L] for i, L in enumerate(_FOLD_ORDER)}
    hits = jnp.zeros(cp.shape, jnp.bool_)
    for c in _FOLD_CPS[letter_id].tolist():
        hits = hits | (cp == c)
    return hits


def match_lengths_jax(
    cp: jnp.ndarray,        # (N,) int32 codepoints (0-padded beyond m)
    m: jnp.ndarray,         # scalar int32: number of valid chars
    page_ids: jnp.ndarray,  # (0x1100,) page table (two-level class lookup)
    pages: jnp.ndarray,     # (n_pages, 256) uint8 class pages
    *,
    contractions: bool = True,
    profile: str | None = None,
) -> jnp.ndarray:
    """Per-char match length, (N,) int32; >= 1 at valid positions."""
    if profile is None:
        profile = "llama4" if contractions else "nocontract"
    if profile == "cl100k":
        return _match_lengths_cl100k_jax(cp, m, page_ids, pages)
    if profile == "gpt2":
        return _match_lengths_gpt2_jax(cp, m, page_ids, pages)
    contractions = profile != "nocontract"
    N = cp.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    valid = idx < m

    cls = _cls_lookup(cp, page_ids, pages)
    ws = ((cls & WS) != 0) & valid
    rn = ((cls & RN) != 0) & valid
    let = (cls & LETTER) != 0
    num = ((cls & NUM) != 0) & valid
    uc = ((cls & UC) != 0) & valid
    lc = ((cls & LC) != 0) & valid
    wd = uc | lc
    p1 = ~(rn | let | num) & valid
    pu = ~((cls & WS) != 0) & ~let & ~((cls & NUM) != 0) & valid
    rns = (rn | (cp == ord("/"))) & valid
    sp = (cp == ord(" ")) & valid

    ws_run = _runlen(ws, idx, N)
    wd_run = _runlen(wd, idx, N)
    uc_run = _runlen(uc, idx, N)
    lc_run = _runlen(lc, idx, N)
    num_run = _runlen(num, idx, N)
    pu_run = _runlen(pu, idx, N)
    rns_run = _runlen(rns, idx, N)
    prevrn = _prevpos(rn, idx)
    prevlc = _prevpos(lc, idx)

    last = jnp.int32(N - 1)

    def g(a: jnp.ndarray, j: jnp.ndarray) -> jnp.ndarray:
        return a[jnp.clip(j, 0, last)]

    # --- word matchers ----------------------------------------------------
    def wm1(j):
        R = g(wd_run, j)
        p = g(uc_run, j)
        lt = p + g(lc_run, j + p)
        s = g(prevlc, j + R - 1)
        eq = jnp.where((s >= j) & (R > 0), s - j + 1, 0)
        return jnp.where(R == 0, 0, jnp.where(p < R, lt, eq))

    def wm2(j):
        p = g(uc_run, j)
        return jnp.where(p > 0, p + g(lc_run, j + p), 0)

    # --- contraction suffix ----------------------------------------------
    if contractions:
        apo = (cp == ord("'")) & valid
        cp1 = jnp.concatenate([cp[1:], jnp.zeros((1,), cp.dtype)])
        cp1 = jnp.where(idx + 1 < m, cp1, 0)
        cp2 = jnp.concatenate([cp[2:], jnp.zeros((2,), cp.dtype)])
        cp2 = jnp.where(idx + 2 < m, cp2, 0)
        one = (
            _fold_is(cp1, _S) | _fold_is(cp1, _T) | _fold_is(cp1, _M)
            | _fold_is(cp1, _D)
        )
        two = (
            (_fold_is(cp1, _R) & _fold_is(cp2, _E))
            | (_fold_is(cp1, _V) & _fold_is(cp2, _E))
            | (_fold_is(cp1, _L) & _fold_is(cp2, _L))
        )
        ct_full = jnp.where(apo & one, 2, jnp.where(apo & two, 3, 0))

        def ct(e):
            return g(ct_full, e)

    else:

        def ct(e):
            return jnp.zeros_like(e)

    # --- alternatives -----------------------------------------------------
    j1 = idx + 1

    w_pre = wm1(j1)
    w_nop = wm1(idx)
    a1_pre = p1 & (w_pre > 0)
    a1 = jnp.where(
        a1_pre,
        1 + w_pre + ct(idx + 1 + w_pre),
        jnp.where(w_nop > 0, w_nop + ct(idx + w_nop), 0),
    )

    w2_pre = wm2(j1)
    w2_nop = wm2(idx)
    a2_pre = p1 & (w2_pre > 0)
    a2 = jnp.where(
        a2_pre,
        1 + w2_pre + ct(idx + 1 + w2_pre),
        jnp.where(w2_nop > 0, w2_nop + ct(idx + w2_nop), 0),
    )

    a3 = jnp.minimum(num_run, 3)

    pu_pre = g(pu_run, j1)
    pu_nop = pu_run
    a4 = jnp.where(
        sp & (pu_pre > 0),
        1 + pu_pre + g(rns_run, idx + 1 + pu_pre),
        jnp.where(pu_nop > 0, pu_nop + g(rns_run, idx + pu_nop), 0),
    )

    e_ws = idx + ws_run
    m_rn = g(prevrn, e_ws - 1)
    a5 = jnp.where(ws & (m_rn >= idx), m_rn + 1 - idx, 0)

    at_eos = e_ws == m
    a6 = jnp.where(
        (ws_run > 0) & at_eos, ws_run, jnp.where(ws_run >= 2, ws_run - 1, 0)
    )

    a7 = ws_run

    lens = jnp.where(
        a1 > 0,
        a1,
        jnp.where(
            a2 > 0,
            a2,
            jnp.where(
                a3 > 0,
                a3,
                jnp.where(a4 > 0, a4, jnp.where(a5 > 0, a5, jnp.where(a6 > 0, a6, a7))),
            ),
        ),
    )
    return jnp.maximum(lens, 1).astype(jnp.int32)


def _match_lengths_cl100k_jax(
    cp: jnp.ndarray, m: jnp.ndarray, page_ids: jnp.ndarray, pages: jnp.ndarray
) -> jnp.ndarray:
    """cl100k profile (see scanner_ref._match_lengths_cl100k)."""
    N = cp.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    valid = idx < m

    cls = _cls_lookup(cp, page_ids, pages)
    ws = ((cls & WS) != 0) & valid
    rn = ((cls & RN) != 0) & valid
    let = ((cls & LETTER) != 0) & valid
    num = ((cls & NUM) != 0) & valid
    p1 = ~((cls & (RN | LETTER | NUM)) != 0) & valid
    pu = ~((cls & (WS | LETTER | NUM)) != 0) & valid
    sp = (cp == ord(" ")) & valid

    ws_run = _runlen(ws, idx, N)
    let_run = _runlen(let, idx, N)
    num_run = _runlen(num, idx, N)
    pu_run = _runlen(pu, idx, N)
    rn_run = _runlen(rn, idx, N)
    prevrn = _prevpos(rn, idx)

    last = jnp.int32(N - 1)

    def g(a, j):
        return a[jnp.clip(j, 0, last)]

    apo = (cp == ord("'")) & valid
    cp1 = jnp.concatenate([cp[1:], jnp.zeros((1,), cp.dtype)])
    cp1 = jnp.where(idx + 1 < m, cp1, 0)
    cp2 = jnp.concatenate([cp[2:], jnp.zeros((2,), cp.dtype)])
    cp2 = jnp.where(idx + 2 < m, cp2, 0)

    one = (
        _fold_is(cp1, _S) | _fold_is(cp1, _D) | _fold_is(cp1, _M)
        | _fold_is(cp1, _T)
    )
    two = (
        (_fold_is(cp1, _L) & _fold_is(cp2, _L))
        | (_fold_is(cp1, _V) & _fold_is(cp2, _E))
        | (_fold_is(cp1, _R) & _fold_is(cp2, _E))
    )
    c1 = jnp.where(apo & one, 2, jnp.where(apo & two, 3, 0))

    j1 = idx + 1
    let_pre = g(let_run, j1)
    c2 = jnp.where(
        p1,
        jnp.where(let_pre > 0, 1 + let_pre, 0),  # possessive prefix
        jnp.where(let, let_run, 0),
    )

    c3 = jnp.minimum(num_run, 3)

    pu_pre = g(pu_run, j1)
    c4 = jnp.where(
        sp & (pu_pre > 0),
        1 + pu_pre + g(rn_run, idx + 1 + pu_pre),
        jnp.where(pu_run > 0, pu_run + g(rn_run, idx + pu_run), 0),
    )

    e_ws = idx + ws_run
    m_rn = g(prevrn, e_ws - 1)
    c5 = jnp.where(ws & (m_rn >= idx), m_rn + 1 - idx, 0)

    at_eos = e_ws == m
    c6 = jnp.where(
        (ws_run > 0) & at_eos, ws_run, jnp.where(ws_run >= 2, ws_run - 1, 0)
    )

    c7 = ws_run

    lens = jnp.where(
        c1 > 0, c1,
        jnp.where(c2 > 0, c2,
                  jnp.where(c3 > 0, c3,
                            jnp.where(c4 > 0, c4,
                                      jnp.where(c5 > 0, c5,
                                                jnp.where(c6 > 0, c6, c7))))),
    )
    return jnp.maximum(lens, 1).astype(jnp.int32)


def _match_lengths_gpt2_jax(
    cp: jnp.ndarray, m: jnp.ndarray, page_ids: jnp.ndarray, pages: jnp.ndarray
) -> jnp.ndarray:
    """gpt2/r50k/p50k profile (see scanner_ref._match_lengths_gpt2):
    case-sensitive contractions, optional-space class runs."""
    N = cp.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    valid = idx < m

    cls = _cls_lookup(cp, page_ids, pages)
    ws = ((cls & WS) != 0) & valid
    let = ((cls & LETTER) != 0) & valid
    num = ((cls & NUM) != 0) & valid
    pu = ~((cls & (WS | LETTER | NUM)) != 0) & valid
    sp = (cp == ord(" ")) & valid

    ws_run = _runlen(ws, idx, N)
    let_run = _runlen(let, idx, N)
    num_run = _runlen(num, idx, N)
    pu_run = _runlen(pu, idx, N)

    last = jnp.int32(N - 1)

    def g(a, j):
        return a[jnp.clip(j, 0, last)]

    cp1 = jnp.concatenate([cp[1:], jnp.zeros((1,), cp.dtype)])
    cp1 = jnp.where(idx + 1 < m, cp1, 0)
    cp2 = jnp.concatenate([cp[2:], jnp.zeros((2,), cp.dtype)])
    cp2 = jnp.where(idx + 2 < m, cp2, 0)
    apo = (cp == ord("'")) & valid
    one = (
        (cp1 == ord("s")) | (cp1 == ord("d")) | (cp1 == ord("m"))
        | (cp1 == ord("t"))
    )
    two = (
        ((cp1 == ord("l")) & (cp2 == ord("l")))
        | ((cp1 == ord("v")) & (cp2 == ord("e")))
        | ((cp1 == ord("r")) & (cp2 == ord("e")))
    )
    g1 = jnp.where(apo & one, 2, jnp.where(apo & two, 3, 0))

    j1 = idx + 1

    def sp_run(run):
        pre = g(run, j1)
        return jnp.where(
            sp & (pre > 0), 1 + pre, jnp.where(run > 0, run, 0)
        )

    g2 = sp_run(let_run)
    g3 = sp_run(num_run)
    g4 = sp_run(pu_run)

    at_eos = (idx + ws_run) == m
    g5 = jnp.where(
        (ws_run > 0) & at_eos, ws_run, jnp.where(ws_run >= 2, ws_run - 1, 0)
    )
    g6 = ws_run

    lens = jnp.where(
        g1 > 0, g1,
        jnp.where(g2 > 0, g2,
                  jnp.where(g3 > 0, g3,
                            jnp.where(g4 > 0, g4,
                                      jnp.where(g5 > 0, g5, g6)))),
    )
    return jnp.maximum(lens, 1).astype(jnp.int32)


def utf8_decode(data: jnp.ndarray, nbytes: jnp.ndarray, *, use_pallas: bool = False):
    """Decode UTF-8 bytes to a compacted codepoint array.

    data (N,) uint8 (0-padded), nbytes scalar. Returns
    (cp (N,) int32 0-padded, char_of_byte (N,) int32, byte_of_char (N,) int32
    padded with nbytes, n_chars scalar int32).

    With ``use_pallas`` the per-byte classify/assemble stage runs as the
    blockwise Pallas kernel (ops/pallas_scan.py); the cross-block cumsum
    and compaction scatter stay in XLA either way.
    """
    N = data.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    valid = idx < nbytes

    if use_pallas:
        from .pallas_scan import BLOCK, utf8_decode_block

        if N % BLOCK == 0:
            cp_at, lead = utf8_decode_block(data)
            is_start = (lead != 0) & valid
        else:
            use_pallas = False
    if not use_pallas:
        b = data.astype(jnp.int32)
        is_cont = (b & 0xC0) == 0x80
        is_start = ~is_cont & valid

        b1 = jnp.concatenate([b[1:], jnp.zeros((1,), jnp.int32)])
        b2 = jnp.concatenate([b[2:], jnp.zeros((2,), jnp.int32)])
        b3 = jnp.concatenate([b[3:], jnp.zeros((3,), jnp.int32)])

        cp1 = b
        cp2 = ((b & 0x1F) << 6) | (b1 & 0x3F)
        cp3 = ((b & 0x0F) << 12) | ((b1 & 0x3F) << 6) | (b2 & 0x3F)
        cp4 = (
            ((b & 0x07) << 18) | ((b1 & 0x3F) << 12) | ((b2 & 0x3F) << 6)
            | (b3 & 0x3F)
        )
        cp_at = jnp.where(
            b < 0x80, cp1,
            jnp.where(b < 0xE0, cp2, jnp.where(b < 0xF0, cp3, cp4)),
        )
        cp_at = jnp.clip(cp_at, 0, 0x10FFFF)

    char_of_byte = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    n_chars = jnp.where(nbytes > 0, jnp.maximum(char_of_byte[-1] + 1, 0), 0)

    tgt = jnp.where(is_start, char_of_byte, N)  # drop non-starts
    cp = jnp.zeros((N,), jnp.int32).at[tgt].set(
        jnp.where(is_start, cp_at, 0), mode="drop"
    )
    byte_of_char = jnp.full((N,), nbytes, jnp.int32).at[tgt].set(
        jnp.where(is_start, idx, 0), mode="drop"
    )
    return cp, char_of_byte, byte_of_char, n_chars


def utf8_decode_ascii(data: jnp.ndarray, nbytes: jnp.ndarray):
    """ASCII specialization of :func:`utf8_decode` — chars ARE bytes, so
    the compaction (the expensive part: XLA lowers its scatters through
    sorts, ~10 ms per 1 MB window on v5e) vanishes entirely.

    Callers must guarantee the window contains no byte >= 0x80 (checked on
    the host at staging time; exactness is unaffected because for pure
    ASCII this is definitionally identical to the general decode)."""
    N = data.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    valid = idx < nbytes
    cp = jnp.where(valid, data.astype(jnp.int32), 0)
    char_of_byte = jnp.where(
        nbytes > 0, jnp.minimum(idx, nbytes - 1), -1
    )
    byte_of_char = jnp.where(valid, idx, nbytes)
    n_chars = jnp.maximum(nbytes, 0)
    return cp, char_of_byte, byte_of_char, n_chars


def utf8_decode_sorted(data: jnp.ndarray, nbytes: jnp.ndarray):
    """General UTF-8 decode with the codepoint compaction done by ONE
    2-operand sort instead of two scatters (see ops/join.py
    compact_piece_keys_sorted for the measurements and the key trick)."""
    N = data.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    valid = idx < nbytes

    b = data.astype(jnp.int32)
    is_cont = (b & 0xC0) == 0x80
    is_start = ~is_cont & valid

    b1 = jnp.concatenate([b[1:], jnp.zeros((1,), jnp.int32)])
    b2 = jnp.concatenate([b[2:], jnp.zeros((2,), jnp.int32)])
    b3 = jnp.concatenate([b[3:], jnp.zeros((3,), jnp.int32)])
    cp2 = ((b & 0x1F) << 6) | (b1 & 0x3F)
    cp3 = ((b & 0x0F) << 12) | ((b1 & 0x3F) << 6) | (b2 & 0x3F)
    cp4 = (
        ((b & 0x07) << 18) | ((b1 & 0x3F) << 12) | ((b2 & 0x3F) << 6)
        | (b3 & 0x3F)
    )
    cp_at = jnp.where(
        b < 0x80, b,
        jnp.where(b < 0xE0, cp2, jnp.where(b < 0xF0, cp3, cp4)),
    )
    cp_at = jnp.clip(cp_at, 0, 0x10FFFF)

    char_of_byte = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    n_chars = jnp.where(nbytes > 0, jnp.maximum(char_of_byte[-1] + 1, 0), 0)

    key = jnp.where(is_start, idx, N + idx)
    ks, cps = jax.lax.sort((key, cp_at), num_keys=1)
    slot = idx
    live = slot < n_chars
    cp = jnp.where(live, cps, 0)
    byte_of_char = jnp.where(live, ks, nbytes)
    return cp, char_of_byte, byte_of_char, n_chars


def _utf8_codepoints_at_leads(data, nbytes):
    """Per-byte codepoint decode (value valid at lead bytes) + lead mask;
    shared by the butterfly and tiles decode forms."""
    B, N = data.shape
    idx = jnp.arange(N, dtype=jnp.int32)[None, :]
    valid = idx < nbytes[:, None]
    b = data.astype(jnp.int32)
    is_cont = (b & 0xC0) == 0x80
    lead = (~is_cont) & valid

    def sh(a, k):
        return jnp.concatenate(
            [a[:, k:], jnp.zeros((B, k), a.dtype)], axis=1
        )

    b1, b2, b3 = sh(b, 1), sh(b, 2), sh(b, 3)
    cp2 = ((b & 0x1F) << 6) | (b1 & 0x3F)
    cp3 = ((b & 0x0F) << 12) | ((b1 & 0x3F) << 6) | (b2 & 0x3F)
    cp4 = (
        ((b & 0x07) << 18) | ((b1 & 0x3F) << 12) | ((b2 & 0x3F) << 6)
        | (b3 & 0x3F)
    )
    cp_at = jnp.where(
        b < 0x80, b,
        jnp.where(b < 0xE0, cp2, jnp.where(b < 0xF0, cp3, cp4)),
    )
    return jnp.clip(cp_at, 0, 0x10FFFF), lead


def utf8_decode_tiles(
    data: jnp.ndarray,       # (B, N) uint8 batched windows
    nbytes: jnp.ndarray,     # (B,) int32
    *,
    c_cap: int | None = None,
    tile_rows: int = 256,
    interpret: bool = False,
):
    """General UTF-8 decode with the codepoint compaction done by the
    TILED butterfly (compact_tiles_masked + degap_record) instead of one
    full-window kernel — every Pallas program stays at the (256, 128)
    tile / degap scale the ASCII flagship path already compiles on the
    live chip, removing the N ~ 2^20 Mosaic compile wedge that kept the
    non-ASCII path off the TPU in round 3 (VERDICT item 2).

    Returns (cp (B, C) int32 dense prefix, lead (B, N) bool, n_chars
    (B,), route) where ``route = (tile_takes, degap_takes, cnts,
    max_disp)`` records the exact byte->char routing for
    :func:`expand_starts_replay` (char->byte flag expansion by inverse
    replay — no scatters, no dynamic rolls)."""
    from .compact_pallas import (
        LANES, compact_tiles_masked, degap_record,
    )

    B, N = data.shape
    C = c_cap or N
    assert C % LANES == 0, C
    cp_at, lead = _utf8_codepoints_at_leads(data, nbytes)
    n_chars = jnp.sum(lead.astype(jnp.int32), axis=1)
    gapped, cnts, tile_takes = compact_tiles_masked(
        [cp_at], lead, out_cap=C, tile_rows=tile_rows,
        interpret=interpret,
    )
    (cp_d,), degap_takes = degap_record(
        list(gapped), cnts, p_rows=C // LANES, interpret=interpret,
    )
    live = jnp.arange(C, dtype=jnp.int32)[None, :] < n_chars[:, None]
    cp = jnp.where(live, cp_d.reshape(B, C), 0)
    return cp, lead, n_chars, (tile_takes, degap_takes, cnts)


def expand_starts_replay(
    starts_char: jnp.ndarray,  # (B, C) bool char-level piece-start flags
    lead: jnp.ndarray,         # (B, N) bool lead-byte mask
    route,                     # from utf8_decode_tiles
    *,
    tile_rows: int = 256,
    interpret: bool = False,
):
    """Char->byte piece-start flag expansion by exact inverse replay of
    the decode's recorded compaction: regap the dense char flags to the
    gapped per-tile layout (static-roll replay of the degap takes), then
    per-tile inverse replay of the tile takes with a dynamic-offset DMA.
    Byte j's flag = lead[j] & starts_char[rank(j)] — identical semantics
    to ops.compact_pallas.expand_by_mask, with every program at a
    proven-compiling shape."""
    from .compact_pallas import LANES, expand_tiles_replay, regap_replay

    tile_takes, degap_takes, cnts = route
    gapped_flags = regap_replay(
        starts_char.astype(jnp.int32), degap_takes,
        cnts.shape[1] * LANES, interpret=interpret,
    )
    flags_b = expand_tiles_replay(
        gapped_flags, lead, tile_takes, cnts,
        tile_rows=tile_rows, interpret=interpret,
    )
    return flags_b != 0


def starts_to_bytes(
    starts_char: jnp.ndarray,   # (N,) bool char-level piece-start flags
    char_of_byte: jnp.ndarray,  # (N,) int32 byte -> char index
    data: jnp.ndarray,          # (N,) uint8
    nbytes: jnp.ndarray,
) -> jnp.ndarray:
    """Byte-level start mask from char-level flags without a scatter:
    byte j starts a piece iff it is a lead byte and its char's flag is
    set. The gather uses monotone indices (char_of_byte)."""
    N = starts_char.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    valid = idx < nbytes
    is_lead = ((data.astype(jnp.int32) & 0xC0) != 0x80) & valid
    return starts_char[jnp.clip(char_of_byte, 0, N - 1)] & is_lead


def chain_starts(lens: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """starts[i] = True iff a match begins at char i (pointer doubling).

    lens (N,) int32 >= 1; m = number of valid chars.
    """
    N = lens.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    # jump targets clamped into [0, N]; sentinel slot N via size-(N+1) arrays
    jump = jnp.minimum(idx + jnp.maximum(lens, 1), N)
    jump = jnp.concatenate([jump, jnp.full((1,), N, jnp.int32)])
    mask = jnp.zeros((N + 1,), jnp.bool_).at[0].set(True)

    rounds = max(1, int(np.ceil(np.log2(max(2, N)))))

    def body(_, state):
        mask, jump = state
        hit = jnp.zeros((N + 1,), jnp.bool_).at[jump].max(mask)
        return mask | hit, jump[jump]

    mask, _ = jax.lax.fori_loop(0, rounds, body, (mask, jump))
    return mask[:N] & (idx < m)


# ===========================================================================
# Boundary-local piece starts (device port of scanner_ref.piece_starts)
# ===========================================================================
#
# Mirrors scanner_ref._piece_starts_llama statement-for-statement — the two
# must stay in lockstep (see CLAUDE.md). The numpy version's only
# device-hostile constructs are rewritten in kind:
#
#   * arbitrary gathers a[pos] (random HBM access, ~12 ms per 1M-from-1M on
#     a v5e) become forward-fill scans with the payload encoded into the
#     cummax key (_ffill_at_j, _ffill_bool_at_j);
#   * the sequential contraction-candidate walk becomes an exact 4-state
#     automaton whose per-position transition codes compose via a
#     precomputed 256x256 table and Hillis-Steele doubling — log2(N)
#     small-table gathers (13 us each on-chip), no data-dependent loop.
#
# Reverse scans (lax.cummin reverse=True) are ~30x slower than forward on
# this chip (376 us vs 13 us per 1M) but only ~10 are needed; everything
# else is forward scans, static shifts, and elementwise ops — the op set
# measured safe on this runtime (no lax.sort / associative_scan).


def _nextpos_m(mask: jnp.ndarray, idx: jnp.ndarray, m) -> jnp.ndarray:
    """p[i] = smallest j >= i with mask[j], else m (the valid length)."""
    return jax.lax.cummin(
        jnp.where(mask, idx, jnp.int32(m)), axis=0, reverse=True
    )


def _shr(a: jnp.ndarray, k: int, fill) -> jnp.ndarray:
    if k == 0:
        return a
    n = a.shape[0]
    if k >= n:
        return jnp.full_like(a, fill)
    return jnp.concatenate([jnp.full((k,), fill, a.dtype), a[: n - k]])


def _shl(a: jnp.ndarray, k: int, fill) -> jnp.ndarray:
    if k == 0:
        return a
    n = a.shape[0]
    if k >= n:
        return jnp.full_like(a, fill)
    return jnp.concatenate([a[k:], jnp.full((k,), fill, a.dtype)])


def _ffill_at_j(entry: jnp.ndarray, val: jnp.ndarray, N: int) -> jnp.ndarray:
    """scanner_ref._ffill_at: value of `val` at the latest entry position
    <= i, -1 if none. Payload rides the cummax key, split across as many
    parallel int32 scans as the bit budget requires (2 for N <= 2^20)."""
    idx_bits = max(1, int(np.ceil(np.log2(max(2, N)))))
    val_bits = idx_bits + 2          # val in [-1, N] stored as val+1
    lo_bits = 31 - idx_bits          # payload bits per scan
    parts = max(1, -(-val_bits // lo_bits))
    idx = jnp.arange(N, dtype=jnp.int32)
    vp = (val + 1).astype(jnp.int32)
    pieces = []
    for p in range(parts):
        chunk = (vp >> (p * lo_bits)) & ((1 << lo_bits) - 1)
        enc = jnp.where(entry, (idx << lo_bits) | chunk, -1)
        c = jax.lax.cummax(enc, axis=0)
        pieces.append(c)
    has = pieces[0] >= 0
    out = jnp.zeros((N,), jnp.int32)
    for p, c in enumerate(pieces):
        out = out | ((c & ((1 << lo_bits) - 1)) << (p * lo_bits))
    return jnp.where(has, out - 1, -1)


def _ffill_bool_at_j(sample: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """X at the latest position j <= i with sample[j], else False.
    Device form of scanner_ref's at(X, _prevpos(sample)) gathers."""
    idx = jnp.arange(sample.shape[0], dtype=jnp.int32)
    enc = jnp.where(sample, (idx << 1) | X.astype(jnp.int32), -1)
    c = jax.lax.cummax(enc, axis=0)
    return (c >= 0) & ((c & 1) == 1)


def _ct_chain_accept(
    ct2: jnp.ndarray, ct3: jnp.ndarray, exact2: jnp.ndarray,
    exact3: jnp.ndarray, N: int,
) -> jnp.ndarray:
    """Acceptance flags for the sequential candidate walk in
    scanner_ref._piece_starts_llama (a candidate starting exactly at the
    previous accepted candidate's suffix end is rejected).

    The walk keeps at most ONE pending suffix end, overwritten at every
    candidate — so rejection at b depends only on the immediately
    preceding candidate a: rej(b) = acc(a) & exact(a) & b == a + ln(a).
    A candidate strictly between a and a+ln(a) voids the link (it
    overwrites the pending end), and candidates are never adjacent
    (an apostrophe cannot follow a word-end apostrophe), so the link is a
    static-shift predicate. Maximal neighbor-linked runs then alternate
    accept/reject from their first member: parity of the candidate index
    relative to the latest chain start — one cumsum + one forward fill."""
    cand = ct2 | ct3
    # b linked from a=b-2 (ln 2) unless a candidate sits at b-1;
    # from a=b-3 (ln 3) unless one sits at b-1 or b-2
    link_in = cand & (
        (_shr(ct2 & exact2, 2, False) & ~_shr(cand, 1, False))
        | (
            _shr(ct3 & exact3, 3, False)
            & ~_shr(cand, 1, False)
            & ~_shr(cand, 2, False)
        )
    )
    cidx = jnp.cumsum(cand.astype(jnp.int32))
    chain_start = cand & ~link_in
    start_cidx = jax.lax.cummax(
        jnp.where(chain_start, cidx, -1), axis=0
    )
    rej = cand & (((cidx - start_cidx) & 1) == 1)
    return cand & ~rej


def piece_starts_jax(
    cp: jnp.ndarray,        # (N,) int32 codepoints (0-padded beyond m)
    m: jnp.ndarray,         # scalar int32: number of valid chars
    page_ids: jnp.ndarray,
    pages: jnp.ndarray,
    *,
    contractions: bool = True,
    profile: str | None = None,
) -> jnp.ndarray:
    """Piece-start flags, (N,) bool — scanner_ref.piece_starts on device."""
    if profile is None:
        profile = "llama4" if contractions else "nocontract"
    if profile == "cl100k":
        return _piece_starts_cl100k_jax(cp, m, page_ids, pages)
    if profile == "gpt2":
        return _piece_starts_gpt2_jax(cp, m, page_ids, pages)
    if profile not in ("llama4", "nocontract"):
        raise NotImplementedError(f"no boundary-local derivation for: {profile}")
    contractions = profile == "llama4"

    N = cp.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    valid = idx < m
    mI = m.astype(jnp.int32) if hasattr(m, "astype") else jnp.int32(m)

    cls = _cls_lookup(cp, page_ids, pages)
    ws = ((cls & WS) != 0) & valid
    rn = ((cls & RN) != 0) & valid
    let = ((cls & LETTER) != 0) & valid
    num = ((cls & NUM) != 0) & valid
    uc = ((cls & UC) != 0) & valid
    lc = ((cls & LC) != 0) & valid
    wd = uc | lc
    pu_re = ~(ws | let | num) & valid
    mark = pu_re & wd
    sp = (cp == ord(" ")) & valid
    apo = (cp == ord("'")) & valid
    rnsl = (rn | (cp == ord("/"))) & valid

    U = uc & ~lc
    L = lc & ~uc
    O = uc & lc

    def prev(mk, k=1):
        return _shr(mk, k, False)

    def nxt(mk, k=1):
        return _shl(mk, k, False)

    rnsl_start = _prevpos(~rnsl, idx) + 1
    mr_start = _prevpos(~mark, idx) + 1

    if contractions:
        cp1 = jnp.where(idx + 1 < m, _shl(cp, 1, jnp.int32(0)), 0)
        cp2 = jnp.where(idx + 2 < m, _shl(cp, 2, jnp.int32(0)), 0)
        fold_one = (
            _fold_is(cp1, _S) | _fold_is(cp1, _T) | _fold_is(cp1, _M)
            | _fold_is(cp1, _D)
        )
        fold_two = (
            (_fold_is(cp1, _R) & _fold_is(cp2, _E))
            | (_fold_is(cp1, _V) & _fold_is(cp2, _E))
            | (_fold_is(cp1, _L) & _fold_is(cp2, _L))
        )
    else:
        fold_one = jnp.zeros((N,), jnp.bool_)
        fold_two = jnp.zeros((N,), jnp.bool_)

    # region partition (classes are static across fixpoint rounds)
    K = jnp.where(ws, 0, jnp.where(num, 1, jnp.where(wd, 2, 3)))
    K = jnp.where(valid, K, 4).astype(jnp.int32)
    newreg = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), K[1:] != K[:-1]]
    )
    reg_start = _prevpos(newreg, idx)
    nxtreg = _nextpos_m(nxt(newreg), idx, mI)
    rend = jnp.where(nxtreg < mI, nxtreg + 1, mI)

    # ================= mutually-recursive core ============================
    ct2 = jnp.zeros((N,), jnp.bool_)
    ct3 = jnp.zeros((N,), jnp.bool_)
    n_rounds = 2 if contractions else 1
    for _round in range(n_rounds):
        PUx = pu_re & ~wd & ~(ct2 | ct3)
        purc = PUx | mark
        pur_start = _prevpos(~purc, idx) + 1
        bad = PUx & ~nxt(mark)
        nbad = _nextpos_m(bad, idx, mI)

        def a4_cover(bound_into, absorbed, *, PUx=PUx, purc=purc,
                     pur_start=pur_start, nbad=nbad):
            entry = purc & ((idx == pur_start) | (~absorbed & prev(absorbed)))
            start_cover = PUx & bound_into & (idx == pur_start)
            seedval = jnp.where(start_cover, idx, nbad)
            cover_from = _ffill_at_j(entry, seedval, N)
            covered = purc & (cover_from >= 0) & (idx >= cover_from)
            return covered, cover_from

        def absorption(a4_valid, *, purc=purc):
            t0 = rn & prev(a4_valid & purc)
            pt0 = _prevpos(t0, idx)
            return rnsl & (pt0 >= rnsl_start)

        def ws_rules(absorbed):
            ws_entry = ws & ~absorbed & (
                prev(~ws) | prev(absorbed) | (idx == 0)
            )
            nextrn_l = _nextpos_m(rn & ~absorbed, idx, mI)
            is_last_rn = rn & ~absorbed & (_shl(nextrn_l, 1, mI) >= rend)
            b_after_rn = ws & prev(is_last_rn)
            in_tail = ws & ~rn & ~absorbed & (nextrn_l >= rend)
            tail_start = in_tail & ~prev(in_tail)
            tail_start_pos = jnp.where(in_tail, _prevpos(tail_start, idx), -1)
            at_last = in_tail & (idx == rend - 1) & (rend < mI)
            eligible = at_last & ((nxt(wd) & ~rn) | (sp & nxt(pu_re)))
            b_ws_split = at_last & (tail_start_pos >= 0) & (
                idx > tail_start_pos
            )
            bound_into = prev(eligible)
            b_ws = (ws_entry | b_after_rn | b_ws_split) & ws
            return b_ws, bound_into

        absorbed = jnp.zeros((N,), jnp.bool_)
        for _ in range(4):
            a4_covered, cover_from = a4_cover(
                jnp.zeros((N,), jnp.bool_), absorbed
            )
            absorbed = absorption(a4_covered)
        _, bound_into0 = ws_rules(absorbed)
        for _ in range(4):
            a4_covered, cover_from = a4_cover(bound_into0, absorbed)
            absorbed = absorption(a4_covered)
        flow_marks = mark & _ffill_bool_at_j(
            ~mark, a4_covered & PUx & ~absorbed
        )
        b_ws, bound_into = ws_rules(absorbed)

        if not contractions:
            break
        # ---- contraction absorption ------------------------------------
        word_end_char = (wd & ~mark) | (
            mark & ~(flow_marks | (a4_covered & mark))
        )
        ct2 = apo & prev(word_end_char) & fold_one
        ct3 = apo & prev(word_end_char) & fold_two & ~fold_one
        exact2 = ~nxt(wd, 2)
        exact3 = ~nxt(wd, 3)
        accept = _ct_chain_accept(ct2, ct3, exact2, exact3, N)
        ct2 = ct2 & accept
        ct3 = ct3 & accept

    ct_any = ct2 | ct3
    absorbed_letters = prev(ct2) | prev(ct3) | prev(ct3, 2)
    forced_entry = wd & (prev(ct2, 2) | prev(ct3, 3)) & ~absorbed_letters

    # ================= boundary rules =====================================
    b_num = num & (((idx - reg_start) % 3) == 0)

    # absorbed letters end the preceding piece: the word rules' run
    # restarts after them (lockstep with scanner_ref)
    wd_start = _prevpos(~wd | absorbed_letters, idx) + 1
    pL = _prevpos(L, idx)
    pU = _prevpos(U, idx)
    nL = _nextpos_m(L, idx, mI)
    nO = _nextpos_m(O, idx, mI)
    wd_end = _nextpos_m(~wd, idx, mI)
    p_prev_L = _shr(pL, 1, jnp.int32(-1))
    p_prev_U = _shr(pU, 1, jnp.int32(-1))
    r1 = U & (p_prev_L > p_prev_U) & (p_prev_L >= wd_start)
    r2 = U & prev(O) & (nO >= wd_end) & (nL >= wd_end) & ~r1

    b_wd = (r1 | r2 | forced_entry) & ~absorbed_letters & ~flow_marks
    b_wd = b_wd | (wd & ~mark & prev(flow_marks))

    # ---- PU interior: alternation entries ----------------------------------
    PUx = pu_re & ~wd & ~ct_any
    purc = PUx | mark
    pur_alt = PUx & prev(mark) & (idx > pur_start) & (
        ~a4_covered | (idx == cover_from)
    )
    b_pu = pur_alt & ~absorbed

    # ---- assemble ------------------------------------------------------------
    base = b_ws | b_num | b_wd | b_pu
    base = base | (newreg & ~ws & ~purc & valid)
    base = base | (purc & (idx == pur_start))
    base = base | (purc & ~absorbed & prev(absorbed))

    sup = absorbed | flow_marks | absorbed_letters | bound_into | ct_any
    word_attached_mark = mark & _ffill_bool_at_j(~mark, wd & ~mark)
    sup = sup | (word_attached_mark & ~forced_entry)

    p1 = ~(rn | let | num) & valid
    base_start = jnp.where(
        ws, base & ~sup,
        jnp.where(num, base, jnp.where(purc & ~wd, base & ~sup, False)),
    ).astype(jnp.bool_)
    prefix_bind = wd & prev(base_start & p1 & ~wd & ~absorbed_letters)
    sup = sup | prefix_bind

    starts = base & ~sup & valid
    starts = starts.at[0].set(mI > 0)
    return starts


def _piece_starts_gpt2_jax(cp, m, page_ids, pages):
    """scanner_ref._piece_starts_gpt2 on device (see its docstring for
    the derivation). Scans + static shifts only."""
    N = cp.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    valid = idx < m

    cls = _cls_lookup(cp, page_ids, pages)
    ws = ((cls & WS) != 0) & valid
    let = ((cls & LETTER) != 0) & valid
    num = ((cls & NUM) != 0) & valid
    pu = ~(ws | let | num) & valid
    sp = (cp == ord(" ")) & valid
    apo = (cp == ord("'")) & valid

    def prev(mk, k=1):
        return _shr(mk, k, False)

    def nxt(mk, k=1):
        return _shl(mk, k, False)

    K = jnp.where(ws, 0, jnp.where(let, 1, jnp.where(num, 2, 3)))
    K = jnp.where(valid, K, 4).astype(jnp.int32)
    newreg = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), K[1:] != K[:-1]]
    )

    nonws_next = nxt(valid & ~ws)
    last_ws_mid = ws & nonws_next
    b_ws = (ws & newreg) | (last_ws_mid & prev(ws))
    bind_ws = last_ws_mid & sp

    cp1 = jnp.where(idx + 1 < m, _shl(cp, 1, jnp.int32(0)), 0)
    cp2 = jnp.where(idx + 2 < m, _shl(cp, 2, jnp.int32(0)), 0)
    one = (
        (cp1 == ord("s")) | (cp1 == ord("d")) | (cp1 == ord("m"))
        | (cp1 == ord("t"))
    )
    two = (
        ((cp1 == ord("l")) & (cp2 == ord("l")))
        | ((cp1 == ord("v")) & (cp2 == ord("e")))
        | ((cp1 == ord("r")) & (cp2 == ord("e")))
    )
    pu_start = pu & newreg
    ct_ok = apo & pu_start & ~prev(bind_ws)
    ct2 = ct_ok & one
    ct3 = ct_ok & two & ~one
    absorbed_letters = prev(ct2) | prev(ct3) | prev(ct3, 2)
    forced_entry = let & (prev(ct2, 2) | prev(ct3, 3))

    base = b_ws | (newreg & ~ws & valid) | forced_entry
    sup = (prev(bind_ws) & ~ws) | absorbed_letters
    starts = base & ~sup & valid
    starts = starts.at[0].set(m > 0)
    return starts


def _piece_starts_cl100k_jax(cp, m, page_ids, pages):
    """scanner_ref._piece_starts_cl100k on device (see its docstring for
    the derivation). Scans + static shifts only."""
    N = cp.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    valid = idx < m
    mI = m.astype(jnp.int32) if hasattr(m, "astype") else jnp.int32(m)

    cls = _cls_lookup(cp, page_ids, pages)
    ws = ((cls & WS) != 0) & valid
    rn = ((cls & RN) != 0) & valid
    let = ((cls & LETTER) != 0) & valid
    num = ((cls & NUM) != 0) & valid
    pu = ~(ws | let | num) & valid
    sp = (cp == ord(" ")) & valid
    apo = (cp == ord("'")) & valid

    def prev(mk, k=1):
        return _shr(mk, k, False)

    def nxt(mk, k=1):
        return _shl(mk, k, False)

    K = jnp.where(ws, 0, jnp.where(let, 1, jnp.where(num, 2, 3)))
    K = jnp.where(valid, K, 4).astype(jnp.int32)
    newreg = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), K[1:] != K[:-1]]
    )
    reg_start = _prevpos(newreg, idx)
    nxtreg = _nextpos_m(nxt(newreg), idx, mI)
    rend = jnp.where(nxtreg < mI, nxtreg + 1, mI)

    # C4 [\r\n]* tail absorption
    rn_seed = rn & ~prev(rn) & prev(pu)
    rn_start = _prevpos(~rn, idx) + 1
    seedpos = _prevpos(rn_seed, idx)
    absorbed = rn & (seedpos >= rn_start)

    # ws rules
    ws_entry = ws & ~absorbed & (prev(~ws) | prev(absorbed) | (idx == 0))
    nextrn_l = _nextpos_m(rn & ~absorbed, idx, mI)
    is_last_rn = rn & ~absorbed & (_shl(nextrn_l, 1, mI) >= rend)
    b_after_rn = ws & prev(is_last_rn)
    in_tail = ws & ~rn & ~absorbed & (nextrn_l >= rend)
    at_last = in_tail & (idx == rend - 1) & (rend < mI)
    eligible = at_last & (nxt(let) | (sp & nxt(pu)))
    b_ws_split = at_last & prev(in_tail)
    bound_into = prev(eligible)
    b_ws = ws_entry | b_after_rn | b_ws_split

    # contractions (case-insensitive fold)
    cp1 = jnp.where(idx + 1 < m, _shl(cp, 1, jnp.int32(0)), 0)
    cp2 = jnp.where(idx + 2 < m, _shl(cp, 2, jnp.int32(0)), 0)
    fold_one = (
        _fold_is(cp1, _S) | _fold_is(cp1, _T) | _fold_is(cp1, _M)
        | _fold_is(cp1, _D)
    )
    fold_two = (
        (_fold_is(cp1, _R) & _fold_is(cp2, _E))
        | (_fold_is(cp1, _V) & _fold_is(cp2, _E))
        | (_fold_is(cp1, _L) & _fold_is(cp2, _L))
    )
    pu_start = pu & newreg
    ct_ok = apo & pu_start & ~bound_into
    ct2 = ct_ok & fold_one
    ct3 = ct_ok & fold_two & ~fold_one
    ct_any = ct2 | ct3
    absorbed_letters = prev(ct2) | prev(ct3) | prev(ct3, 2)
    forced_entry = let & (prev(ct2, 2) | prev(ct3, 3)) & ~absorbed_letters

    bind_pu = pu_start & ~bound_into & ~ct_any & nxt(let)

    b_num = num & (((idx - reg_start) % 3) == 0)

    base = b_ws | b_num | (newreg & (let | pu)) | forced_entry
    sup = absorbed | absorbed_letters | bound_into | prev(bind_pu)
    starts = base & ~sup & valid
    starts = starts.at[0].set(m > 0)
    return starts


@jax.jit
def compact_pieces(starts, byte_of_char, nbytes):
    """Compact char-level start flags into piece (start, len) byte arrays."""
    N = starts.shape[0]
    pid = jnp.cumsum(starts.astype(jnp.int32)) - 1
    n_pieces = jnp.maximum(pid[-1] + 1, 0)
    tgt = jnp.where(starts, pid, N)
    start_b = jnp.full((N,), nbytes, jnp.int32).at[tgt].set(
        jnp.where(starts, byte_of_char, 0), mode="drop"
    )
    # piece end byte = start byte of next piece (or nbytes)
    end_b = jnp.concatenate([start_b[1:], jnp.full((1,), 0, jnp.int32)])
    end_b = jnp.where(jnp.arange(N) == n_pieces - 1, nbytes, end_b)
    piece_len = jnp.where(jnp.arange(N) < n_pieces, end_b - start_b, 0)
    return start_b, piece_len, n_pieces


# Stage-level jits: compiling the whole scan as one XLA module triggers a
# pathologically slow CPU-backend compile (minutes); the stages individually
# compile in ~1 s each and the extra dispatches are negligible vs the work.
_utf8_decode_j = jax.jit(utf8_decode, static_argnames=("use_pallas",))
_utf8_decode_ascii_j = jax.jit(utf8_decode_ascii)
_utf8_decode_sorted_j = jax.jit(utf8_decode_sorted)
_starts_to_bytes_j = jax.jit(starts_to_bytes)
_match_lengths_j = jax.jit(
    match_lengths_jax, static_argnames=("contractions", "profile")
)
_chain_starts_j = jax.jit(chain_starts)
_piece_starts_j = jax.jit(
    piece_starts_jax, static_argnames=("contractions", "profile")
)


def _piece_starts_bits_j(cp, m, page_ids, pages, *, contractions, profile):
    from .bitplane import piece_starts_bits

    global _piece_starts_bits_jit
    if _piece_starts_bits_jit is None:
        _piece_starts_bits_jit = jax.jit(
            piece_starts_bits,
            static_argnames=("contractions", "profile", "ascii_fast"),
        )
    return _piece_starts_bits_jit(
        cp, m, page_ids, pages, contractions=contractions, profile=profile
    )


_piece_starts_bits_jit = None


def scan_bytes(
    data: jnp.ndarray,      # (N,) uint8, 0-padded
    nbytes: jnp.ndarray,    # scalar int32
    page_ids: jnp.ndarray,  # (0x1100,) two-level class page table
    pages: jnp.ndarray,     # (n_pages, 256) uint8 class pages
    *,
    contractions: bool = True,
    profile: str | None = None,
    use_pallas: bool = False,
):
    """Full pretokenizer scan (staged jits, async dispatch). Returns
    (piece_start (N,) int32 byte offsets compacted & padded with nbytes,
     piece_len (N,) int32 byte lengths (0-padded),
     n_pieces scalar int32)."""
    cp, _, byte_of_char, m = _utf8_decode_j(
        data, nbytes, use_pallas=use_pallas
    )
    starts = compute_starts(
        cp, m, page_ids, pages, contractions=contractions, profile=profile
    )
    return compact_pieces(starts, byte_of_char, nbytes)


def compute_starts(
    cp: jnp.ndarray, m: jnp.ndarray, page_ids: jnp.ndarray,
    pages: jnp.ndarray, *, contractions: bool = True,
    profile: str | None = None,
) -> jnp.ndarray:
    """Char-level piece-start flags for any profile (staged jits).

    All four profiles use boundary-local derivations (scans and static
    shifts only — no pointer-chase, no large-array gathers); an unknown
    profile would fall back to match_lengths + pointer-doubling chain."""
    eff = profile or ("llama4" if contractions else "nocontract")
    if eff in ("llama4", "nocontract", "cl100k", "gpt2"):
        import jax

        if jax.default_backend() != "cpu":
            # bit-plane formulation (ops/bitplane.py): measured 1.3x the
            # char-per-element derivation on v5e even with the class-table
            # gather (ASCII fast paths go further; see docs/PERF.md). The
            # CPU backend keeps the char form: its compile time for the
            # ~10k-op bit graph dominates test runs.
            from .bitplane import piece_starts_bits

            return _piece_starts_bits_j(
                cp, m, page_ids, pages, contractions=contractions,
                profile=profile,
            )
        return _piece_starts_j(
            cp, m, page_ids, pages, contractions=contractions, profile=profile
        )
    lens = _match_lengths_j(
        cp, m, page_ids, pages, contractions=contractions, profile=profile
    )
    return _chain_starts_j(lens, m)
