r"""Bit-plane (32 chars/word) formulation of the piece-start derivation.

The boundary-local derivation (ops/pretokenize.piece_starts_jax, the
device port of scanner_ref._piece_starts_llama — the engines MUST stay in
lockstep, see CLAUDE.md) runs ~80 global scans over one int32 PER CHAR.
On a TPU VPU that wastes 31/32 of every vector lane: almost every scanned
quantity is a boolean, and the handful of positional quantities
(prevpos/nextpos/forward-fills) are only ever USED through boolean
predicates ("is there an X since the last Y", "am I the first Z of my
run"). This module re-expresses the entire derivation in boolean-run
algebra over **bit-packed words**:

  * layout: plane-major — word w's bit j is char ``j*C + w`` (C = N/32).
    Along the word axis, chars of one plane are consecutive, so a shift
    by k chars is a word shift by k with a (k-word, 1-bit) wraparound:
    ``prevk(x, k) = concat([x[C-k:] << 1, x[:-k]])`` — two ops total.
  * every scan becomes a first-order bitwise recurrence
    ``s[w] = (s[w-1] & a[w]) | b[w]`` run over all 32 planes at once:
    log2(C) doubling steps on (C,) uint32 words, one 5-step bit-level
    scan to chain plane carries, one apply (``_affine_fwd``). One scan
    costs ~90 word ops on N/32 words — a 32x density win over the
    char-per-element form, with no Pallas needed (pure jnp elementwise/
    shift/concat ops that XLA fuses).

Positional-to-boolean translations (proofs in the docstrings below):

  pt0 >= rnsl_start          -> seg_or_fwd(t0, reset=~rnsl)
  idx == pur_start           -> purc & ~prev1(purc)
  idx  > pur_start           -> purc & prev1(purc)
  cover_from semantics       -> sc_fill | bad-since-last-entry (seg ORs)
  idx == cover_from          -> (entry & start_cover) | first-bad-since
  nextrn_l >= rend           -> ~seg_or_rev(rn&~absorbed, reset=newreg)
  idx == rend-1 & rend < m   -> nxt1(newreg & valid)
  idx > tail_start_pos       -> prev1(in_tail)
  p_prev_L > p_prev_U
    & p_prev_L >= wd_start   -> prev1(seg_or_fwd(L, reset=U|runbreak))
  nO >= wd_end & nL >= wd_end -> ~seg_or_rev(O|L, reset=~wd)
  (idx - reg_start) % 3 == 0 -> stride-3 doubling from run starts
  _ct_chain_accept parity    -> prefix-XOR + parity at last chain start

Exactness: asserted equal to piece_starts_jax (itself fuzzed against the
scanner_ref/regex oracle) bit-for-bit in tests/test_bitplane.py.
Reference behavior: /root/reference/src/tiktoken/tiktoken.cpp:70-128.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..unicode_tables import LC, LETTER, NUM, RN, UC, WS

_U32 = jnp.uint32
_ALL1 = np.uint32(0xFFFFFFFF)


# ===========================================================================
# Packing
# ===========================================================================


def pack_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """(N,) bool -> (N/32,) uint32, plane-major: word w bit j = mask[j*C+w].
    N must be a multiple of 32."""
    n = mask.shape[0]
    assert n % 32 == 0, n
    c = n // 32
    rows = mask.reshape(32, c).astype(_U32)
    return jnp.sum(
        rows << jnp.arange(32, dtype=_U32)[:, None], axis=0, dtype=_U32
    )


def unpack_mask(w: jnp.ndarray) -> jnp.ndarray:
    """(C,) uint32 -> (32*C,) bool (plane-major inverse of pack_mask)."""
    bits = (w[None, :] >> jnp.arange(32, dtype=_U32)[:, None]) & _U32(1)
    return bits.astype(jnp.bool_).reshape(-1)


# ===========================================================================
# Word-space primitives. All take/return (C,) uint32; semantics are stated
# on the flat char stream x[i] (i = plane*C + word).
# ===========================================================================


# Tile mode: inside the Pallas kernel (piece_starts_bits_pallas) the word
# stream lives on an (R, 128) raster tile in VMEM — Mosaic cannot lower
# unaligned lane-axis slices/concats, so word shifts become cyclic rolls
# with a column fix-up. Toggled around the kernel body; the derivation and
# every primitive above it are shared verbatim between the two modes.
_TILE = False


def _nwords(x) -> int:
    return x.shape[-2] * x.shape[-1] if _TILE else x.shape[-1]


def _last_word(x):
    if _TILE:
        r, l = x.shape
        return x[r - 1, l - 1]  # static scalar extract (rank-0 splats OK)
    return x[..., -1]


def _first_word(x):
    if _TILE:
        return x[0, 0]
    return x[..., 0]


def _carry_expand(t):
    """Broadcastable plane-carry word: (1,1) in tile mode already
    broadcasts against (R, L); add the trailing axis otherwise."""
    return t if _TILE else jnp.expand_dims(t, -1)


def _word_iota(x):
    r, l = x.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (r, l), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (r, l), 1)
    return row * l + col


def _at0_like(x):
    if _TILE:
        return jnp.where(_word_iota(x) == 0, _U32(1), _U32(0))
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(iota == 0, _U32(1), _U32(0))


def _roll_raster(x, k: int):
    """Cyclic raster roll: out[w] = x[(w - k) mod n] on an (R, L) tile."""
    from jax.experimental.pallas import tpu as pltpu

    r, l = x.shape
    n = r * l
    k = k % n
    if k == 0:
        return x
    q, s = divmod(k, l)
    if s == 0:
        return pltpu.roll(x, q, 0)
    xl = pltpu.roll(x, s, 1)            # lanes: j <- j - s (cyclic)
    a = pltpu.roll(xl, q, 0)            # rows: i <- i - q
    b = pltpu.roll(xl, q + 1, 0)        # rows: i <- i - q - 1
    col = jax.lax.broadcasted_iota(jnp.int32, (r, l), 1)
    return jnp.where(col < s, b, a)


def _prevk_tile(x, k: int):
    c = _nwords(x)
    q, s = divmod(k, c)
    if q >= 32:
        return jnp.zeros_like(x)
    cyc = _roll_raster(x, s)
    if s == 0:
        return cyc << q if q else cyc
    w = _word_iota(x)
    return jnp.where(w < s, cyc << (q + 1), cyc << q)


def _nxtk_tile(x, k: int):
    c = _nwords(x)
    q, s = divmod(k, c)
    if q >= 32:
        return jnp.zeros_like(x)
    cyc = _roll_raster(x, c - s) if s else x
    if s == 0:
        return cyc >> q if q else cyc
    w = _word_iota(x)
    return jnp.where(w >= c - s, cyc >> (q + 1), cyc >> q)


def _shift_words_tile(x, k: int, fill, rev: bool):
    c = _nwords(x)
    if k >= c:
        return jnp.full_like(x, fill)
    cyc = _roll_raster(x, c - k if rev else k)
    w = _word_iota(x)
    cond = (w >= c - k) if rev else (w < k)
    return jnp.where(cond, jnp.full_like(x, fill), cyc)


def prevk(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """out[i] = x[i-k], False for i < k. Operates on the last axis."""
    if _TILE:
        return _prevk_tile(x, k)
    c = x.shape[-1]
    q, s = divmod(k, c)
    if q >= 32:
        return jnp.zeros_like(x)
    if s == 0:
        return x << q if q else x
    hi = x[..., c - s :] << (q + 1)  # words [0, s): plane below, q+1 up
    lo = x[..., : c - s] << q        # words [s, C)
    return jnp.concatenate([hi, lo], axis=-1)


def nxtk(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """out[i] = x[i+k], False for i >= N-k. Operates on the last axis."""
    if _TILE:
        return _nxtk_tile(x, k)
    c = x.shape[-1]
    q, s = divmod(k, c)
    if q >= 32:
        return jnp.zeros_like(x)
    if s == 0:
        return x >> q if q else x
    lo = x[..., s:] >> q             # words [0, C-s)
    hi = x[..., :s] >> (q + 1)       # words [C-s, C): plane above
    return jnp.concatenate([lo, hi], axis=-1)


def _shift_words(x, k, fill, *, rev):
    if _TILE:
        return _shift_words_tile(x, k, fill, rev)
    f = jnp.full(x.shape[:-1] + (k,), fill, x.dtype)
    return (
        jnp.concatenate([x[..., k:], f], axis=-1)
        if rev
        else jnp.concatenate([f, x[..., :-k]], axis=-1)
    )


def _affine_fwd(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """s[i] = (s[i-1] & a[i]) | b[i] over the char stream, s[-1] = 0.
    Composition ((s&a1)|b1 -> &a2|b2) is associative: a'=a1&a2,
    b'=(b1&a2)|b2 — log-doubling along words, then a 5-step bit-level
    scan chains the 32 plane carries."""
    c = a.shape[-1]
    A, B = a, b
    k = 1
    while k < c:
        A_sh = _shift_words(A, k, _ALL1, rev=False)
        B_sh = _shift_words(B, k, np.uint32(0), rev=False)
        B = (B_sh & A) | B
        A = A_sh & A
        k *= 2
    # bit j of (Aw,Bw): composition over plane j's full word range
    Aw, Bw = _last_word(A), _last_word(B)
    k = 1
    while k < 32:
        low1 = _U32(((1 << k) - 1))
        Aw, Bw = (Aw << k | low1) & Aw, ((Bw << k) & Aw) | Bw
        k *= 2
    # plane j's carry-in = plane j-1's final state (from s=0 at plane 0)
    t = _carry_expand(Bw << 1)
    return (t & A) | B


def _affine_rev(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """s[i] = (s[i+1] & a[i]) | b[i], s[N] = 0 (suffix mirror)."""
    c = _nwords(a)
    A, B = a, b
    k = 1
    while k < c:
        A_sh = _shift_words(A, k, _ALL1, rev=True)
        B_sh = _shift_words(B, k, np.uint32(0), rev=True)
        B = (B_sh & A) | B
        A = A_sh & A
        k *= 2
    Aw, Bw = _first_word(A), _first_word(B)
    k = 1
    while k < 32:
        top1 = _U32((((1 << k) - 1) << (32 - k)) & 0xFFFFFFFF)
        Aw, Bw = (Aw >> k | top1) & Aw, ((Bw >> k) & Aw) | Bw
        k *= 2
    t = _carry_expand(Bw >> 1)
    return (t & A) | B


def seg_or_fwd(x: jnp.ndarray, reset: jnp.ndarray) -> jnp.ndarray:
    """out[i] = OR of x[j] for j <= i with no reset at any t in (j, i].
    (A reset at i drops everything before i but keeps x[i].)"""
    return _affine_fwd(~reset, x)


def seg_or_rev(x: jnp.ndarray, reset: jnp.ndarray) -> jnp.ndarray:
    """out[i] = OR of x[j] for j >= i with no reset at any t in (i, j]."""
    return _affine_rev(~nxtk(reset, 1), x)


def or_scan_fwd(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix OR (cheaper than the affine form: a == ones)."""
    c = _nwords(x)
    B = x
    k = 1
    while k < c:
        B = B | _shift_words(B, k, np.uint32(0), rev=False)
        k *= 2
    t = _last_word(B)
    k = 1
    while k < 32:
        t = t | (t << k)
        k *= 2
    return B | _carry_expand(t << 1)


def xor_scan_fwd(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix XOR."""
    c = _nwords(x)
    B = x
    k = 1
    while k < c:
        B = B ^ _shift_words(B, k, np.uint32(0), rev=False)
        k *= 2
    t = _last_word(B)
    k = 1
    while k < 32:
        t = t ^ (t << k)
        k *= 2
    return B ^ _carry_expand(t << 1)


def ffill_bool(sample: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Value of x at the latest sample position <= i; False if none.
    (pretokenize._ffill_bool_at_j in word space: the last sample with x
    survives iff no later sample-without-x resets the segment.)"""
    return seg_or_fwd(sample & x, sample & ~x)


def stride_marks(seed: jnp.ndarray, carrier: jnp.ndarray, stride: int,
                 n: int) -> jnp.ndarray:
    """Positions reachable from a seed by repeated +stride steps where
    every char of each step span lies in ``carrier``. Implements
    ``carrier & ((idx - run_start) % stride == 0)`` for contiguous
    carrier runs seeded at their starts."""
    span = carrier
    for j in range(1, stride):
        span = span & prevk(carrier, j)   # span[i]: (i-stride, i] all carrier
    out = seed
    step = stride
    while step < n:
        out = out | (prevk(out, step) & span)
        span = span & prevk(span, step)
        step *= 2
    return out


# ===========================================================================
# Char-space mask construction (mirrors piece_starts_jax:664-719)
# ===========================================================================


_ASCII_RANGES: dict | None = None


def _ascii_class_ranges():
    """For each class bit, the ASCII (cp < 128) members as (lo, hi) ranges,
    derived from the authoritative class table — so the compare fast path
    is exact by construction."""
    global _ASCII_RANGES
    if _ASCII_RANGES is None:
        from ..unicode_tables import get_tables

        table, _ = get_tables()
        out = {}
        for name, bit in (("ws", WS), ("rn", RN), ("let", LETTER),
                          ("num", NUM), ("uc", UC), ("lc", LC)):
            members = [b for b in range(128) if table[b] & bit]
            ranges, i = [], 0
            while i < len(members):
                j = i
                while j + 1 < len(members) and members[j + 1] == members[j] + 1:
                    j += 1
                ranges.append((members[i], members[j]))
                i = j + 1
            out[name] = ranges
        _ASCII_RANGES = out
    return _ASCII_RANGES


def _cls_bit_ascii(cp, name):
    hit = jnp.zeros(cp.shape, jnp.bool_)
    for lo, hi in _ascii_class_ranges()[name]:
        hit = hit | ((cp >= lo) & (cp <= hi)) if lo != hi else (
            hit | (cp == lo)
        )
    return hit


# contraction fold-letter ids (index into scanner_ref._FOLD_ORDER:
# s t r e v m l d)
_S, _T, _R, _E, _V, _M, _L, _D = range(8)


# ===========================================================================
# Plane-space ASCII mask construction: bytes -> packed class words directly
# ===========================================================================
#
# The char-space ascii_fast path computes ~10 boolean masks with range
# compares on (N,) int32 and packs each with pack_mask (2N ops/mask). For
# all-ASCII windows the same masks are pure boolean functions of the 7 low
# BIT-PLANES of the byte: pack the byte's bit-planes ONCE (8 shift+sum
# passes) and evaluate every class with a handful of word ops on (N/32,)
# words — the whole mask stage drops from ~100N to ~30N elementwise ops.
# Exact by construction: member sets come from the same authoritative
# class table; equality with the char-space path is asserted in
# tests/test_bitplane.py.


def _ascii_class_members():
    """Member byte sets per class bit + fold-letter sets (ASCII only),
    from the authoritative tables. Cached."""
    global _ASCII_MEMBERS
    if _ASCII_MEMBERS is None:
        from ..scanner_ref import _FOLD_ORDER
        from ..unicode_tables import get_tables

        table, folds = get_tables()
        classes = {}
        for name, bit in (("ws", WS), ("rn", RN), ("let", LETTER),
                          ("num", NUM), ("uc", UC), ("lc", LC)):
            classes[name] = frozenset(
                b for b in range(128) if table[b] & bit
            )
        classes["sp"] = frozenset([ord(" ")])
        classes["apo"] = frozenset([ord("'")])
        classes["rnsl"] = classes["rn"] | {ord("/")}
        # fold sets: ASCII members only (ascii_fast guarantees cp < 128,
        # so non-ASCII fold codepoints like U+017F can never match)
        fold = {
            i: frozenset(c for c in folds[L].tolist() if c < 128)
            for i, L in enumerate(_FOLD_ORDER)
        }
        _ASCII_MEMBERS = (classes, fold)
    return _ASCII_MEMBERS


_ASCII_MEMBERS = None


def _pack_byte_planes(by: jnp.ndarray):
    """(N,) integer byte values -> 7 packed (N/32,) uint32 bit-planes in
    pack_mask layout (plane i word w bit p = bit i of byte[p*C + w]).
    Bit 7 is not produced: every *valid* byte is < 128 under the
    ascii_fast contract, and invalid tail bytes are masked by the caller
    via the valid words."""
    n = by.shape[0]
    assert n % 32 == 0, n
    c = n // 32
    rows = by.reshape(32, c).astype(_U32)
    sh = jnp.arange(32, dtype=_U32)[:, None]
    return [
        jnp.sum(((rows >> _U32(i)) & _U32(1)) << sh, axis=0, dtype=_U32)
        for i in range(7)
    ]


def _valid_words(m, c: int):
    """Packed validity plane for length m: bit p of word w = (p*C+w < m).
    Closed form — the count of valid planes at word w is ceil((m-w)/C),
    so the word is a low-bit run of that length. ~6 word ops total
    instead of a 2N pack."""
    w = jnp.arange(c, dtype=jnp.int32)
    t = jnp.clip((jnp.asarray(m, jnp.int32) - w + (c - 1)) // c, 0, 32)
    run = (_U32(1) << jnp.minimum(t, 31).astype(_U32)) - _U32(1)
    return jnp.where(t >= 32, _ALL1, run)


def _char_masks_planes(by, m, *, contractions: bool,
                       profile: str = "llama4"):
    """ascii_fast mask construction in plane space: returns the packed
    (C,) uint32 word dict (same keys/values as pack_mask over
    _char_masks(..., ascii_fast=True)). ``by`` is the raw byte window
    (uint8 or any int dtype); bytes at positions >= m may be arbitrary
    (they are masked via the validity plane). For profile="gpt2" the
    fold planes carry the CASE-SENSITIVE suffix predicate instead of the
    fold-table one."""
    n = by.shape[0]
    c = n // 32
    valid = _valid_words(m, c)
    # mask the positive planes with validity: every used member byte is
    # nonzero, so each minterm below carries at least one positive
    # literal and invalid chars can never match any class
    b = [p & valid for p in _pack_byte_planes(by)]
    nb = [~p for p in b[:4]]
    lo_eq = [
        (b[0] if v & 1 else nb[0]) & (b[1] if v & 2 else nb[1])
        & (b[2] if v & 4 else nb[2]) & (b[3] if v & 8 else nb[3])
        for v in range(16)
    ]
    nb4, nb5, nb6 = ~b[4], ~b[5], ~b[6]
    hi_eq = [
        (b[4] if h & 1 else nb4) & (b[5] if h & 2 else nb5)
        & (b[6] if h & 4 else nb6)
        for h in range(8)
    ]

    def members(mset):
        out = None
        for h in range(8):
            row = [v for v in range(16) if (h << 4) | v in mset]
            if not row:
                continue
            # h == 0 full-row would match invalid (all-zero) chars; no
            # current class needs it, keep the guard for safety
            if len(row) == 16 and h != 0:
                t = hi_eq[h]
            else:
                rr = lo_eq[row[0]]
                for v in row[1:]:
                    rr = rr | lo_eq[v]
                t = hi_eq[h] & rr
            out = t if out is None else (out | t)
        return out if out is not None else jnp.zeros_like(valid)

    classes, fold = _ascii_class_members()
    ws = members(classes["ws"])
    rn = members(classes["rn"])
    uc = members(classes["uc"])
    lc = members(classes["lc"])
    let = uc | lc
    num = members(classes["num"])
    sp = members(classes["sp"])
    apo = members(classes["apo"])
    rnsl = rn | members(classes["rnsl"] - classes["rn"])

    if profile == "gpt2":
        # case-sensitive ASCII suffix letters (no fold table)
        lit = {c: members(frozenset([ord(c)])) for c in "sdmtlver"}
        fold_one = nxtk(lit["s"] | lit["d"] | lit["m"] | lit["t"], 1)
        fold_two = (
            (nxtk(lit["l"], 1) & nxtk(lit["l"], 2))
            | (nxtk(lit["v"], 1) & nxtk(lit["e"], 2))
            | (nxtk(lit["r"], 1) & nxtk(lit["e"], 2))
        )
    elif contractions:
        f = {i: members(fold[i]) for i in range(8)}
        # fold_one[i] = char i+1 folds to s/t/m/d; fold_two[i] = chars
        # (i+1, i+2) fold to (r,e)/(v,e)/(l,l). nxtk fills with 0 and the
        # fold planes are validity-masked, so out-of-range chars never
        # match — same semantics as the char-space cp1/cp2 zero fill.
        fold_one = nxtk(f[_S] | f[_T] | f[_M] | f[_D], 1)
        fold_two = (nxtk(f[_R] | f[_V], 1) & nxtk(f[_E], 2)) | (
            nxtk(f[_L], 1) & nxtk(f[_L], 2)
        )
    else:
        fold_one = jnp.zeros_like(valid)
        fold_two = jnp.zeros_like(valid)
    return dict(
        valid=valid, ws=ws, rn=rn, let=let, num=num, uc=uc, lc=lc,
        sp=sp, apo=apo, rnsl=rnsl, fold1=fold_one, fold2=fold_two,
    )


def _char_masks(cp, m, page_ids, pages, *, contractions: bool,
                ascii_fast: bool = False, profile: str = "llama4",
                cls=None):
    from .pretokenize import _cls_lookup, _fold_is, _shl

    n = cp.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    valid = idx < m

    def _gpt2_suffix():
        # case-sensitive ASCII suffix letters (no fold table)
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
        return one, two

    if ascii_fast:
        # caller guarantees every codepoint < 128: class bits become a
        # handful of range compares (no table gather on the hot path)
        ws = _cls_bit_ascii(cp, "ws") & valid
        rn = _cls_bit_ascii(cp, "rn") & valid
        let = _cls_bit_ascii(cp, "let") & valid
        num = _cls_bit_ascii(cp, "num") & valid
        uc = _cls_bit_ascii(cp, "uc") & valid
        lc = _cls_bit_ascii(cp, "lc") & valid
        sp = (cp == ord(" ")) & valid
        apo = (cp == ord("'")) & valid
        rnsl = (rn | (cp == ord("/"))) & valid
        if profile == "gpt2":
            fold_one, fold_two = _gpt2_suffix()
        elif contractions:
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
            fold_one = jnp.zeros((n,), jnp.bool_)
            fold_two = jnp.zeros((n,), jnp.bool_)
        return dict(
            valid=valid, ws=ws, rn=rn, let=let, num=num, uc=uc, lc=lc,
            sp=sp, apo=apo, rnsl=rnsl, fold1=fold_one, fold2=fold_two,
        )
    if cls is None:
        cls = _cls_lookup(cp, page_ids, pages)
    ws = ((cls & WS) != 0) & valid
    rn = ((cls & RN) != 0) & valid
    let = ((cls & LETTER) != 0) & valid
    num = ((cls & NUM) != 0) & valid
    uc = ((cls & UC) != 0) & valid
    lc = ((cls & LC) != 0) & valid
    sp = (cp == ord(" ")) & valid
    apo = (cp == ord("'")) & valid
    rnsl = (rn | (cp == ord("/"))) & valid

    if profile == "gpt2":
        fold_one, fold_two = _gpt2_suffix()
    elif contractions:
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
        fold_one = jnp.zeros((n,), jnp.bool_)
        fold_two = jnp.zeros((n,), jnp.bool_)
    return dict(
        valid=valid, ws=ws, rn=rn, let=let, num=num, uc=uc, lc=lc,
        sp=sp, apo=apo, rnsl=rnsl, fold1=fold_one, fold2=fold_two,
    )


# ===========================================================================
# The derivation in word space
# ===========================================================================


MASK_ORDER = (
    "valid", "ws", "rn", "let", "num", "uc", "lc", "sp", "apo", "rnsl",
    "fold1", "fold2",
)


def derive_starts_words(
    P: dict, *, contractions: bool, n_total: int,
    profile: str | None = None,
) -> jnp.ndarray:
    """Word-space derivation: packed masks -> packed start flags.
    Shape-agnostic over leading axes (last axis = words); runs unchanged
    under jit, vmap, and inside a Pallas kernel body. Dispatches on
    profile: o200k family (llama4/nocontract) below, cl100k/gpt2 in
    their own word-space derivations."""
    if profile == "cl100k":
        return _derive_cl100k_words(P, n_total=n_total)
    if profile == "gpt2":
        return _derive_gpt2_words(P, n_total=n_total)
    valid, ws, rn, let, num = P["valid"], P["ws"], P["rn"], P["let"], P["num"]
    uc, lc, sp, apo, rnsl = P["uc"], P["lc"], P["sp"], P["apo"], P["rnsl"]
    fold1, fold2 = P["fold1"], P["fold2"]

    wd = uc | lc
    pu_re = ~(ws | let | num) & valid
    mark = pu_re & wd
    U = uc & ~lc
    L = lc & ~uc
    O = uc & lc
    at0 = _at0_like(valid)

    def prev1(x):
        return prevk(x, 1)

    def nxt1(x):
        return nxtk(x, 1)

    # region partition: newreg[i] = class(i) != class(i-1), True at 0
    # (piece_starts_jax:712-716; categories in priority order ws/num/wd/
    # other/invalid)
    k0 = ws
    k1 = num & ~ws
    k2 = wd & ~ws & ~num
    k3 = valid & ~ws & ~num & ~wd
    k4 = ~valid
    same = (
        (k0 & prev1(k0)) | (k1 & prev1(k1)) | (k2 & prev1(k2))
        | (k3 & prev1(k3)) | (k4 & prev1(k4))
    )
    newreg = ~same  # char 0: all prev1 False -> newreg set

    def a4_cover_b(bound_into, absorbed, PUx, purc, bad):
        """a4_cover (piece_starts_jax:732-739) in run algebra.
        covered[i] = purc & entry-exists & (last entry was start_cover
        | bad seen in [last_entry, i]); eq_cover[i] = idx == cover_from."""
        run_start = purc & ~prev1(purc)       # idx == pur_start
        entry = purc & (run_start | (~absorbed & prev1(absorbed)))
        start_cover = PUx & bound_into & run_start
        sc_fill = ffill_bool(entry, start_cover)
        bad_since = seg_or_fwd(bad, entry)
        hasentry = or_scan_fwd(entry)
        covered = purc & hasentry & (sc_fill | bad_since)
        first_bad_since = bad & (entry | ~prev1(bad_since))
        eq_cover = (entry & start_cover) | (
            hasentry & ~sc_fill & first_bad_since
        )
        return covered, eq_cover

    def absorption_b(a4_valid, purc):
        """absorption (:741-744): pt0 >= rnsl_start <=> a t0 inside the
        current rnsl run (resets at ~rnsl cut older runs)."""
        t0 = rn & prev1(a4_valid & purc)
        return rnsl & seg_or_fwd(t0, ~rnsl)

    def ws_rules_b(absorbed):
        """ws_rules (:746-763). nextrn_l/rend/tail_start_pos comparisons
        become segmented ORs over the region partition."""
        ws_entry = ws & ~absorbed & (prev1(~ws) | prev1(absorbed) | at0)
        x = rn & ~absorbed
        e_x = seg_or_rev(x, newreg)           # an x at j>=i in i's region
        exists_later = nxt1(e_x) & ~nxt1(newreg)
        is_last_rn = x & ~exists_later
        in_tail = ws & ~rn & ~absorbed & ~e_x
        b_after_rn = ws & prev1(is_last_rn)
        at_last = in_tail & nxt1(newreg & valid)  # idx==rend-1 & rend<m
        eligible = at_last & ((nxt1(wd) & ~rn) | (sp & nxt1(pu_re)))
        b_ws_split = at_last & prev1(in_tail)  # idx > tail_start_pos
        bound_into = prev1(eligible)
        b_ws = (ws_entry | b_after_rn | b_ws_split) & ws
        return b_ws, bound_into

    # ================= mutually-recursive core (:721-792) =================
    zero = jnp.zeros_like(valid)
    ct2 = zero
    ct3 = zero
    n_rounds = 2 if contractions else 1
    for _round in range(n_rounds):
        PUx = pu_re & ~wd & ~(ct2 | ct3)
        purc = PUx | mark
        bad = PUx & ~nxt1(mark)

        absorbed = zero
        for _ in range(4):
            a4_covered, eq_cover = a4_cover_b(zero, absorbed, PUx, purc, bad)
            absorbed = absorption_b(a4_covered, purc)
        _, bound_into0 = ws_rules_b(absorbed)
        for _ in range(4):
            a4_covered, eq_cover = a4_cover_b(
                bound_into0, absorbed, PUx, purc, bad
            )
            absorbed = absorption_b(a4_covered, purc)
        flow_marks = mark & ffill_bool(~mark, a4_covered & PUx & ~absorbed)
        b_ws, bound_into = ws_rules_b(absorbed)

        if not contractions:
            break
        # ---- contraction absorption (:783-792) ---------------------------
        word_end_char = (wd & ~mark) | (
            mark & ~(flow_marks | (a4_covered & mark))
        )
        pwe = prev1(word_end_char)
        ct2 = apo & pwe & fold1
        ct3 = apo & pwe & fold2 & ~fold1
        exact2 = ~nxtk(wd, 2)
        exact3 = ~nxtk(wd, 3)
        # _ct_chain_accept (:610-644): parity of candidate count since the
        # latest chain start — prefix XOR + boolean fill
        cand = ct2 | ct3
        link_in = cand & (
            (prevk(ct2 & exact2, 2) & ~prev1(cand))
            | (prevk(ct3 & exact3, 3) & ~prev1(cand) & ~prevk(cand, 2))
        )
        par = xor_scan_fwd(cand)
        chain_start = cand & ~link_in
        par_at_start = ffill_bool(chain_start, par)
        rej = cand & (par ^ par_at_start)
        ct2 = ct2 & ~rej
        ct3 = ct3 & ~rej

    purc_loop = purc  # loop-scoped purc: pur_start below is NOT recomputed

    ct_any = ct2 | ct3
    absorbed_letters = prev1(ct2) | prev1(ct3) | prevk(ct3, 2)
    forced_entry = wd & (prevk(ct2, 2) | prevk(ct3, 3)) & ~absorbed_letters

    # ================= boundary rules (:798-844) ==========================
    b_num = num & stride_marks(num & newreg, num, 3, n_total)

    # word rules: r1 needs "an L in [wd_start, i-1] after the last U";
    # r2 needs "no O/L from i to the wd-run end" (breaks at ~wd only).
    # An L that IS a break (an absorbed contraction letter) sits below
    # wd_start in the positional form, so it must not seed the scan
    # (seg resets only sever strictly-later positions).
    brk_w = ~wd | absorbed_letters
    l_after_u = seg_or_fwd(L & ~absorbed_letters, U | brk_w)
    r1 = U & prev1(l_after_u)
    r2 = U & prev1(O) & ~seg_or_rev(O | L, ~wd) & ~r1

    b_wd = (r1 | r2 | forced_entry) & ~absorbed_letters & ~flow_marks
    b_wd = b_wd | (wd & ~mark & prev1(flow_marks))

    # ---- PU interior: alternation entries (:817-823) ---------------------
    PUx_f = pu_re & ~wd & ~ct_any
    purc_f = PUx_f | mark
    in_run_past_start = purc_loop & prev1(purc_loop)  # idx > pur_start
    pur_alt = PUx_f & prev1(mark) & in_run_past_start & (
        ~a4_covered | eq_cover
    )
    b_pu = pur_alt & ~absorbed

    # ---- assemble (:825-844) ---------------------------------------------
    run_start_loop = purc_loop & ~prev1(purc_loop)    # idx == pur_start
    base = b_ws | b_num | b_wd | b_pu
    base = base | (newreg & ~ws & ~purc_f & valid)
    base = base | (purc_f & run_start_loop)
    base = base | (purc_f & ~absorbed & prev1(absorbed))

    sup = absorbed | flow_marks | absorbed_letters | bound_into | ct_any
    wam = mark & ffill_bool(~mark, wd & ~mark)
    sup = sup | (wam & ~forced_entry)

    p1 = ~(rn | let | num) & valid
    ns = base & ~sup
    base_start = (
        (ws & ns) | (~ws & num & base) | (~ws & ~num & purc_f & ~wd & ns)
    )
    prefix_bind = wd & prev1(base_start & p1 & ~wd & ~absorbed_letters)
    sup = sup | prefix_bind

    starts = base & ~sup & valid
    # char 0: start iff m > 0 == valid bit 0 of word 0
    starts = (starts & ~at0) | (valid & at0)
    return starts


def _derive_gpt2_words(P: dict, *, n_total: int) -> jnp.ndarray:
    """Word-space port of scanner_ref._piece_starts_gpt2 (see its
    docstring for the derivation). P["fold1"]/P["fold2"] carry the
    CASE-SENSITIVE suffix predicates for this profile."""
    valid, ws, let, num = P["valid"], P["ws"], P["let"], P["num"]
    sp, apo, fold1, fold2 = P["sp"], P["apo"], P["fold1"], P["fold2"]
    pu = ~(ws | let | num) & valid
    at0 = _at0_like(valid)

    def prev1(x):
        return prevk(x, 1)

    def nxt1(x):
        return nxtk(x, 1)

    inv = ~valid
    same = (
        (ws & prev1(ws)) | (let & prev1(let)) | (num & prev1(num))
        | (pu & prev1(pu)) | (inv & prev1(inv))
    )
    newreg = ~same

    nonws_next = nxt1(valid & ~ws)
    last_ws_mid = ws & nonws_next
    b_ws = (ws & newreg) | (last_ws_mid & prev1(ws))
    bind_ws = last_ws_mid & sp

    pu_start = pu & newreg
    ct_ok = apo & pu_start & ~prev1(bind_ws)
    ct2 = ct_ok & fold1
    ct3 = ct_ok & fold2 & ~fold1
    absorbed_letters = prev1(ct2) | prev1(ct3) | prevk(ct3, 2)
    forced_entry = let & (prevk(ct2, 2) | prevk(ct3, 3))

    base = b_ws | (newreg & ~ws & valid) | forced_entry
    sup = (prev1(bind_ws) & ~ws) | absorbed_letters
    starts = base & ~sup & valid
    return (starts & ~at0) | (valid & at0)


def _derive_cl100k_words(P: dict, *, n_total: int) -> jnp.ndarray:
    """Word-space port of scanner_ref._piece_starts_cl100k (see its
    docstring for the derivation)."""
    valid, ws, rn, let, num = P["valid"], P["ws"], P["rn"], P["let"], P["num"]
    sp, apo, fold1, fold2 = P["sp"], P["apo"], P["fold1"], P["fold2"]
    pu = ~(ws | let | num) & valid
    at0 = _at0_like(valid)

    def prev1(x):
        return prevk(x, 1)

    def nxt1(x):
        return nxtk(x, 1)

    inv = ~valid
    same = (
        (ws & prev1(ws)) | (let & prev1(let)) | (num & prev1(num))
        | (pu & prev1(pu)) | (inv & prev1(inv))
    )
    newreg = ~same

    b_num = num & stride_marks(num & newreg, num, 3, n_total)

    # C4 [\r\n]* tail absorption: rn-runs directly after punct
    rn_seed = rn & ~prev1(rn) & prev1(pu)
    absorbed = rn & seg_or_fwd(rn_seed, ~rn)

    # ws rules (cf. ws_rules_b in the o200k derivation; rnsl -> rn,
    # wd -> let)
    ws_entry = ws & ~absorbed & (prev1(~ws) | prev1(absorbed) | at0)
    x = rn & ~absorbed
    e_x = seg_or_rev(x, newreg)
    exists_later = nxt1(e_x) & ~nxt1(newreg)
    is_last_rn = x & ~exists_later
    b_after_rn = ws & prev1(is_last_rn)
    in_tail = ws & ~rn & ~absorbed & ~e_x
    at_last = in_tail & nxt1(newreg & valid)
    eligible = at_last & (nxt1(let) | (sp & nxt1(pu)))
    b_ws_split = at_last & prev1(in_tail)
    bound_into = prev1(eligible)
    b_ws = ws_entry | b_after_rn | b_ws_split

    pu_start = pu & newreg
    ct_ok = apo & pu_start & ~bound_into
    ct2 = ct_ok & fold1
    ct3 = ct_ok & fold2 & ~fold1
    ct_any = ct2 | ct3
    absorbed_letters = prev1(ct2) | prev1(ct3) | prevk(ct3, 2)
    forced_entry = let & (prevk(ct2, 2) | prevk(ct3, 3)) & ~absorbed_letters

    bind_pu = pu_start & ~bound_into & ~ct_any & nxt1(let)

    base = b_ws | b_num | (newreg & (let | pu)) | forced_entry
    sup = absorbed | absorbed_letters | bound_into | prev1(bind_pu)
    starts = base & ~sup & valid
    return (starts & ~at0) | (valid & at0)


_BITS_PROFILES = ("llama4", "nocontract", "cl100k", "gpt2")


def class_lookup_hot(
    cp: jnp.ndarray,        # (B, C) int32 codepoints (0-padded beyond m)
    m: jnp.ndarray,         # (B,) int32 valid char counts
    page_ids: jnp.ndarray,
    pages: jnp.ndarray,
    *,
    hot_cps: tuple,         # static: codepoints classified by compare
    u_cap: int,             # static: slots for the compacted unknowns
    tile_rows: int = 256,
    interpret: bool = False,
):
    """Batched class lookup with hot-codepoint pre-classification.

    The general path's class row gather pays the chip's gather issue
    rate per SLOT (~491 Mrows/s regardless of table size — docs/PERF.md)
    and is ~93% of the emoji arm's starts stage. Real corpora
    concentrate: the reference emoji fixture's top-32 codepoints cover
    69% of chars. Chars matching a (host-chosen, trace-baked) hot set
    are classified by full-lane compares (~free, class constants from
    the authoritative table); only the remaining chars ride the gather,
    compacted to a dense ``u_cap`` prefix by the recorded-route tiled
    butterfly and distributed back by exact inverse replay. Measured on
    v5e (tools/probe_cls5.py, 8 x 393216 slots, 69% hot): 8.79 ms
    production gather -> 4.18 ms, bit-identical output.

    Requires C % (32 * tile_rows * 128 / 32) == 0 (the tile constraint:
    C % 32768 with the default tile_rows) and ``u_cap`` >= the actual
    unknown-char count (callers size it host-side from the staged
    windows, like the tight piece capacity). Returns (cls (B, C) int32,
    overflow (B,) bool) — overflow set means u_cap was too small and the
    classes of the truncated chars are garbage: the caller must discard
    the window (exact fallback), never the ids.
    """
    from ..unicode_tables import get_tables
    from .compact_pallas import (
        LANES, compact_tiles_masked, degap_record, expand_tiles_replay,
        regap_replay,
    )
    from .pretokenize import _cls_lookup

    table, _ = get_tables()
    B, C = cp.shape
    idx = jnp.arange(C, dtype=jnp.int32)[None, :]
    valid = idx < m[:, None]
    hot = jnp.zeros(cp.shape, jnp.bool_)
    cls_hot = jnp.zeros(cp.shape, jnp.int32)
    for v in hot_cps:
        is_v = cp == int(v)
        hot = hot | is_v
        cls_hot = jnp.where(is_v, int(table[int(v)]), cls_hot)
    unknown = valid & ~hot
    gapped, cnts, tile_takes = compact_tiles_masked(
        [cp], unknown, out_cap=u_cap, tile_rows=tile_rows,
        interpret=interpret,
    )
    (cp_u,), degap_takes = degap_record(
        list(gapped), cnts, p_rows=u_cap // LANES, interpret=interpret,
    )
    cls_u = _cls_lookup(cp_u.reshape(B, u_cap), page_ids, pages)
    gapped_cls = regap_replay(
        cls_u, degap_takes, cnts.shape[1] * LANES, interpret=interpret,
    )
    cls_back = expand_tiles_replay(
        gapped_cls, unknown, tile_takes, cnts, tile_rows=tile_rows,
        interpret=interpret,
    )
    overflow = jnp.sum(cnts, axis=1) > u_cap
    return jnp.where(hot, cls_hot, cls_back), overflow


def piece_starts_bits(
    cp: jnp.ndarray,        # (N,) int32 codepoints (0-padded beyond m)
    m: jnp.ndarray,         # scalar int32 valid length
    page_ids: jnp.ndarray,
    pages: jnp.ndarray,
    *,
    contractions: bool = True,
    profile: str | None = None,
    ascii_fast: bool = False,
) -> jnp.ndarray:
    """Bit-plane piece_starts: identical output to piece_starts_jax.
    ascii_fast: caller guarantees cp < 128 everywhere (class bits from
    range compares instead of the two-level table gather)."""
    if profile is None:
        profile = "llama4" if contractions else "nocontract"
    if profile not in _BITS_PROFILES:
        raise NotImplementedError(profile)
    contractions = profile != "nocontract"

    n = cp.shape[0]
    n32 = -(-n // 32) * 32
    if n32 != n:
        cp = jnp.concatenate([cp, jnp.zeros((n32 - n,), cp.dtype)])

    if ascii_fast:
        P = _char_masks_planes(cp, m, contractions=contractions,
                               profile=profile)
    else:
        mk = _char_masks(cp, m, page_ids, pages, contractions=contractions,
                         ascii_fast=ascii_fast, profile=profile)
        P = {k: pack_mask(v) for k, v in mk.items()}
    starts = derive_starts_words(P, contractions=contractions, n_total=n32,
                                 profile=profile)
    out = unpack_mask(starts)
    return out[:n] if n32 != n else out


def piece_starts_bits_pallas(
    cp: jnp.ndarray,        # (B, N) or (N,) int32 codepoints
    m: jnp.ndarray,         # (B,) or scalar int32 valid lengths
    page_ids: jnp.ndarray,
    pages: jnp.ndarray,
    *,
    contractions: bool = True,
    profile: str | None = None,
    interpret: bool = False,
    ascii_fast: bool = False,
    packed_out: bool = False,
    hot_cps: tuple | None = None,
    u_cap: int | None = None,
):
    """derive_starts_words as ONE Pallas kernel per window batch: the ~95
    word scans run entirely in VMEM (12 x C-word inputs ~ 1.5 MB), so no
    intermediate ever round-trips HBM. Mask construction + packing stay in
    XLA (elementwise + small reduces). Same output as piece_starts_bits.

    packed_out: return the start flags as (B, C) uint32 plane-major words
    (pack_mask layout) instead of unpacking to (B, N) bool — consumers
    that understand the plane layout (compact_tiles with packed=True)
    skip the 8 MB/window unpack/repack round-trip entirely.

    hot_cps/u_cap: route the class lookup through
    :func:`class_lookup_hot` (hot-codepoint compare pre-classification +
    compacted gather — halves the general path's dominant cost on
    concentrated corpora). Requires batched input, not ascii_fast, and
    N % 32768 == 0. Changes the return to ``(starts, cls_overflow)``
    where cls_overflow (B,) flags windows whose unknown-char count blew
    u_cap (their flags are garbage: caller must fall back exactly)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if profile is None:
        profile = "llama4" if contractions else "nocontract"
    if profile not in _BITS_PROFILES:
        raise NotImplementedError(profile)
    contractions = profile != "nocontract"

    squeeze = cp.ndim == 1
    if squeeze:
        cp = cp[None, :]
    B, n = cp.shape
    assert n % (32 * 128) == 0, n  # C must be lane-aligned for the tile
    c = n // 32
    lanes = 128
    rows = c // lanes
    m_arr = jnp.broadcast_to(jnp.asarray(m, jnp.int32).reshape(-1), (B,))

    cls_ovf = None
    if ascii_fast:
        # plane-space construction: bytes -> packed words directly (the
        # char-space compare+pack form costs ~1.0 ms per 8 MB on v5e vs
        # ~0.3 ms for this; tools/sweep_starts.py). cp may be the raw
        # uint8 window — garbage tail bytes are masked by the validity
        # plane inside.
        def pack_all(cp_row, m_row):
            d = _char_masks_planes(cp_row, m_row, contractions=contractions,
                                   profile=profile)
            return tuple(d[k] for k in MASK_ORDER)

        packed = jax.vmap(pack_all)(cp, m_arr)  # tuple of (B, C) uint32
    elif hot_cps is not None:
        assert u_cap is not None
        cls2d, cls_ovf = class_lookup_hot(
            cp, m_arr, page_ids, pages, hot_cps=tuple(hot_cps),
            u_cap=u_cap, interpret=interpret,
        )

        def pack_all_cls(cp_row, m_row, cls_row):
            mk = _char_masks(
                cp_row, m_row, page_ids, pages, contractions=contractions,
                ascii_fast=False, profile=profile, cls=cls_row,
            )
            return tuple(pack_mask(mk[k]) for k in MASK_ORDER)

        packed = jax.vmap(pack_all_cls)(cp, m_arr, cls2d)
    else:
        def pack_all(cp_row, m_row):
            mk = _char_masks(
                cp_row, m_row, page_ids, pages, contractions=contractions,
                ascii_fast=ascii_fast, profile=profile,
            )
            return tuple(pack_mask(mk[k]) for k in MASK_ORDER)

        packed = jax.vmap(pack_all)(cp, m_arr)  # tuple of (B, C) uint32
    tiles = [p.reshape(B, rows, lanes) for p in packed]

    def kern(*refs):
        in_refs = refs[:-1]
        out_ref = refs[-1]
        P = {k: r[0] for k, r in zip(MASK_ORDER, in_refs)}
        global _TILE
        _TILE = True
        try:
            out = derive_starts_words(
                P, contractions=contractions, n_total=n, profile=profile
            )
        finally:
            _TILE = False
        out_ref[0] = out

    spec = pl.BlockSpec((1, rows, lanes), lambda b: (b, 0, 0))
    starts_w = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[spec] * len(MASK_ORDER),
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, rows, lanes), _U32),
        interpret=interpret,
    )(*tiles)
    if packed_out:
        w = starts_w.reshape(B, c)
        out = w[0] if squeeze else w
    else:
        out = jax.vmap(unpack_mask)(starts_w.reshape(B, c))
        out = out[0] if squeeze else out
    if cls_ovf is not None:
        return out, cls_ovf
    return out
