r"""Pallas sweep implementation of the boundary-local piece-start scan.

Port of ops/pretokenize.piece_starts_jax (itself the device port of
scanner_ref._piece_starts_llama — the three MUST stay in lockstep, see
CLAUDE.md) restructured as ~13 blockwise sweeps over (B, N) char streams.

Why: as separate XLA kernels the derivation's ~77 global scans cost
~25 ms per 1 MB window on v5e (each scan materializes its operands in
HBM); a Pallas sweep runs a global scan in ~0.03 ms/MB and *chained*
scans share the pass (tools in results/probe_prims*.py). The
transformation is pure scheduling:

* every group of forward-chained scans — including each entire
  4-iteration a4_cover/absorption fixpoint — runs in ONE sweep: each
  grid step loads a (R, 128) tile into VMEM, computes all quantities
  block-locally (ops/sweep.py raster scans), and threads scalar carries
  through SMEM scratch;
* reverse quantities (_nextpos_m) get mirrored sweeps with a reversed
  grid index map;
* every ``nxt(...)`` the derivation uses is either of a STATIC mask
  (precomputed by XLA into the packed feature word, `pack_feat`) or of
  a same-pass reverse-scan output (threaded through the carry chain) —
  so no halo blocks are needed anywhere.

Exactness strategy: the pass bodies below are written once and executed
in two modes — full-array jnp (`piece_starts_jnp_passes`, the
verification twin) and Pallas tiles (`piece_starts_sweep`). The jnp twin
is asserted equal to piece_starts_jax; the Pallas path is asserted equal
to the twin (tests/test_sweep_starts.py), and the fuzz corpus covers
both. Reference behavior: /root/reference/src/tiktoken/tiktoken.cpp:70-128.
"""

from __future__ import annotations

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from ..unicode_tables import LC, LETTER, NUM, RN, UC, WS
from .sweep import (
    I32_MAX,
    I32_MIN,
    LANES,
    raster_scan,
    reverse_raster_scan,
    shift_bwd,
    shift_fwd,
)

# contraction fold-letter ids (match scanner_ref._FOLD_ORDER)
_S, _T, _R, _E, _V, _M, _L, _D = range(8)

# ---- packed feature bits (pack_feat) --------------------------------------
F_WS = 1 << 0
F_RN = 1 << 1
F_LET = 1 << 2
F_NUM = 1 << 3
F_UC = 1 << 4
F_LC = 1 << 5
F_SP = 1 << 6
F_APO = 1 << 7
F_RNSL = 1 << 8
F_FOLD1 = 1 << 9
F_FOLD2 = 1 << 10
F_NEWREG = 1 << 11
F_NXTNEWREG = 1 << 12
F_NXTMARK1 = 1 << 13
F_NXTWD1 = 1 << 14
F_NXTWD2 = 1 << 15
F_NXTWD3 = 1 << 16
F_NXTPU1 = 1 << 17

N_CARRY = 96  # SMEM scalar-carry slots per pass (max used: Fa/Fb ~60)


def _fold_cps():
    from ..scanner_ref import _FOLD_ORDER
    from ..unicode_tables import get_tables

    _, folds = get_tables()
    return {i: folds[L] for i, L in enumerate(_FOLD_ORDER)}


_FOLD_CPS: dict | None = None


def _fold_is(cp, letter_id):
    global _FOLD_CPS
    if _FOLD_CPS is None:
        _FOLD_CPS = _fold_cps()
    hit = jnp.zeros(cp.shape, jnp.bool_)
    for c in _FOLD_CPS[letter_id].tolist():
        hit = hit | (cp == c)
    return hit


def _shl(a, k, fill):
    n = a.shape[0]
    if k == 0:
        return a
    if k >= n:
        return jnp.full_like(a, fill)
    return jnp.concatenate([a[k:], jnp.full((k,), fill, a.dtype)])


def pack_feat(cp, m, page_ids, pages, *, contractions: bool = True):
    """XLA precompute: one int32 feature word per char. Mirrors the mask
    construction of piece_starts_jax statement-for-statement (including
    validity masking); all static ``nxt`` shifts are baked in as bits."""
    N = cp.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    valid = idx < m

    from .pretokenize import _cls_lookup

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

    K = jnp.where(ws, 0, jnp.where(num, 1, jnp.where(wd, 2, 3)))
    K = jnp.where(valid, K, 4).astype(jnp.int32)
    newreg = jnp.concatenate([jnp.ones((1,), jnp.bool_), K[1:] != K[:-1]])

    def b(mask, bit):
        return mask.astype(jnp.int32) * bit

    feat = (
        b(ws, F_WS) | b(rn, F_RN) | b(let, F_LET) | b(num, F_NUM)
        | b(uc, F_UC) | b(lc, F_LC) | b(sp, F_SP) | b(apo, F_APO)
        | b(rnsl, F_RNSL) | b(fold_one, F_FOLD1) | b(fold_two, F_FOLD2)
        | b(newreg, F_NEWREG)
        | b(_shl(newreg, 1, False), F_NXTNEWREG)
        | b(_shl(mark, 1, False), F_NXTMARK1)
        | b(_shl(wd, 1, False), F_NXTWD1)
        | b(_shl(wd, 2, False), F_NXTWD2)
        | b(_shl(wd, 3, False), F_NXTWD3)
        | b(_shl(pu_re, 1, False), F_NXTPU1)
    )
    return feat


def _masks(ctx, f):
    """Unpack the feature word into the standard mask set (all already
    validity-masked at pack time)."""
    def g(bit):
        return (f & bit) != 0

    ws = g(F_WS)
    rn = g(F_RN)
    let = g(F_LET)
    num = g(F_NUM)
    uc = g(F_UC)
    lc = g(F_LC)
    wd = uc | lc
    pu_re = ~(ws | let | num) & ctx.valid
    return SimpleNamespace(
        ws=ws, rn=rn, let=let, num=num, uc=uc, lc=lc, wd=wd,
        pu_re=pu_re, mark=pu_re & wd, sp=g(F_SP), apo=g(F_APO),
        rnsl=g(F_RNSL), fold1=g(F_FOLD1), fold2=g(F_FOLD2),
        newreg=g(F_NEWREG), nxtnewreg=g(F_NXTNEWREG),
        nxtmark1=g(F_NXTMARK1), nxtwd1=g(F_NXTWD1), nxtwd2=g(F_NXTWD2),
        nxtwd3=g(F_NXTWD3), nxtpu1=g(F_NXTPU1),
    )


def _pack_bits(*bools):
    out = bools[0].astype(jnp.int32)
    for i, x in enumerate(bools[1:], start=1):
        out = out | (x.astype(jnp.int32) << i)
    return out


def _bit(word, i):
    return ((word >> i) & 1) != 0


# ===========================================================================
# Scalar-carry plumbing (SMEM in Pallas; no-op in jnp mode)
# ===========================================================================


class Carries:
    """Deterministically-indexed scalar carry slots in SMEM scratch.

    Every pass executes the same op sequence per grid step, so slot
    allocation by call order is stable. ``fresh`` is True on the first
    grid step of each batch row (carries reset to their inits)."""

    def __init__(self, ref, fresh):
        self.ref = ref
        self.fresh = fresh
        self.n = 0

    def begin(self, init):
        """Returns (carried value for this tile, slot id)."""
        i = self.n
        self.n += 1
        cur = jnp.where(
            self.fresh, jnp.asarray(init, jnp.int32), self.ref[i]
        )
        return cur, i

    def end(self, slot, new_val):
        self.ref[slot] = jnp.asarray(new_val, jnp.int32)

    def step(self, init, new_val):
        cur, i = self.begin(init)
        self.end(i, new_val)
        return cur


class PallasCtx:
    """Tile-level scan/shift context (one (R, 128) tile per grid step)."""

    is_tile = True

    def __init__(self, carries: Carries, gidx, m, reverse: bool):
        self.c = carries
        self.gidx = gidx          # (R, 128) int32 global char index
        self.m = m                # scalar int32 valid length
        self.reverse = reverse
        self.valid = gidx < m

    # ---- shifts ----------------------------------------------------------
    def prev(self, x, k: int = 1, fill: int = 0):
        """Raster shift +k (out[i] = x[i-k]); forward passes only."""
        assert not self.reverse
        out = x.astype(jnp.int32)
        R, L = out.shape
        for _ in range(k):
            prev_last = self.c.step(fill, out[R - 1, L - 1])
            out = shift_fwd(out, prev_last)
        return (out != 0) if x.dtype == jnp.bool_ else out

    def nxt_carry(self, x, k: int = 1, fill=0):
        """Raster shift -k (out[i] = x[i+k]); reverse passes only."""
        assert self.reverse
        out = x.astype(jnp.int32)
        for _ in range(k):
            nxt_first = self.c.step(fill, out[0, 0])
            out = shift_bwd(out, nxt_first)
        return (out != 0) if x.dtype == jnp.bool_ else out

    # ---- scans -----------------------------------------------------------
    def cummax(self, x, init=I32_MIN):
        assert not self.reverse
        carry, slot = self.c.begin(init)
        out = raster_scan(x.astype(jnp.int32), "max", carry)
        R, L = out.shape
        self.c.end(slot, out[R - 1, L - 1])
        return out

    def cumsum(self, x):
        assert not self.reverse
        carry, slot = self.c.begin(0)
        out = raster_scan(x.astype(jnp.int32), "add", carry)
        R, L = out.shape
        self.c.end(slot, out[R - 1, L - 1])
        return out

    def cummin_rev(self, x, init=I32_MAX):
        assert self.reverse
        carry, slot = self.c.begin(init)
        out = reverse_raster_scan(x.astype(jnp.int32), "min", carry)
        self.c.end(slot, out[0, 0])
        return out

    # ---- derived ---------------------------------------------------------
    def prevpos(self, mask):
        """largest j <= i with mask[j], else -1 (lax.cummax form)."""
        return self.cummax(jnp.where(mask, self.gidx, -1), init=-1)

    def nextpos_m(self, mask):
        """smallest j >= i with mask[j], else m (_nextpos_m form)."""
        return jnp.minimum(
            self.cummin_rev(jnp.where(mask, self.gidx, I32_MAX)),
            self.m,
        )

    def ffill_at(self, entry, val, n_total: int):
        """pretokenize._ffill_at_j: payload rides the cummax key, split
        across parallel scans by the bit budget."""
        idx_bits = max(1, int(np.ceil(np.log2(max(2, n_total)))))
        val_bits = idx_bits + 2
        lo_bits = 31 - idx_bits
        parts = max(1, -(-val_bits // lo_bits))
        vp = (val + 1).astype(jnp.int32)
        pieces = []
        for p in range(parts):
            chunk = (vp >> (p * lo_bits)) & ((1 << lo_bits) - 1)
            enc = jnp.where(entry, (self.gidx << lo_bits) | chunk, -1)
            pieces.append(self.cummax(enc, init=-1))
        has = pieces[0] >= 0
        out = jnp.zeros_like(vp)
        for p, cpc in enumerate(pieces):
            out = out | ((cpc & ((1 << lo_bits) - 1)) << (p * lo_bits))
        return jnp.where(has, out - 1, -1)

    def ffill_bool_at(self, sample, X):
        """pretokenize._ffill_bool_at_j."""
        enc = jnp.where(sample, (self.gidx << 1) | X.astype(jnp.int32), -1)
        cme = self.cummax(enc, init=-1)
        return (cme >= 0) & ((cme & 1) == 1)


class JnpCtx:
    """Full-array twin of PallasCtx (verification mode). Same API; global
    scans via lax; both directions usable from one object."""

    is_tile = False

    def __init__(self, n: int, m):
        self.gidx = jnp.arange(n, dtype=jnp.int32)
        self.m = jnp.asarray(m, jnp.int32)
        self.reverse = False  # accepts both directions
        self.valid = self.gidx < self.m
        self._n = n

    def prev(self, x, k: int = 1, fill: int = 0):
        out = x.astype(jnp.int32)
        n = out.shape[0]
        fillv = jnp.asarray(fill, jnp.int32)
        kk = min(k, n)
        out = jnp.concatenate(
            [jnp.full((kk,), fillv, jnp.int32), out[: n - kk]]
        )
        return (out != 0) if x.dtype == jnp.bool_ else out

    def nxt_carry(self, x, k: int = 1, fill=0):
        out = x.astype(jnp.int32)
        n = out.shape[0]
        fillv = jnp.asarray(fill, jnp.int32)
        kk = min(k, n)
        out = jnp.concatenate([out[kk:], jnp.full((kk,), fillv, jnp.int32)])
        return (out != 0) if x.dtype == jnp.bool_ else out

    def cummax(self, x, init=I32_MIN):
        return jnp.maximum(
            jax.lax.cummax(x.astype(jnp.int32), axis=0),
            jnp.asarray(init, jnp.int32),
        )

    def cumsum(self, x):
        return jnp.cumsum(x.astype(jnp.int32))

    def cummin_rev(self, x, init=I32_MAX):
        return jnp.minimum(
            jax.lax.cummin(x.astype(jnp.int32), axis=0, reverse=True),
            jnp.asarray(init, jnp.int32),
        )

    prevpos = PallasCtx.prevpos
    nextpos_m = PallasCtx.nextpos_m
    ffill_at = PallasCtx.ffill_at
    ffill_bool_at = PallasCtx.ffill_bool_at


# ===========================================================================
# Pass bodies — shared verbatim between jnp and Pallas modes.
# Each takes (ctx, int32 arrays...) and returns int32 arrays.
# ===========================================================================


def body_R0(ctx, f):
    """Static reverse quantities + round-0 nbad. Outputs:
    rend, nL, nO, wd_end, nbad0 (all int32)."""
    M = _masks(ctx, f)
    nxtreg = ctx.nextpos_m(M.nxtnewreg)
    rend = jnp.where(nxtreg < ctx.m, nxtreg + 1, ctx.m)
    L_ = M.lc & ~M.uc
    O = M.uc & M.lc
    nL = ctx.nextpos_m(L_)
    nO = ctx.nextpos_m(O)
    wd_end = ctx.nextpos_m(~M.wd)
    PUx = M.pu_re & ~M.wd  # ct == 0 in round 0
    bad = PUx & ~M.nxtmark1
    nbad0 = ctx.nextpos_m(bad)
    return rend, nL, nO, wd_end, nbad0


def body_Rd(ctx, f, ct):
    """nbad for the next round (PUx excludes this round's contractions)."""
    M = _masks(ctx, f)
    ct_any = _bit(ct, 0) | _bit(ct, 1)
    PUx = M.pu_re & ~M.wd & ~ct_any
    bad = PUx & ~M.nxtmark1
    return ctx.nextpos_m(bad)


def _fixpoint(ctx, M, ct2, ct3, nbad, bound_into, absorbed, n_total):
    """One 4-iteration a4_cover/absorption fixpoint (lockstep with
    piece_starts_jax's loops). All scans forward-chained: one sweep."""
    PUx = M.pu_re & ~M.wd & ~(ct2 | ct3)
    purc = PUx | M.mark
    pur_start = ctx.prevpos(~purc) + 1
    rnsl_start = ctx.prevpos(~M.rnsl) + 1
    a4_covered = jnp.zeros_like(PUx)
    cover_from = jnp.full_like(ctx.gidx, -1)
    for _ in range(4):
        entry = purc & (
            (ctx.gidx == pur_start) | (~absorbed & ctx.prev(absorbed))
        )
        start_cover = PUx & bound_into & (ctx.gidx == pur_start)
        seedval = jnp.where(start_cover, ctx.gidx, nbad)
        cover_from = ctx.ffill_at(entry, seedval, n_total)
        a4_covered = purc & (cover_from >= 0) & (ctx.gidx >= cover_from)
        t0 = M.rn & ctx.prev(a4_covered & purc)
        pt0 = ctx.prevpos(t0)
        absorbed = M.rnsl & (pt0 >= rnsl_start)
    return absorbed, a4_covered, cover_from, PUx


def body_Fa(ctx, f, ct, nbad, *, n_total: int):
    """Fixpoint 1 (bound_into = 0). Output: absorbed (bit 0)."""
    M = _masks(ctx, f)
    ct2, ct3 = _bit(ct, 0), _bit(ct, 1)
    zero = jnp.zeros_like(M.ws)
    absorbed, _, _, _ = _fixpoint(ctx, M, ct2, ct3, nbad, zero, zero, n_total)
    return _pack_bits(absorbed)


def body_Fb(ctx, f, ct, nbad, abs1, elig1, *, n_total: int):
    """Fixpoint 2 (bound_into = prev(eligible1)) + flow_marks.
    Outputs: misc bits (absorbed, a4_covered, flow_marks), cover_from."""
    M = _masks(ctx, f)
    ct2, ct3 = _bit(ct, 0), _bit(ct, 1)
    bound_into = ctx.prev(_bit(elig1, 0))
    absorbed = _bit(abs1, 0)
    absorbed, a4_covered, cover_from, PUx = _fixpoint(
        ctx, M, ct2, ct3, nbad, bound_into, absorbed, n_total
    )
    flow_marks = M.mark & ctx.ffill_bool_at(
        ~M.mark, a4_covered & PUx & ~absorbed
    )
    return _pack_bits(absorbed, a4_covered, flow_marks), cover_from


def body_Rws(ctx, f, absw, rend):
    """ws_rules reverse parts given `absorbed` (bit 0 of absw). Outputs
    bits: eligible, is_last_rn, in_tail, at_last."""
    M = _masks(ctx, f)
    absorbed = _bit(absw, 0)
    nextrn_l = ctx.nextpos_m(M.rn & ~absorbed)
    nextrn_l_sh = ctx.nxt_carry(nextrn_l, fill=ctx.m)
    is_last_rn = M.rn & ~absorbed & (nextrn_l_sh >= rend)
    in_tail = M.ws & ~M.rn & ~absorbed & (nextrn_l >= rend)
    at_last = in_tail & (ctx.gidx == rend - 1) & (rend < ctx.m)
    eligible = at_last & ((M.nxtwd1 & ~M.rn) | (M.sp & M.nxtpu1))
    return _pack_bits(eligible, is_last_rn, in_tail, at_last)


def body_Fc(ctx, f, misc, ws2, *, contractions: bool):
    """ws_rules forward parts + contraction candidates/acceptance.
    Outputs: ct bits (ct2, ct3), bws bits (b_ws, bound_into)."""
    M = _masks(ctx, f)
    absorbed = _bit(misc, 0)
    a4_covered = _bit(misc, 1)
    flow_marks = _bit(misc, 2)
    eligible = _bit(ws2, 0)
    is_last_rn = _bit(ws2, 1)
    in_tail = _bit(ws2, 2)
    at_last = _bit(ws2, 3)

    ws_entry = M.ws & ~absorbed & (
        ctx.prev(~M.ws) | ctx.prev(absorbed) | (ctx.gidx == 0)
    )
    b_after_rn = M.ws & ctx.prev(is_last_rn)
    tail_start = in_tail & ~ctx.prev(in_tail)
    tail_start_pos = jnp.where(in_tail, ctx.prevpos(tail_start), -1)
    b_ws_split = at_last & (tail_start_pos >= 0) & (
        ctx.gidx > tail_start_pos
    )
    bound_into = ctx.prev(eligible)
    b_ws = (ws_entry | b_after_rn | b_ws_split) & M.ws
    bws = _pack_bits(b_ws, bound_into)

    if not contractions:
        return jnp.zeros_like(f), bws

    word_end_char = (M.wd & ~M.mark) | (
        M.mark & ~(flow_marks | (a4_covered & M.mark))
    )
    pwe = ctx.prev(word_end_char)
    ct2 = M.apo & pwe & M.fold1
    ct3 = M.apo & pwe & M.fold2 & ~M.fold1
    exact2 = ~M.nxtwd2
    exact3 = ~M.nxtwd3
    # chain acceptance (pretokenize._ct_chain_accept)
    cand = ct2 | ct3
    c1 = ctx.prev(cand)
    c2 = ctx.prev(c1)
    s2 = ctx.prev(ctx.prev(ct2 & exact2))
    s3 = ctx.prev(ctx.prev(ctx.prev(ct3 & exact3)))
    link_in = cand & ((s2 & ~c1) | (s3 & ~c1 & ~c2))
    cidx = ctx.cumsum(cand)
    chain_start = cand & ~link_in
    start_cidx = ctx.cummax(jnp.where(chain_start, cidx, -1), init=-1)
    rej = cand & (((cidx - start_cidx) & 1) == 1)
    accept = cand & ~rej
    ct2 = ct2 & accept
    ct3 = ct3 & accept
    return _pack_bits(ct2, ct3), bws


def body_F4(ctx, f, ct_loop, ct_fin, misc, bws, cover2, nL, nO, wd_end):
    """Final assembly. ``ct_loop`` is the ct the LAST round's fixpoint saw
    (ct after round 0 for llama4; zeros for nocontract) — the loop-scoped
    pur_start in piece_starts_jax is NOT recomputed with the final ct.
    Output: starts bits (bit 0)."""
    M = _masks(ctx, f)
    ct2, ct3 = _bit(ct_fin, 0), _bit(ct_fin, 1)
    ct2l, ct3l = _bit(ct_loop, 0), _bit(ct_loop, 1)
    absorbed = _bit(misc, 0)
    a4_covered = _bit(misc, 1)
    flow_marks = _bit(misc, 2)
    b_ws = _bit(bws, 0)
    bound_into = _bit(bws, 1)

    # loop-scoped pur_start (from the final round's purc)
    PUx_loop = M.pu_re & ~M.wd & ~(ct2l | ct3l)
    purc_loop = PUx_loop | M.mark
    pur_start = ctx.prevpos(~purc_loop) + 1

    ct_any = ct2 | ct3
    p_ct3_1 = ctx.prev(ct3)
    p_ct3_2 = ctx.prev(p_ct3_1)
    p_ct2_1 = ctx.prev(ct2)
    absorbed_letters = p_ct2_1 | p_ct3_1 | p_ct3_2
    p_ct2_2 = ctx.prev(p_ct2_1)
    p_ct3_3 = ctx.prev(p_ct3_2)
    forced_entry = M.wd & (p_ct2_2 | p_ct3_3) & ~absorbed_letters

    reg_start = ctx.prevpos(M.newreg)
    b_num = M.num & (((ctx.gidx - reg_start) % 3) == 0)

    wd_start = ctx.prevpos(~M.wd | absorbed_letters) + 1
    U = M.uc & ~M.lc
    L_ = M.lc & ~M.uc
    O = M.uc & M.lc
    pL = ctx.prevpos(L_)
    pU = ctx.prevpos(U)
    p_prev_L = ctx.prev(pL, fill=-1)
    p_prev_U = ctx.prev(pU, fill=-1)
    r1 = U & (p_prev_L > p_prev_U) & (p_prev_L >= wd_start)
    r2 = U & ctx.prev(O) & (nO >= wd_end) & (nL >= wd_end) & ~r1

    b_wd = (r1 | r2 | forced_entry) & ~absorbed_letters & ~flow_marks
    b_wd = b_wd | (M.wd & ~M.mark & ctx.prev(flow_marks))

    PUx = M.pu_re & ~M.wd & ~ct_any
    purc = PUx | M.mark
    pur_alt = PUx & ctx.prev(M.mark) & (ctx.gidx > pur_start) & (
        ~a4_covered | (ctx.gidx == cover2)
    )
    b_pu = pur_alt & ~absorbed

    base = b_ws | b_num | b_wd | b_pu
    base = base | (M.newreg & ~M.ws & ~purc & ctx.valid)
    base = base | (purc & (ctx.gidx == pur_start))
    base = base | (purc & ~absorbed & ctx.prev(absorbed))

    sup = absorbed | flow_marks | absorbed_letters | bound_into | ct_any
    wam = M.mark & ctx.ffill_bool_at(~M.mark, M.wd & ~M.mark)
    sup = sup | (wam & ~forced_entry)

    p1 = ~(M.rn | M.let | M.num) & ctx.valid
    # bitwise form of the nested where (Mosaic cannot select_n on bool
    # vectors: i8->i1 truncation is unsupported on v5e)
    ns = base & ~sup
    base_start = (
        (M.ws & ns)
        | (~M.ws & M.num & base)
        | (~M.ws & ~M.num & purc & ~M.wd & ns)
    )
    prefix_bind = M.wd & ctx.prev(
        base_start & p1 & ~M.wd & ~absorbed_letters
    )
    sup = sup | prefix_bind

    starts = base & ~sup & ctx.valid
    at0 = ctx.gidx == 0
    starts = (at0 & (ctx.m > 0)) | (~at0 & starts)
    return _pack_bits(starts)


# ===========================================================================
# Orchestrators
# ===========================================================================


def _run_rounds(run_fwd, run_rev, feat, n_total, contractions):
    """Shared pass schedule. run_fwd/run_rev(body, ins, n_out, **kw) run
    one sweep and return its output arrays."""
    rend, nL, nO, wd_end, nbad = run_rev(body_R0, [feat], 5)
    ct = jnp.zeros_like(feat)
    ct_loop = ct
    n_rounds = 2 if contractions else 1
    for r in range(n_rounds):
        ct_loop = ct
        (abs1,) = run_fwd(body_Fa, [feat, ct, nbad], 1, n_total=n_total)
        (elig1,) = run_rev(body_Rws, [feat, abs1, rend], 1)
        misc, cover2 = run_fwd(
            body_Fb, [feat, ct, nbad, abs1, elig1], 2, n_total=n_total
        )
        (ws2,) = run_rev(body_Rws, [feat, misc, rend], 1)
        ct, bws = run_fwd(
            body_Fc, [feat, misc, ws2], 2, contractions=contractions
        )
        if contractions and r == 0:
            (nbad,) = run_rev(body_Rd, [feat, ct], 1)
    (starts,) = run_fwd(
        body_F4, [feat, ct_loop, ct, misc, bws, cover2, nL, nO, wd_end], 1
    )
    return _bit(starts, 0)


def piece_starts_jnp_passes(
    cp, m, page_ids, pages, *, contractions: bool = True,
    profile: str | None = None,
):
    """Verification twin: the pass decomposition on full arrays with lax
    scans. Must equal pretokenize.piece_starts_jax bit-for-bit."""
    if profile is None:
        profile = "llama4" if contractions else "nocontract"
    if profile not in ("llama4", "nocontract"):
        raise NotImplementedError(profile)
    contractions = profile == "llama4"
    N = cp.shape[0]
    feat = pack_feat(cp, m, page_ids, pages, contractions=contractions)
    ctx = JnpCtx(N, m)

    def run(body, ins, n_out, **kw):
        out = body(ctx, *ins, **kw)
        return out if isinstance(out, tuple) else (out,)

    return _run_rounds(run, run, feat, N, contractions)


# ---------------------------------------------------------------------------
# Pallas driver
# ---------------------------------------------------------------------------


def _sweep_pass(body, ins, n_out, m_arr, *, reverse, R, interpret, **kw):
    """Run one pass over (B, N) int32 arrays as a Pallas sweep."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N = ins[0].shape
    blk = R * LANES
    assert N % blk == 0, (N, blk)
    G = N // blk
    n_in = len(ins)

    def kern(*refs):
        m_ref = refs[0]
        in_refs = refs[1 : 1 + n_in]
        out_refs = refs[1 + n_in : 1 + n_in + n_out]
        carry = refs[-1]
        g = pl.program_id(1)
        gblk = (G - 1 - g) if reverse else g
        base = gblk * blk
        row = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
        gidx = base + row * LANES + col
        ctx = PallasCtx(
            Carries(carry, g == 0), gidx, m_ref[pl.program_id(0)], reverse
        )
        outs = body(ctx, *[r[0] for r in in_refs], **kw)
        if not isinstance(outs, tuple):
            outs = (outs,)
        for oref, o in zip(out_refs, outs):
            oref[0] = o.astype(jnp.int32)

    def idx(b, g):
        return (b, (G - 1 - g) if reverse else g, 0)

    tile = pl.BlockSpec((1, R, LANES), idx)
    out = pl.pallas_call(
        kern,
        grid=(B, G),
        in_specs=[
            # whole (B,) lengths array in SMEM: real-TPU lowering requires
            # rank-1 blocks to cover the array (block (1,) is rejected);
            # the kernel indexes it with program_id(0)
            pl.BlockSpec(
                (B,), lambda b, g: (0,), memory_space=pltpu.SMEM
            )
        ]
        + [tile] * n_in,
        out_specs=[tile] * n_out,
        out_shape=[
            jax.ShapeDtypeStruct((B, G * R, LANES), jnp.int32)
        ] * n_out,
        scratch_shapes=[pltpu.SMEM((N_CARRY,), jnp.int32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
    )(m_arr, *[x.reshape(B, G * R, LANES) for x in ins])
    return tuple(o.reshape(B, N) for o in out)


def piece_starts_sweep(
    cp, m, page_ids, pages, *, contractions: bool = True,
    profile: str | None = None, R: int = 256, interpret: bool = False,
):
    """Pallas-sweep piece_starts. cp: (N,) or (B, N) int32 codepoints;
    m: scalar or (B,) valid lengths. Returns bool starts, same shape."""
    if profile is None:
        profile = "llama4" if contractions else "nocontract"
    if profile not in ("llama4", "nocontract"):
        raise NotImplementedError(profile)
    contractions = profile == "llama4"

    squeeze = cp.ndim == 1
    if squeeze:
        cp = cp[None, :]
    B, N = cp.shape
    m_arr = jnp.broadcast_to(
        jnp.asarray(m, jnp.int32).reshape(-1), (B,)
    )

    feat = jax.vmap(
        lambda c, mm: pack_feat(
            c, mm, page_ids, pages, contractions=contractions
        )
    )(cp, m_arr)

    def run_fwd(body, ins, n_out, **kw):
        return _sweep_pass(
            body, ins, n_out, m_arr, reverse=False, R=R,
            interpret=interpret, **kw
        )

    def run_rev(body, ins, n_out, **kw):
        return _sweep_pass(
            body, ins, n_out, m_arr, reverse=True, R=R,
            interpret=interpret, **kw
        )

    starts = _run_rounds(run_fwd, run_rev, feat, N, contractions)
    return starts[0] if squeeze else starts
