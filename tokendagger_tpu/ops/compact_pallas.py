r"""Pallas stream compaction for piece starts (replaces the sort path).

The resolver needs the piece-start positions (and their 16-byte join-key
words) compacted from an (N,)-dense mask into p_cap slots in stream
order. XLA can only express this as a scatter or a 5-operand sort over
all N positions (~36 ms per 8 MB dispatch on v5e — the pipeline's
largest stage). This module does it with **displacement butterflies**:

  stable compaction moves element i left by disp[i] = (# dead slots
  before i) — a monotone displacement, so processing its bits LSB->MSB
  with "take from the right by 2^b where the source's bit b is set"
  is collision-free (vector semantics read all sources before writing;
  a live target that is overwritten moves simultaneously because
  monotone displacements give equal low bits to adjacent live slots).

Two kernels:

* ``compact_tiles`` — grid (B, G): each (R, 128) tile compacts its live
  elements to the tile front in VMEM (15 butterfly rounds) and DMAs the
  tile to the output at its window's running ROW offset (rows of 128;
  the next tile's copy overwrites this tile's garbage tail rows —
  sequential grid). Output is therefore row-quantized: tile regions are
  dense, with < 128 dead slots between regions. Per-tile counts go to a
  (B, G) side output.
* ``degap_keys`` — grid (B,): removes the inter-tile gaps with one
  bounded full-window butterfly (the gapped arrays are ~N/3 and fit
  VMEM) and computes the piece geometry (start_b, piece_len, masked key
  words) from the same VMEM-resident values.

Reference behavior being accelerated: the whole-piece fast path of
/root/reference/src/tiktoken/tiktoken.cpp:210-215 needs each pretoken's
bytes; this supplies (start, key-words) per pretoken in stream order.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128


def _iota2(shape, axis):
    return jax.lax.broadcasted_iota(jnp.int32, shape, axis)


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
    xl = pltpu.roll(x, s, 1)
    a = pltpu.roll(xl, q, 0)
    b = pltpu.roll(xl, q + 1, 0)
    col = _iota2(x.shape, 1)
    return jnp.where(col < s, b, a)


def _raster_incl_sum(x):
    """Inclusive raster prefix sum of an (R, L) int32 tile (row-major).
    Input entries MUST be 0/1 (every caller scans a live mask): the
    lane-level inclusive scan and the row-total broadcast are ONE pair of
    bf16 matmuls on the MXU (0/1 operands, row sums <= L = 128 — exact in
    bf16 x bf16 -> f32); only the cross-row prefix (log2(R) conditional
    row-rolls) stays on the VPU. Replaces the previous 22-round
    roll-doubling form (~45 full-tile VPU ops saved per scan)."""
    r, l = x.shape
    xb = x.astype(jnp.bfloat16)
    tri = (_iota2((l, l), 0) <= _iota2((l, l), 1)).astype(jnp.bfloat16)
    lane_incl = jnp.dot(
        xb, tri, preferred_element_type=jnp.float32
    ).astype(jnp.int32)
    rowtot = jnp.dot(
        xb, jnp.ones((l, l), jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    row = _iota2(x.shape, 0)
    rowpref = rowtot  # inclusive scan of row totals down rows
    k = 1
    while k < r:
        rowpref = rowpref + jnp.where(
            row >= k, _roll_raster_axis0(rowpref, k), 0
        )
        k *= 2
    return lane_incl + (rowpref - rowtot)  # add sum of full rows above


def _roll_raster_axis1(x, k):
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.roll(x, k, 1)


def _roll_raster_axis0(x, k):
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.roll(x, k, 0)


def _butterfly(arrays, disp, n: int, max_disp: int | None = None):
    """Move every element left by its displacement (LSB->MSB rounds).
    arrays/disp are (R, L) int32 raster tiles; disp must be 0 on dead
    slots and monotone non-decreasing over live slots. ``max_disp``
    bounds the displacement magnitude when the caller can prove one
    (fewer rounds): degap's displacement is the inter-tile garbage,
    < G*L, not the window size."""
    if max_disp is None:
        max_disp = n
    bit = 0
    while (1 << bit) < max_disp:
        k = 1 << bit
        sd = _roll_raster(disp, n - k)   # sd[j] = disp[j + k]
        m = ((sd >> bit) & 1) == 1
        arrays = [
            jnp.where(m, _roll_raster(a, n - k), a) for a in arrays
        ]
        disp = jnp.where(m, sd, disp)
        bit += 1
    return arrays


def _roll_raster_dyn(x, k):
    """Cyclic raster roll by a traced non-negative shift k (< n)."""
    from jax.experimental.pallas import tpu as pltpu

    r, l = x.shape
    q = k // l
    s = k % l
    xl = pltpu.roll(x, s, 1)
    a = pltpu.roll(xl, q, 0)
    b = pltpu.roll(xl, q + 1, 0)
    col = _iota2(x.shape, 1)
    return jnp.where(col < s, b, a)


def _butterfly_packed(arrays, n: int, *, disp_shift: int,
                      max_disp: int | None = None):
    """Same movement as :func:`_butterfly`, but the displacement rides in
    ``arrays[0]`` at bits [disp_shift, 32) — one fewer array per round,
    and the shared displacement roll IS arrays[0]'s roll. The caller must
    guarantee arrays[0]'s payload fits below ``disp_shift`` bits, the
    displacement fits above, and the disp field is 0 on dead slots."""
    if max_disp is None:
        max_disp = n
    bit = 0
    while (1 << bit) < max_disp:
        k = 1 << bit
        sp = _roll_raster(arrays[0], n - k)  # sp[j] = arrays[0][j + k]
        m = ((sp >> (disp_shift + bit)) & 1) == 1
        arrays = [jnp.where(m, sp, arrays[0])] + [
            jnp.where(m, _roll_raster(a, n - k), a) for a in arrays[1:]
        ]
        bit += 1
    return arrays


def compact_tiles(
    starts: jnp.ndarray,     # (B, N) uint8/int32 0/1 live mask (byte-level)
    word0: jnp.ndarray,      # (B, N) int32 w0 (join.sliding_word0 bits)
    nbytes: jnp.ndarray,     # (B,) int32
    *,
    p_cap: int,
    tile_rows: int = 256,
    interpret: bool = False,
    packed: bool = False,
):
    """Tile-compact (start positions + key words); returns 5 gapped
    (B, OutRows, L) arrays [gidx, w0, w4, w8, w12] + (B, G) tile counts.
    OutRows = ceil(p_cap/L) + G + tile_rows slack rows; regions are in
    stream order at row-quantized offsets (cumsum(ceil(cnt/L))).

    Only w0 is materialized in HBM: the shifted words w4/w8/w12 are
    w0 rolled by 4/8/12 slots, derived IN-KERNEL with a one-row halo
    from the next tile (3 raster rolls + tail blends per tile) — the
    3 full-window int32 arrays the old form round-tripped through HBM
    (~192 MB per 8 MB dispatch) never exist.

    packed: ``starts`` is (B, N/32) uint32 plane-major words (the
    bitplane pack_mask layout). Requires N == 32*blk, in which case tile
    g's byte flags are exactly bit g of the full word array — the word
    tile stays VMEM-resident across the grid's g axis (constant index
    map) and each program extracts its plane with one shift."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N0 = starts.shape
    N = N0 * 32 if packed else N0
    R, L = tile_rows, LANES
    blk = R * L
    assert N % blk == 0, (N, blk)
    assert blk <= 1 << 15, blk  # lidx + disp must pack into one int32
    G = N // blk
    if packed:
        assert N == 32 * blk, (N, blk)  # plane g <-> tile g
    out_rows = -(-p_cap // L) + G + R
    n_vals = 5

    def kern(nb_ref, st_ref, w0_ref, halo_ref, *rest):
        out_refs = rest[:n_vals]
        cnt_ref = rest[n_vals]
        scratch = rest[n_vals + 1 : n_vals + 1 + n_vals]
        sems = rest[n_vals + 1 + n_vals]
        carry = rest[-1]
        b = pl.program_id(0)
        g = pl.program_id(1)
        row_off = jnp.where(g == 0, 0, carry[0])

        row = _iota2((R, L), 0)
        col = _iota2((R, L), 1)
        lidx = row * L + col
        gidx = g * blk + lidx
        if packed:
            # word raster index == byte-within-tile; plane g == tile g.
            # Arithmetic >> is fine: bit extraction is sign-agnostic.
            st_bit = (st_ref[0].astype(jnp.int32) >> g) & 1
            live = (st_bit != 0) & (gidx < nb_ref[b])
        else:
            live = (st_ref[0] != 0) & (gidx < nb_ref[b])
        live_i = live.astype(jnp.int32)
        incl = _raster_incl_sum(live_i)
        cnt = incl[R - 1, L - 1]
        pos = incl - live_i
        # tile-local index and displacement are both < 2^15: pack them in
        # one int32 (disp high, lidx low) so the butterfly moves 5 arrays
        # instead of 6
        dl = (jnp.where(live, lidx - pos, 0) << 16) | lidx
        # derive w4/w8/w12 from w0: raster roll left by k, last-row tail
        # filled from the next tile's first row (zeros past the last
        # tile — sliding_word0 zero-fills beyond nbytes, matching
        # sliding_words' word_at(k) zero pad exactly)
        w0t = w0_ref[0]
        # halo block is 8 rows (Mosaic's minimum sublane tile); only its
        # first row — the next tile's first w0 row — is used
        halo = jnp.where(g == G - 1, 0, halo_ref[0][0:1, :])  # (1, L)
        halo_b = jnp.broadcast_to(halo, (R, L))
        last_row = row == R - 1

        def wshift(k: int):
            rolled = _roll_raster(w0t, blk - k)
            hr = _roll_raster_axis1(halo_b, L - k)  # hr[c] = halo[c+k-L]
            return jnp.where(last_row & (col >= L - k), hr, rolled)

        vals = [dl, w0t, wshift(4), wshift(8), wshift(12)]
        vals = _butterfly_packed(vals, blk, disp_shift=16)
        vals[0] = g * blk + (vals[0] & 0xFFFF)

        safe_off = jnp.minimum(row_off, out_rows - R)
        copies = []
        for i in range(n_vals):
            scratch[i][...] = vals[i]
            c = pltpu.make_async_copy(
                scratch[i],
                out_refs[i].at[b, pl.ds(safe_off, R), :],
                sems.at[i],
            )
            c.start()
            copies.append(c)
        for c in copies:
            c.wait()
        cnt_ref[b * G + g] = cnt
        carry[0] = safe_off + (cnt + (L - 1)) // L

    grid = (B, G)
    tile = pl.BlockSpec((1, R, L), lambda b, g: (b, g, 0))
    # packed flags: one (R, L) word tile per window, constant over g —
    # Pallas detects the unchanged block and keeps it VMEM-resident
    st_spec = (
        pl.BlockSpec((1, R, L), lambda b, g: (b, 0, 0)) if packed else tile
    )
    # next tile's first w0 rows (8-row block: Mosaic requires the
    # second-to-last block dim divisible by 8; clamped at the end, and
    # the kernel zeroes it for the last tile)
    halo_spec = pl.BlockSpec(
        (1, 8, L),
        lambda b, g: (b, jnp.minimum((g + 1) * (R // 8),
                                     G * (R // 8) - 1), 0),
    )
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B,), lambda b, g: (0,),
                         memory_space=pltpu.SMEM),
        ] + [st_spec, tile, halo_spec],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_vals)
        ] + [
            # real-TPU lowering rejects partial SMEM blocks: expose the
            # counts as ONE flat (B*G,) SMEM array and index it manually
            pl.BlockSpec((B * G,), lambda b, g: (0,),
                         memory_space=pltpu.SMEM)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, out_rows, L), jnp.int32)
            for _ in range(n_vals)
        ] + [jax.ShapeDtypeStruct((B * G,), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((R, L), jnp.int32) for _ in range(n_vals)]
        + [pltpu.SemaphoreType.DMA((n_vals,)), pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
    )(
        nbytes,
        starts.reshape(B, R, L) if packed else starts.reshape(B, G * R, L),
        word0.reshape(B, G * R, L),
        word0.reshape(B, G * R, L),
    )
    return out[:n_vals], out[n_vals].reshape(B, G)


def _butterfly_takes(arrays, disp, n: int, max_disp: int):
    """:func:`_butterfly` that also records each round's take mask: bit b
    of ``tk[j]`` = "slot j took from slot j + 2^b at round b". The
    recorded masks make the movement exactly invertible by
    :func:`_replay_inverted` — the wedge-free route used by the general
    (non-ASCII) pipeline's char->byte flag expansion."""
    tk = jnp.zeros(disp.shape, jnp.int32)
    bit = 0
    while (1 << bit) < max_disp:
        k = 1 << bit
        sd = _roll_raster(disp, n - k)   # sd[j] = disp[j + k]
        m = ((sd >> bit) & 1) == 1
        arrays = [jnp.where(m, _roll_raster(a, n - k), a) for a in arrays]
        tk = tk | (m.astype(jnp.int32) << bit)
        disp = jnp.where(m, sd, disp)
        bit += 1
    return arrays, tk


def _replay_inverted(y, tk, max_disp: int):
    """Invert a recorded butterfly (static rolls, MSB->LSB): wherever
    ``tk[j - 2^b]`` has bit b ("j-k took from j"), put the value back at
    j. Exact for every live element (collision-freedom of monotone
    displacements); garbage lands only on slots the live routing never
    targeted, which the caller's final select clears."""
    nbits = max(1, (max_disp - 1).bit_length())
    for bit in reversed(range(nbits)):
        k = 1 << bit
        mk = ((_roll_raster(tk, k) >> bit) & 1) == 1  # mk[j] = tk[j-k] b
        y = jnp.where(mk, _roll_raster(y, k), y)
    return y


def compact_tiles_masked(
    arrays: list,            # list of (B, N) int32 value arrays
    mask: jnp.ndarray,       # (B, N) bool/uint8 keep mask (stream order)
    *,
    out_cap: int,
    tile_rows: int = 256,
    interpret: bool = False,
):
    """Generic tile-phase stable compaction (the wedge-free decomposition
    of :func:`compact_by_mask` for full-window sizes): grid (B, G), each
    (R, 128) tile compacts its kept elements to the tile front in VMEM
    (static butterfly rounds) and DMAs the tile to the output at its
    window's running row offset. Returns (gapped arrays
    [(B, OutRows, L)], cnts (B, G), takes (B, G*R, L)); pair with
    :func:`degap_record` for the dense prefix. ``takes`` records each
    tile's butterfly rounds for exact inverse replay
    (:func:`expand_tiles_replay`).

    Rationale: one full-window butterfly at N ~ 2^20 is a Mosaic
    compile-time wedge on this machine's remote runtime (both the
    unrolled ~40-round stack and the while_loop/dynamic-roll form,
    docs/PERF.md); this two-phase form keeps every program at the
    (R, L)-tile scale the ASCII path already compiles and runs at
    945 MB/s/chip."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N = mask.shape
    R, L = tile_rows, LANES
    blk = R * L
    assert N % blk == 0, (N, blk)
    G = N // blk
    out_rows = -(-out_cap // L) + G + R
    nv = len(arrays)
    mask_i = mask.astype(jnp.uint8).reshape(B, G * R, L)

    def kern(m_ref, *rest):
        in_refs = rest[:nv]
        out_refs = rest[nv : 2 * nv]
        cnt_ref = rest[2 * nv]
        tk_ref = rest[2 * nv + 1]
        scratch = rest[2 * nv + 2 : 2 * nv + 2 + nv]
        sems = rest[-2]
        carry = rest[-1]
        b = pl.program_id(0)
        g = pl.program_id(1)
        row_off = jnp.where(g == 0, 0, carry[0])

        live = m_ref[0] != 0
        live_i = live.astype(jnp.int32)
        incl = _raster_incl_sum(live_i)
        cnt = incl[R - 1, L - 1]
        pos = incl - live_i
        row = _iota2((R, L), 0)
        col = _iota2((R, L), 1)
        lidx = row * L + col
        disp = jnp.where(live, lidx - pos, 0)
        vals, tk = _butterfly_takes(
            [r[0] for r in in_refs], disp, blk, blk
        )
        tk_ref[0] = tk

        safe_off = jnp.minimum(row_off, out_rows - R)
        copies = []
        for i in range(nv):
            scratch[i][...] = vals[i]
            c = pltpu.make_async_copy(
                scratch[i],
                out_refs[i].at[b, pl.ds(safe_off, R), :],
                sems.at[i],
            )
            c.start()
            copies.append(c)
        for c in copies:
            c.wait()
        cnt_ref[b * G + g] = cnt
        carry[0] = safe_off + (cnt + (L - 1)) // L

    tile = pl.BlockSpec((1, R, L), lambda b, g: (b, g, 0))
    out = pl.pallas_call(
        kern,
        grid=(B, G),
        in_specs=[tile] * (1 + nv),
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * nv + [
            pl.BlockSpec((B * G,), lambda b, g: (0,),
                         memory_space=pltpu.SMEM),
            tile,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, out_rows, L), jnp.int32)
            for _ in range(nv)
        ] + [
            jax.ShapeDtypeStruct((B * G,), jnp.int32),
            jax.ShapeDtypeStruct((B, G * R, L), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((R, L), jnp.int32) for _ in range(nv)]
        + [pltpu.SemaphoreType.DMA((nv,)), pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
    )(mask_i, *[a.reshape(B, G * R, L) for a in arrays])
    return out[:nv], out[nv].reshape(B, G), out[nv + 1]


def _degap_geometry(cnts, out_rows: int):
    """Row geometry shared by :func:`degap` and its take-recording /
    replay variants: per-window live totals and the (B, OutRows, L)
    gapped live mask, from the per-tile counts (row math on tiny
    arrays, in XLA)."""
    B, G = cnts.shape
    L = LANES
    rpt = (cnts + (L - 1)) // L
    offs, acc = [], jnp.zeros((B,), jnp.int32)
    for g in range(G):
        offs.append(acc)
        acc = acc + rpt[:, g]
    off_rows = jnp.stack(offs, axis=1)
    total = jnp.sum(cnts, axis=1).astype(jnp.int32)
    rowi = jnp.arange(out_rows, dtype=jnp.int32)[None, :]
    lo_row = jnp.zeros((B, out_rows), jnp.int32)
    c_row = jnp.zeros((B, out_rows), jnp.int32)
    has = jnp.zeros((B, out_rows), jnp.bool_)
    for g in range(G):
        m = (rowi >= off_rows[:, g : g + 1]) & (
            rowi < off_rows[:, g : g + 1] + rpt[:, g : g + 1]
        )
        lo_row = jnp.where(m, off_rows[:, g : g + 1] * L, lo_row)
        c_row = jnp.where(m, cnts[:, g : g + 1], c_row)
        has = has | m
    lane = jnp.arange(L, dtype=jnp.int32)
    dlt = rowi * L - lo_row
    live_u8 = (
        has[..., None] & (dlt[..., None] + lane < c_row[..., None])
    ).astype(jnp.uint8)
    return total, off_rows, live_u8


def degap_keys(
    arrays: list,            # 5x (B, OutRows, L) int32 gapped [dl, w0..w12]
    cnts: jnp.ndarray,       # (B, G) int32 per-tile live counts
    nbytes: jnp.ndarray,     # (B,) int32
    *,
    p_rows: int,
    p_cap: int,
    first_bits: int,
    interpret: bool = False,
):
    """:func:`degap` specialized for the piece-key pipeline, with the
    piece-geometry epilogue FUSED into the kernel: after the bounded
    butterfly, the same VMEM-resident values yield start_b (dead slots
    = nbytes), piece_len (next-start diff; the last live slot ends at
    nbytes) and the 4 length-masked key words — the (B, p_pad) XLA
    epilogue that round-tripped all five dense arrays through HBM is
    gone. Returns (start_b, piece_len, k0..k3) as (B, p_rows, L) int32
    (k words bit-identical to the uint32 forms)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, out_rows, L = arrays[0].shape
    G = cnts.shape[1]
    n = out_rows * L
    max_disp = G * L
    pack = first_bits + (max_disp - 1).bit_length() <= 32
    total, _, live_u8 = _degap_geometry(cnts, out_rows)

    def kern(tot_ref, nb_ref, live_ref, *rest):
        in_refs = rest[:5]
        out_refs = rest[5:]
        b = pl.program_id(0)
        row = _iota2((out_rows, L), 0)
        col = _iota2((out_rows, L), 1)
        lidx = row * L + col
        live = live_ref[0] != 0
        live_i = live.astype(jnp.int32)
        incl = _raster_incl_sum(live_i)
        pos = incl - live_i
        disp = jnp.where(live, lidx - pos, 0)
        vals = [r[0] for r in in_refs]
        if pack:
            vals[0] = (disp << first_bits) | vals[0]
            vals = _butterfly_packed(
                vals, n, disp_shift=first_bits, max_disp=max_disp
            )
            vals[0] = vals[0] & ((1 << first_bits) - 1)
        else:
            vals = _butterfly(vals, disp, n, max_disp=max_disp)
        tot = tot_ref[b]
        nb = nb_ref[b]
        keep = (lidx < tot) & (lidx < p_cap)
        start_b = jnp.where(keep, vals[0], nb)
        nxt = _roll_raster(start_b, n - 1)       # nxt[j] = start_b[j+1]
        end_b = jnp.where(lidx == tot - 1, nb, nxt)
        plen = jnp.where(keep, end_b - start_b, 0)
        out_refs[0][0] = start_b[:p_rows, :]
        out_refs[1][0] = plen[:p_rows, :]
        for j in range(4):
            r4 = jnp.clip(plen - 4 * j, 0, 4)
            m = jnp.where(
                r4 >= 4, jnp.int32(-1),
                (jnp.int32(1) << (8 * jnp.minimum(r4, 3))) - 1,
            )
            out_refs[2 + j][0] = (vals[1 + j] & m)[:p_rows, :]

    tile_in = pl.BlockSpec((1, out_rows, L), lambda b: (b, 0, 0))
    tile_out = pl.BlockSpec((1, p_rows, L), lambda b: (b, 0, 0))
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((B,), lambda b: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((B,), lambda b: (0,), memory_space=pltpu.SMEM),
            tile_in,
        ] + [tile_in] * 5,
        out_specs=[tile_out] * 6,
        out_shape=[jax.ShapeDtypeStruct((B, p_rows, L), jnp.int32)] * 6,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(total, nbytes, live_u8, *arrays)


def degap_record(
    arrays: list,            # list of (B, OutRows, L) int32 gapped arrays
    cnts: jnp.ndarray,       # (B, G) int32 per-tile live counts
    *,
    p_rows: int,
    interpret: bool = False,
    fill: int = 0,
):
    """:func:`degap` that also records its butterfly take masks (one
    int32 (B, OutRows, L) array) so the movement can be inverted by
    :func:`regap_replay`. Returns (dense arrays [(B, p_rows, L)],
    takes)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, out_rows, L = arrays[0].shape
    G = cnts.shape[1]
    n = out_rows * L
    max_disp = G * L
    total, _, live_u8 = _degap_geometry(cnts, out_rows)
    nv = len(arrays)

    def kern(tot_ref, live_ref, *rest):
        in_refs = rest[:nv]
        out_refs = rest[nv : 2 * nv]
        tk_ref = rest[-1]
        b = pl.program_id(0)
        row = _iota2((out_rows, L), 0)
        col = _iota2((out_rows, L), 1)
        lidx = row * L + col
        live = live_ref[0] != 0
        live_i = live.astype(jnp.int32)
        incl = _raster_incl_sum(live_i)
        pos = incl - live_i
        disp = jnp.where(live, lidx - pos, 0)
        vals, tk = _butterfly_takes(
            [r[0] for r in in_refs], disp, n, max_disp
        )
        tk_ref[0] = tk
        keep = lidx < tot_ref[b]
        for oref, v in zip(out_refs, vals):
            oref[0] = jnp.where(keep, v, jnp.int32(fill))[:p_rows, :]

    tile_in = pl.BlockSpec((1, out_rows, L), lambda b: (b, 0, 0))
    tile_out = pl.BlockSpec((1, p_rows, L), lambda b: (b, 0, 0))
    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((B,), lambda b: (0,), memory_space=pltpu.SMEM),
            tile_in,
        ] + [tile_in] * nv,
        out_specs=[tile_out] * nv + [tile_in],
        out_shape=[jax.ShapeDtypeStruct((B, p_rows, L), jnp.int32)] * nv
        + [jax.ShapeDtypeStruct((B, out_rows, L), jnp.int32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(total, live_u8, *arrays)
    return out[:nv], out[nv]


def regap_replay(
    dense: jnp.ndarray,      # (B, p_rows*L) int32 values in dense prefix
    takes: jnp.ndarray,      # (B, OutRows, L) from degap_record
    max_disp: int,           # must equal degap_record's bound (G * LANES)
    *,
    interpret: bool = False,
):
    """Inverse of the recorded degap: distribute a dense live-prefix back
    to its gapped (row-quantized per-tile) positions by inverted replay
    of the recorded rounds — all static rolls. Garbage lands only on
    never-routed slots (cleared downstream). ``max_disp`` fixes the round
    count and must match the recording pass."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, out_rows, L = takes.shape
    p_rows = dense.shape[1] // L

    def kern(v_ref, tk_ref, o_ref):
        y = jnp.concatenate(
            [v_ref[0],
             jnp.zeros((out_rows - p_rows, L), jnp.int32)], axis=0
        )
        o_ref[0] = _replay_inverted(y, tk_ref[0], max_disp)

    tile_d = pl.BlockSpec((1, p_rows, L), lambda b: (b, 0, 0))
    tile_g = pl.BlockSpec((1, out_rows, L), lambda b: (b, 0, 0))
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[tile_d, tile_g],
        out_specs=tile_g,
        out_shape=jax.ShapeDtypeStruct((B, out_rows, L), jnp.int32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(dense.reshape(B, p_rows, L), takes)


def expand_tiles_replay(
    gapped: jnp.ndarray,     # (B, OutRows, L) int32 values at gapped slots
    lead: jnp.ndarray,       # (B, N) bool/uint8 destination mask
    tile_takes: jnp.ndarray,  # (B, G*R, L) from compact_tiles_masked
    cnts: jnp.ndarray,       # (B, G) per-tile live counts
    *,
    tile_rows: int = 256,
    interpret: bool = False,
):
    """Per-tile inverse replay: tile g DMAs its char rows from the gapped
    array at its (dynamic) row offset, replays the recorded tile
    butterfly inverted (static rolls), and keeps values only on ``lead``
    slots — yielding (B, N) int32 values distributed to the masked byte
    positions. Phase 2 of the wedge-free expand."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, out_rows, L = gapped.shape
    _, N = lead.shape
    R = tile_rows
    blk = R * L
    G = N // blk
    assert N % blk == 0 and cnts.shape == (B, G), (N, blk, cnts.shape)
    rpt = (cnts + (L - 1)) // L
    offs, acc = [], jnp.zeros((B,), jnp.int32)
    for g in range(G):
        offs.append(acc)
        acc = acc + rpt[:, g]
    off_flat = jnp.stack(offs, axis=1).reshape(B * G)
    lead_i = lead.astype(jnp.uint8).reshape(B, G * R, L)

    def kern(off_ref, gap_ref, m_ref, tk_ref, o_ref, scratch, sem):
        b = pl.program_id(0)
        g = pl.program_id(1)
        row_off = jnp.minimum(off_ref[b * G + g], out_rows - R)
        c = pltpu.make_async_copy(
            gap_ref.at[b, pl.ds(row_off, R), :], scratch, sem,
        )
        c.start()
        c.wait()
        y = _replay_inverted(scratch[...], tk_ref[0], blk)
        o_ref[0] = jnp.where(m_ref[0] != 0, y, jnp.int32(0))

    tile = pl.BlockSpec((1, R, L), lambda b, g: (b, g, 0))
    out = pl.pallas_call(
        kern,
        grid=(B, G),
        in_specs=[
            pl.BlockSpec((B * G,), lambda b, g: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            tile,
            tile,
        ],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((B, G * R, L), jnp.int32),
        scratch_shapes=[pltpu.VMEM((R, L), jnp.int32),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
    )(off_flat, gapped, lead_i, tile_takes)
    return out.reshape(B, N)


def compact_by_mask(
    arrays: list,            # list of (B, P) int32 arrays (P % 128 == 0)
    mask: jnp.ndarray,       # (B, P) bool: elements to keep, stream order
    *,
    interpret: bool = False,
    fill: int = 0,
    unroll: bool | None = None,
):
    """Stable-compact ``arrays`` by ``mask`` with one full-array butterfly
    per window (grid (B,)); slots beyond the kept count get ``fill``.
    All value arrays share ONE pallas_call (one displacement scan).

    Two round forms (``unroll=None`` picks by size):

    * static unrolled log2(P) stack (static rolls) for P <= 2^19 — the
      form measured at 0.42 ms in finalize at p_cap shapes; sparse masks
      (finalize's misses) have near-P max displacement, so a dynamic
      loop saves nothing there and pays ~3x per round in dynamic-roll
      blends (measured: finalize 0.42 -> 1.27 ms on v5e).
    * in-kernel ``while_loop`` with dynamic rolls above that: the
      unrolled stack is a Mosaic compile-time wedge at P ~ 2^20 on this
      machine's remote runtime (docs/PERF.md), and the loop stops at the
      ACTUAL max displacement — the general path's mostly-dense lead
      masks pay only the rounds they need."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, P = mask.shape
    L = LANES
    assert P % L == 0, P
    rows = P // L
    n = P
    if unroll is None:
        unroll = P <= (1 << 19)
    mask_i = mask.astype(jnp.uint8).reshape(B, rows, L)

    nv = len(arrays)

    def kern(m_ref, *refs):
        in_refs = refs[:nv]
        out_refs = refs[nv:]
        live = m_ref[0] != 0
        live_i = live.astype(jnp.int32)
        incl = _raster_incl_sum(live_i)
        total = incl[rows - 1, L - 1]
        pos = incl - live_i
        row = _iota2((rows, L), 0)
        col = _iota2((rows, L), 1)
        lidx = row * L + col
        disp = jnp.where(live, lidx - pos, 0)

        if unroll:
            vs = _butterfly([r[0] for r in in_refs], disp, n)
        else:
            maxd = jnp.max(disp)

            def cond(st):
                return (jnp.int32(1) << st[0]) <= maxd

            def body(st):
                bit, vs, d = st
                k = jnp.int32(1) << bit
                sd = _roll_raster_dyn(d, n - k)
                mm = ((sd >> bit) & 1) == 1
                vs = tuple(
                    jnp.where(mm, _roll_raster_dyn(v, n - k), v)
                    for v in vs
                )
                d = jnp.where(mm, sd, d)
                return bit + 1, vs, d

            _, vs, _ = jax.lax.while_loop(
                cond, body,
                (jnp.int32(0), tuple(r[0] for r in in_refs), disp),
            )
        keep = lidx < total
        for oref, v in zip(out_refs, vs):
            oref[0] = jnp.where(keep, v, jnp.int32(fill))

    tile = pl.BlockSpec((1, rows, L), lambda b: (b, 0, 0))
    outs = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[tile] * (1 + nv),
        out_specs=[tile] * nv,
        out_shape=[jax.ShapeDtypeStruct((B, rows, L), jnp.int32)] * nv,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(mask_i, *[a.reshape(B, rows, L) for a in arrays])
    return [o.reshape(B, P) for o in outs]


@partial(
    jax.jit,
    static_argnames=("p_cap", "tile_rows", "interpret", "packed"),
)
def compact_piece_keys_butterfly(
    starts_b: jnp.ndarray,   # (B, N) bool byte flags — or see ``packed``
    data: jnp.ndarray,       # (B, N) uint8 raw windows
    nbytes: jnp.ndarray,     # (B,) int32
    p_cap: int,
    *,
    tile_rows: int = 256,
    interpret: bool = False,
    packed: bool = False,
):
    """Batched drop-in for compact_piece_keys_sorted (same per-window
    contract, plus a batch axis): returns (start_b, piece_len, k0..k3,
    n_pieces) with identical pad semantics, via the butterfly kernels
    instead of a 5-operand sort.

    packed: ``starts_b`` is (B, N/32) uint32 plane-major words straight
    from piece_starts_bits_pallas(packed_out=True) — no unpack/repack
    round-trip (requires N == 32 * tile_rows * 128)."""
    from .join import sliding_word0

    B, N = data.shape
    L = LANES
    p_rows = -(-p_cap // L)
    p_pad = p_rows * L

    w0 = jax.vmap(sliding_word0)(data, nbytes).astype(jnp.int32)
    st = starts_b if packed else starts_b.astype(jnp.uint8)
    (gapped, cnts) = compact_tiles(
        st, w0, nbytes,
        p_cap=p_cap, tile_rows=tile_rows, interpret=interpret,
        packed=packed,
    )
    outs = degap_keys(
        list(gapped), cnts, nbytes, p_rows=p_rows, p_cap=p_cap,
        interpret=interpret,
        # gapped[0] carries byte indices < N: pack the degap displacement
        # into its high bits (both always fit one int32 at these shapes)
        first_bits=max(1, (N - 1).bit_length()),
    )
    n_pieces = jnp.sum(cnts, axis=1)
    start_b, piece_len = (o.reshape(B, p_pad) for o in outs[:2])
    kw = [
        jax.lax.bitcast_convert_type(o.reshape(B, p_pad), jnp.uint32)
        for o in outs[2:]
    ]
    out_slice = slice(None, p_cap)
    return (start_b[:, out_slice], piece_len[:, out_slice],
            kw[0][:, out_slice], kw[1][:, out_slice], kw[2][:, out_slice],
            kw[3][:, out_slice], n_pieces)


@partial(jax.jit, static_argnames=("p_cap", "interpret"))
def finalize_butterfly(
    start_b: jnp.ndarray,    # (B, p_cap) int32
    piece_len: jnp.ndarray,  # (B, p_cap) int32
    rank: jnp.ndarray,       # (B, p_cap) int32 (rank or -1)
    n_pieces: jnp.ndarray,   # (B,) int32
    trim: jnp.ndarray,       # scalar int32 (must cover whole windows)
    *,
    p_cap: int,
    interpret: bool = False,
):
    """Batched finalize for complete windows (trim >= nbytes): flat ids
    need no compaction (kept == live in slot order); the miss spans
    compact with the mask butterfly instead of a 3-operand sort. Same
    per-window contract as fused.finalize_host_sorted(untrimmed=True)."""
    from .fused import SENTINEL

    B = start_b.shape[0]
    L = LANES
    p_pad = -(-p_cap // L) * L
    pslot = jnp.arange(p_cap, dtype=jnp.int32)[None, :]
    live = pslot < jnp.minimum(n_pieces, p_cap)[:, None]
    n_kept = jnp.minimum(n_pieces, p_cap)
    end_b = start_b + piece_len
    consumed = jnp.max(jnp.where(live, end_b, 0), axis=1)
    overflow = n_pieces > p_cap
    hit = live & (rank >= 0)
    miss = live & (rank < 0)
    flat = jnp.where(live, jnp.where(hit, rank, SENTINEL), -1)
    n_ms = jnp.sum(miss.astype(jnp.int32), axis=1)

    def pad(x, fill):
        return jnp.concatenate(
            [x, jnp.full((B, p_pad - p_cap), fill, x.dtype)], axis=1
        )

    ms_s, ms_l = compact_by_mask(
        [pad(start_b, 0), pad(piece_len, 0)],
        pad(miss, False), interpret=interpret,
    )
    return (flat, n_kept, n_pieces, n_kept, consumed, overflow,
            ms_s[:, :p_cap], ms_l[:, :p_cap], n_ms)
