"""Real-TPU probe (round 5): decompose the general-path starts stage.

The emoji arm's jit_starts_bits_pallas_stage costs 8,579 µs vs 1,177
English (artifacts/tpu_validation.json) — 59% of the arm's device time.
Its floor is the per-char class row gather (one issue-bound gather per
c_cap slot: 8 x 290816 slots = 2.33M rows = 4.74 ms at 491 Mrows/s).
This probe splits the stage into its phases on the live chip:

  1. cls gather alone (row gather + fused one-hot lane select + barrier)
  2. full mask construction + 12x pack_mask (includes 1.)
  3. the Pallas derivation kernel alone on pre-packed masks
  4. the full production stage (piece_starts_bits_pallas)

and times two candidate overhead cuts:

  5. mask construction packing the 6 CLASS-BYTE bit-planes once and
     deriving ws/rn/let/num/uc/lc as word ops (6 packs + 5 cp packs
     instead of 12 bool packs)

Also (VERDICT item 1 arithmetic): a hot-K compare filter over piece keys
at the flagship probe shape, to decide whether filtering hot pieces
before the vocab gather can beat the probe's issue floor.

Usage: timeout 3600 python tools/probe_starts5.py [reps]
"""
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from tools.probe_prims import device_ms


def main():
    import jax
    import jax.numpy as jnp

    from tokendagger_tpu.engine import _enable_persistent_compile_cache

    _enable_persistent_compile_cache(jax)
    print("devices:", jax.devices(), flush=True)
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    from tokendagger_tpu.ops import bitplane as BP
    from tokendagger_tpu.ops import pretokenize as PT
    from tokendagger_tpu.unicode_tables import get_two_level_tables

    page_ids, pages = map(jnp.asarray, get_two_level_tables())

    # ---- stage the emoji-arm shape: 8 windows, tight c_cap ---------------
    B, N = 8, 1 << 20
    raw = Path("/root/reference/tests/input/emoji.txt").read_bytes()
    need = B * N
    corpus = (raw * (need // len(raw) + 1))[:need]
    cps_rows, ms = [], []
    for b in range(B):
        chunk = corpus[b * N : (b + 1) * N].decode("utf-8", errors="ignore")
        cp = np.frombuffer(chunk.encode("utf-32-le"), np.uint32).astype(np.int32)
        cps_rows.append(cp)
        ms.append(len(cp))
    max_chars = max(ms)
    c_cap = -(-int(max_chars * 1.02 + 32) // 4096) * 4096
    print(f"B={B} N={N} max_chars={max_chars} c_cap={c_cap}", flush=True)
    cp2 = np.zeros((B, c_cap), np.int32)
    for b in range(B):
        cp2[b, : ms[b]] = cps_rows[b][:c_cap]
    cp_d = jax.device_put(jnp.asarray(cp2))
    m_d = jax.device_put(jnp.asarray(np.asarray(ms, np.int32)))
    jax.block_until_ready((cp_d, m_d))

    def timed(name, fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        d = tempfile.mkdtemp(prefix="st5_")
        t0 = time.perf_counter()
        with jax.profiler.trace(d):
            for _ in range(reps):
                out = fn(*args)
            jax.block_until_ready(out)
        wall = (time.perf_counter() - t0) / reps * 1e3
        dev = device_ms(d, reps)
        print(f"{name:<52} dev {dev:8.3f} ms  wall {wall:8.2f}", flush=True)
        return dev

    def calib(tag):
        x = jnp.arange(1024, dtype=jnp.int32)
        f = jax.jit(lambda v: (v * 3 + 1).sum())
        f(x).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(20):
            f(x).block_until_ready()
        print(f"calibration[{tag}]: "
              f"{(time.perf_counter() - t0) / 20 * 1e3:.3f} ms", flush=True)

    calib("start")

    # ---- 1. cls gather alone ---------------------------------------------
    @jax.jit
    def cls_only(cp):
        cls = PT._cls_lookup(cp, page_ids, pages)
        return (cls & 0x3F).astype(jnp.uint8)

    timed("1 cls row-gather + select (materialized u8)", cls_only, cp_d)

    # ---- 2. production mask construction + 12 packs ------------------------
    def pack_all(cp_row, m_row):
        mk = BP._char_masks(cp_row, m_row, page_ids, pages,
                            contractions=True, ascii_fast=False,
                            profile="llama4")
        return tuple(BP.pack_mask(mk[k]) for k in BP.MASK_ORDER)

    v_pack = jax.jit(jax.vmap(pack_all))
    packed = timed("2 _char_masks + 12x pack_mask (production)", v_pack,
                   cp_d, m_d)
    P_words = v_pack(cp_d, m_d)
    jax.block_until_ready(P_words)

    # ---- 3. derivation kernel alone on pre-packed masks --------------------
    lanes = 128
    c_words = c_cap // 32
    assert c_words % lanes == 0
    rows = c_words // lanes

    from jax.experimental import pallas as pl

    def kern(*refs):
        in_refs = refs[:-1]
        out_ref = refs[-1]
        P = {k: r[0] for k, r in zip(BP.MASK_ORDER, in_refs)}
        BP._TILE = True
        try:
            out = BP.derive_starts_words(P, contractions=True,
                                         n_total=c_cap, profile="llama4")
        finally:
            BP._TILE = False
        out_ref[0] = out

    spec = pl.BlockSpec((1, rows, lanes), lambda b: (b, 0, 0))
    tiles = [p.reshape(B, rows, lanes) for p in P_words]

    @jax.jit
    def derive_only(*ts):
        return pl.pallas_call(
            kern,
            grid=(B,),
            in_specs=[spec] * len(BP.MASK_ORDER),
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, rows, lanes), jnp.uint32),
        )(*ts)

    timed("3 pallas derivation kernel alone", derive_only, *tiles)

    # ---- 4. full production stage ------------------------------------------
    @jax.jit
    def full_stage(cp, m):
        return BP.piece_starts_bits_pallas(
            cp, m, page_ids, pages, contractions=True, profile="llama4",
        )

    timed("4 full piece_starts_bits_pallas (production)", full_stage,
          cp_d, m_d)

    # ---- 5. plane-packed mask construction variant -------------------------
    # pack the 6 class-byte bit-planes once; class masks become word ops.
    def pack_planes(cp_row, m_row):
        n = cp_row.shape[0]
        idx = jnp.arange(n, dtype=jnp.int32)
        valid_b = idx < m_row
        cls = PT._cls_lookup(cp_row, page_ids, pages)
        cls = jnp.where(valid_b, cls, 0)
        # 6 packs of the class-byte planes
        cls_planes = [BP.pack_mask((cls & (1 << i)) != 0) for i in range(6)]
        # cp-compare masks (5 packs)
        sp = BP.pack_mask((cp_row == ord(" ")) & valid_b)
        apo = BP.pack_mask((cp_row == ord("'")) & valid_b)
        sl = BP.pack_mask((cp_row == ord("/")) & valid_b)
        from tokendagger_tpu.ops.pretokenize import _fold_is, _shl
        cp1 = jnp.where(idx + 1 < m_row, _shl(cp_row, 1, jnp.int32(0)), 0)
        cp2_ = jnp.where(idx + 2 < m_row, _shl(cp_row, 2, jnp.int32(0)), 0)
        f1 = BP.pack_mask(
            _fold_is(cp1, 0) | _fold_is(cp1, 1) | _fold_is(cp1, 5)
            | _fold_is(cp1, 7))
        f2 = BP.pack_mask(
            (_fold_is(cp1, 2) & _fold_is(cp2_, 3))
            | (_fold_is(cp1, 4) & _fold_is(cp2_, 3))
            | (_fold_is(cp1, 6) & _fold_is(cp2_, 6)))
        valid = BP._valid_words(m_row, cp_row.shape[0] // 32)
        return tuple(cls_planes) + (sp, apo, sl, f1, f2, valid)

    v_pack5 = jax.jit(jax.vmap(pack_planes))
    timed("5 plane-packed mask construction (6+5 packs)", v_pack5,
          cp_d, m_d)

    # ---- 6. hot-K compare filter at the flagship probe shape ---------------
    # (VERDICT item 1 arithmetic: can a pure-compute hot-piece filter +
    # smaller gather beat the probe's one-gather-per-piece floor?)
    P_rows = 8 * 240_512
    rng = np.random.default_rng(0)
    qk0 = jax.device_put(jnp.asarray(
        rng.integers(0, 1 << 31, P_rows, dtype=np.int64).astype(np.uint32)))
    qk1 = jax.device_put(jnp.asarray(
        rng.integers(0, 1 << 31, P_rows, dtype=np.int64).astype(np.uint32)))
    qlen = jax.device_put(jnp.asarray(
        rng.integers(1, 17, P_rows, dtype=np.int64).astype(np.int32)))
    jax.block_until_ready((qk0, qk1, qlen))
    hot = rng.integers(0, 1 << 31, (32, 3), dtype=np.int64)

    def hotk(K):
        consts = [(np.uint32(hot[i, 0]), np.uint32(hot[i, 1]),
                   np.int32(hot[i, 2] % 16 + 1), np.int32(i))
                  for i in range(K)]

        @jax.jit
        def f(k0, k1, ln):
            out = jnp.full(k0.shape, -1, jnp.int32)
            for h0, h1, hl, r in consts:
                hit = (k0 == h0) & (k1 == h1) & (ln == hl)
                out = jnp.where(hit, r, out)
            return out

        return f

    for K in (16, 32):
        timed(f"6 hot-{K} compare filter @ {P_rows} pieces", hotk(K),
              qk0, qk1, qlen)

    calib("end")


if __name__ == "__main__":
    main()
