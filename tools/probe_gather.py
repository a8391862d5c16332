"""Real-TPU probe: row-gather cost vs row width.

The whole-piece vocab probe is a row gather per piece; whether it is
latency-bound (count of rows) or bandwidth-bound (bytes moved) decides
the right table layout (one 192 B 8-slot row vs fingerprint+verify
split). Arms cover the probe formulations
(barrier+slice probe8, transposed probe8t, count-word encodings) and raw
gathers at the resident pipeline's scale (P = p_cap * 8 windows).
Device-trace protocol; no D2H before timing. Findings in docs/PERF.md.

Usage: timeout 1200 python tools/probe_gather.py
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

    NB = 1 << 17          # table buckets (matches vhash8)
    B, P = 8, 349_536     # windows x p_cap (1 MB window, caps_for)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, NB, (B, P)).astype(np.int32))
    jax.block_until_ready(idx)

    # --- vocab_probe8 in isolation (real table, random keys) --------------
    from tokendagger_tpu import vocab
    from tokendagger_tpu.ops.join import vocab_probe8
    from tokendagger_tpu.tables import build_tables

    ranks = vocab.load_tiktoken_model("/root/reference/src/tokenizer.model")
    t = build_tables(ranks, {})
    rows8 = jnp.asarray(t.vhash8_rows)
    qk = [jnp.asarray(rng.integers(0, 2**31, (B, P)).astype(np.uint32))
          for _ in range(4)]
    ql = jnp.asarray(rng.integers(1, 17, (B, P)).astype(np.int32))
    jax.block_until_ready([rows8, ql] + qk)

    def probe_arm(k0, k1, k2, k3, ql):
        return jax.vmap(
            lambda a, b, c, d, e: vocab_probe8(
                a, b, c, d, e, rows8, t.vhash8_mask
            )
        )(k0, k1, k2, k3, ql)

    from tokendagger_tpu.ops.join import vocab_probe8_fused

    rows64 = jnp.asarray(t.vhash64_rows())

    def probe_fused_arm(k0, k1, k2, k3, ql):
        return jax.vmap(
            lambda a, b, c, d, e: vocab_probe8_fused(
                a, b, c, d, e, rows64, t.vhash8_mask
            )
        )(k0, k1, k2, k3, ql)

    from tokendagger_tpu.ops.join import _vhash_ab_jnp
    from tokendagger_tpu.ops.merge import _mix

    rows64_flat = rows64.reshape(-1)

    def probe_cnt2g(k0, k1, k2, k3, ql):
        """Count-word probe: ONE full-width sum reduce (fused with the
        gather, (P,) output so no sub-128 minor dims) packing per-slot
        mismatch counts into 3-bit fields, then a second 1-element flat
        gather for the hit slot's rank."""
        a, b = _vhash_ab_jnp(k0, k1, k2, k3, ql)
        h = _mix(a, b, 0, t.vhash8_mask)
        r = rows64[h]                                   # (B, P, 64)
        iot = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 64), 2)
        fld = iot % 8
        slot = iot // 8
        q = jnp.where(
            fld == 0, k0.astype(jnp.int32)[..., None],
            jnp.where(
                fld == 1, k1.astype(jnp.int32)[..., None],
                jnp.where(
                    fld == 2, k2.astype(jnp.int32)[..., None],
                    jnp.where(
                        fld == 3, k3.astype(jnp.int32)[..., None],
                        jnp.where(fld == 4, ql[..., None], jnp.int32(0)),
                    ),
                ),
            ),
        )
        elem = jnp.where(
            (fld < 5) & (r != q), jnp.int32(1) << (3 * slot), jnp.int32(0)
        )
        cnt = elem.sum(axis=-1)                         # (B, P) fused
        s_hit = jnp.full(cnt.shape, -1, jnp.int32)
        for s in range(7, -1, -1):
            s_hit = jnp.where(((cnt >> (3 * s)) & 7) == 0, s, s_hit)
        idx = jnp.where(s_hit >= 0, h * 64 + 8 * s_hit + 5, 0)
        return jnp.where(s_hit >= 0, rows64_flat[idx], -1)

    NB8 = rows8.shape[0]
    rows128 = np.zeros((NB8, 128), np.int32)
    rows128[:, :48] = np.asarray(rows8)
    rows128 = jnp.asarray(rows128)

    def probe_pad128(k0, k1, k2, k3, ql):
        """probe8's barrier+slice-compare form on 128-int32 rows: the
        materialized gather result is lane-aligned, so consumer fusions
        pay no relayout."""
        i0 = k0.astype(jnp.int32)
        i1 = k1.astype(jnp.int32)
        i2 = k2.astype(jnp.int32)
        i3 = k3.astype(jnp.int32)
        a, b = _vhash_ab_jnp(k0, k1, k2, k3, ql)
        h = _mix(a, b, 0, t.vhash8_mask)
        r = jax.lax.optimization_barrier(rows128[h])    # (B, P, 128)
        hit = (
            (r[..., 0:8] == i0[..., None])
            & (r[..., 8:16] == i1[..., None])
            & (r[..., 16:24] == i2[..., None])
            & (r[..., 24:32] == i3[..., None])
            & (r[..., 32:40] == ql[..., None])
        )
        return jnp.max(jnp.where(hit, r[..., 40:48], -1), axis=-1)

    def mat_sum(k0, k1, k2, k3, ql):
        """Barrier + single cheap consumer: isolates the cost of
        materializing the gathered (P, 48) rows."""
        a, b = _vhash_ab_jnp(k0, k1, k2, k3, ql)
        h = _mix(a, b, 0, t.vhash8_mask)
        r = jax.lax.optimization_barrier(rows8[h])
        return r.sum(axis=-1)

    def probe8t(k0, k1, k2, k3, ql):
        """Transposed-compare probe: materialize the gathered rows as
        (48, P) so every compare/select runs full-lane on minor dim P
        (the (P, 8)-shaped intermediates of probe8 run at 8/128 lane
        utilization — that, not the materialization, is its 10 ms)."""
        i0 = k0.astype(jnp.int32)
        i1 = k1.astype(jnp.int32)
        i2 = k2.astype(jnp.int32)
        i3 = k3.astype(jnp.int32)
        a, b = _vhash_ab_jnp(k0, k1, k2, k3, ql)
        h = _mix(a, b, 0, t.vhash8_mask)
        rT = jax.lax.optimization_barrier(
            jnp.swapaxes(rows8[h], -1, -2)
        )                                               # (B, 48, P)
        out = jnp.full(ql.shape, -1, jnp.int32)
        for s in range(8):
            hit = (
                (rT[:, s, :] == i0)
                & (rT[:, 8 + s, :] == i1)
                & (rT[:, 16 + s, :] == i2)
                & (rT[:, 24 + s, :] == i3)
                & (rT[:, 32 + s, :] == ql)
            )
            out = jnp.maximum(out, jnp.where(hit, rT[:, 40 + s, :], -1))
        return out

    rows8_flat = rows8.reshape(-1)
    _M = np.zeros((5, 48), np.int32)
    for j in range(5):
        _M[j, 8 * j : 8 * j + 8] = 1
    _W = np.zeros((1, 1, 48), np.int32)
    for s in range(8):
        for j in range(5):
            _W[0, 0, 8 * j + s] = 1 << (3 * s)
    _Mj = [jnp.asarray(_M[j][None, None, :]) for j in range(5)]
    _Wj = jnp.asarray(_W)

    def cnt1b(k0, k1, k2, k3, ql):
        """Count-word probe v2: q built by constant-mask multiplies (no
        where-chains, no per-lane shifts), ONE fused full-width reduce
        producing (P,), then a flat 1-element gather for the rank."""
        a, b = _vhash_ab_jnp(k0, k1, k2, k3, ql)
        h = _mix(a, b, 0, t.vhash8_mask)
        r = rows8[h]                                    # (B, P, 48)
        q = (
            k0.astype(jnp.int32)[..., None] * _Mj[0]
            + k1.astype(jnp.int32)[..., None] * _Mj[1]
            + k2.astype(jnp.int32)[..., None] * _Mj[2]
            + k3.astype(jnp.int32)[..., None] * _Mj[3]
            + ql[..., None] * _Mj[4]
        )
        cnt = jnp.where(r != q, _Wj, 0).sum(axis=-1)    # (B, P) fused
        s_hit = jnp.full(cnt.shape, -1, jnp.int32)
        for s in range(7, -1, -1):
            s_hit = jnp.where(((cnt >> (3 * s)) & 7) == 0, s, s_hit)
        idx = jnp.where(s_hit >= 0, h * 48 + 40 + s_hit, 0)
        return jnp.where(s_hit >= 0, rows8_flat[idx], -1)


    def gather_only(k0, k1, k2, k3, ql):
        from tokendagger_tpu.ops.join import _vhash_ab_jnp
        from tokendagger_tpu.ops.merge import _mix

        a, b = _vhash_ab_jnp(k0, k1, k2, k3, ql)
        h = _mix(a, b, 0, t.vhash8_mask)
        return rows8[h].sum(axis=-1).sum(axis=-1).sum(axis=-1)

    # real-text keys: actual corpus pieces (hot buckets: common words
    # repeat, concentrating gathers on few rows)
    from tokendagger_tpu.hostengine import HostEngine

    host = HostEngine(vocab.LLAMA4_PATTERN, ranks, {})
    corpus = Path("results/corpus_4194304.txt").read_text()[: 1 << 20]
    pieces = [m.group().encode() for m in host._re.finditer(corpus)]
    pk = np.zeros((P, 16), np.uint8)
    pln = np.zeros(P, np.int32)
    for i in range(P):
        p = pieces[i % len(pieces)]
        pk[i, : min(16, len(p))] = np.frombuffer(p[:16], np.uint8)
        pln[i] = len(p)
    pkw = pk.view("<u4").reshape(P, 4)
    qk_r = [jnp.asarray(np.broadcast_to(pkw[:, j], (B, P)).copy())
            for j in range(4)]
    ql_r = jnp.asarray(np.broadcast_to(pln, (B, P)).copy())
    jax.block_until_ready(qk_r + [ql_r])

    reps = 16
    for name, jf, args in (
        ("probe8", jax.jit(probe_arm), (*qk, ql)),
        ("probe8t", jax.jit(probe8t), (*qk, ql)),
        ("probe8t_real", jax.jit(probe8t), (*qk_r, ql_r)),
        ("cnt1b", jax.jit(cnt1b), (*qk, ql)),
        ("cnt1b_real", jax.jit(cnt1b), (*qk_r, ql_r)),
        ("mat_sum", jax.jit(mat_sum), (*qk, ql)),
    ):
        out = jf(*args)
        jax.block_until_ready(out)
        td = tempfile.mkdtemp(prefix=f"ga_{name}_")
        t0 = time.perf_counter()
        with jax.profiler.trace(td):
            for _ in range(reps):
                out = jf(*args)
            jax.block_until_ready(out)
        wall = (time.perf_counter() - t0) / reps * 1e3
        try:
            dms = device_ms(td, reps)
        except Exception:
            dms = float("nan")
        print(f"{name:8s}: device {dms:8.3f} ms  wall {wall:8.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
