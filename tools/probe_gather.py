"""Real-TPU probe: row-gather cost vs row width.

The whole-piece vocab probe is a row gather per piece; whether it is
latency-bound (count of rows) or bandwidth-bound (bytes moved) decides
the right table layout (one 192 B 8-slot row vs fingerprint+verify
split). Times gathers of P rows from a (nb, W) int32 table for
W in {2, 8, 24, 48} at the resident pipeline's scale (P = p_cap * 8
windows). Device-trace protocol; no D2H before timing.

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
        ("probe8_real", jax.jit(probe_arm), (*qk_r, ql_r)),
        ("gather1", jax.jit(gather_only), (*qk, ql)),
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

    for W in (2, 8, 24, 48):
        tab = jnp.asarray(rng.integers(0, 2**31, (NB, W)).astype(np.int32))

        def f(idx, tab=tab):
            r = tab[idx]                      # (B, P, W)
            return r.sum(axis=-1).sum(axis=-1)

        jf = jax.jit(f)
        out = jf(idx)
        jax.block_until_ready(out)
        td = tempfile.mkdtemp(prefix=f"gather_w{W}_")
        t0 = time.perf_counter()
        with jax.profiler.trace(td):
            for _ in range(reps):
                out = jf(idx)
            jax.block_until_ready(out)
        wall = (time.perf_counter() - t0) / reps * 1e3
        try:
            dms = device_ms(td, reps)
        except Exception:
            dms = float("nan")
        rows_per_s = B * P / (dms / 1e3) if dms == dms and dms else 0.0
        gbps = B * P * W * 4 / (dms / 1e3) / 1e9 if dms == dms and dms else 0.0
        print(f"W={W:3d} ({W*4:4d} B/row): device {dms:8.3f} ms  "
              f"wall {wall:8.2f} ms  {rows_per_s/1e6:7.1f} Mrows/s  "
              f"{gbps:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
