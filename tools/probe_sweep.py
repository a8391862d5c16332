"""Real-TPU probe: Pallas-sweep piece_starts vs the staged jnp derivation.

Times (device-trace protocol, docs/PERF.md) the two formulations of the
starts stage on B=8 x 1 MB ASCII corpus windows:

  - jnp:   jit(vmap(pretokenize.piece_starts_jax))   [current resident stage]
  - sweep: piece_starts_sweep (Pallas, grid=(B, G))  [candidate]

then ONE verification read at the very end (D2H poisons the session, so it
comes after all timing). Usage: timeout 900 python tools/probe_sweep.py
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
    from tokendagger_tpu.ops import pretokenize as PT
    from tokendagger_tpu.ops.sweep_starts import piece_starts_sweep
    from tokendagger_tpu.unicode_tables import get_two_level_tables

    _enable_persistent_compile_cache(jax)
    print("devices:", jax.devices(), flush=True)

    B, N = 8, 1 << 20
    corpus = Path("results/corpus_4194304.txt").read_bytes()
    wins = np.zeros((B, N), dtype=np.uint8)
    for b in range(B):
        lo = (b * N) % max(1, len(corpus) - N)
        chunk = corpus[lo : lo + N]
        wins[b, : len(chunk)] = np.frombuffer(chunk, dtype=np.uint8)
    page_ids, pages = map(jnp.asarray, get_two_level_tables())
    dev = jnp.asarray(wins)
    nb = jnp.full((B,), N, jnp.int32)

    v_dec = jax.jit(jax.vmap(PT._utf8_decode_ascii_j))
    cp, cob, boc, m = v_dec(dev, nb)
    jax.block_until_ready((cp, m))

    def starts_jnp(cp, m):
        return jax.vmap(
            lambda c, mm: PT.piece_starts_jax(
                c, mm, page_ids, pages, contractions=True, profile="llama4"
            )
        )(cp, m)

    # calibration: one minimal pass (1 cummax + 1 shift) through the same
    # sweep driver — isolates the per-pass floor from the derivation logic
    from tokendagger_tpu.ops import sweep_starts as SS

    def body_calib(ctx, f):
        return ctx.cummax(f) + ctx.prev(f, 1, 0)

    def calib_one(feat8):
        m_arr = jnp.full((B,), N, jnp.int32)
        (o,) = SS._sweep_pass(
            body_calib, [feat8], 1, m_arr, reverse=False, R=256,
            interpret=False,
        )
        return o

    feat8 = jax.vmap(
        lambda c, mm: SS.pack_feat(c, mm, page_ids, pages, contractions=True)
    )(cp, jnp.full((B,), N, jnp.int32))
    jax.block_until_ready(feat8)

    def packfeat_only(cp, m):
        return jax.vmap(
            lambda c, mm: SS.pack_feat(
                c, mm, page_ids, pages, contractions=True
            )
        )(cp, m)

    cases = [
        ("calib1pass", jax.jit(calib_one), (feat8,)),
        ("pack_feat", jax.jit(packfeat_only), (cp, m)),
        ("jnp", jax.jit(starts_jnp), (cp, m)),
    ]
    for R in (256, 512):
        cases.append((
            f"sweep_R{R}",
            jax.jit(lambda cp, m, R=R: piece_starts_sweep(
                cp, m, page_ids, pages, contractions=True,
                profile="llama4", R=R,
            )),
            (cp, m),
        ))

    reps = 8
    outs = {}
    for name, jf, args in cases:
        t0 = time.perf_counter()
        out = jf(*args)
        jax.block_until_ready(out)
        print(f"{name:12s} compile+first {time.perf_counter()-t0:6.1f} s",
              flush=True)
        td = tempfile.mkdtemp(prefix=f"sweep_{name}_")
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
        mbs = B * N / 1e6 / (dms / 1e3) if dms == dms and dms else 0.0
        print(f"{name:12s} device {dms:8.3f} ms   wall {wall:8.2f} ms "
              f"({mbs:7.1f} MB/s)", flush=True)
        outs[name] = out

    # verification LAST (the D2H reads flip the session into degraded mode)
    ref = np.asarray(outs["jnp"]).astype(bool)
    for name, o in outs.items():
        if name == "jnp":
            continue
        got = np.asarray(o).astype(bool)
        eq = np.array_equal(ref, got)
        print(f"{name:12s} match_jnp={eq}"
              + ("" if eq else f"  ndiff={int((ref != got).sum())}"),
              flush=True)


if __name__ == "__main__":
    main()
