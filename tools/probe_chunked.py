"""Real-TPU probe: live-prefix probe formulations.

The vocab probe gathers one row per CAPACITY slot; pieces only fill
~70-90% of capacity, so a live-prefix probe should save the difference.
The fori_loop (while) formulation measured 3x WORSE than the monolithic
gather (26 ms vs 9 ms at cap 3.0) — this tool isolates why, and times
the alternatives:

  a) full vmapped probe8t over (8, P)                [baseline]
  b) static unrolled 8 chunk probes (slices, no loop) [small-gather rate]
  c) fori_loop chunked, n_live = 0.7 P               [the loser]
  d) staged-cond prefix probe (lax.cond tail levels) [candidate]
  e) fori_loop with 2 big chunks                     [per-iter overhead]

Device-trace protocol; no D2H before timing.
Usage: timeout 1800 python tools/probe_chunked.py
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

    from tokendagger_tpu import vocab
    from tokendagger_tpu.engine import _enable_persistent_compile_cache
    from tokendagger_tpu.ops.join import (
        _probe8t_core, vocab_probe8t, vocab_probe8t_chunked,
    )
    from tokendagger_tpu.tables import build_tables

    _enable_persistent_compile_cache(jax)
    print("devices:", jax.devices(), flush=True)

    B, P = 8, 349_568  # 1 MB window at cap 3.0, lane-rounded, /128
    rng = np.random.default_rng(0)
    ranks = vocab.load_tiktoken_model("/root/reference/src/tokenizer.model")
    t = build_tables(ranks, {})
    rows8 = jnp.asarray(t.vhash8_rows)
    mask = t.vhash8_mask
    qk = [jnp.asarray(rng.integers(0, 2**31, (B, P)).astype(np.uint32))
          for _ in range(4)]
    ql = jnp.asarray(rng.integers(1, 17, (B, P)).astype(np.int32))
    n_live = jnp.full((B,), int(0.7 * P), jnp.int32)
    jax.block_until_ready([rows8, ql, *qk])

    def timed(name, fn, *args, reps=16):
        out = fn(*args)
        jax.block_until_ready(out)
        d = tempfile.mkdtemp(prefix="probe_chunked_")
        t0 = time.perf_counter()
        with jax.profiler.trace(d):
            for _ in range(reps):
                out = fn(*args)
            jax.block_until_ready(out)
        wall = (time.perf_counter() - t0) / reps * 1e3
        dev = device_ms(d, reps)
        print(f"{name:<42} dev {dev:8.3f} ms   wall {wall:8.2f} ms",
              flush=True)
        return dev

    # a) monolithic
    f_full = jax.jit(jax.vmap(
        lambda a, b, c, d, e: vocab_probe8t(a, b, c, d, e, rows8, mask)
    ))
    timed("a) full probe8t (8,P)", f_full, *qk, ql)

    # b) static unrolled chunks (8 slices, no control flow)
    CH = P // 8

    def unrolled(k0, k1, k2, k3, pl):
        outs = []
        for i in range(8):
            sl = slice(i * CH, (i + 1) * CH)
            outs.append(_probe8t_core(
                k0[:, sl], k1[:, sl], k2[:, sl], k3[:, sl], pl[:, sl],
                rows8, mask))
        return jnp.concatenate(outs, axis=1)

    timed("b) static 8-chunk unrolled", jax.jit(unrolled), *qk, ql)

    # c) fori_loop chunked (the measured loser), chunk = P//8
    f_chunked = jax.jit(jax.vmap(
        lambda a, b, c, d, e, n: vocab_probe8t_chunked(
            a, b, c, d, e, n, rows8, mask, chunk=CH)
    ))
    timed("c) fori chunk=P/8 live=0.7P", f_chunked, *qk, ql, n_live)

    # e) fori_loop with 2 big chunks
    f_chunk2 = jax.jit(jax.vmap(
        lambda a, b, c, d, e, n: vocab_probe8t_chunked(
            a, b, c, d, e, n, rows8, mask, chunk=P // 2)
    ))
    timed("e) fori chunk=P/2 live=0.7P", f_chunk2, *qk, ql, n_live)

    # d) staged-cond prefix probe: always probe [0, P/2); tail quarters
    # guarded by scalar lax.cond on the batch-max live count
    def staged(k0, k1, k2, k3, pl, nl):
        nmax = jnp.max(nl)

        def probe_span(lo, hi):
            sl = slice(lo, hi)
            return _probe8t_core(
                k0[:, sl], k1[:, sl], k2[:, sl], k3[:, sl], pl[:, sl],
                rows8, mask)

        base = probe_span(0, P // 2)
        parts = [base]
        for q in range(2, 4 + 1):
            lo, hi = P * (q) // 4 - P // 4, P * q // 4
            lo = P * (q - 1) // 4
            hi = P * q // 4
            part = jax.lax.cond(
                nmax > lo,
                lambda lo=lo, hi=hi: probe_span(lo, hi),
                lambda lo=lo, hi=hi: jnp.full((B, hi - lo), -1, jnp.int32),
            )
            parts.append(part)
        return jnp.concatenate(parts, axis=1)

    timed("d) staged-cond (1/2 + 2 cond quarters)", jax.jit(staged),
          *qk, ql, n_live)

    # d2) finer staging: 8 levels of P/8, first always, 7 conds
    def staged8(k0, k1, k2, k3, pl, nl):
        nmax = jnp.max(nl)

        def probe_span(lo, hi):
            sl = slice(lo, hi)
            return _probe8t_core(
                k0[:, sl], k1[:, sl], k2[:, sl], k3[:, sl], pl[:, sl],
                rows8, mask)

        parts = [probe_span(0, CH)]
        for i in range(1, 8):
            lo, hi = i * CH, min((i + 1) * CH, P)
            parts.append(jax.lax.cond(
                nmax > lo,
                lambda lo=lo, hi=hi: probe_span(lo, hi),
                lambda lo=lo, hi=hi: jnp.full((B, hi - lo), -1, jnp.int32),
            ))
        return jnp.concatenate(parts, axis=1)

    timed("d2) staged-cond (8 levels of P/8)", jax.jit(staged8),
          *qk, ql, n_live)


if __name__ == "__main__":
    main()
