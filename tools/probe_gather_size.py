"""Real-TPU probe: row-gather issue rate vs table size + scatter safety.

Decides the piece-dedup probe design: if gathers from small tables run
faster than the 491 Mrows/s issue floor measured on the 25 MB vhash8
table, then dedup-then-probe (scatter piece keys into a small claim
table, probe distinct pieces, distribute results with a small-table
gather) beats the direct per-piece probe ~16x on English piece
repetition. Also times a RANDOM scatter (the dedup claim step) and
re-times a trivial op afterwards to detect the dispatch-cliff poison
(docs/PERF.md).

Usage: timeout 1800 python tools/probe_gather_size.py
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

    Q = 2_800_000  # queries (8 windows x ~350k slots)
    rng = np.random.default_rng(0)

    def timed(name, fn, *args, reps=16):
        out = fn(*args)
        jax.block_until_ready(out)
        d = tempfile.mkdtemp(prefix="gsz_")
        t0 = time.perf_counter()
        with jax.profiler.trace(d):
            for _ in range(reps):
                out = fn(*args)
            jax.block_until_ready(out)
        wall = (time.perf_counter() - t0) / reps * 1e3
        dev = device_ms(d, reps)
        rate = Q / dev / 1e3 if dev else 0.0
        print(f"{name:<46} dev {dev:8.3f} ms ({rate:7.1f} Mrows/s) "
              f"wall {wall:7.2f}", flush=True)
        return dev

    def calib():
        x = jnp.arange(1024, dtype=jnp.int32)
        f = jax.jit(lambda v: (v * 3 + 1).sum())
        f(x).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(20):
            f(x).block_until_ready()
        print(f"  calib trivial dispatch: "
              f"{(time.perf_counter() - t0) / 20 * 1e3:.3f} ms", flush=True)

    calib()
    # --- gather rate vs table rows (48-int32 = 192 B rows) ---------------
    for nrows in (1 << 11, 1 << 14, 1 << 17):
        tbl = jnp.asarray(
            rng.integers(0, 2**31, (nrows, 48)).astype(np.int32))
        idx = jnp.asarray(rng.integers(0, nrows, Q).astype(np.int32))
        jax.block_until_ready((tbl, idx))
        f = jax.jit(lambda t, i: jax.lax.optimization_barrier(t[i]).sum())
        timed(f"gather 192B rows, table {nrows} rows "
              f"({nrows * 192 // 1024} KB)", f, tbl, idx)

    # --- gather rate vs row width at fixed table bytes -------------------
    for width in (8, 16):
        nrows = 1 << 17
        tbl = jnp.asarray(
            rng.integers(0, 2**31, (nrows, width)).astype(np.int32))
        idx = jnp.asarray(rng.integers(0, nrows, Q).astype(np.int32))
        jax.block_until_ready((tbl, idx))
        f = jax.jit(lambda t, i: jax.lax.optimization_barrier(t[i]).sum())
        timed(f"gather {width * 4}B rows, table {nrows} rows", f, tbl, idx)

    # --- random scatter (dedup claim step): rate + poison check ----------
    nslots = 1 << 16
    idx_s = jnp.asarray(rng.integers(0, nslots, Q).astype(np.int32))
    vals = jnp.asarray(rng.integers(0, 2**31, Q).astype(np.int32))
    jax.block_until_ready((idx_s, vals))

    def scat(i, v):
        return jnp.zeros((nslots,), jnp.int32).at[i].max(v, mode="drop")

    timed("random scatter-max 2.8M -> 64k slots", jax.jit(scat),
          idx_s, vals)
    calib()  # poisoned if this jumped to ~30 ms

    # element (1-wide) gather from tiny table, for the distribute step
    tbl1 = jnp.asarray(rng.integers(0, 2**31, (nslots,)).astype(np.int32))
    f1 = jax.jit(lambda t, i: jax.lax.optimization_barrier(t[i]).sum())
    timed("element gather 4B, table 64k (256 KB)", f1, tbl1, idx_s)
    # row-ified distribute: (nslots/128 rows, 128) then pick lane
    tbl2 = tbl1.reshape(nslots // 128, 128)

    def frow(t, i):
        r = jax.lax.optimization_barrier(t[i // 128])
        return jnp.take_along_axis(r, (i % 128)[:, None], axis=1).sum()

    timed("row gather 512B + lane pick, table 64k", jax.jit(frow),
          tbl2, idx_s)
    calib()


if __name__ == "__main__":
    main()
