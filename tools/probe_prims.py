"""Micro-benchmark TPU primitive strategies for the resident pipeline.

Times (device-trace) candidate formulations:
  - elementwise pass over (8,1M) i32        [baseline pass cost]
  - cumsum / cummax fwd / cummax rev        [scan soup calibration]
  - scatter-compact (current compact form)
  - scatter with stacked payload
  - lax.sort-based compaction (6 payloads)
  - 96B-row gather probe (current)          [probe calibration]
"""
import glob
import gzip
import json
import sys
import tempfile
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def device_ms(trace_dir, reps):
    paths = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
    with gzip.open(paths[-1]) as f:
        t = json.load(f)
    evs = t.get("traceEvents", [])
    dev_pids = {
        e["pid"] for e in evs
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    tot = 0.0
    for e in evs:
        if (e.get("ph") == "X" and e.get("pid") in dev_pids
                and str(e.get("name", "")).startswith("jit")):
            tot += float(e.get("dur", 0.0))
    return tot / reps / 1e3


def main():
    import jax
    import jax.numpy as jnp

    from tokendagger_tpu.engine import _enable_persistent_compile_cache
    _enable_persistent_compile_cache(jax)

    B, N = 8, 1 << 20
    P = N // 4
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.integers(0, 200, (B, N), dtype=np.int32))
    is_start = jnp.asarray(rng.random((B, N)) < 0.22)
    payload = [jnp.asarray(rng.integers(0, 1 << 30, (B, N), dtype=np.int32))
               for _ in range(6)]
    table = jnp.asarray(rng.integers(0, 1 << 30, (1 << 19, 24), dtype=np.int32))
    hidx = jnp.asarray(rng.integers(0, 1 << 19, (B, P), dtype=np.int32))

    def f_elem(d):
        return (d * 3 + 1) ^ (d >> 2)

    def f_cumsum(d):
        return jnp.cumsum(d, axis=1)

    def f_cummaxf(d):
        return jax.lax.cummax(d, axis=1)

    def f_cummaxr(d):
        return jax.lax.cummax(d, axis=1, reverse=True)

    def f_scatter6(st, *ps):
        idx = jnp.arange(N, dtype=jnp.int32)[None, :]
        pid = jnp.cumsum(st.astype(jnp.int32), axis=1) - 1
        tgt = jnp.where(st, pid, P)

        def comp(v):
            return jnp.zeros((B, P), v.dtype).at[
                jnp.arange(B)[:, None], tgt
            ].set(v, mode="drop")

        return [comp(p) for p in ps]

    def f_scatter_stacked(st, *ps):
        pid = jnp.cumsum(st.astype(jnp.int32), axis=1) - 1
        tgt = jnp.where(st, pid, P)
        stacked = jnp.stack(ps, axis=-1)  # (B, N, 6)
        out = jnp.zeros((B, P, len(ps)), stacked.dtype).at[
            jnp.arange(B)[:, None], tgt
        ].set(stacked, mode="drop")
        return out

    def f_sortcompact(st, *ps):
        idx = jnp.arange(N, dtype=jnp.int32)[None, :] * jnp.ones(
            (B, 1), jnp.int32
        )
        key = jnp.where(st, idx, jnp.int32(N))
        srt = jax.lax.sort((key,) + ps, dimension=1, num_keys=1)
        return [s[:, :P] for s in srt[1:]]

    def f_gather_rows(h):
        r = table[h]  # (B, P, 24)
        return r.sum(axis=2)

    def f_cummax_fwd_multi(d):
        # 8 chained forward cummaxes (ffill-style dependency chain)
        x = d
        for _ in range(8):
            x = jax.lax.cummax(x ^ 1, axis=1)
        return x

    cases = [
        ("elementwise", f_elem, (data,)),
        ("cumsum", f_cumsum, (data,)),
        ("cummax_fwd", f_cummaxf, (data,)),
        ("cummax_rev", f_cummaxr, (data,)),
        ("cummax_fwd_x8", f_cummax_fwd_multi, (data,)),
        ("scatter6", f_scatter6, (is_start, *payload)),
        ("scatter_stacked", f_scatter_stacked, (is_start, *payload)),
        ("sortcompact", f_sortcompact, (is_start, *payload)),
        ("gather_rows96B", f_gather_rows, (hidx,)),
    ]
    reps = 8
    for name, fn, args in cases:
        jf = jax.jit(fn)
        out = jf(*args)
        jax.block_until_ready(out)
        td = tempfile.mkdtemp(prefix=f"prim_{name}_")
        t0 = time.perf_counter()
        with jax.profiler.trace(td):
            for _ in range(reps):
                out = jf(*args)
            jax.block_until_ready(out)
        wall = (time.perf_counter() - t0) / reps * 1e3
        try:
            dms = device_ms(td, reps)
        except Exception as e:
            dms = float("nan")
        print(f"{name:18s} device {dms:8.3f} ms   wall {wall:8.2f} ms "
              f"({8.0/ (dms or 1e9) * 1e3:7.1f} MB/s-equiv)")


if __name__ == "__main__":
    main()
