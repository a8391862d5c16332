"""Second round of primitive calibration: batch scaling + post-sort health."""
import glob
import gzip
import json
import sys
import tempfile
import time
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


def bench(jf, args, reps=8, name=""):
    import jax
    out = jf(*args)
    jax.block_until_ready(out)
    td = tempfile.mkdtemp(prefix=f"p2_{name}_")
    t0 = time.perf_counter()
    with jax.profiler.trace(td):
        for _ in range(reps):
            out = jf(*args)
        jax.block_until_ready(out)
    wall = (time.perf_counter() - t0) / reps * 1e3
    return device_ms(td, reps), wall


def main():
    import jax
    import jax.numpy as jnp

    from tokendagger_tpu.engine import _enable_persistent_compile_cache
    _enable_persistent_compile_cache(jax)

    N = 1 << 20
    rng = np.random.default_rng(0)

    # --- scan batch scaling ------------------------------------------------
    for B in (8, 16, 32):
        d = jnp.asarray(rng.integers(0, 200, (B, N), dtype=np.int32))
        jf = jax.jit(lambda x: jnp.cumsum(x, axis=1))
        dms, wall = bench(jf, (d,), name=f"cs{B}")
        print(f"cumsum  (B={B:2d},1M): device {dms:8.3f} ms  "
              f"-> {B/dms*1e3:8.1f} MB/s-equiv")

    # --- stacked scans: k independent scans in one call --------------------
    B = 8
    for K in (1, 4, 8, 16):
        d = jnp.asarray(
            rng.integers(0, 200, (B * K, N), dtype=np.int32)
        )
        jf = jax.jit(lambda x: jax.lax.cummax(x, axis=1))
        dms, wall = bench(jf, (d,), name=f"k{K}")
        print(f"cummax (B*K={B*K:3d},1M): device {dms:8.3f} ms  "
              f"({dms/K:6.3f} ms per 8-window scan)")

    # --- sortcompact batch scaling + fewer operands ------------------------
    for B, ops in ((8, 5), (16, 5), (8, 2)):
        st = jnp.asarray(rng.random((B, N)) < 0.22)
        pay = [jnp.asarray(rng.integers(0, 1 << 30, (B, N), dtype=np.int32))
               for _ in range(ops - 1)]
        P = N // 4

        def f_sc(st, *ps):
            idx = jnp.arange(N, dtype=jnp.int32)[None, :] * jnp.ones(
                (st.shape[0], 1), jnp.int32)
            key = jnp.where(st, idx, N + idx)
            srt = jax.lax.sort((key,) + ps, dimension=1, num_keys=1)
            return [s[:, :P] for s in srt]

        jf = jax.jit(f_sc)
        dms, wall = bench(jf, (st, *pay), name=f"sc{B}_{ops}")
        print(f"sortcompact(B={B:2d},{ops}ops): device {dms:8.3f} ms")

    # --- gather words at compacted positions (alt to payload-in-sort) ------
    B, P = 8, (1 << 20) // 4
    src = jnp.asarray(rng.integers(0, 1 << 30, (B, N), dtype=np.int32))
    pos = jnp.asarray(
        np.sort(rng.integers(0, N, (B, P), dtype=np.int32), axis=1))

    def f_g4(src, pos):
        b = jnp.arange(B)[:, None]
        return [src[b, jnp.clip(pos + k, 0, N - 1)] for k in range(4)]

    dms, wall = bench(jax.jit(f_g4), (src, pos), name="g4")
    print(f"gather4x(8,256k)from(8,1M): device {dms:8.3f} ms")

    # --- post-sort health: trivial dispatch latency after many sorts -------
    xcal = jnp.arange(1024, dtype=jnp.int32)
    fcal = jax.jit(lambda x: (x * 3 + 1).sum())
    fcal(xcal).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(20):
        fcal(xcal).block_until_ready()
    print(f"trivial dispatch after sorts: "
          f"{(time.perf_counter()-t0)/20*1e3:.3f} ms (healthy < 1 ms)")


if __name__ == "__main__":
    main()
