"""Real-TPU decomposition of vocab_probe_hot at the flagship shape:
how the 2.6-3.0 ms probe splits into hot-compare / compact+degap /
dense gather-probe / regap+expand. Quantifies the next-round lever
(the butterfly machinery legs) with measured numbers for docs/PERF.md.

Usage: timeout 2400 python tools/probe_hot_decomp.py [reps]
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

    from tokendagger_tpu.ops.compact_pallas import (
        LANES, compact_tiles_masked, degap_record, expand_tiles_replay,
        regap_replay,
    )
    from tokendagger_tpu.ops.join import vocab_probe8t_chunks

    B, P = 8, 262144          # flagship hot-probe piece shape
    U = 48000                 # dense unknown capacity (80% hot coverage)
    K = 128
    rng = np.random.default_rng(0)
    qk = [jax.device_put(jnp.asarray(
        rng.integers(0, 1 << 31, (B, P), dtype=np.int64).astype(np.uint32)))
        for _ in range(4)]
    qlen = jax.device_put(jnp.asarray(
        rng.integers(1, 17, (B, P), dtype=np.int64).astype(np.int32)))
    # fake vocab table at the real size
    nb8 = 1 << 17
    rows = jax.device_put(jnp.asarray(
        rng.integers(0, 1 << 30, (nb8, 48), dtype=np.int64).astype(np.int32)))
    hot = rng.integers(1, 1 << 30, (K, 5), dtype=np.int64)
    jax.block_until_ready([*qk, qlen, rows])

    def timed(name, fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        d = tempfile.mkdtemp(prefix="hd_")
        t0 = time.perf_counter()
        with jax.profiler.trace(d):
            for _ in range(reps):
                out = fn(*args)
            jax.block_until_ready(out)
        wall = (time.perf_counter() - t0) / reps * 1e3
        dev = device_ms(d, reps)
        print(f"{name:<52} dev {dev:8.3f} ms  wall {wall:8.2f}", flush=True)
        return dev

    # 1. hot compare alone
    @jax.jit
    def v_hot(k0, k1, k2, k3, ln):
        hotm = jnp.zeros(k0.shape, jnp.bool_)
        rhot = jnp.full(k0.shape, -1, jnp.int32)
        for i in range(K):
            m = ((k0 == np.uint32(hot[i, 0])) & (k1 == np.uint32(hot[i, 1]))
                 & (k2 == np.uint32(hot[i, 2])) & (k3 == np.uint32(hot[i, 3]))
                 & (ln == np.int32(hot[i, 4] % 16 + 1)))
            hotm = hotm | m
            rhot = jnp.where(m, np.int32(i), rhot)
        return hotm, rhot

    timed(f"1 hot-{K} compare @ {B}x{P}", v_hot, *qk, qlen)

    # 2. compact 5 arrays + degap (the forward machinery)
    bc = jax.lax.bitcast_convert_type
    mask_np = rng.random((B, P)) < (U - 2048) / P
    maskd = jax.device_put(jnp.asarray(mask_np))

    @jax.jit
    def v_fwd(k0, k1, k2, k3, ln, m):
        gapped, cnts, takes = compact_tiles_masked(
            [bc(k0, jnp.int32), bc(k1, jnp.int32), bc(k2, jnp.int32),
             bc(k3, jnp.int32), ln], m, out_cap=U)
        dense, dtakes = degap_record(list(gapped), cnts, p_rows=U // LANES)
        return dense, dtakes, cnts, takes

    dense, dtakes, cnts, takes = jax.block_until_ready(
        v_fwd(*qk, qlen, maskd))
    timed("2 compact 5 arrays + degap_record (forward)", v_fwd, *qk,
          qlen, maskd)

    # 3. dense chunked probe at U
    d5 = [x.reshape(B, U) for x in dense]

    @jax.jit
    def v_probe(d0, d1, d2, d3, dl):
        return vocab_probe8t_chunks(
            bc(d0, jnp.uint32), bc(d1, jnp.uint32), bc(d2, jnp.uint32),
            bc(d3, jnp.uint32), dl, rows, nb8 - 1, n_chunks=96)

    timed(f"3 dense chunked probe @ {B}x{U}", v_probe, *d5)

    # 4. regap + expand (the return machinery, 1 array)
    r_u = jax.block_until_ready(v_probe(*d5))

    @jax.jit
    def v_back(r, dt, c, tk, m):
        g = regap_replay(r, dt, c.shape[1] * LANES)
        return expand_tiles_replay(g, m, tk, c)

    timed("4 regap_replay + expand_tiles_replay (return)", v_back,
          r_u, dtakes, cnts, takes, maskd)


if __name__ == "__main__":
    main()
