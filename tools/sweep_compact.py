"""Real-TPU sweep: compact tile_rows x probe chunk count at the flagship
shape (8 x 1 MB windows, cap 4.0, packed flags).

The round-3 stage budget (docs/PERF.md) leaves compact (2.16 ms) and the
probe's 0.67 ms over its 4.27 ms gather-issue floor as the remaining
headroom above ~917 MB/s. This tool isolates both stages with the
device-trace protocol (no D2H before timing) and sweeps:

  compact_piece_keys_butterfly: tile_rows in {128, 256, 512}
    (rounds/tile = log2(tile_rows*128); fewer rows = fewer rounds but
     more grid steps + DMAs; packed flags require N == 32*blk so only
     tile_rows=256 can take the packed handoff at 1 MB windows)
  vocab_probe8t_chunks: n_chunks in {16, 32, 48, 64} at p_cap 262144

Usage: timeout 2400 python tools/sweep_compact.py
"""
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tokendagger_tpu import vocab
    from tokendagger_tpu.engine import _enable_persistent_compile_cache
    from tokendagger_tpu.ops.bitplane import pack_mask
    from tokendagger_tpu.ops.compact_pallas import (
        compact_piece_keys_butterfly,
    )
    from tokendagger_tpu.ops.fused import caps_for
    from tokendagger_tpu.ops.join import vocab_probe8t_chunks
    from tokendagger_tpu.tables import build_tables

    _enable_persistent_compile_cache(jax)
    print("devices:", jax.devices(), flush=True)

    B, N = 8, 1 << 20
    bpp = 3.0 if "--cap3" in sys.argv else 4.0
    p_cap = caps_for(N, bytes_per_piece=bpp)["p_cap"]
    rng = np.random.default_rng(0)
    ranks = vocab.load_tiktoken_model("/root/reference/src/tokenizer.model")
    t = build_tables(ranks, {})
    rows8 = jnp.asarray(t.vhash8_rows)
    vmask = t.vhash8_mask

    # English-like flag density (~23% starts) + ASCII bytes
    data = jnp.asarray(rng.integers(32, 127, (B, N)).astype(np.uint8))
    st_b = rng.random((B, N)) < 0.23
    st_b[:, 0] = True
    starts = jnp.asarray(st_b)
    words = jax.jit(jax.vmap(pack_mask))(starts)
    nbytes = jnp.full((B,), N, jnp.int32)
    qk = [jnp.asarray(rng.integers(0, 2**31, (B, p_cap)).astype(np.uint32))
          for _ in range(4)]
    ql = jnp.asarray(rng.integers(1, 17, (B, p_cap)).astype(np.int32))
    jax.block_until_ready([rows8, data, starts, words, nbytes, ql, *qk])

    def timed(name, fn, *args, reps=12):
        from tokendagger_tpu.resident import _device_times_from_trace

        out = fn(*args)
        jax.block_until_ready(out)
        d = tempfile.mkdtemp(prefix="sweep_compact_")
        t0 = time.perf_counter()
        with jax.profiler.trace(d):
            for _ in range(reps):
                out = fn(*args)
            jax.block_until_ready(out)
        wall = (time.perf_counter() - t0) / reps * 1e3
        dev = sum(_device_times_from_trace(d).values()) / reps / 1e3
        print(f"{name:42s} dev {dev:7.3f} ms  wall {wall:7.1f} ms",
              flush=True)
        return dev

    # tile_rows=512 would need blk=65536 > 2^15 lidx+disp packing — invalid
    if "--probe-only" not in sys.argv:
        for tr in (128, 256):
            fn = jax.jit(lambda s, d, nb, tr=tr: compact_piece_keys_butterfly(
                s, d, nb, p_cap, tile_rows=tr))
            timed(f"compact tile_rows={tr} bool", fn, starts, data, nbytes)
        fnp = jax.jit(lambda s, d, nb: compact_piece_keys_butterfly(
            s, d, nb, p_cap, tile_rows=256, packed=True))
        timed("compact tile_rows=256 packed", fnp, words, data, nbytes)

    chunk_arms = ((32, 48, 64, 96) if "--cap3" in sys.argv
                  else (16, 32, 48, 64, 96, 128, 192, 256))
    for nc in chunk_arms:
        fn = jax.jit(lambda *a, nc=nc: vocab_probe8t_chunks(
            *a, rows8, vmask, n_chunks=nc))
        timed(f"probe chunks={nc} p_cap={p_cap}", fn, *qk, ql)


if __name__ == "__main__":
    main()
