"""Real-TPU probe: non-ASCII class-lookup formulations.

The general (non-ASCII) scanner path pays one class-table lookup per
char. Decomposes the measured 60 ms/8M chars (probe_cls.log single_lvl)
into gather vs consumer cost and tests row-gather recastings:

  elem_sum   — flat[cp] with ONE fused sum consumer (pure gather floor)
  elem_bar   — flat[cp] + barrier + the 6 mask bit-tests (current shape)
  row2_sel   — (2^20, 2) row gather by cp>>1 + fused one-hot lane select
  row2_bar   — row2 select + barrier + 6 mask bit-tests
  row8_sel   — (2^17, 8) row gather by cp>>3 + fused one-hot select

Usage: timeout 1800 python tools/probe_cls2.py
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
    from tokendagger_tpu.unicode_tables import get_two_level_tables

    _enable_persistent_compile_cache(jax)
    print("devices:", jax.devices(), flush=True)

    page_ids, pages = get_two_level_tables()
    flat_np = pages[page_ids.astype(np.int32)].astype(np.int32).reshape(-1)
    F = flat_np.shape[0]
    flat = jnp.asarray(flat_np)
    row2 = jnp.asarray(flat_np.reshape(F // 2, 2))
    row8 = jnp.asarray(flat_np.reshape(F // 8, 8))

    N = 8 << 20
    rng = np.random.default_rng(0)
    # realistic mixed codepoints: mostly CJK/emoji/latin-ext
    cp_np = np.concatenate([
        rng.integers(0x4E00, 0x9FFF, N // 2),        # CJK
        rng.integers(0x1F300, 0x1FAFF, N // 4),      # emoji
        rng.integers(0x80, 0x2000, N - N // 2 - N // 4),
    ]).astype(np.int32)
    rng.shuffle(cp_np)
    cp = jnp.asarray(cp_np)
    jax.block_until_ready([flat, row2, row8, cp])

    WS, RN, LETTER, NUM, UC, LC = 1, 2, 4, 8, 16, 32

    def masks(cls):
        return (
            ((cls & WS) != 0).sum() + ((cls & RN) != 0).sum()
            + ((cls & LETTER) != 0).sum() + ((cls & NUM) != 0).sum()
            + ((cls & UC) != 0).sum() + ((cls & LC) != 0).sum()
        )

    def elem_sum(cp):
        return flat[cp].sum()

    def elem_bar(cp):
        cls = jax.lax.optimization_barrier(flat[cp])
        return masks(cls)

    def row2_sel(cp):
        r = row2[cp >> 1]                              # (N, 2)
        lane = (cp & 1)[:, None]
        iot = jax.lax.broadcasted_iota(jnp.int32, (1, 2), 1)
        return jnp.where(iot == lane, r, 0).sum(axis=1).sum()

    def row2_bar(cp):
        r = row2[cp >> 1]
        lane = (cp & 1)[:, None]
        iot = jax.lax.broadcasted_iota(jnp.int32, (1, 2), 1)
        cls = jax.lax.optimization_barrier(
            jnp.where(iot == lane, r, 0).sum(axis=1)
        )
        return masks(cls)

    def row8_sel(cp):
        r = row8[cp >> 3]                              # (N, 8)
        lane = (cp & 7)[:, None]
        iot = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
        return jnp.where(iot == lane, r, 0).sum(axis=1).sum()

    row4 = jnp.asarray(flat_np.reshape(F // 4, 4))
    row16 = jnp.asarray(flat_np.reshape(F // 16, 16))
    row32 = jnp.asarray(flat_np.reshape(F // 32, 32))
    # byte-packed: 4 chars per int32, 8-int rows cover 32 chars
    packed_np = (
        flat_np.astype(np.uint32).reshape(-1, 4)
        * (np.uint32(1) << (8 * np.arange(4, dtype=np.uint32)))[None, :]
    ).sum(axis=1, dtype=np.uint32).astype(np.int32)
    rowp8 = jnp.asarray(packed_np.reshape(F // 32, 8))
    jax.block_until_ready([row4, row16, row32, rowp8])

    def rowW_sel(tab, shift, mask):
        def f(cp):
            r = tab[cp >> shift]
            W = tab.shape[1]
            lane = (cp & mask)[:, None]
            iot = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
            return jnp.where(iot == lane, r, 0).sum(axis=1).sum()
        return f

    def rowp8_sel(cp):
        r = rowp8[cp >> 5]                             # (N, 8) packed
        lane = ((cp >> 2) & 7)[:, None]
        iot = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
        word = jnp.where(iot == lane, r, 0).sum(axis=1)
        byte = (cp & 3).astype(jnp.uint32) * jnp.uint32(8)
        return (
            (word.astype(jnp.uint32) >> byte) & jnp.uint32(0xFF)
        ).astype(jnp.int32).sum()

    reps = 16
    for name, f in (
        ("row4_sel", rowW_sel(row4, 2, 3)),
        ("row8_sel", row8_sel),
        ("row16_sel", rowW_sel(row16, 4, 15)),
        ("row32_sel", rowW_sel(row32, 5, 31)),
        ("rowp8_sel", rowp8_sel),
    ):
        jf = jax.jit(f)
        out = jf(cp)
        jax.block_until_ready(out)
        td = tempfile.mkdtemp(prefix=f"cls_{name}_")
        t0 = time.perf_counter()
        with jax.profiler.trace(td):
            for _ in range(reps):
                out = jf(cp)
            jax.block_until_ready(out)
        wall = (time.perf_counter() - t0) / reps * 1e3
        try:
            dms = device_ms(td, reps)
        except Exception:
            dms = float("nan")
        print(f"{name:9s}: device {dms:8.3f} ms  wall {wall:8.2f} ms  "
              f"{N / (dms / 1e3) / 1e6:7.1f} Mchars/s", flush=True)


if __name__ == "__main__":
    main()
