"""Real-TPU breakdown of the starts stage (fused ASCII decode +
bit-plane mask construction/packing in XLA + the Pallas scan kernel).

The flagship stage measures ~1.97 ms per 8 MB (stage_us
jit_starts_bits_pallas_stage) while its HBM traffic is ~25 MB — far off
bandwidth, so it is VPU-bound. This tool splits the stage on the chip:

  a) full fused stage (bytes -> packed start words), as resident.py runs it
  b) mask construction + pack only (bytes -> 12 packed mask planes)
  c) the Pallas derivation kernel only (packed planes -> start words)

Usage: timeout 1800 python tools/sweep_starts.py
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

    from tokendagger_tpu.engine import _enable_persistent_compile_cache
    from tokendagger_tpu.ops import bitplane as bp
    from tokendagger_tpu.unicode_tables import get_two_level_tables

    _enable_persistent_compile_cache(jax)
    print("devices:", jax.devices(), flush=True)

    B, N = 8, 1 << 20
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.integers(32, 127, (B, N)).astype(np.uint8))
    nbytes = jnp.full((B,), N, jnp.int32)
    page_ids, pages = map(jnp.asarray, get_two_level_tables())
    jax.block_until_ready([data, nbytes, page_ids, pages])

    def timed(name, fn, *args, reps=12):
        from tokendagger_tpu.resident import _device_times_from_trace

        out = fn(*args)
        jax.block_until_ready(out)
        d = tempfile.mkdtemp(prefix="sweep_starts_")
        t0 = time.perf_counter()
        with jax.profiler.trace(d):
            for _ in range(reps):
                out = fn(*args)
            jax.block_until_ready(out)
        wall = (time.perf_counter() - t0) / reps * 1e3
        dev = sum(_device_times_from_trace(d).values()) / reps / 1e3
        print(f"{name:46s} dev {dev:7.3f} ms  wall {wall:7.1f} ms",
              flush=True)
        return dev

    # a) the full fused stage exactly as resident.py's flagship runs it
    # (raw uint8 windows; ascii_fast builds masks in plane space)
    def full_stage(dv, nbs):
        return bp.piece_starts_bits_pallas(
            dv, nbs, page_ids, pages, contractions=True,
            ascii_fast=True, packed_out=True)

    timed("full stage (decode+masks+pack+kernel)",
          jax.jit(full_stage), data, nbytes)

    # b) masks + pack only (plane-space form; pass --char for the old
    # char-space compare+pack form)
    if "--char" in sys.argv:
        def masks_pack(dv, nbs):
            cp = dv.astype(jnp.int32)

            def one(cp_row, m_row):
                mk = bp._char_masks(cp_row, m_row, page_ids, pages,
                                    contractions=True, ascii_fast=True)
                return tuple(bp.pack_mask(mk[k]) for k in bp.MASK_ORDER)

            return jax.vmap(one)(cp, nbs)
    else:
        def masks_pack(dv, nbs):
            def one(by_row, m_row):
                d = bp._char_masks_planes(by_row, m_row, contractions=True)
                return tuple(d[k] for k in bp.MASK_ORDER)

            return jax.vmap(one)(dv, nbs)

    packed = jax.jit(masks_pack)(data, nbytes)
    jax.block_until_ready(packed)
    timed("masks+pack only", jax.jit(masks_pack), data, nbytes)

    # c) the Pallas kernel only, on pre-packed planes
    from jax.experimental import pallas as pl

    c = N // 32
    lanes = 128
    rows = c // lanes
    tiles = [p.reshape(B, rows, lanes) for p in packed]
    jax.block_until_ready(tiles)

    def kern(*refs):
        in_refs = refs[:-1]
        out_ref = refs[-1]
        P = {k: r[0] for k, r in zip(bp.MASK_ORDER, in_refs)}
        bp._TILE = True
        try:
            out = bp.derive_starts_words(P, contractions=True, n_total=N)
        finally:
            bp._TILE = False
        out_ref[0] = out

    spec = pl.BlockSpec((1, rows, lanes), lambda b: (b, 0, 0))

    def kernel_only(*tls):
        return pl.pallas_call(
            kern,
            grid=(B,),
            in_specs=[spec] * len(bp.MASK_ORDER),
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, rows, lanes), jnp.uint32),
        )(*tls)

    timed("pallas derivation kernel only", jax.jit(kernel_only), *tiles)


if __name__ == "__main__":
    main()
