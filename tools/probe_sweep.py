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

    from tokendagger_tpu.ops.bitplane import (
        piece_starts_bits, piece_starts_bits_pallas,
    )

    def starts_bits(cp, m):
        return jax.vmap(
            lambda c, mm: piece_starts_bits(
                c, mm, page_ids, pages, contractions=True, profile="llama4"
            )
        )(cp, m)

    def starts_bits_pl(cp, m):
        return piece_starts_bits_pallas(
            cp, m, page_ids, pages, contractions=True, profile="llama4"
        )

    def starts_bits_pl_ascii(cp, m):
        return piece_starts_bits_pallas(
            cp, m, page_ids, pages, contractions=True, profile="llama4",
            ascii_fast=True,
        )

    def starts_bits_ascii(cp, m):
        return jax.vmap(
            lambda c, mm: piece_starts_bits(
                c, mm, page_ids, pages, contractions=True,
                profile="llama4", ascii_fast=True,
            )
        )(cp, m)

    def pack_only_ascii(cp, m):
        from tokendagger_tpu.ops.bitplane import (
            MASK_ORDER, _char_masks, pack_mask,
        )

        def one(c, mm):
            mk = _char_masks(c, mm, page_ids, pages, contractions=True,
                             ascii_fast=True)
            return tuple(pack_mask(mk[k]) for k in MASK_ORDER)

        return jax.vmap(one)(cp, m)

    cases = [
        ("bits_pl_ascii", jax.jit(starts_bits_pl_ascii), (cp, m)),
        ("bits_ascii", jax.jit(starts_bits_ascii), (cp, m)),
        ("pack_ascii", jax.jit(pack_only_ascii), (cp, m)),
        ("bits_pallas", jax.jit(starts_bits_pl), (cp, m)),
        ("jnp", jax.jit(starts_jnp), (cp, m)),
    ]

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
        if name == "jnp" or name.startswith("pack"):
            continue
        got = np.asarray(o).astype(bool)
        eq = np.array_equal(ref, got)
        print(f"{name:12s} match_jnp={eq}"
              + ("" if eq else f"  ndiff={int((ref != got).sum())}"),
              flush=True)


if __name__ == "__main__":
    main()
