"""Bisect the non-ASCII resident pipeline's compile times on the live
chip: each stage program compiled standalone at the production shapes
(8 x 1 MB windows, c_cap = N/4), one SUBPROCESS per stage so a single
wedged compile cannot hide the others' results.

    python tools/probe_nonascii_compile.py            # driver (all stages)
    python tools/probe_nonascii_compile.py --stage dec  # one stage inline

Appends to results/probe_nonascii_compile.log as each stage returns.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

B = 8
N = 1 << 20
C = N // 4
R, L = 256, 128
G = N // (R * L)
OUT_ROWS = C // L + G + R
CAP_BPP = 3.0

STAGES = ["dec", "starts", "regap", "exptiles", "compact", "fin"]


def run_stage(stage: str) -> dict:
    import jax
    import jax.numpy as jnp

    from tokendagger_tpu.engine import _enable_persistent_compile_cache

    _enable_persistent_compile_cache(jax)
    rng = np.random.default_rng(3)
    t0 = time.perf_counter()

    if stage == "dec":
        from tokendagger_tpu.ops.pretokenize import utf8_decode_tiles

        data = rng.integers(0, 128, (B, N)).astype(np.uint8)
        nb = np.full((B,), N, np.int32)
        out = jax.jit(
            lambda d, n: utf8_decode_tiles(d, n, c_cap=C)
        )(jnp.asarray(data), jnp.asarray(nb))
    elif stage == "starts":
        from tokendagger_tpu.ops.bitplane import piece_starts_bits_pallas
        from tokendagger_tpu.unicode_tables import get_two_level_tables

        page_ids, pages = map(jnp.asarray, get_two_level_tables())
        cp = rng.integers(1, 0x2600, (B, C)).astype(np.int32)
        m = np.full((B,), C, np.int32)
        out = jax.jit(
            lambda c, mm: piece_starts_bits_pallas(
                c, mm, page_ids, pages, ascii_fast=False)
        )(jnp.asarray(cp), jnp.asarray(m))
    elif stage == "regap":
        from tokendagger_tpu.ops.compact_pallas import regap_replay

        dense = rng.integers(0, 2, (B, C)).astype(np.int32)
        takes = rng.integers(0, 1 << 12, (B, OUT_ROWS, L)).astype(np.int32)
        out = jax.jit(
            lambda d, t: regap_replay(d, t, G * L)
        )(jnp.asarray(dense), jnp.asarray(takes))
    elif stage == "exptiles":
        from tokendagger_tpu.ops.compact_pallas import expand_tiles_replay

        gapped = rng.integers(0, 2, (B, OUT_ROWS, L)).astype(np.int32)
        lead = rng.random((B, N)) < 0.25
        tk = rng.integers(0, 1 << 15, (B, G * R, L)).astype(np.int32)
        cnts = rng.integers(0, R * L // 4, (B, G)).astype(np.int32)
        out = jax.jit(
            lambda gp, ld, t, c: expand_tiles_replay(gp, ld, t, c)
        )(jnp.asarray(gapped), jnp.asarray(lead), jnp.asarray(tk),
          jnp.asarray(cnts))
    elif stage == "compact":
        from tokendagger_tpu.ops.compact_pallas import (
            compact_piece_keys_butterfly,
        )
        from tokendagger_tpu.ops.fused import caps_for

        p_cap = caps_for(N, bytes_per_piece=CAP_BPP)["p_cap"]
        st = (rng.random((B, N)) < 0.25)
        data = rng.integers(32, 127, (B, N)).astype(np.uint8)
        nb = np.full((B,), N, np.int32)
        out = compact_piece_keys_butterfly(
            jnp.asarray(st), jnp.asarray(data), jnp.asarray(nb), p_cap)
    elif stage == "fin":
        from tokendagger_tpu.ops.compact_pallas import finalize_butterfly
        from tokendagger_tpu.ops.fused import caps_for

        p_cap = caps_for(N, bytes_per_piece=CAP_BPP)["p_cap"]
        sb = np.sort(rng.integers(0, N, (B, p_cap)).astype(np.int32), 1)
        pl_ = rng.integers(1, 8, (B, p_cap)).astype(np.int32)
        rank = rng.integers(-1, 1000, (B, p_cap)).astype(np.int32)
        npc = np.full((B,), p_cap // 2, np.int32)
        out = finalize_butterfly(
            jnp.asarray(sb), jnp.asarray(pl_), jnp.asarray(rank),
            jnp.asarray(npc), jnp.int32(N), p_cap=p_cap)
    else:
        raise SystemExit(f"unknown stage {stage}")

    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    # warm re-run for an execution-time hint (block only; no D2H)
    t0 = time.perf_counter()
    for _ in range(3):
        pass  # compile time is the question; exec timing via resident.py
    return {"stage": stage, "compile_s": round(compile_s, 1)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default=None, choices=STAGES)
    ap.add_argument("--timeout", type=float, default=1500.0)
    args = ap.parse_args()

    if args.stage:
        print(json.dumps(run_stage(args.stage)), flush=True)
        return 0

    log = REPO / "results" / "probe_nonascii_compile.log"
    with log.open("a") as f:
        f.write(f"=== run at {time.strftime('%F %T')} (timeout "
                f"{args.timeout:.0f}s per stage) ===\n")
        for stage in STAGES:
            t0 = time.perf_counter()
            try:
                p = subprocess.run(
                    [sys.executable, __file__, "--stage", stage],
                    capture_output=True, text=True, timeout=args.timeout,
                )
                line = (p.stdout.strip().splitlines() or ["?"])[-1]
                if not line.startswith("{"):
                    line = json.dumps({
                        "stage": stage, "rc": p.returncode,
                        "err": (p.stderr.strip().splitlines()
                                or ["no output"])[-1][-160:]})
            except subprocess.TimeoutExpired:
                line = json.dumps({
                    "stage": stage,
                    "wedged": f">{args.timeout:.0f}s "
                              f"({time.perf_counter() - t0:.0f}s wall)"})
            print(line, flush=True)
            f.write(line + "\n")
            f.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
