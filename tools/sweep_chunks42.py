"""Chip sweep: vocab_probe8t_chunks chunk count at p_cap 249728 (the
auto cap-4.2 English shape) — the heuristic picked 64 from the 262144
sweep; re-check at the new shape. Device-trace protocol, real llama
tables, random keys (gather cost is content-independent).

Usage: timeout 1800 python tools/sweep_chunks42.py [--pcap 249728]
Appends results/sweep_chunks42.log
"""

import argparse
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pcap", type=int, default=249728)
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--reps", type=int, default=16)
    ap.add_argument("--chunks", default="32,48,64,96")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tokendagger_tpu import vocab
    from tokendagger_tpu.engine import _enable_persistent_compile_cache
    from tokendagger_tpu.ops.join import vocab_probe8t_chunks
    from tokendagger_tpu.resident import _device_times_from_trace
    from tokendagger_tpu.tables import build_tables

    _enable_persistent_compile_cache(jax)
    ranks = vocab.load_tiktoken_model("/root/reference/src/tokenizer.model")
    specials = vocab.load_hf_special_tokens(
        "/root/reference/src/tokenizer_config.json")
    t = build_tables(ranks, specials)
    vh = jnp.asarray(t.vhash8_rows)

    B, P = args.b, args.pcap
    rng = np.random.default_rng(9)
    k = [jnp.asarray(rng.integers(0, 1 << 31, (B, P)).astype(np.int32)
                     .view(np.uint32)) for _ in range(4)]
    pl_ = jnp.asarray(rng.integers(1, 9, (B, P)).astype(np.int32))
    npc = jnp.asarray(np.full((B,), int(P * 0.95), np.int32))
    jax.block_until_ready([vh, pl_, npc] + k)

    log = REPO / "results" / "sweep_chunks42.log"
    lines = [f"sweep p_cap={P} B={B} reps={args.reps}"]
    for nc in [int(x) for x in args.chunks.split(",")]:
        f = jax.jit(lambda a, b_, c, d, e: vocab_probe8t_chunks(
            a, b_, c, d, e, vh, t.vhash8_mask, n_chunks=nc))
        t0 = time.perf_counter()
        out = f(*k, pl_)
        jax.block_until_ready(out)
        comp = time.perf_counter() - t0
        td = tempfile.mkdtemp(prefix=f"ch{nc}_")
        with jax.profiler.trace(td):
            for _ in range(args.reps):
                out = f(*k, pl_)
            jax.block_until_ready(out)
        ms = sum(_device_times_from_trace(td).values()) / args.reps / 1e3
        line = f"n_chunks={nc:<4} device {ms:7.3f} ms  compile {comp:5.1f}s"
        print(line, flush=True)
        lines.append(line)
    with log.open("a") as fh:
        fh.write("\n".join(lines) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
