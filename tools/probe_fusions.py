"""Fusion-level trace breakdown of the resident batched pipeline stages.

Runs the batch=8 pipeline once under the profiler and prints the top
device ops by total time, so optimization targets specific fusions
instead of whole jit programs.
"""
import glob
import gzip
import json
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
    from tokendagger_tpu.ops import pretokenize as PT
    from tokendagger_tpu.ops.fused import caps_for, finalize_host
    from tokendagger_tpu.ops.join import compact_piece_keys, vocab_probe
    from tokendagger_tpu.tables import build_tables
    from tokendagger_tpu.unicode_tables import get_two_level_tables

    _enable_persistent_compile_cache(jax)
    ranks = vocab.load_tiktoken_model("/root/reference/src/tokenizer.model")
    tables = build_tables(ranks, {})
    page_ids, pages = map(jnp.asarray, get_two_level_tables())
    vhash_rows = jnp.asarray(tables.vhash_rows)

    N = 1 << 20
    B = 8
    caps = caps_for(N)
    p_cap = caps["p_cap"]
    corpus = Path("results/corpus_4194304.txt").read_bytes()
    wins = np.zeros((B, N), dtype=np.uint8)
    for b in range(B):
        lo = (b * N) % (len(corpus) - N)
        wins[b] = np.frombuffer(corpus[lo : lo + N], dtype=np.uint8)
    devs = jnp.asarray(wins)
    nbs = jnp.full((B,), N, jnp.int32)
    trim = jnp.int32(N)

    def dec_stage(d, nb):
        return PT.utf8_decode(d, nb, use_pallas=False)

    def starts_stage(cp, m):
        return PT.piece_starts_jax(cp, m, page_ids, pages,
                                   contractions=True, profile="llama4")

    def compact_stage(st, boc, d, nb):
        return compact_piece_keys(st, boc, d, nb, p_cap)

    def probe_stage(k0, k1, k2, k3, pl):
        return vocab_probe(k0, k1, k2, k3, pl, vhash_rows, tables.vhash_mask)

    def fin_stage(sb, pl, rank, npc):
        return finalize_host(sb, pl, rank, npc, trim, p_cap=p_cap)

    v_dec = jax.jit(jax.vmap(dec_stage))
    v_starts = jax.jit(jax.vmap(starts_stage))
    v_compact = jax.jit(jax.vmap(compact_stage))
    v_probe = jax.jit(jax.vmap(probe_stage))
    v_fin = jax.jit(jax.vmap(fin_stage))

    def pipeline(devs, nbs):
        cp, _, boc, m = v_dec(devs, nbs)
        starts = v_starts(cp, m)
        sb, pl, k0, k1, k2, k3, npc = v_compact(starts, boc, devs, nbs)
        rank = v_probe(k0, k1, k2, k3, pl)
        return v_fin(sb, pl, rank, npc)

    out = pipeline(devs, nbs)
    jax.block_until_ready(out)

    trace_dir = tempfile.mkdtemp(prefix="td_fusions_")
    reps = 4
    with jax.profiler.trace(trace_dir):
        for _ in range(reps):
            out = pipeline(devs, nbs)
        _ = int(np.asarray(out[1]).sum())

    paths = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
    with gzip.open(paths[-1]) as f:
        t = json.load(f)
    evs = t.get("traceEvents", [])
    dev_pids = {
        e["pid"] for e in evs
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    tids_by_pid = {}
    tot = {}
    for e in evs:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = str(e.get("name", ""))
            if name.startswith("jit"):
                continue  # container events
            tot[name] = tot.get(name, 0.0) + float(e.get("dur", 0.0))
    items = sorted(tot.items(), key=lambda kv: -kv[1])
    total = sum(tot.values())
    print(f"total device op time per rep: {total/reps/1e3:.2f} ms "
          f"({B} MB/dispatch -> {B*reps*total and B/(total/reps/1e6):.1f} MB/s)")
    for k, v in items[:45]:
        print(f"{v/reps/1e3:9.3f} ms  {k[:110]}")


if __name__ == "__main__":
    main()
