"""Dump per-stage optimized HLO summaries for the resident batched pipeline.

Identifies which stage owns the dominant fusions/sorts seen in the device
trace, and prints each stage's cost analysis + big-op inventory.
"""
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tokendagger_tpu import vocab
    from tokendagger_tpu.ops import pretokenize as PT
    from tokendagger_tpu.ops.fused import caps_for, finalize_host
    from tokendagger_tpu.ops.join import compact_piece_keys, vocab_probe
    from tokendagger_tpu.tables import build_tables
    from tokendagger_tpu.unicode_tables import get_two_level_tables

    ranks = vocab.load_tiktoken_model("/root/reference/src/tokenizer.model")
    tables = build_tables(ranks, {})
    page_ids, pages = map(jnp.asarray, get_two_level_tables())
    vhash_rows = jnp.asarray(tables.vhash_rows)

    N = 1 << 20
    B = 8
    p_cap = caps_for(N)["p_cap"]
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

    u8 = jax.ShapeDtypeStruct((B, N), jnp.uint8)
    i32 = jax.ShapeDtypeStruct((B, N), jnp.int32)
    b_ = jax.ShapeDtypeStruct((B, N), jnp.bool_)
    s32 = jax.ShapeDtypeStruct((B,), jnp.int32)
    pc32 = jax.ShapeDtypeStruct((B, p_cap), jnp.int32)
    pcu32 = jax.ShapeDtypeStruct((B, p_cap), jnp.uint32)

    stages = {
        "dec": (dec_stage, (u8, s32)),
        "starts": (starts_stage, (i32, s32)),
        "compact": (compact_stage, (b_, i32, u8, s32)),
        "probe": (probe_stage, (pcu32, pcu32, pcu32, pcu32, pc32)),
        "fin": (fin_stage, (pc32, pc32, pc32, s32)),
    }
    for name, (fn, shapes) in stages.items():
        lowered = jax.jit(jax.vmap(fn)).lower(*shapes)
        comp = lowered.compile()
        txt = comp.as_text()
        ca = comp.cost_analysis()
        flops = ca.get("flops", 0)
        ba = ca.get("bytes accessed", 0)
        print(f"\n===== {name}: flops={flops/1e9:.2f}G bytes={ba/1e9:.2f}GB")
        # inventory: count ops by kind; list fusions with output shapes
        kinds = {}
        for line in txt.splitlines():
            mt = re.match(r"\s*(?:ROOT )?%?[\w.-]+ = (\w+)", line)
            if not mt:
                continue
            op = mt.group(1)
            if op in ("parameter", "constant", "tuple", "get-tuple-element",
                      "bitcast"):
                continue
            kinds[op] = kinds.get(op, 0) + 1
        print("  top-level+nested op counts:",
              dict(sorted(kinds.items(), key=lambda kv: -kv[1])[:14]))
        for line in txt.splitlines():
            if re.search(r"= (sort|scatter|gather|while)\(", line) and \
                    "fusion" not in line:
                print("  BIG:", line.strip()[:160])
        # entry computation fusion list with shapes
        in_entry = False
        n_fus = 0
        for line in txt.splitlines():
            if line.startswith("ENTRY"):
                in_entry = True
                continue
            if in_entry:
                if line.startswith("}"):
                    break
                mt = re.search(r"= ((?:\w+\[[^\]]*\][^ ]*|\([^)]*\))) (fusion|sort|scatter|while|custom-call)\(", line)
                if mt:
                    n_fus += 1
                    nm = re.search(r"%?([\w.-]+) =", line)
                    print(f"  entry: {mt.group(2):8s} {nm.group(1) if nm else '?':14s} -> {mt.group(1)[:90]}")
        print(f"  ({n_fus} entry fusions/sorts)")


if __name__ == "__main__":
    main()
