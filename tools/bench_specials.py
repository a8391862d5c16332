"""Special-token encode benchmark -> artifacts/specials_bench.json.

Measures the full-allowed-set encode on special-dense chat-log text and
the scan rates behind it (docs/PERF.md "The special-token scan at
device speeds"), differentially verified against tiktoken first.

Usage: python tools/bench_specials.py
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def best(fn, reps=7):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main() -> int:
    import tiktoken

    import tokendagger_tpu as td
    from tokendagger_tpu.hostengine import HostEngine

    ranks = td.load_tiktoken_model("/root/reference/src/tokenizer.model")
    specials = td.load_hf_special_tokens(
        "/root/reference/src/tokenizer_config.json")
    enc = td.Encoding("llama4", pat_str=td.LLAMA4_PATTERN,
                      mergeable_ranks=ranks, special_tokens=specials)
    tk = tiktoken.Encoding("llama4", pat_str=td.LLAMA4_PATTERN,
                           mergeable_ranks=ranks, special_tokens=specials)
    host = HostEngine(td.LLAMA4_PATTERN, ranks, specials)
    native = enc._get_native()

    msg = ("<|header_start|>user<|header_end|>\n\nTell me about tokenizer "
           "performance on TPU hardware today.<|eot|>")
    dense = msg * 9000                       # ~0.91 MB, 1 special / ~34 B
    chat = (("<|header_start|>user<|header_end|>"
             + "lorem ipsum dolor sit amet " * 17 + "<|eot|>") * 2000)
    plain = "lorem ipsum dolor sit amet consectetur " * 26000

    # exactness gate first
    for t in (dense, chat, plain + "<|eot|>"):
        assert enc.encode(t, allowed_special="all") == \
            tk.encode(t, allowed_special="all")

    def mbps(text, fn):
        mb = len(text.encode()) / 1e6
        return round(mb / best(fn), 1)

    rec = {
        "exact_vs_tiktoken": True,
        "encode_allowed_all_mbps": {
            "dense_1per34B": {
                "ours": mbps(dense, lambda: enc.encode(
                    dense, allowed_special="all")),
                "tiktoken": mbps(dense, lambda: tk.encode(
                    dense, allowed_special="all")),
            },
            "chat_1per160B": {
                "ours": mbps(chat, lambda: enc.encode(
                    chat, allowed_special="all")),
                "tiktoken": mbps(chat, lambda: tk.encode(
                    chat, allowed_special="all")),
            },
        },
        "scan_mbps": {
            "native_dense": mbps(
                dense, lambda: native.find_specials(dense.encode())),
            "python_dense": mbps(
                dense,
                lambda: host.find_all_specials(dense, set(specials))),
            "native_plain": mbps(
                plain, lambda: native.find_specials(plain.encode())),
        },
        "note": ("encode via tdpy.encode_with_specials (one-call scan + "
                 "GIL-free OpenMP segment encode + interleaved list); "
                 "scan via td_find_specials (memchr + bigram bitmap + "
                 "first-4-byte dispatch)"),
    }
    for d in rec["encode_allowed_all_mbps"].values():
        d["speedup"] = round(d["ours"] / d["tiktoken"], 2)
    out = REPO / "artifacts" / "specials_bench.json"
    out.write_text(json.dumps(rec, indent=2))
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
