"""Micro perf benchmark — port of the reference's category benchmark
(/root/reference/tests/performance_benchmark.py — behavior spec: warmup+N
timed runs per test case on both tokenizers, categories spanning input
files, edge cases, repetitive BPE stress, synthetic lengths, code, JSON and
generated articles; buckets by length; prints avg/median speedup and
tokens/s).

    python tests/performance_benchmark.py [--quick] [--warmup 5] [--runs 100]
"""

import argparse
import json
import random
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REFERENCE = Path("/root/reference")


def build_cases() -> dict[str, list[str]]:
    rng = random.Random(7)
    cases: dict[str, list[str]] = {}

    files = []
    for name in ["lorem.txt", "emoji.txt"]:
        p = REFERENCE / "tests" / "input" / name
        if p.exists():
            files.append(p.read_text()[:200_000])
    if files:
        cases["input_files"] = files

    cases["minimal"] = ["", " ", "a", "1", ".", "\n"]
    cases["special_chars"] = ["!@#$%^&*()", "-- == ++", "<<>>", "~`|\\"]
    cases["unicode"] = ["café", "日本語のテキストです", "🙂👍🏽🇺🇸", "русский текст",
                        "العربية حروف"]
    cases["punctuation"] = ["Hello, world!", "Why? Because.", "a;b;c;d",
                            "(parens) [brackets] {braces}"]
    cases["numbers"] = ["123", "3.14159", "1,000,000", "42 43 44 45",
                        "2026-08-16 12:34:56"]
    # repetitive BPE stress (reference :309-315)
    cases["repetitive"] = ["a" * 100, "ab" * 50, "abc" * 33, "the " * 25,
                           "aaaa bbbb " * 10]
    cases["synthetic_lengths"] = [
        "word " * (n // 5) for n in (10, 100, 1000, 10000)
    ]
    cases["code"] = [
        "def fib(n):\n    if n < 2:\n        return n\n    return fib(n-1) + fib(n-2)\n",
        "for (int i = 0; i < n; ++i) { sum += arr[i]; }",
        "SELECT id, name FROM users WHERE age > 21 ORDER BY name;",
        "const x = {a: 1, b: [2, 3], c: 'four'};",
    ]
    cases["json"] = [json.dumps({"k": list(range(50)), "s": "v" * 100})]
    # generated articles
    words = "the quick brown fox jumps over lazy dog and runs far away".split()
    cases["articles"] = [
        " ".join(rng.choice(words) for _ in range(n)) for n in (200, 2000)
    ]
    return cases


def time_encode(encode_fn, text, warmup, runs):
    for _ in range(warmup):
        encode_fn(text)
    times = []
    for _ in range(runs):
        t0 = time.perf_counter_ns()
        ids = encode_fn(text)
        times.append(time.perf_counter_ns() - t0)
    return min(times) / 1e9, len(ids)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokenizer", default="llama",
                    choices=["llama", "mistral"],
                    help="mistral = Tekken-layout stand-in vocab "
                         "(tools/tekken_standin.py)")
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--runs", type=int, default=100)
    ap.add_argument("--quick", action="store_true",
                    help="2 warmup / 10 runs (reference :641-643)")
    ap.add_argument("--backend", default="host",
                    choices=["auto", "host", "tpu"])
    ap.add_argument("--output", default=None,
                    help="also write a JSON summary artifact (per-category "
                         "mean speedups + overall avg/median)")
    args = ap.parse_args()
    if args.quick:
        args.warmup, args.runs = 2, 10

    import tiktoken

    import tokendagger_tpu as td

    if args.tokenizer == "mistral":
        from tools.tekken_standin import load_standin

        tek = load_standin()
        pattern = tek["pattern"]
        ranks = tek["mergeable_ranks"]
        specials = tek["special_tokens"]
    else:
        pattern = td.LLAMA4_PATTERN
        ranks = td.load_tiktoken_model(REFERENCE / "src" / "tokenizer.model")
        specials = td.load_hf_special_tokens(
            REFERENCE / "src" / "tokenizer_config.json"
        )
    ours = td.Encoding("perf", pat_str=pattern,
                       mergeable_ranks=ranks, special_tokens=specials)
    ours.backend = args.backend
    oracle = tiktoken.Encoding("perf", pat_str=pattern,
                               mergeable_ranks=ranks, special_tokens=specials)

    speedups = []
    by_cat: dict[str, list[float]] = {}
    print(f"{'category':<20} {'len':>8} {'ours µs':>10} {'tiktoken µs':>12} "
          f"{'speedup':>8} {'tok/s':>12}")
    for cat, texts in build_cases().items():
        for text in texts:
            t_ours, n_tok = time_encode(ours.encode_ordinary, text,
                                        args.warmup, args.runs)
            t_tk, n_tok2 = time_encode(oracle.encode_ordinary, text,
                                       args.warmup, args.runs)
            assert ours.encode_ordinary(text) == oracle.encode_ordinary(text), (
                f"MISMATCH in {cat}: {text[:60]!r}"
            )
            sp = t_tk / t_ours if t_ours > 0 else float("inf")
            speedups.append(sp)
            by_cat.setdefault(cat, []).append(sp)
            tps = n_tok / t_ours if t_ours > 0 else 0
            print(f"{cat:<20} {len(text):>8} {t_ours * 1e6:>10.1f} "
                  f"{t_tk * 1e6:>12.1f} {sp:>7.2f}x {tps:>12.0f}")

    avg, med = statistics.mean(speedups), statistics.median(speedups)
    print(f"\naverage speedup: {avg:.2f}x   median: {med:.2f}x")
    if args.output:
        Path(args.output).write_text(json.dumps({
            "tokenizer": args.tokenizer,
            "warmup": args.warmup, "runs": args.runs,
            "avg_speedup_vs_tiktoken": round(avg, 2),
            "median_speedup_vs_tiktoken": round(med, 2),
            "by_category_mean": {
                c: round(statistics.mean(s), 2) for c, s in by_cat.items()
            },
            "exactness": "every case asserted id-identical to tiktoken",
        }, indent=2))
        print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
