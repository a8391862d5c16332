"""Code-tokenization benchmark — port of the reference's code benchmark
(/root/reference/tests/code_performance_benchmark.py — behavior spec:
tokenize the repo's own source files across many extensions, excluding
vendored dirs and files > 1 MB; warmup + N runs per file; summarize speedup
vs tiktoken by file type and size bucket; source of the reference's
"4x faster on code" claim).

    python tests/code_performance_benchmark.py [--warmup 3] [--runs 25]
"""

import argparse
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")

EXTENSIONS = {
    ".py", ".cpp", ".hpp", ".c", ".h", ".js", ".ts", ".java", ".go", ".rs",
    ".rb", ".sh", ".md", ".json", ".yaml", ".yml", ".toml", ".txt", ".html",
    ".css", ".sql", ".cmake", ".mk", ".cfg", ".ini", ".xml", ".proto", ".tsx",
}
EXCLUDE_DIRS = {".git", "__pycache__", ".cache", "node_modules", "extern"}
MAX_FILE_BYTES = 1 << 20  # skip files > 1 MB (reference :346)


def collect_files(root: Path) -> list[Path]:
    out = []
    for p in sorted(root.rglob("*")):
        if not p.is_file() or p.suffix not in EXTENSIONS:
            continue
        if any(d in p.parts for d in EXCLUDE_DIRS):
            continue
        if p.stat().st_size > MAX_FILE_BYTES or p.stat().st_size == 0:
            continue
        out.append(p)
    return out


def size_bucket(n: int) -> str:
    if n < 1024:
        return "<1KB"
    if n < 10 * 1024:
        return "1-10KB"
    if n < 100 * 1024:
        return "10-100KB"
    return ">100KB"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokenizer", default="llama", choices=["llama"])
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--runs", type=int, default=25)
    ap.add_argument("--backend", default="host", choices=["auto", "host", "tpu"])
    ap.add_argument("--root", default=str(REPO))
    ap.add_argument("--output", default=None,
                    help="also write a JSON summary artifact")
    args = ap.parse_args()

    import tiktoken

    import tokendagger_tpu as td

    ranks = td.load_tiktoken_model(REFERENCE / "src" / "tokenizer.model")
    specials = td.load_hf_special_tokens(REFERENCE / "src" / "tokenizer_config.json")
    ours = td.Encoding("code", pat_str=td.LLAMA4_PATTERN,
                       mergeable_ranks=ranks, special_tokens=specials)
    ours.backend = args.backend
    oracle = tiktoken.Encoding("code", pat_str=td.LLAMA4_PATTERN,
                               mergeable_ranks=ranks, special_tokens=specials)

    files = collect_files(Path(args.root))
    print(f"{len(files)} files")
    by_ext: dict[str, list[float]] = {}
    by_bucket: dict[str, list[float]] = {}
    total_bytes = 0
    total_ours = 0.0
    total_tk = 0.0

    for p in files:
        try:
            text = p.read_text(errors="replace")
        except OSError:
            continue
        assert ours.encode_ordinary(text) == oracle.encode_ordinary(text), p

        def best(fn):
            for _ in range(args.warmup):
                fn(text)
            ts = []
            for _ in range(args.runs):
                t0 = time.perf_counter_ns()
                fn(text)
                ts.append(time.perf_counter_ns() - t0)
            return min(ts) / 1e9

        t_ours = best(ours.encode_ordinary)
        t_tk = best(oracle.encode_ordinary)
        sp = t_tk / t_ours if t_ours else float("inf")
        by_ext.setdefault(p.suffix, []).append(sp)
        by_bucket.setdefault(size_bucket(len(text)), []).append(sp)
        total_bytes += len(text.encode())
        total_ours += t_ours
        total_tk += t_tk

    print("\nby file type:")
    for ext, sps in sorted(by_ext.items()):
        print(f"  {ext:<8} n={len(sps):<4} mean {statistics.mean(sps):5.2f}x")
    print("by size bucket:")
    for b, sps in sorted(by_bucket.items()):
        print(f"  {b:<9} n={len(sps):<4} mean {statistics.mean(sps):5.2f}x")
    print(f"\noverall: {total_tk / total_ours:.2f}x faster on code "
          f"({total_bytes / 1e6 / total_ours:.1f} MB/s vs "
          f"{total_bytes / 1e6 / total_tk:.1f} MB/s)")
    if args.output:
        import json

        Path(args.output).write_text(json.dumps({
            "warmup": args.warmup, "runs": args.runs,
            "total_bytes": total_bytes,
            "overall_speedup_vs_tiktoken": round(total_tk / total_ours, 2),
            "ours_mb_per_s": round(total_bytes / 1e6 / total_ours, 1),
            "tiktoken_mb_per_s": round(total_bytes / 1e6 / total_tk, 1),
            "by_ext_mean": {
                e: round(statistics.mean(s), 2)
                for e, s in sorted(by_ext.items())
            },
            "by_bucket_mean": {
                b: round(statistics.mean(s), 2)
                for b, s in sorted(by_bucket.items())
            },
            "exactness": "every file asserted id-identical to tiktoken",
        }, indent=2))
        print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
