"""Throughput macro-benchmark — port of the reference's published-numbers
harness (/root/reference/tests/throughput_test.py — behavior spec: generate
a synthetic English-like corpus of --text-size MB, split into
threads x iterations chunks, time encode_batch for each thread count, also
bench tiktoken and optionally HF fast tokenizers, emit JSON with the same
schema as throughput_llama_1024mb.json plus TPU-era fields).

    python tests/throughput_test.py --text-size 256 --tokenizer llama \
        [--threads 1,2,4,8] [--skip-hf] [--backend auto|host|tpu]
"""

import argparse
import json
import random
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REFERENCE = Path("/root/reference")

WORDS = (
    "the of and to in a is that for it as was with be by on not he this are "
    "or his from at which but have an they you were her she all would there "
    "their we him been has when who will no more if out so said what up its "
    "about into than them can only other new some could time these two may "
    "then do first any my now such like our over man me even most made after "
    "also did many before must through back years where much your way well "
    "down should because each just those people how too little state good "
    "very make world still own see men work long get here between both life "
    "being under never day same another know while last might us great old "
    "year off come since against go came right used take three"
).split()


def generate_corpus(size_mb: float, seed: int = 42) -> str:
    """Synthetic English-like text (reference corpus style: random common
    words, sentences, paragraphs — throughput_test.py:246-333).
    Vectorized with numpy so GB-scale corpora generate in seconds."""
    import numpy as np

    rng = np.random.default_rng(seed)
    target = int(size_mb * 1024 * 1024)
    avg_word = sum(len(w) + 1 for w in WORDS) / len(WORDS)
    n_words = int(target / avg_word * 1.1) + 100
    words = np.array(WORDS)
    picks = words[rng.integers(0, len(words), n_words)]
    # sentence boundaries every 5-18 words: mark with punctuation+capital
    out = []
    i = 0
    py_rng = random.Random(seed)
    while i < len(picks):
        n = py_rng.randint(5, 18)
        chunk = picks[i : i + n]
        if not len(chunk):
            break
        s = " ".join(chunk.tolist())
        s = s[0].upper() + s[1:] + py_rng.choice([". ", ". ", "! ", "? "])
        if py_rng.random() < 0.1:
            s += "\n\n"
        out.append(s)
        i += n
    text = "".join(out)
    while len(text) < target:
        text += text[: target - len(text)]
    return text[:target]


def generate_code_corpus(size_mb: float) -> str:
    """Code-heavy corpus (BASELINE config 4): the repo's own source files
    tiled to size, interleaved with deep-indentation and long-run stress
    blocks (the long-pretoken path)."""
    repo = Path(__file__).resolve().parent.parent
    parts = []
    for p in sorted(repo.rglob("*")):
        if p.suffix in {".py", ".cpp", ".md", ".toml", ".json"} and p.is_file():
            if any(d in p.parts for d in (".git", "__pycache__", "output")):
                continue
            try:
                parts.append(p.read_text(errors="replace"))
            except OSError:
                pass
    stress = (
        "\n" + " " * 64 + "deep_indent = [1, 2, 3]\n"
        + "#" * 120 + "\n" + "=" * 80 + "\n" + "x" * 300 + "\n"
    )
    base = ("\n".join(parts) + stress) or "x = 1\n"
    target = int(size_mb * 1024 * 1024)
    reps = target // len(base) + 1
    return (base * reps)[:target]


def chunk_corpus(corpus: str, n_chunks: int) -> list[str]:
    step = max(1, len(corpus) // n_chunks)
    return [corpus[i : i + step] for i in range(0, len(corpus), step)]


def bench_ours(corpus, thread_counts, iterations, pattern, ranks, specials,
               backend):
    import tokendagger_tpu as td

    tok = td.Encoding("bench", pat_str=pattern, mergeable_ranks=ranks,
                      special_tokens=specials)
    tok.backend = backend
    results = []
    for nt in thread_counts:
        chunks = chunk_corpus(corpus, nt * iterations)
        tok.encode_batch(chunks[: nt], num_threads=nt)  # warmup
        t0 = time.perf_counter()
        tok.encode_batch(chunks, num_threads=nt)
        dt = time.perf_counter() - t0
        mbps = len(corpus) / 1e6 / dt
        results.append(round(mbps, 2))
        print(f"  ours     threads={nt:>2}: {mbps:8.2f} MB/s")
    return results


def bench_tiktoken(corpus, thread_counts, iterations, pattern, ranks, specials):
    import tiktoken

    tok = tiktoken.Encoding("bench", pat_str=pattern, mergeable_ranks=ranks,
                            special_tokens=specials)
    results = []
    for nt in thread_counts:
        chunks = chunk_corpus(corpus, nt * iterations)
        tok.encode_ordinary_batch(chunks[: nt], num_threads=nt)
        t0 = time.perf_counter()
        tok.encode_ordinary_batch(chunks, num_threads=nt)
        dt = time.perf_counter() - t0
        mbps = len(corpus) / 1e6 / dt
        results.append(round(mbps, 2))
        print(f"  tiktoken threads={nt:>2}: {mbps:8.2f} MB/s")
    return results


def bench_hf(corpus, thread_counts, iterations, pattern, ranks, name):
    """HF fast-tokenizer arm (reference measured it at
    /root/reference/tests/throughput_test.py:335-392). Offline environment:
    the tokenizer is built locally from the same ranks+pattern
    (tools/hf_local.py, bit-exact vs tiktoken) instead of a hub download.
    Returns (results | None, skip_reason | None)."""
    try:
        from tools.hf_local import build_hf_fast_tokenizer

        cache = (Path(__file__).resolve().parent.parent / "results"
                 / f"hf_{name}_fast.json")
        tok = build_hf_fast_tokenizer(ranks, pattern, cache_path=cache)
    except Exception as e:  # noqa: BLE001 - package missing / build failed
        return None, f"local HF build failed: {e}"[:160]
    results = []
    for nt in thread_counts:
        # the Rust tokenizer parallelizes encode_batch internally; the
        # thread axis here only shapes the chunking, as in the reference
        chunks = chunk_corpus(corpus, nt * iterations)
        tok.encode_batch(chunks[:nt])
        t0 = time.perf_counter()
        tok.encode_batch(chunks)
        dt = time.perf_counter() - t0
        mbps = len(corpus) / 1e6 / dt
        results.append(round(mbps, 2))
        print(f"  hf-fast  threads={nt:>2}: {mbps:8.2f} MB/s")
    return results, None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokenizer", default="llama",
                    choices=["llama", "mistral"],
                    help="mistral = Tekken-layout stand-in vocab "
                         "(tools/tekken_standin.py; the real tekken.json "
                         "is stripped from the reference mount)")
    ap.add_argument("--text-size", type=float, default=1024,
                    help="corpus size in MB (reference default: 1024)")
    ap.add_argument("--iterations", type=int, default=4)
    ap.add_argument("--threads", default="1,2,4,8,16,32")
    ap.add_argument("--backend", default="auto",
                    choices=["auto", "host", "tpu"])
    ap.add_argument("--corpus", default="english",
                    choices=["english", "code"])
    ap.add_argument("--skip-tiktoken", action="store_true")
    ap.add_argument("--skip-hf", action="store_true")
    ap.add_argument("--output", default=None, help="JSON output path")
    ap.add_argument("--prefault-gb", type=int, default=-1,
                    help="pre-fault this many GB before timing so hypervisor "
                         "demand-faults don't pollute the numbers (-1 = auto "
                         "from --text-size, 0 = skip; see tools/prefault.py)")
    args = ap.parse_args()

    thread_counts = [int(x) for x in args.threads.split(",")]

    if args.prefault_gb != 0:
        from tools.prefault import prefault
        gb = args.prefault_gb
        if gb < 0:
            # peak footprint: corpus + chunk copies + both engines' result
            # lists (~8 B/token ours, ~32 B/token tiktoken, at ~4.2 B/token
            # density) + generation slack; tiktoken's arm dominates
            gb = min(48, int(args.text_size / 1024 * 14) + 6)
        print(f"Pre-faulting {gb} GB (hypervisor grant warmup)...")
        prefault(gb)

    import tokendagger_tpu as td

    if args.tokenizer == "mistral":
        from tools.tekken_standin import load_standin

        tek = load_standin()
        ranks = tek["mergeable_ranks"]
        specials = tek["special_tokens"]
        pattern = tek["pattern"]
    else:
        ranks = td.load_tiktoken_model(REFERENCE / "src" / "tokenizer.model")
        specials = td.load_hf_special_tokens(
            REFERENCE / "src" / "tokenizer_config.json"
        )
        pattern = td.LLAMA4_PATTERN

    print(f"Generating {args.text_size} MB {args.corpus} corpus...")
    if args.corpus == "code":
        corpus = generate_code_corpus(args.text_size)
    else:
        corpus = generate_corpus(args.text_size)

    print("Benchmarking tokendagger_tpu:")
    ours = bench_ours(corpus, thread_counts, args.iterations, pattern, ranks,
                      specials, args.backend)
    tk = None
    if not args.skip_tiktoken:
        print("Benchmarking tiktoken:")
        tk = bench_tiktoken(corpus, thread_counts, args.iterations, pattern,
                            ranks, specials)
    hf, hf_skip = None, None
    if not args.skip_hf:
        print("Benchmarking HF fast tokenizer:")
        hf, hf_skip = bench_hf(corpus, thread_counts, args.iterations,
                               pattern, ranks, args.tokenizer)

    base = ours[0]
    print("Scaling efficiency vs 1 thread:")
    for nt, v in zip(thread_counts, ours):
        print(f"  threads={nt:>2}: {v / base / nt * 100:6.1f}%")

    out = {
        "tokenizer_type": args.tokenizer,
        "text_size_mb": args.text_size,
        "thread_counts": thread_counts,
        "tokendagger_throughput": ours,
        "backend": args.backend,
    }
    if tk:
        out["tiktoken_throughput"] = tk
        out["speedups"] = [round(a / b, 2) for a, b in zip(ours, tk)]
    if hf:
        out["hf_throughput"] = hf
        out["hf_speedups"] = [round(a / b, 2) for a, b in zip(ours, hf)]
    elif hf_skip:
        out["hf_skipped_reason"] = hf_skip

    if args.output:
        path = Path(args.output)
    else:
        results = Path(__file__).resolve().parent.parent / "results"
        results.mkdir(exist_ok=True)
        path = results / (
            f"throughput_{args.tokenizer}_{int(args.text_size)}mb.json"
        )
    Path(path).write_text(json.dumps(out, indent=2))
    svg_path = Path(path).with_suffix(".svg")
    svg_path.write_text(render_svg(out))
    print(f"Wrote {path} and {svg_path}")
    print(json.dumps(out))
    return 0


def render_svg(data: dict) -> str:
    """Hand-rolled grouped-bar SVG of MB/s per thread count (the reference
    emits an equivalent chart from its throughput run)."""
    series = [("tokendagger_tpu", data["tokendagger_throughput"], "#4c78a8")]
    if "tiktoken_throughput" in data:
        series.append(("tiktoken", data["tiktoken_throughput"], "#f58518"))
    if "hf_throughput" in data:
        series.append(("hf-fast", data["hf_throughput"], "#54a24b"))
    threads = data["thread_counts"]
    W, H, M = 720, 360, 50
    vmax = max(max(s[1]) for s in series) * 1.15 or 1
    n_groups = len(threads)
    group_w = (W - 2 * M) / n_groups
    bar_w = group_w / (len(series) + 0.7)
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{W}" height="{H}" '
        f'font-family="sans-serif" font-size="11">',
        f'<text x="{W/2}" y="18" text-anchor="middle" font-size="14">'
        f'encode_batch throughput — {data["text_size_mb"]} MB corpus</text>',
    ]
    for g, t in enumerate(threads):
        for s_i, (name, vals, color) in enumerate(series):
            v = vals[g]
            h = (H - 2 * M) * v / vmax
            x = M + g * group_w + s_i * bar_w
            y = H - M - h
            parts.append(
                f'<rect x="{x:.1f}" y="{y:.1f}" width="{bar_w * 0.9:.1f}" '
                f'height="{h:.1f}" fill="{color}"/>'
            )
            parts.append(
                f'<text x="{x + bar_w * 0.45:.1f}" y="{y - 3:.1f}" '
                f'text-anchor="middle" font-size="9">{v:.0f}</text>'
            )
        parts.append(
            f'<text x="{M + g * group_w + group_w / 2:.1f}" y="{H - M + 14}" '
            f'text-anchor="middle">{t}t</text>'
        )
    for s_i, (name, _, color) in enumerate(series):
        parts.append(
            f'<rect x="{M + s_i * 150}" y="{H - 18}" width="10" height="10" '
            f'fill="{color}"/>'
            f'<text x="{M + s_i * 150 + 14}" y="{H - 9}">{name}</text>'
        )
    parts.append(
        f'<line x1="{M}" y1="{H - M}" x2="{W - M}" y2="{H - M}" '
        f'stroke="#333"/></svg>'
    )
    return "".join(parts)


if __name__ == "__main__":
    sys.exit(main())
