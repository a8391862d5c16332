"""Differential fuzz: scanner_ref spans vs the `regex` module oracle.

Run directly (`python tests/fuzz_scanner.py [trials]`) for a long fuzz; the
pytest suite runs a bounded version via test_scanner.py.
"""

import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import regex

from tokendagger_tpu.scanner_ref import piece_starts, split_spans
from tokendagger_tpu.vocab import LLAMA4_PATTERN

PAT = regex.compile(LLAMA4_PATTERN)
# Tekken-style: same family, no contraction alternates
PATTERN_NOCONTR = (
    r"[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]*[\p{Ll}\p{Lm}\p{Lo}\p{M}]+"
    r"|[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]+[\p{Ll}\p{Lm}\p{Lo}\p{M}]*"
    r"|\p{N}{1,3}"
    r"| ?[^\s\p{L}\p{N}]+[\r\n/]*"
    r"|\s*[\r\n]+"
    r"|\s+(?!\S)"
    r"|\s+"
)
PAT_NC = regex.compile(PATTERN_NOCONTR)

from tokendagger_tpu.vocab import CL100K_PATTERN, GPT2_PATTERN  # noqa: E402

PAT_CL = regex.compile(CL100K_PATTERN)
PAT_G2 = regex.compile(GPT2_PATTERN)

EDGE_TEXTS = [
    "", "a", "A", "hello world", "Hello World", "HELLO", "HTTPConnection",
    "it's", "IT'S", "it'S", "don't you'll we're I've he'd I'm", "can'T",
    "x'ſ", "'s", " 's", "a'sb", "'ll", "a'rx", "a're", "A'RE",
    "123", "12345678", "a1b2", " 42", "1,234.56",
    "  spaces   everywhere  ", "\n", "\r\n", "\n\n\n", " \n ", "\t\t",
    "   \r\n  \n x", "...", "!!!", " !!!", "a//b", "x!\r\n/", "#/\n//",
    "/", " /", "//\r\n//", "!\r/\n",
    "日本語テキスト",
    "русский ТЕКСТ",
    "café CAFÉ", "naïve",
    "ʰello", "ᵃbc", "ǅungla", "ǅ", "Ǆ", "ǆ",
    "ábc", "́́", "é's", "é's", "x́ y",
    "मराठी हिन्दी",
    "العربية",
    "한국어 조선말",
    "\U0001f642\U0001f643", "\U0001f44d\U0001f3fd",
    "\U0001f1fa\U0001f1f8", "a\U0001f642b",
    "x  y", "x \n y", "word.", "word .", "( )", "[a](b)",
    "    def f(x):\n        return x**2\n", "int main() { return 0; }",
    "   ", "\x0b\x0c", "‍", "x‍y",
    "ſ", "'ſ", "aſ'ſ", "ẞß", "İi",
    "ⅣⅳⅨ", "①②③", "½¾",
    "   ", "　x", "  ", "\x85",
]


def oracle_spans(pat, text):
    return [m.span() for m in pat.finditer(text)]


def _local_spans(text, profile):
    """Spans from the boundary-local piece_starts derivation (the device
    scanner's formulation) — must equal the chained split_spans."""
    import numpy as np

    cp = np.frombuffer(
        text.encode("utf-32-le"), dtype=np.uint32
    ).astype(np.int64)
    st = piece_starts(cp, profile=profile)
    pos = np.nonzero(st)[0].tolist() + [len(cp)]
    return list(zip(pos[:-1], pos[1:]))


def check(text, tag, verbose=True):
    ok = True
    for pat, profile in (
        (PAT, "llama4"), (PAT_NC, "nocontract"), (PAT_CL, "cl100k"),
        (PAT_G2, "gpt2"),
    ):
        got = split_spans(text, profile=profile)
        want = oracle_spans(pat, text)
        local = _local_spans(text, profile)
        if local != want:
            ok = False
            if verbose:
                diff = next(
                    ((a, b) for a, b in zip(local, want) if a != b),
                    (("len", len(local)), ("len", len(want))),
                )
                print(f"LOCAL MISMATCH [{tag}] profile={profile}: "
                      f"got {diff[0]} want {diff[1]}")
                print("  text:", repr(text[:120]))
        if got != want:
            ok = False
            if verbose:
                diff = next(
                    ((a, b) for a, b in zip(got, want) if a != b),
                    (("len", len(got)), ("len", len(want))),
                )
                print(f"MISMATCH [{tag}] profile={profile}: "
                      f"got {diff[0]} want {diff[1]}")
                print("  text:", repr(text[:120]))
    return ok


from tokendagger_tpu.unicode_tables import get_override_cps

# codepoints whose class is oracle-calibrated away from the regex
# module's tables (see unicode_tables.get_override_cps): the scanner
# deliberately disagrees with `regex` on them, so this regex-oracle fuzz
# excludes them; tests/test_unicode_calibration.py differentials them
# against tiktoken directly
_CALIBRATED = get_override_cps()


def random_text(rng):
    pools = [
        [chr(c) for c in range(0x20, 0x7F)],
        [" ", "\t", "\n", "\r", " ", " ", "\x0c", "\x0b", " ", " "],
        [chr(rng.randrange(0x80, 0x3000)) for _ in range(400)],
        [chr(rng.randrange(0x3000, 0x30000)) for _ in range(400)],
        ["'s", "'T", "'re", "'Ve", "'ll", "'d", "'", "ſ", "'ſ"],
        ["́", "م", "ǅ", "A", "z", "5", "/", "\r\n"],
    ]
    parts = []
    for _ in range(rng.randrange(1, 60)):
        parts.append(rng.choice(rng.choice(pools)))
    t = "".join(parts)
    return "".join(
        ch for ch in t
        if not (0xD800 <= ord(ch) <= 0xDFFF) and ord(ch) not in _CALIBRATED
    )


def run_fuzz(trials=400, seed=42, verbose=True):
    bad = 0
    for i, c in enumerate(EDGE_TEXTS):
        if not check(c, f"edge{i}", verbose):
            bad += 1
    rng = random.Random(seed)
    for trial in range(trials):
        if not check(random_text(rng), f"fuzz{trial}", verbose):
            bad += 1
            if bad > 8:
                break
    return bad


if __name__ == "__main__":
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    bad = run_fuzz(trials)
    print("FAILED" if bad else "ALL OK", bad)
    sys.exit(1 if bad else 0)
