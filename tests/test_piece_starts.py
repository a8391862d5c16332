"""Boundary-local piece_starts vs the chained match_lengths formulation.

piece_starts derives the piece-start flag set with scans and static shifts
only (no pointer-chase) — the device scanner's fast path. These tests pin it
to the chained reference (which is itself pinned to the `regex` oracle by
tests/fuzz_scanner.py) on fixed adversarial cases, real corpora, and random
class-adversarial fuzz.
"""

import random
from pathlib import Path

import numpy as np
import pytest

from tokendagger_tpu.scanner_ref import match_lengths, piece_starts

PROFILES = ["llama4", "nocontract", "cl100k", "gpt2"]


def _chain_truth(cp: np.ndarray, profile: str) -> np.ndarray:
    lens = match_lengths(cp, profile=profile)
    n = len(cp)
    st = np.zeros(n, dtype=bool)
    i = 0
    while i < n:
        st[i] = True
        i += int(lens[i])
    return st


def _cp(text: str) -> np.ndarray:
    return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)


def _assert_match(text: str, profile: str) -> None:
    cp = _cp(text)
    want = _chain_truth(cp, profile)
    got = piece_starts(cp, profile=profile)
    if not np.array_equal(got, want):
        bad = np.nonzero(got != want)[0]
        i = int(bad[0])
        raise AssertionError(
            f"{profile}: {len(bad)} diffs, first at {i}: "
            f"{text[max(0, i - 12): i + 12]!r}"
        )


FIXED_CASES = [
    "",
    "hello world",
    "it's the THE it'S",
    "HTTPResponse OK",
    "a1b22c333d4444",
    "  x",
    "a\n\n  b",
    "!!!x",
    "''s",
    "x'Stri",
    "x'LLow",
    "don't CAN'T won'T",
    "م'd'Ve",  # chained contraction parity
    " 'a",
    "3's",
    "!M!M!x",
    "!!Mabc",
    "aM!b",
    "x́'s",
    "!\n/x",
    "!\n//abc",
    "a/b//c",
    "tab\tx",
    "tab\t!",
    " \n",
    "\r\n\r\n",
    "x \r\n y",
    "ABC's",
    "aAbBcC",
    "AMBMC",
    "１２３４",
    "  １a",
    "'",
    "''",
    "M",
    " M",
    "!M's",
    "a'9",
    "x''y",
    "end ",
    "end  ",
    "end\n",
]


@pytest.mark.parametrize("profile", PROFILES)
def test_fixed_cases(profile):
    for text in FIXED_CASES:
        _assert_match(text, profile)


@pytest.mark.parametrize("profile", PROFILES)
def test_real_corpora(profile):
    for name in ("lorem.txt", "emoji.txt"):
        path = Path("/root/reference/tests/input") / name
        if not path.exists():
            pytest.skip(f"{name} not mounted")
        text = path.read_bytes().decode("utf-8", errors="replace")[:200_000]
        _assert_match(text, profile)


POOLS = [
    "abcdefgh", "ABCDEFGH", "xyzXYZ", "0123456789", " ", "\t", "\n", "\r",
    "!#$%&()*+,-.:;<=>?@[]^_`{|}~", "'", "/", "日本語漢字", "éàüßñ",
    "ΑΒΓΔ", "αβγδ", "֑́̈", "ʰʱ", "ʻʼ", "０１２", "　",
    "s t r e v m l d S T R E V M L D",
]


@pytest.mark.parametrize("profile", PROFILES)
def test_fuzz_vs_chain(profile):
    rng = random.Random(0xD06)
    for _ in range(150):
        parts = []
        for _ in range(rng.randint(3, 60)):
            pool = rng.choice(POOLS)
            parts.append(
                "".join(rng.choice(pool) for _ in range(rng.randint(1, 6)))
            )
        _assert_match("".join(parts), profile)


def test_unsupported_profile_raises():
    with pytest.raises(NotImplementedError):
        piece_starts(_cp("abc"), profile="o999k_nonexistent")
