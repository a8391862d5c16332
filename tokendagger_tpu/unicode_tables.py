"""Unicode classification tables for the pretokenizer.

The reference pretokenizes with a PCRE2-JIT regex over Unicode categories
(/root/reference/src/tiktoken/tiktoken.cpp:48-68, pattern at
/root/reference/src/main.cpp:114). The TPU-native design replaces the
backtracking regex engine with class-run analysis (see ops/pretokenize.py);
this module compiles the per-codepoint class bitmask it runs on.

Classes are derived by querying the `regex` module for each property over
the full codepoint range, then overlaid with the checked-in calibration
data (data/unicode_overrides.npz): the `regex` module, CPython's
unicodedata, and the Rust regex crate vendored by tiktoken each carry a
DIFFERENT Unicode version, and they disagree on ~10k codepoints (newly
assigned blocks + re-categorizations). tiktoken is the conformance
oracle, so tools/calibrate_unicode.py decides each divergent codepoint's
class byte by direct behavioral differential against tiktoken (probe
battery through the scanner + exact merge); the winners ship as package
data so the table matches the oracle without tiktoken at build time.
Tables are cached on disk.

Bit layout (uint8):
  WS      0x01  \\s          (Unicode whitespace)
  RN      0x02  [\\r\\n]
  LETTER  0x04  \\p{L}
  NUM     0x08  \\p{N}
  UC      0x10  [\\p{Lu}\\p{Lt}\\p{Lm}\\p{Lo}\\p{M}]  ("uppercase-ish" word class)
  LC      0x20  [\\p{Ll}\\p{Lm}\\p{Lo}\\p{M}]          ("lowercase-ish" word class)
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np

WS = 0x01
RN = 0x02
LETTER = 0x04
NUM = 0x08
UC = 0x10
LC = 0x20

N_CP = 0x110000

# Codepoints matching (?i:x) for each contraction letter, computed from the
# oracle engine (simple case folding: e.g. U+017F LATIN SMALL LETTER LONG S
# case-folds to 's').
_CONTRACTION_LETTERS = "stredvml"

_TABLE_VERSION = 4  # bump when bit layout / derivation changes


def _cache_path() -> Path:
    from .utils.cachedir import cache_dir

    d = cache_dir()
    # the table is built by querying the `regex` module, so its version
    # must be part of the key (regex vendors its own Unicode data)
    import unicodedata

    import regex

    rv = getattr(regex, "__version__", "0")
    uv = sys.implementation.name
    ov = _overrides_tag()
    return d / (
        f"uniclass_v{_TABLE_VERSION}_{uv}_"
        f"{unicodedata.unidata_version}_re{rv}_ov{ov}.npz"
    )


def _overrides_path() -> Path:
    return Path(__file__).with_name("data") / "unicode_overrides.npz"


def _overrides_tag() -> str:
    """Short content tag of the calibration overlay (cache key part)."""
    import hashlib

    p = _overrides_path()
    if not p.exists():
        return "none"
    return hashlib.sha256(p.read_bytes()).hexdigest()[:10]


def build_raw_classes() -> np.ndarray:
    """The UNCALIBRATED class table straight from the `regex` module —
    the base the calibration overlay is defined against. Used by
    tools/calibrate_unicode.py (overrides are recorded relative to THIS,
    so re-running the calibration can never silently drop them); not
    cached."""
    classes, _ = _build(apply_overrides=False)
    return classes


def _build(
    apply_overrides: bool = True,
) -> tuple[np.ndarray, dict[str, np.ndarray]]:
    import regex

    classes = np.zeros(N_CP, dtype=np.uint8)

    # Surrogates can't be put in a str; leave them classless (they never
    # appear in decoded text).
    cps = [cp for cp in range(N_CP) if not (0xD800 <= cp <= 0xDFFF)]
    all_chars = "".join(map(chr, cps))
    idx = np.asarray(cps, dtype=np.int64)

    def member_mask(char_class: str) -> np.ndarray:
        pat = regex.compile(char_class)
        mask = np.zeros(len(cps), dtype=bool)
        # scan the all-chars string once; matches are single chars
        for m in pat.finditer(all_chars):
            s, e = m.span()
            mask[s:e] = True
        return mask

    for char_class, bit in [
        (r"\s", WS),
        (r"[\r\n]", RN),
        (r"\p{L}", LETTER),
        (r"\p{N}", NUM),
        (r"[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]", UC),
        (r"[\p{Ll}\p{Lm}\p{Lo}\p{M}]", LC),
    ]:
        m = member_mask(char_class)
        classes[idx[m]] |= bit

    folds: dict[str, np.ndarray] = {}
    for letter in _CONTRACTION_LETTERS:
        m = member_mask(f"(?i:{letter})")
        folds[letter] = idx[m].astype(np.int32)

    # oracle-calibration overlay: per-codepoint class bytes decided by
    # behavioral differential against tiktoken (see module docstring /
    # tools/calibrate_unicode.py)
    if apply_overrides:
        op = _overrides_path()
        if op.exists():
            z = np.load(op)
            classes[z["cps"]] = z["vals"]
    return classes, folds


_CACHED: tuple[np.ndarray, dict[str, np.ndarray]] | None = None
_CACHED_2L: tuple[np.ndarray, np.ndarray] | None = None
_CACHED_OV: frozenset[int] | None = None


def get_override_cps() -> frozenset[int]:
    """Codepoints whose class byte is oracle-calibrated AWAY from the
    `regex` module's classing (tools/calibrate_unicode.py). On these the
    scanner intentionally disagrees with the regex engine — differential
    fuzz against `regex` must exclude them (the authoritative
    differential for them is tests/test_unicode_calibration.py, straight
    against tiktoken)."""
    global _CACHED_OV
    if _CACHED_OV is None:
        p = _overrides_path()
        if p.exists():
            _CACHED_OV = frozenset(np.load(p)["cps"].tolist())
        else:
            _CACHED_OV = frozenset()
    return _CACHED_OV


def get_two_level_tables() -> tuple[np.ndarray, np.ndarray]:
    """Page-compressed class table for device gathers.

    Returns (page_ids (0x1100,) uint8/uint16, pages (n_pages, 256) uint8)
    with classes[cp] == pages[page_ids[cp >> 8], cp & 0xFF]. Unicode class
    data is massively repetitive across 256-codepoint pages (~tens of
    distinct pages), so both tables together are a few KB — cache/VMEM
    resident instead of a 1.1 MB random-gather target.
    """
    global _CACHED_2L
    if _CACHED_2L is not None:
        return _CACHED_2L
    classes, _ = get_tables()
    paged = classes.reshape(-1, 256)
    pages, inverse = np.unique(paged, axis=0, return_inverse=True)
    dtype = np.uint8 if len(pages) < 256 else np.uint16
    _CACHED_2L = (inverse.astype(dtype), pages.astype(np.uint8))
    return _CACHED_2L


def get_tables() -> tuple[np.ndarray, dict[str, np.ndarray]]:
    """(classes (0x110000,) uint8, {letter: sorted codepoint array})."""
    global _CACHED
    if _CACHED is not None:
        return _CACHED
    path = _cache_path()
    if path.exists():
        z = np.load(path)
        classes = z["classes"]
        folds = {L: z[f"fold_{L}"] for L in _CONTRACTION_LETTERS}
    else:
        classes, folds = _build()
        tmp = path.with_suffix(f".tmp{os.getpid()}.npz")
        np.savez_compressed(
            tmp,
            classes=classes,
            **{f"fold_{L}": folds[L] for L in _CONTRACTION_LETTERS},
        )
        os.replace(tmp, path)
    _CACHED = (classes, folds)
    return _CACHED
