"""Calibrate the pretokenizer class table against the tiktoken oracle's
OWN Unicode tables (round-5 soak finding).

Three Unicode data sources coexist in this stack and they disagree on
~10k codepoints (new assignments + re-categorizations across Unicode
versions): the Python `regex` module (our table builder + host regex
oracle), `unicodedata` (CPython's tables), and the Rust regex crate
vendored by tiktoken — THE conformance oracle. Example: U+187FE is
unassigned (plain punct) to tiktoken 0.13 but a letter to regex
2026.7, so `\U000187FE's` pretokenizes differently and the encodes
diverge (caught by the round-5 adversarial-unicode soak).

This script decides, PER divergent codepoint, the class byte that makes
our scanner reproduce tiktoken exactly: it patches the cached class
table in place, runs a probe battery through scanner_ref.split_spans +
the exact merge, and compares against tk.encode_ordinary for every
plausible class byte (regex-module classing first, then
unicodedata's, then the remaining letter/num/mark combinations).
The winning overrides are written to
tokendagger_tpu/data/unicode_overrides.npz, which unicode_tables.py
applies on top of the regex-module base at build time — so the shipped
table matches the oracle without needing tiktoken at table-build time.

Usage: timeout 3600 python tools/calibrate_unicode.py
"""

from __future__ import annotations

import sys
import unicodedata
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def alt_bits_ud(cp: int, LETTER, NUM, UC, LC) -> int:
    cat = unicodedata.category(chr(cp))
    b = 0
    if cat in ("Lu", "Ll", "Lt", "Lm", "Lo"):
        b |= LETTER
    if cat in ("Nd", "Nl", "No"):
        b |= NUM
    if cat in ("Lu", "Lt", "Lm", "Lo", "Mn", "Mc", "Me"):
        b |= UC
    if cat in ("Ll", "Lm", "Lo", "Mn", "Mc", "Me"):
        b |= LC
    return b


def main() -> int:
    import tiktoken

    from tokendagger_tpu import vocab as V
    from tokendagger_tpu.hostengine import byte_pair_merge
    from tokendagger_tpu.scanner_ref import split_spans
    from tokendagger_tpu.unicode_tables import (
        LC, LETTER, NUM, RN, UC, WS, get_tables,
    )

    from tokendagger_tpu.unicode_tables import (
        build_raw_classes, get_override_cps,
    )

    ranks = V.load_tiktoken_model("/root/reference/src/tokenizer.model")
    tk = tiktoken.Encoding("llama4", pat_str=V.LLAMA4_PATTERN,
                           mergeable_ranks=ranks, special_tokens={})
    rd = dict(ranks)
    classes, _ = get_tables()  # the CACHED array — patched in place
    # overrides are defined RELATIVE TO THE RAW regex-module classing:
    # the cached table already carries the current overlay, so deciding
    # "needs an override?" against it would silently drop every existing
    # override on a re-run
    raw = build_raw_classes()

    MASK = LETTER | NUM | UC | LC

    def our_encode(text: str) -> list[int]:
        out: list[int] = []
        for a, e in split_spans(text, profile="llama4"):
            piece = text[a:e].encode("utf-8")
            r = rd.get(piece)
            if r is not None:
                out.append(r)
            else:
                out.extend(byte_pair_merge(piece, rd))
        return out

    def battery(c: str) -> list[str]:
        return [
            c, "a" + c, c + "a", "a" + c + "b", c + "'s", "a" + c + "'s",
            c + "'st", "1" + c + "2", c + "1111", " " + c + " ",
            "." + c + "/a", "A" + c + "a", "a" + c + "A", "x " + c + "y",
            c + "́a", c + " 's", "é" + c, c + c,
            "A" + c + "'s", c + "\n x",
        ]

    alt = np.array(
        [alt_bits_ud(cp, LETTER, NUM, UC, LC)
         if not (0xD800 <= cp <= 0xDFFF) else 0
         for cp in range(0x110000)], dtype=np.uint8)
    # calibration set: raw-vs-unicodedata divergence UNION the currently
    # overridden codepoints (so every existing override is re-validated,
    # never silently forgotten)
    cand = set(np.nonzero((raw & MASK) != alt)[0].tolist())
    cand |= set(get_override_cps())
    diff = np.asarray(sorted(cand), dtype=np.int64)
    print(f"calibrating {len(diff)} divergent codepoints", flush=True)

    overrides: dict[int, int] = {}
    unresolved: list[int] = []
    ambiguous = 0
    for k, cp in enumerate(diff.tolist()):
        c = chr(cp)
        texts = battery(c)
        want = [tk.encode_ordinary(t) for t in texts]
        orig = int(classes[cp])  # current (possibly overlaid) value
        base_bits = int(raw[cp])
        keep = base_bits & ~MASK
        cands = [base_bits & MASK, alt_bits_ud(cp, LETTER, NUM, UC, LC)]
        for extra in (0, LETTER | UC | LC, UC | LC, NUM, LETTER | UC,
                      LETTER | LC, LETTER):
            if extra not in cands:
                cands.append(extra)
        chosen = None
        for ci, cand in enumerate(cands):
            classes[cp] = keep | cand
            ok = all(our_encode(t) == w for t, w in zip(texts, want))
            if ok:
                chosen = cand
                # prefer the base classing when it is already exact
                # (no override churn); any later-candidate win is real
                break
        if chosen is None:
            classes[cp] = orig
            unresolved.append(cp)
        else:
            classes[cp] = keep | chosen
            if chosen != (base_bits & MASK):
                overrides[cp] = keep | chosen
            else:
                ambiguous += 1
        if (k + 1) % 1000 == 0:
            print(f"  {k + 1}/{len(diff)}: {len(overrides)} overrides, "
                  f"{len(unresolved)} unresolved", flush=True)

    print(f"done: {len(overrides)} overrides, {ambiguous} base-exact, "
          f"{len(unresolved)} unresolved", flush=True)
    if unresolved:
        print("unresolved sample:",
              [hex(c) for c in unresolved[:20]], flush=True)

    out = REPO / "tokendagger_tpu" / "data" / "unicode_overrides.npz"
    out.parent.mkdir(exist_ok=True)
    cps = np.asarray(sorted(overrides), dtype=np.int32)
    vals = np.asarray([overrides[int(c)] for c in cps], dtype=np.uint8)
    np.savez_compressed(out, cps=cps, vals=vals,
                        meta=np.asarray([0x13]))  # tiktoken 0.13 oracle
    print(f"wrote {out} ({len(cps)} entries)", flush=True)
    return 0 if not unresolved else 1


if __name__ == "__main__":
    sys.exit(main())
