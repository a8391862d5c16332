"""Deterministic Mistral-Tekken stand-in config for `--tokenizer mistral`.

The reference ships `tekken.json` (Mistral Tekken vocab) and every bench
script takes `--tokenizer {llama,mistral}` (/root/reference/README.md:24-32),
but the real asset is stripped from this mount
(/root/reference/.MISSING_LARGE_BLOBS). This builds the same stand-in the
conformance suite uses (tests/test_tekken_conformance.py): a merge-closed
130,000-rank prefix of the real Llama-4 vocab re-encoded in the Tekken JSON
layout (+1000 id offset, 1,000 specials incl. the real Mistral control
names), cached at results/tekken_standin.json. Layout spec:
/root/reference/tests/test_tokendagger_vs_tiktoken.py:61-105.
"""

from __future__ import annotations

import base64
import json
from pathlib import Path

N_PREFIX = 130_000
NUM_SPECIAL = 1000

_REFERENCE = Path("/root/reference")


def special_names() -> list[str]:
    """1,000 specials shaped like the real Tekken config: named control
    tokens first, a few deliberately multi-byte/UTF-8, then filler."""
    names = [
        "<unk>", "<s>", "</s>", "[INST]", "[/INST]", "[TOOL_CALLS]",
        "[AVAILABLE_TOOLS]", "[/AVAILABLE_TOOLS]", "[TOOL_RESULTS]",
        "[/TOOL_RESULTS]", "[IMG]", "[PREFIX]", "[MIDDLE]", "[SUFFIX]",
        "⟦控制⟧", "«spécial»", "🛑STOP🛑", "⟨βήμα⟩",
    ]
    i = 0
    while len(names) < NUM_SPECIAL:
        names.append(f"<SPECIAL_{i}>")
        i += 1
    return names


def write_standin(path: str | Path) -> Path:
    """Write the stand-in tekken.json (idempotent; cached on disk)."""
    from tokendagger_tpu import vocab

    path = Path(path)
    if path.exists():
        return path
    full_ranks = vocab.load_tiktoken_model(
        _REFERENCE / "src" / "tokenizer.model"
    )
    ordered = sorted(
        ((tb, r) for tb, r in full_ranks.items() if r < N_PREFIX),
        key=lambda kv: kv[1],
    )
    cfg = {
        "config": {
            "pattern": vocab.TEKKEN_PATTERN,
            "default_vocab_size": N_PREFIX + NUM_SPECIAL,
            "default_num_special_tokens": NUM_SPECIAL,
            "version": "v3",
        },
        "vocab": [
            {"rank": i, "token_bytes": base64.b64encode(tb).decode(),
             "token_str": None}
            for i, (tb, _) in enumerate(ordered)
        ],
        "special_tokens": [
            {"rank": i, "token_str": name, "is_control": True}
            for i, name in enumerate(special_names())
        ],
    }
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(cfg))
    return path


def load_standin(cache_dir: str | Path | None = None) -> dict:
    """Return `vocab.load_tekken(...)` output for the stand-in config:
    {"pattern", "mergeable_ranks", "special_tokens", ...}."""
    from tokendagger_tpu import vocab

    cache_dir = Path(
        cache_dir
        or Path(__file__).resolve().parent.parent / "results"
    )
    p = write_standin(cache_dir / "tekken_standin.json")
    return vocab.load_tekken(p)
