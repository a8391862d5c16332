"""Build a HuggingFace `tokenizers` fast tokenizer from local tiktoken
assets — no network, no hub.

The reference benchmarked HF's fast tokenizer as a third arm
(/root/reference/tests/throughput_test.py:335-392, published numbers at
/root/reference/throughput_llama_256mb.json:36-43). This environment is
offline, so `AutoTokenizer.from_pretrained(...)` can never resolve; instead
we construct an equivalent Rust-backed `tokenizers.Tokenizer` directly from
the mounted Llama-4 `tokenizer.model` ranks:

* vocab: every token's bytes mapped through the GPT-2 byte->unicode
  alphabet (what ByteLevel pretokenizers expect),
* merges: reconstructed by re-merging each multi-byte token using only
  ranks strictly below its own — the unique merge sequence that produced
  it, so the BPE model reproduces tiktoken's merges exactly,
* pretokenizer: Split(pattern, isolated) + ByteLevel(use_regex=False),
  i.e. the same Llama-4 regex the other arms use.

The built tokenizer is cached as JSON next to the corpus cache; building
takes ~1 min for the 200k-entry vocab (one bounded merge replay per token).
"""

from __future__ import annotations

from pathlib import Path


def _bytes_to_unicode() -> dict[int, str]:
    """GPT-2's reversible byte->printable-unicode map (the ByteLevel
    alphabet): printable ASCII/latin-1 map to themselves, the rest to
    256+offset codepoints."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(0xA1, 0xAD))
        + list(range(0xAE, 0x100))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


def _merge_pair_for(token: bytes, ranks: dict[bytes, int], rank: int):
    """Replay BPE over `token` using only merges with rank < `rank`; if it
    converges to exactly two parts, that pair is the merge that creates
    this token."""
    parts = [token[i : i + 1] for i in range(len(token))]
    while len(parts) > 2:
        best_i, best_r = -1, rank
        for i in range(len(parts) - 1):
            r = ranks.get(parts[i] + parts[i + 1])
            if r is not None and r < best_r:
                best_i, best_r = i, r
        if best_i < 0:
            break
        parts = (
            parts[:best_i]
            + [parts[best_i] + parts[best_i + 1]]
            + parts[best_i + 2 :]
        )
    return tuple(parts) if len(parts) == 2 else None


def build_hf_fast_tokenizer(
    ranks: dict[bytes, int],
    pattern: str,
    cache_path: str | Path | None = None,
):
    """Return a `tokenizers.Tokenizer` (Rust fast tokenizer) equivalent to
    the tiktoken BPE defined by `ranks` + `pattern`. Raises ImportError if
    the `tokenizers` package is unavailable."""
    from tokenizers import Regex, Tokenizer, decoders, models, pre_tokenizers

    cache_path = Path(cache_path) if cache_path else None
    if cache_path and cache_path.exists():
        return Tokenizer.from_file(str(cache_path))

    b2u = _bytes_to_unicode()

    def tos(bs: bytes) -> str:
        return "".join(b2u[b] for b in bs)

    vocab = {tos(tok): r for tok, r in ranks.items()}
    merges = []
    for tok, r in sorted(ranks.items(), key=lambda kv: kv[1]):
        if len(tok) < 2:
            continue
        pair = _merge_pair_for(tok, ranks, r)
        if pair is not None:
            merges.append((tos(pair[0]), tos(pair[1])))

    tk = Tokenizer(models.BPE(vocab=vocab, merges=merges, fuse_unk=False))
    tk.pre_tokenizer = pre_tokenizers.Sequence(
        [
            pre_tokenizers.Split(Regex(pattern), behavior="isolated"),
            pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=False),
        ]
    )
    tk.decoder = decoders.ByteLevel()
    if cache_path:
        try:
            cache_path.parent.mkdir(parents=True, exist_ok=True)
            tk.save(str(cache_path))
        except OSError:
            pass
    return tk
