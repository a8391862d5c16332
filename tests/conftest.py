"""Test configuration.

Tests run on CPU JAX with 8 virtual devices so multi-chip sharding logic is
exercised without TPU hardware (mirrors the strategy in SURVEY.md §4:
single-process conformance on CPU JAX + fake meshes for multi-chip logic).
Real-TPU numbers come from bench.py, not the test suite.
"""

import os
import sys
from pathlib import Path

# Must run before jax initializes its backends. NOTE: the env var alone is
# NOT reliable on this machine — the axon TPU plugin overrides it — so we
# import jax here and force the platform through the config API.
# TD_REAL_BACKEND=1 skips the pin: scripts that import helpers from this
# module (tests/scaling_test.py --real) set it to keep the real chip.
if not os.environ.get("TD_REAL_BACKEND"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

REFERENCE = Path("/root/reference")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def llama4_assets():
    """Real Llama-4 vocab + specials from the reference mount (data assets,
    not code). Skip if unavailable."""
    model = REFERENCE / "src" / "tokenizer.model"
    config = REFERENCE / "src" / "tokenizer_config.json"
    if not model.exists() or not config.exists():
        pytest.skip("reference Llama-4 vocab assets not available")
    from tokendagger_tpu import vocab

    ranks = vocab.load_tiktoken_model(model)
    specials = vocab.load_hf_special_tokens(config)
    return vocab.LLAMA4_PATTERN, ranks, specials


@pytest.fixture(scope="session")
def corpus_lorem():
    p = REFERENCE / "tests" / "input" / "lorem.txt"
    if not p.exists():
        pytest.skip("lorem corpus not available")
    return p.read_text(encoding="utf-8")


@pytest.fixture(scope="session")
def corpus_emoji():
    p = REFERENCE / "tests" / "input" / "emoji.txt"
    if not p.exists():
        pytest.skip("emoji corpus not available")
    return p.read_text(encoding="utf-8")


def make_tiny_vocab():
    """Small synthetic BPE vocab built by actually running BPE training-style
    merges so the 'children before parents' property holds."""
    ranks: dict[bytes, int] = {}
    for i in range(256):
        ranks[bytes([i])] = i
    nxt = 256
    # common English-ish merges, built up from existing tokens
    for merge in [
        b"th", b"he", b"in", b"er", b"an", b" t", b" a", b"re", b"on",
        b"the", b" th", b" the", b"ing", b"nd", b"and", b" and",
        b"es", b"en", b"ed", b"to", b" to", b"or", b"st", b"ar",
        b"te", b"at", b"it", b"is", b" is", b"ll", b"lo", b"llo",
        b"hel", b"hell", b"hello",
    ]:
        if merge not in ranks:
            ranks[merge] = nxt
            nxt += 1
    specials = {
        "<|bos|>": 5000,
        "<|eos|>": 5001,
        "<|pad|>": 5002,
        "<|fim_prefix|>": 5003,
        "<|fim_suffix|>": 5004,
    }
    return ranks, specials


@pytest.fixture(scope="session")
def tiny_vocab():
    return make_tiny_vocab()
