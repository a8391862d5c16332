"""tokendagger_tpu — TPU-native, tiktoken-compatible BPE tokenizer framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
M4THYOU/TokenDagger: exact tiktoken token ids, with the hot path
(pretokenizer DFA scan + parallel BPE merge) running on TPU and scaling
data-parallel over a device mesh.

Public surface mirrors the reference package
(/root/reference/tokendagger/__init__.py):
``Tokenizer``, ``Encoding``, ``load_tokenizer``, ``create_tokenizer``,
``TokenDaggerError``.
"""

from .registry import (  # noqa: F401
    get_encoding,
    list_encodings,
    register_encoding,
)
from .streaming import StreamingEncoder  # noqa: F401
from .wrapper import (  # noqa: F401
    Encoding,
    Tokenizer,
    TokenDaggerError,
    create_tokenizer,
    load_tokenizer,
)
from .vocab import (  # noqa: F401
    LLAMA4_PATTERN,
    load_hf_special_tokens,
    load_tekken,
    load_tiktoken_model,
)

__version__ = "0.1.0"

__all__ = [
    "Tokenizer",
    "Encoding",
    "StreamingEncoder",
    "get_encoding",
    "register_encoding",
    "list_encodings",
    "TokenDaggerError",
    "create_tokenizer",
    "load_tokenizer",
    "LLAMA4_PATTERN",
    "load_tiktoken_model",
    "load_hf_special_tokens",
    "load_tekken",
    "__version__",
]
