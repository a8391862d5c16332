"""Shared cache-directory resolution (TOKENDAGGER_TPU_CACHE)."""

from __future__ import annotations

import os
from pathlib import Path


def cache_dir(sub: str | None = None) -> Path:
    """The package cache root (or a subdirectory of it), created on use."""
    d = Path(
        os.environ.get(
            "TOKENDAGGER_TPU_CACHE", Path.home() / ".cache" / "tokendagger_tpu"
        )
    )
    if sub:
        d = d / sub
    d.mkdir(parents=True, exist_ok=True)
    return d
