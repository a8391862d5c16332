"""Device decode: token ids -> byte stream (SURVEY §7 "Decode kernel").

A gather-only program: per output byte position, locate its token via a
searchsorted over the exclusive-cumsum of token byte lengths, then gather
the byte from the replicated rank->bytes blob (tables.py decode tables).
Trivially data-parallel; rides the same fixed-shape discipline as the
encode pipeline (static out_size cap, true length returned).

Reference behavior: /root/reference/src/tiktoken/tiktoken.cpp:236-255
(per-id lookup + concat, errors on unknown ids — validation stays on the
host here; unknown ids must be rejected before calling the kernel).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("out_size",))
def decode_ids(
    ids: jnp.ndarray,        # (N,) int32 token ids (pre-validated)
    offsets: jnp.ndarray,    # (V,) int64 rank -> blob offset
    lengths: jnp.ndarray,    # (V,) int32 rank -> byte length
    blob: jnp.ndarray,       # (B,) uint8 concatenated token bytes
    out_size: int,           # static output capacity (>= total bytes)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (out (out_size,) uint8 zero-padded, total scalar int32)."""
    lens = lengths[ids].astype(jnp.int32)
    starts = jnp.cumsum(lens) - lens            # exclusive
    total = jnp.sum(lens)
    j = jnp.arange(out_size, dtype=jnp.int32)
    # token index owning output byte j
    t = jnp.searchsorted(starts + lens, j, side="right")
    t = jnp.clip(t, 0, ids.shape[0] - 1)
    src = offsets[ids[t]] + (j - starts[t])
    src = jnp.clip(src, 0, blob.shape[0] - 1)
    out = jnp.where(j < total, blob[src], 0)
    return out, total
