"""The join-first device pipeline under ``shard_map``: windows
data-parallel across a mesh.

This is the pod-scale form of the flagship on-chip pipeline
(tokendagger_tpu/resident.py): each device runs the five fixed-shape
stages — UTF-8 decode, bit-plane piece starts, butterfly compaction,
transposed vocab probe, finalize — over ITS shard of the window batch,
with byte/token counters reduced by ``psum`` over the data axis. Tables
are replicated (a few MB per device); windows are sharded; there is no
cross-device communication in the hot loop besides the counter psum,
so bytes/s scales linearly by construction (the reference's analogue is
thread data parallelism over texts, /root/reference/tokendagger/
wrapper.py:234-235 — here the axis is a TPU mesh, not OS threads).

Validated on a virtual 8-device CPU mesh (tests/test_resident_mesh.py):
per-window ids bit-identical to the single-device pipeline and the host
oracle, counters equal to the global totals on every shard.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def mesh_resident_pipeline(
    mesh: Mesh,
    tables,
    page_ids: jnp.ndarray,
    pages: jnp.ndarray,
    *,
    window: int,
    p_cap: int,
    impl: str = "ascii",
    profile: str = "llama4",
    c_cap: int | None = None,
    class_hot_cfg: dict | None = None,
    probe_hot_cfg: dict | None = None,
    interpret: bool = False,
):
    """Build a jitted ``(windows (B, N) uint8, nbytes (B,)) ->
    (flat_ids, n_kept, n_pieces, overflow, miss_spans..., totals)``
    function with windows sharded over the mesh's data axis.

    B must be a multiple of the mesh size; tables/pages are replicated.
    ``interpret`` runs the Pallas kernels in interpret mode (CPU tests).
    Returns (fn, in_shardings) — callers place inputs with
    ``jax.device_put(x, in_shardings[i])`` for zero-copy dispatch.

    Same ``impl``/``profile``/capacity configuration as resident.py
    (input-agnostic parallelism, like the reference's thread DP at
    /root/reference/tokendagger/wrapper.py:234-235):

    * impl="ascii": the flagship all-ASCII form — decode is a widening
      fused into the bit-plane starts kernel (plane-space masks over the
      raw bytes). Caller must guarantee every window is pure ASCII.
    * impl="general": arbitrary UTF-8 — tiled butterfly decode, class
      table gathers in the starts kernel, char->byte flag expansion by
      recorded-route replay. ``c_cap`` sizes the char-indexed stages
      (defaults to ``window``; must be a multiple of 4096).
    * profile: any scanner profile (llama4 / nocontract / cl100k / gpt2).
    * class_hot_cfg {hot_cps, u_cap} / probe_hot_cfg {hot_keys,
      hot_ranks, u_cap}: the round-5 hot-set routings
      (ops/bitplane.class_lookup_hot, ops/join.vocab_probe_hot) — same
      host-side staging analysis as resident.py; a blown u_cap folds
      into the per-window overflow flag (exact fallback downstream).
      class_hot_cfg requires impl="general" and c_cap % 32768 == 0;
      probe_hot_cfg pads p_cap to the compaction tile internally.
    """
    from ..ops import pretokenize as PT
    from ..ops.bitplane import piece_starts_bits_pallas
    from ..ops.compact_pallas import (
        compact_piece_keys_butterfly, finalize_butterfly,
    )
    from ..ops.join import vocab_probe8t_chunks, vocab_probe_hot

    vhash_rows = jnp.asarray(tables.vhash8_rows)
    vhash_mask = tables.vhash8_mask
    trim = jnp.int32(window)
    contractions = profile != "nocontract"
    # same handoff as resident.py's flagship config: the ASCII decode is
    # just a widening fused into the starts stage, and the flags ride as
    # packed plane words when the window is 32 * the butterfly block
    packed = impl == "ascii" and window == 32 * 256 * 128
    cc = c_cap or window
    assert cc % 4096 == 0, cc
    if probe_hot_cfg is not None:
        # the hot probe's compaction tiles need p_cap % 32768 == 0
        p_cap = max(32768, -(-p_cap // 32768) * 32768)
    if class_hot_cfg is not None:
        assert impl == "general" and cc % 32768 == 0, cc

    def local_starts_bytes(devs, nbs):
        """Byte-level piece-start flags (or packed planes) per impl;
        second element is the class-u_cap overflow (or None)."""
        if impl == "ascii":
            # ascii_fast consumes the raw byte window (plane-space
            # masks; validity plane covers the garbage tail, no int32
            # widening); char == byte so the flags are byte flags
            return piece_starts_bits_pallas(
                devs, nbs, page_ids, pages, contractions=contractions,
                profile=profile, ascii_fast=True, packed_out=packed,
                interpret=interpret,
            ), None
        cp, lead, m, route = PT.utf8_decode_tiles(
            devs, nbs, c_cap=cc, interpret=interpret,
        )
        cls_ovf = None
        if class_hot_cfg is not None:
            starts_c, cls_ovf = piece_starts_bits_pallas(
                cp, m, page_ids, pages, contractions=contractions,
                profile=profile, interpret=interpret,
                hot_cps=tuple(class_hot_cfg["hot_cps"]),
                u_cap=class_hot_cfg["u_cap"],
            )
        else:
            starts_c = piece_starts_bits_pallas(
                cp, m, page_ids, pages, contractions=contractions,
                profile=profile, interpret=interpret,
            )
        return PT.expand_starts_replay(
            starts_c, lead, route, interpret=interpret,
        ), cls_ovf

    def local_pipeline(devs, nbs):
        # devs (b_local, N) uint8; nbs (b_local,)
        starts, cls_ovf = local_starts_bytes(devs, nbs)
        sb, pl_, k0, k1, k2, k3, npc = compact_piece_keys_butterfly(
            starts, devs, nbs, p_cap, packed=packed, interpret=interpret,
        )
        p_ovf = None
        if probe_hot_cfg is not None:
            rank, p_ovf = vocab_probe_hot(
                k0, k1, k2, k3, pl_, vhash_rows, vhash_mask,
                hot_keys=tuple(probe_hot_cfg["hot_keys"]),
                hot_ranks=tuple(probe_hot_cfg["hot_ranks"]),
                u_cap=probe_hot_cfg["u_cap"], interpret=interpret,
            )
        else:
            # chunk count mirrors resident.py's chip-swept heuristic
            # (results/sweep_chunks42.log): 48 at the tight flagship
            # p_cap band; identical results at any count
            n_chunks = (16 if p_cap > 300_000
                        else 64 if p_cap > 256_000
                        else 48 if p_cap > 200_000 else 96)
            rank = jax.vmap(
                lambda a, b, c, d, e: vocab_probe8t_chunks(
                    a, b, c, d, e, vhash_rows, vhash_mask,
                    n_chunks=n_chunks)
            )(k0, k1, k2, k3, pl_)
        out = finalize_butterfly(
            sb, pl_, rank, npc, trim, p_cap=p_cap, interpret=interpret,
        )
        # fold hot-routing u_cap overflows into the per-window overflow
        # flag (exact-fallback contract, same as resident.py)
        for ovf in (cls_ovf, p_ovf):
            if ovf is not None:
                out = out[:5] + (out[5] | ovf,) + out[6:]
        flat, n_kept = out[0], out[1]
        # psum'd global counters: every shard ends up with the totals
        total_tokens = jax.lax.psum(jnp.sum(n_kept), DATA_AXIS)
        total_bytes = jax.lax.psum(jnp.sum(nbs), DATA_AXIS)
        return out + (total_tokens, total_bytes)

    spec_b = P(DATA_AXIS)
    fn = jax.jit(
        jax.shard_map(
            local_pipeline,
            mesh=mesh,
            in_specs=(spec_b, spec_b),
            out_specs=(
                spec_b, spec_b, spec_b, spec_b, spec_b, spec_b,
                spec_b, spec_b, spec_b,
                P(), P(),  # psum'd totals are replicated
            ),
            check_vma=False,
        )
    )
    shardings = (
        NamedSharding(mesh, spec_b),
        NamedSharding(mesh, spec_b),
    )
    return fn, shardings
