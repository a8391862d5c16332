"""Selectable H2D-overlap corpus encoder over the flagship device
pipeline (VERDICT r4 item 5: the co-located "wall approaches kernel"
claim must be a tested code path, not a retired experiment).

``ResidentStream`` builds the four flagship stages once (bit-plane
starts with the fused ASCII decode, butterfly compaction, chunked
transposed vocab probe, butterfly finalize — the exact kernels
resident.py and parallel/resident_mesh.py run) and encodes an arbitrary
corpus in fixed-shape window batches with **double-buffered staging**:
batch k+1's ``jax.device_put`` is issued before blocking on batch k's
dispatches, so on hardware where H2D and compute overlap the wall
approaches max(transfer, compute). On this machine's tunneled TPU the
wall is transfer-bound (~45-70 MB/s link); a co-located deployment
(H2D ~50 GB/s) flips the max() — the mechanism was measured in round 3
(stream wall == transfer wall within 6% while kernel compute ran 11x
the link; docs/PERF.md).

Exactness: windows are char-aligned; non-ASCII windows, capacity
overflows, and device-missed pieces all take the exact host path (the
same layered-fallback contract as every other engine path); the result
is bit-identical to HostEngine.encode_ordinary of each window.

Routing: ``preferred_wall_path(dispatch_ms)`` selects the streamed
device wall only when the measured post-sync dispatch latency is
healthy (co-located chips: microseconds; degraded/proxied runtimes:
tens of ms — wrapper._device_dispatch_ms measures it); everything else
belongs on the host engine.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np

# dispatches costlier than this are a degraded/remote runtime: the
# streamed wall would be dominated by per-dispatch latency, not work
# (same threshold as wrapper._DEVICE_HEALTHY_MS)
HEALTHY_DISPATCH_MS = 1.0


def preferred_wall_path(dispatch_ms: float,
                        threshold: float = HEALTHY_DISPATCH_MS) -> str:
    """"stream" when the runtime's measured dispatch latency is healthy
    enough for the double-buffered device wall to win; else "host"."""
    return "stream" if dispatch_ms < threshold else "host"


@dataclass
class StreamStats:
    n_windows: int = 0
    n_batches: int = 0
    host_fallback_windows: int = 0   # non-ASCII or overflow windows
    spliced_pieces: int = 0          # device misses merged on the host
    wall_s: float = 0.0
    bytes_total: int = 0
    extra: dict = field(default_factory=dict)

    @property
    def wall_mbps(self) -> float:
        return self.bytes_total / 1e6 / self.wall_s if self.wall_s else 0.0


class ResidentStream:
    """Flagship-pipeline corpus encoder with double-buffered staging."""

    def __init__(
        self,
        ranks: dict[bytes, int],
        specials: dict[str, int],
        pattern: str,
        *,
        window: int = 1 << 20,
        batch: int = 8,
        cap_bytes_per_piece: float = 3.0,
        profile: str = "llama4",
        probe_chunks: int | None = None,
        interpret: bool | None = None,
    ):
        import jax
        import jax.numpy as jnp

        from .engine import _enable_persistent_compile_cache
        from .hostengine import HostEngine
        from .ops.bitplane import piece_starts_bits_pallas
        from .ops.compact_pallas import (
            compact_piece_keys_butterfly, finalize_butterfly,
        )
        from .ops.fused import caps_for
        from .ops.join import vocab_probe8t_chunks
        from .tables import build_tables
        from .unicode_tables import get_two_level_tables

        _enable_persistent_compile_cache(jax)
        self._jax = jax
        self._jnp = jnp
        self.window = window
        self.batch = batch
        self.profile = profile
        self.host = HostEngine(pattern, ranks, specials)
        self._rdict = dict(ranks)
        tables = build_tables(ranks, specials)
        page_ids, pages = map(jnp.asarray, get_two_level_tables())
        vhash_rows = jnp.asarray(tables.vhash8_rows)
        vhash_mask = tables.vhash8_mask
        p_cap = caps_for(window, bytes_per_piece=cap_bytes_per_piece)["p_cap"]
        self.p_cap = p_cap
        trim = jnp.int32(window)
        interp = (jax.default_backend() not in ("tpu", "axon")
                  if interpret is None else interpret)
        packed = window == 32 * 256 * 128
        contractions = profile != "nocontract"
        if probe_chunks is None:
            # resident.py's chip-swept heuristic
            probe_chunks = (16 if p_cap > 300_000
                            else 64 if p_cap > 256_000
                            else 48 if p_cap > 200_000 else 96)

        def pipeline_b(devs, nbs):
            starts = piece_starts_bits_pallas(
                devs, nbs, page_ids, pages, contractions=contractions,
                profile=profile, ascii_fast=True, packed_out=packed,
                interpret=interp,
            )
            sb, pl_, k0, k1, k2, k3, npc = compact_piece_keys_butterfly(
                starts, devs, nbs, p_cap, packed=packed, interpret=interp,
            )
            rank = jax.vmap(
                lambda a, b, c, d, e: vocab_probe8t_chunks(
                    a, b, c, d, e, vhash_rows, vhash_mask,
                    n_chunks=probe_chunks)
            )(k0, k1, k2, k3, pl_)
            return finalize_butterfly(
                sb, pl_, rank, npc, trim, p_cap=p_cap, interpret=interp,
            )

        self._pipeline = jax.jit(pipeline_b)
        self._dev = jax.devices()[0]

    # ------------------------------------------------------------------
    def _stage_windows(self, corpus: bytes):
        """Char-aligned fixed-shape windows + per-window validity. ASCII
        windows ride the device; others are host-fallback routed."""
        from .utils.windows import stream_windows

        wins = stream_windows(corpus, self.window)
        metas = [len(w) > 0 and not (w & 0x80).any() for w in wins]
        return wins, metas

    def encode(self, corpus: bytes) -> tuple[list[list[int]], StreamStats]:
        """Encode ``corpus`` window-by-window (each window an independent
        text, like the reference's encode_batch chunks). Returns
        (per-window id lists, stats); ids are bit-identical to
        HostEngine.encode_ordinary per window."""
        jax = self._jax
        jnp = self._jnp

        N, B = self.window, self.batch
        wins, dev_ok = self._stage_windows(corpus)
        stats = StreamStats(
            n_windows=len(wins), bytes_total=sum(len(w) for w in wins)
        )
        out: list[list[int] | None] = [None] * len(wins)

        # device-eligible window indices, in batches of B
        idxs = [i for i, ok in enumerate(dev_ok) if ok]
        batches = [idxs[k : k + B] for k in range(0, len(idxs), B)]
        t0 = time.perf_counter()

        def stage(bidx):
            d = np.zeros((B, N), np.uint8)
            nb = np.zeros((B,), np.int32)
            for r, i in enumerate(bidx):
                d[r, : len(wins[i])] = wins[i]
                nb[r] = len(wins[i])
            return (jax.device_put(jnp.asarray(d), self._dev),
                    jax.device_put(jnp.asarray(nb), self._dev))

        cur = stage(batches[0]) if batches else None
        results = []
        for k, bidx in enumerate(batches):
            nxt = stage(batches[k + 1]) if k + 1 < len(batches) else None
            results.append((bidx, self._pipeline(*cur)))
            cur = nxt
        # drain + host splice
        for bidx, res in results:
            (flat, n_kept, _np_, _nk2, _cons, overflow,
             ms_s, ms_l, n_ms) = [np.asarray(x) for x in res]
            for r, i in enumerate(bidx):
                if bool(overflow[r]):
                    stats.host_fallback_windows += 1
                    continue  # filled by the host pass below
                ids = flat[r][: int(n_kept[r])]
                k_ms = int(n_ms[r])
                if k_ms:
                    stats.spliced_pieces += k_ms
                    ids = self._splice(ids, wins[i].tobytes(),
                                       ms_s[r], ms_l[r])
                out[i] = ids.tolist()
        stats.n_batches = len(batches)
        stats.wall_s = time.perf_counter() - t0

        for i, w in enumerate(wins):
            if out[i] is None:
                if dev_ok[i]:
                    pass  # overflow fallback
                else:
                    stats.host_fallback_windows += 1
                out[i] = self.host.encode_ordinary(
                    w.tobytes().decode("utf-8")
                )
        return out, stats  # type: ignore[return-value]

    def _splice(self, ids, window_b: bytes, sp_s, sp_l):
        """Merge device-missed piece spans exactly (oracle order)."""
        from .hostengine import byte_pair_merge
        from .ops.fused import SENTINEL

        idl = ids.tolist()
        spliced: list[int] = []
        prev = 0
        sp_s = sp_s.tolist()
        sp_l = sp_l.tolist()
        for j, p in enumerate(np.nonzero(ids == SENTINEL)[0].tolist()):
            spliced.extend(idl[prev:p])
            piece = window_b[sp_s[j] : sp_s[j] + sp_l[j]]
            r = self._rdict.get(piece)
            if r is not None:
                spliced.append(r)
            else:
                spliced.extend(byte_pair_merge(piece, self._rdict))
            prev = p + 1
        spliced.extend(idl[prev:])
        return np.asarray(spliced, dtype=ids.dtype)
