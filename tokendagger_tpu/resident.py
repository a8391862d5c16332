"""Device-resident kernel benchmark harness (real-TPU measurements).

Measures the join-first encode pipeline (ops/fused.py staged dispatches)
with ALL inputs staged on device once, using the **drain protocol** this
machine's remote runtime demands (see docs/PERF.md "dispatch cliff"):

  stage H2D -> t0 -> dispatch the whole workload asynchronously (no
  device-to-host reads of any kind) -> ONE final 4-byte read that forces
  every queued program to complete -> t1.

Rationale: the axon session runs dispatches in a fast speculative mode
until the first device->host read (even an int() of a scalar), after
which EVERY dispatch permanently costs ~25-30 ms. Timing loops that sync
per repetition therefore measure the degraded mode; the drain protocol
measures true end-to-end device execution as observable by the client.
The first timed trial is the honest one; a post-drain (degraded-mode)
trial is also recorded for transparency.
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
    calibration_ms: float       # trivial-op dispatch latency
    device_ms: float            # per-DISPATCH on-device time (trace)
    kernel_mbps: float          # batch*window_bytes / device_ms
    stage_us: dict              # per-stage on-device µs per dispatch
    wall_ms: float              # per-dispatch wall clock incl. final drain
    wall_mbps: float
    total_tokens: int
    match_host: bool            # ids bit-identical to the host oracle
    batch: int = 1              # windows per dispatch (vmapped stages)
    impl: str = "scatter"       # compaction strategy (ascii-sort/sort/scatter)
    starts_impl: str = "jnp"    # piece-start formulation (jnp/sweep/bits*)
    compact_impl: str = "sort"  # piece compaction (sort/butterfly)
    probe_impl: str = "transposed"  # vocab probe (chunked/transposed/barrier)
    cap_bpp: float = 3.0        # piece-slot sizing (bytes/piece)
    overlap: dict | None = None  # H2D/compute overlap probe (streaming)
    # windows whose piece count exceeded p_cap and demoted to the exact
    # host fallback — nonzero here under auto capacity means the host
    # sizer (regex split_spans) and the device scanner disagree on piece
    # counts, a silent perf cliff that must surface in artifacts
    overflow_windows: int = 0
    # hot-piece probe routing (ops/join.vocab_probe_hot): coverage and
    # compacted-gather capacity when active
    probe_hot: dict | None = None

    def to_dict(self):
        return asdict(self)


def _device_times_from_trace(trace_dir: str) -> dict[str, float]:
    """Sum on-device execution time (µs) per top-level program from the
    newest profiler trace under ``trace_dir``. Device-lane events only;
    top-level jit programs (names beginning "jit") so inner fusions are
    not double-counted."""
    import glob
    import gzip
    import json

    paths = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz",
                             recursive=True))
    with gzip.open(paths[-1]) as f:
        t = json.load(f)
    evs = t.get("traceEvents", [])
    dev_pids = {
        e["pid"] for e in evs
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    out: dict[str, float] = {}
    for e in evs:
        if (e.get("ph") == "X" and e.get("pid") in dev_pids
                and str(e.get("name", "")).startswith("jit")):
            name = e["name"].split("(")[0]
            out[name] = out.get(name, 0.0) + float(e.get("dur", 0.0))
    return out


def run_resident(
    ranks: dict[bytes, int],
    specials: dict[str, int],
    pattern: str,
    corpus: bytes,
    *,
    window: int = 1 << 20,
    n_windows: int = 8,
    reps: int = 32,
    trials: int = 1,  # kept for API compat; the drain protocol uses one
    verify: bool = True,
    join_mode: str = "probe",
    miss_mode: str = "host",
    batch: int = 1,
    impl: str = "auto",
    starts_impl: str = "jnp",
    compact_impl: str = "sort",
    probe_impl: str = "transposed",
    cap_bytes_per_piece: float = 3.0,
    overlap_trial: bool = True,
    profile: str = "llama4",
) -> ResidentResult:
    import jax
    import jax.numpy as jnp

    from .engine import _enable_persistent_compile_cache
    from .ops import pretokenize as PT
    from .ops.fused import (
        caps_for, finalize_host, finalize_host_sorted, resolve_window,
    )
    from .ops.join import (
        compact_piece_keys, compact_piece_keys_sorted, vocab_probe8,
        vocab_probe8t, vocab_probe8t_chunked, vocab_probe8t_chunks,
        vocab_probe_hot,
    )
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
    vhash_rows = jnp.asarray(tables.vhash8_rows)
    if miss_mode != "host":
        probe_impl = "barrier"  # resolve_window hardcodes vocab_probe8

    N = window
    mask = tables.pair.mask

    wins = []
    win_bytes: list[bytes] = []
    all_ascii = True
    max_chars = 0
    for w in range(n_windows):
        lo = (w * N) % max(1, len(corpus) - N)
        chunk = corpus[lo : lo + N]
        arr = np.frombuffer(chunk, dtype=np.uint8)
        # char-align the window (each window is encoded as an independent
        # text by both the kernel and the oracle): skip leading
        # continuation bytes, trim an incomplete trailing sequence
        k = 0
        while k < len(arr) and (arr[k] & 0xC0) == 0x80:
            k += 1
        arr = arr[k:]
        e = len(arr)
        if e and (arr[e - 1] & 0x80):
            j = e - 1
            while j > max(0, e - 4) and (arr[j] & 0xC0) == 0x80:
                j -= 1
            if (arr[j] & 0xC0) == 0xC0:
                need = 2 if arr[j] < 0xE0 else (3 if arr[j] < 0xF0 else 4)
                if e - j < need:
                    e = j
        arr = arr[:e]
        buf = np.zeros(N, dtype=np.uint8)
        buf[: len(arr)] = arr
        all_ascii = all_ascii and not (buf & 0x80).any()
        max_chars = max(max_chars, int(((arr & 0xC0) != 0x80).sum()))
        win_bytes.append(arr.tobytes())
        wins.append((jnp.asarray(buf), jnp.int32(len(arr))))

    cap_auto = not cap_bytes_per_piece
    probe_hot_cfg = None
    if cap_auto:
        # auto piece capacity: exact host piece count per window (the
        # scanners are bit-identical, so the count is the truth), sized
        # TIGHT — the smallest lane-aligned slot count covering every
        # window with 2% headroom. Every piece-indexed stage (probe
        # gathers, degap, finalize) pays per SLOT, so oversized capacity
        # is pure wall time: English ~4.45 B/piece wastes 26% at the
        # worst-case 3.0, emoji ~9.8 wastes 3.2x (docs/PERF.md). Tight
        # sizing gives a corpus-unique shape (one fresh compile per
        # corpus profile, then cached); callers that need shape reuse
        # across corpora pass an explicit cap.
        from collections import Counter

        from .hostengine import HostEngine

        h_sizer = HostEngine(pattern, ranks, specials)
        max_pieces = max(
            (len(h_sizer.split_spans(b.decode("utf-8"))) for b in win_bytes),
            default=1,
        )
        p_tight = max(512, -(-int(max_pieces * 1.02 + 8) // 128) * 128)
        cap_bytes_per_piece = round(N / p_tight, 2)

        # hot-piece probe routing (ops/join.vocab_probe_hot): the probe
        # gather pays per SLOT at the chip's issue rate and already sits
        # ~8% above its floor — the only lever left is fewer rows. Bake
        # the staged windows' top pieces (<= 16 B, so (key, len) is
        # exact identity) as trace constants; only the rest ride the
        # gather, compacted to an exact-counted prefix. Gates: batched
        # chunks probe, meaningful coverage, and a worthwhile count cut.
        # (Piece lists are built only under the gate — they hold ~2M
        # small bytes objects at the 8 x 1 MB shape.)
        if batch > 1 and probe_impl == "chunks" and miss_mode == "host":
            win_pieces: list[list[bytes]] = []
            for b in win_bytes:
                txt = b.decode("utf-8")
                win_pieces.append(
                    [txt[a:e].encode("utf-8")
                     for a, e in h_sizer.split_spans(txt)]
                )
            pc: Counter = Counter()
            for pieces in win_pieces:
                pc.update(p for p in pieces if len(p) <= 16)
            # adaptive K, capped at 128: each hot key buys (its
            # frequency) fewer gathered rows for ~5 full-lane compares.
            # Chip-measured landscape at the flagship shape: K=128 ->
            # probe 2,594 µs; K=256 (97.7% coverage, u_cap 5504) ->
            # 3,219 µs — past ~128 keys the where-chain outgrows one
            # fusion and the split passes re-materialize the (B, P)
            # intermediates, costing more than the saved gathers. The
            # 0.02% floor just trims useless tail keys on low-repetition
            # corpora.
            tot0 = sum(pc.values()) or 1
            hot_list = []
            for p, cnt in pc.most_common(128):
                if cnt / tot0 < 0.0002 and len(hot_list) >= 32:
                    break
                hot_list.append(p)
            hot_set = frozenset(hot_list)
            unknowns = [
                sum(1 for p in pieces if p not in hot_set)
                for pieces in win_pieces
            ]
            max_unknown = max(unknowns, default=0)
            tot = sum(len(p) for p in win_pieces) or 1
            coverage = 1.0 - sum(unknowns) / tot
            u_tight = max(4096, -(-(max_unknown + 128) // 128) * 128)
            p_tile = max(32768, -(-p_tight // 32768) * 32768)
            if hot_list and coverage >= 0.3 and u_tight <= (
                    (7 * p_tile) // 10):
                from .ops.join import piece_key_words

                rd = dict(ranks)
                probe_hot_cfg = dict(
                    hot_keys=tuple(piece_key_words(p) for p in hot_list),
                    hot_ranks=tuple(rd.get(p, -1) for p in hot_list),
                    u_cap=u_tight,
                    coverage=round(coverage, 4),
                )
                p_tight = p_tile
                cap_bytes_per_piece = round(N / p_tight, 2)
    caps = caps_for(N, bytes_per_piece=cap_bytes_per_piece)
    if cap_auto:
        # float-rounding of the reported cap_bpp must not shrink the
        # verified-tight slot count
        caps["p_cap"] = p_tight
    p_cap = caps["p_cap"]

    # "chunks": static span slicing, no control flow: ~31% over monolithic.
    # The sweet spot is shape-dependent (chip sweeps, 8 windows:
    # p_cap 349568 -> 16 chunks 6.17 ms (32 -> 6.42, 64 -> 6.28);
    # p_cap 262144 -> 64 chunks 4.65 ms (32 -> 4.93, 16 -> 6.40;
    # 96-256 flat or worse for much longer compiles);
    # results/probe_chunks_sweep*.log + tools/sweep_compact.py)
    # "chunked": transposed probe over the LIVE prefix only (while_loop
    # over chunks — gather cost scales with actual pieces, not capacity);
    # "transposed": gathered rows materialized as (48, P) so compares run
    # full-lane (2.1x the barrier form, measured — ops/join.vocab_probe8t);
    # "barrier": (P, 48) materialization + slice compares
    probe_hot_active = probe_hot_cfg is not None
    if probe_hot_active:
        u_cap_p = probe_hot_cfg["u_cap"]
        # chunk sweep at the DENSE shape (tools/probe_hot_decomp.py,
        # 8 x 48000): 8 -> 0.912, **16 -> 0.845**, 24 -> 0.857,
        # 32 -> 0.910, 48 -> 0.886, 96 -> 1.280 ms — small dense prefixes
        # want few chunks (the 96 band was tuned for 150k+ slots)
        nch_u = (16 if u_cap_p <= 131_072
                 else 16 if u_cap_p > 300_000
                 else 64 if u_cap_p > 256_000
                 else 48 if u_cap_p > 200_000 else 96)
        interp_p = jax.default_backend() not in ("tpu",)

        def probe_fn(k0, k1, k2, k3, pl, npc):
            return vocab_probe_hot(
                k0, k1, k2, k3, pl, vhash_rows, tables.vhash8_mask,
                hot_keys=probe_hot_cfg["hot_keys"],
                hot_ranks=probe_hot_cfg["hot_ranks"],
                u_cap=u_cap_p, n_chunks=nch_u, interpret=interp_p,
            )
    elif probe_impl == "chunks":
        # chip sweeps (results/sweep_chunks42.log): p_cap 349568 -> 16;
        # 262144 -> 64; 240512 (tight English) -> 48 (4.249 ms vs 4.554
        # at 96; the landscape is noisy — 40 spikes to 6.1); 156544
        # (tight emoji) -> flat, 96 best by a hair
        n_chunks = (16 if p_cap > 300_000
                    else 64 if p_cap > 256_000
                    else 48 if p_cap > 200_000 else 96)

        def probe_fn(k0, k1, k2, k3, pl, npc):
            return vocab_probe8t_chunks(k0, k1, k2, k3, pl,
                                        vhash_rows, tables.vhash8_mask,
                                        n_chunks=n_chunks)
    elif probe_impl == "chunked":
        def probe_fn(k0, k1, k2, k3, pl, npc):
            return vocab_probe8t_chunked(k0, k1, k2, k3, pl, npc,
                                         vhash_rows, tables.vhash8_mask)
    elif probe_impl == "transposed":
        def probe_fn(k0, k1, k2, k3, pl, npc):
            return vocab_probe8t(k0, k1, k2, k3, pl, vhash_rows,
                                 tables.vhash8_mask)
    else:
        def probe_fn(k0, k1, k2, k3, pl, npc):
            return vocab_probe8(k0, k1, k2, k3, pl, vhash_rows,
                                tables.vhash8_mask)

    if impl == "auto":
        # char==byte shortcut when every window is ASCII; otherwise the
        # butterfly general path in batch mode (sorts/scatters are
        # dispatch-poison on this runtime — docs/PERF.md), sorted
        # compaction in single-window mode
        if all_ascii and miss_mode == "host":
            impl = "ascii-sort"
        elif batch > 1 and miss_mode == "host":
            impl = "general"
        else:
            impl = "sort"
    if impl == "general":
        # the general path is built from bits starts + butterfly stages
        starts_impl = "bits-pallas"
        compact_impl = "butterfly"
    trim = jnp.int32(N)
    jax.block_until_ready(
        [a for w in wins for a in w]
        + [page_ids, pages, byte_rank, pair_rows, pair_lut, vk, vlen, vrank,
           vhash_rows, trim]
    )

    def dec_stage(d, nb):
        if impl == "ascii-sort":
            return PT._utf8_decode_ascii_j(d, nb)
        if impl == "sort":
            return PT._utf8_decode_sorted_j(d, nb)
        return PT._utf8_decode_j(d, nb, use_pallas=False)

    def compact_stage(st, cob, boc, d, nb):
        if impl == "ascii-sort":
            return compact_piece_keys_sorted(st, d, nb, p_cap)
        if impl == "sort":
            stb = PT._starts_to_bytes_j(st, cob, d, nb)
            return compact_piece_keys_sorted(stb, d, nb, p_cap)
        return compact_piece_keys(st, boc, d, nb, p_cap)

    def fin_stage(sb, pl, rank, npc):
        if impl in ("ascii-sort", "sort"):
            # windows here are complete (trim == window size), so the
            # kept set is the live set in slot order: skip the flat sort
            return finalize_host_sorted(sb, pl, rank, npc, trim,
                                        p_cap=p_cap, untrimmed=True)
        return finalize_host(sb, pl, rank, npc, trim, p_cap=p_cap)

    def pipeline(dev, nb):
        cp, cob, boc, m = dec_stage(dev, nb)
        starts = PT.compute_starts(
            cp, m, page_ids, pages, contractions=profile != "nocontract", profile=profile
        )
        if miss_mode == "host":
            sb, pl, k0, k1, k2, k3, npc = compact_stage(
                starts, cob, boc, dev, nb
            )
            rank = probe_fn(k0, k1, k2, k3, pl, npc)
            return fin_stage(sb, pl, rank, npc)
        return resolve_window(
            starts, boc, dev, nb, trim, byte_rank, pair_rows, pair_lut,
            vk, vlen, vrank, vhash_rows, mask=mask,
            vhash_mask=tables.vhash8_mask, join_mode=join_mode,
            miss_mode=miss_mode, **caps,
        )

    if batch > 1:
        # Batched mode: B windows per dispatch through jit(vmap(stage)).
        # The remote runtime charges a flat per-dispatch cost that dwarfs
        # the per-window execution (docs/PERF.md "dispatch cliff"
        # aftermath: every top-level program in the cycling pipeline pays
        # a ~30-46 ms image-swap floor). vmapping each STAGE keeps the
        # program set identical in count/structure but amortizes that
        # floor over `batch` windows.
        if miss_mode != "host":
            raise ValueError("batched resident mode requires miss_mode='host'")

        def starts_stage(cp, m):
            return PT.piece_starts_jax(
                cp, m, page_ids, pages, contractions=profile != "nocontract", profile=profile
            )

        def probe_stage(k0, k1, k2, k3, pl, npc):
            return probe_fn(k0, k1, k2, k3, pl, npc)

        if compact_impl == "butterfly" and impl not in ("ascii-sort",
                                                        "general"):
            # the butterfly path takes byte-level start flags (char == byte
            # for ASCII; the general path expands char flags to byte flags
            # with the inverse butterfly); degrade to the sort otherwise
            compact_impl = "sort"
        # ASCII + bits-pallas: the decode stage is just a widening — fuse
        # it into the starts jit (no (B, N) int32 codepoint round-trip),
        # and hand the flags to the butterfly compact as packed plane
        # words when the shapes line up (N == 32 * blk)
        fuse_dec = (impl == "ascii-sort" and starts_impl == "bits-pallas"
                    and compact_impl == "butterfly")
        packed_flags = (
            fuse_dec and compact_impl == "butterfly" and N == 32 * 256 * 128
        )
        v_dec = jax.jit(jax.vmap(dec_stage))
        if starts_impl in ("bits", "bits-pallas"):
            # bit-plane boolean-run derivation (ops/bitplane.py): 32 chars
            # per word; "bits-pallas" keeps every scan VMEM-resident. For
            # all-ASCII windows (already verified on the host for the
            # ascii-sort impl) the class masks come from range compares.
            from .ops.bitplane import (
                piece_starts_bits, piece_starts_bits_pallas,
            )

            af = impl == "ascii-sort"
            if starts_impl == "bits-pallas":
                interp_s = jax.default_backend() != "tpu"

                if fuse_dec:
                    # ascii_fast takes the raw byte window: mask
                    # construction happens in plane space (validity plane
                    # masks the garbage tail; no int32 widening at all)
                    def starts_bits_pallas_stage(dv, nbs):
                        return piece_starts_bits_pallas(
                            dv, nbs, page_ids, pages,
                            contractions=profile != "nocontract",
                            profile=profile, ascii_fast=af,
                            packed_out=packed_flags, interpret=interp_s,
                        )
                else:
                    def starts_bits_pallas_stage(cp, m):
                        return piece_starts_bits_pallas(
                            cp, m, page_ids, pages,
                            contractions=profile != "nocontract",
                            profile=profile, ascii_fast=af,
                            interpret=interp_s,
                        )

                v_starts = jax.jit(starts_bits_pallas_stage)
                hot_cps = None
                u_cap = None
                if impl == "general":
                    # char-capacity routing: chars were counted on the
                    # host at staging, so multi-byte-heavy windows run a
                    # program whose char-indexed stages (class gather,
                    # bit planes) cover a fraction of N slots. The class
                    # row-gather is issue-bound (491 Mrows/s) and pays
                    # per SLOT, so capacity slack is wall time: the
                    # emoji corpus at N/2 measured starts = 11.3 ms of
                    # 23.0 total; 5N/16 fits its 283k chars/window with
                    # 14% slack instead of 85%. Candidates stay multiples
                    # of 4096 (bitplane tile constraint).
                    c_cap = N
                    if cap_auto:
                        # auto capacity: tight fit, multiple of 4096
                        # (the bitplane tile constraint) with 2%
                        # headroom — same one-compile-per-corpus
                        # tradeoff as the tight p_cap above
                        c_cap = min(N, max(
                            4096,
                            -(-int(max_chars * 1.02 + 32) // 4096) * 4096,
                        ))
                    else:
                        for cand in (N // 4, 5 * N // 16, 3 * N // 8,
                                     N // 2, 5 * N // 8, 3 * N // 4):
                            if cand % 4096 == 0 and max_chars <= cand:
                                c_cap = cand
                                break

                    if cap_auto and N % 32768 == 0:
                        # hot-codepoint class routing (class_lookup_hot):
                        # the class gather — ~93% of the general starts
                        # stage — pays per SLOT, but real corpora
                        # concentrate (emoji fixture: top-32 cps = 69% of
                        # chars). Host-side histogram of the staged
                        # windows bakes the hot set as trace constants;
                        # only the remaining chars ride the gather,
                        # compacted to an exact-counted u_cap prefix.
                        # Measured 8.79 -> 4.18 ms (tools/probe_cls5.py).
                        from collections import Counter

                        hist: Counter = Counter()
                        win_cps = []
                        for b in win_bytes:
                            wcp = np.frombuffer(
                                b.decode("utf-8").encode("utf-32-le"),
                                np.uint32,
                            ).astype(np.int32)
                            win_cps.append(wcp)
                            vals, cnts = np.unique(wcp, return_counts=True)
                            hist.update(dict(zip(vals.tolist(),
                                                 cnts.tolist())))
                        hot = np.asarray(
                            [v for v, _ in hist.most_common(32)], np.int32
                        )
                        max_unknown = max(
                            (int((~np.isin(wcp, hot)).sum())
                             for wcp in win_cps), default=0,
                        )
                        # u_cap needs only lane alignment (the gather's
                        # minor dim); the INPUT length must be a tile
                        # multiple (32768) for the mask compaction
                        u_tight = max(
                            4096, -(-(max_unknown + 128) // 128) * 128
                        )
                        c_cap32 = min(N, -(-c_cap // 32768) * 32768)
                        if len(hot) and u_tight <= (3 * c_cap32) // 4:
                            hot_cps = tuple(int(v) for v in hot)
                            u_cap = u_tight
                            c_cap = c_cap32

                            def starts_hot_stage(cp, m):
                                return piece_starts_bits_pallas(
                                    cp, m, page_ids, pages,
                                    contractions=profile != "nocontract",
                                    profile=profile, ascii_fast=False,
                                    interpret=interp_s,
                                    hot_cps=hot_cps, u_cap=u_cap,
                                )

                            v_starts = jax.jit(starts_hot_stage)

                    # wedge-free general decode/expand (VERDICT r3 item
                    # 2): tiled compaction with recorded take-masks +
                    # static-roll inverse replay — no full-window
                    # butterfly programs (docs/PERF.md compile wedge)
                    def dec_general_stage(devs, nbs):
                        return PT.utf8_decode_tiles(
                            devs, nbs, c_cap=c_cap, interpret=interp_s,
                        )

                    def expand_stage(starts_char, lead, route):
                        return PT.expand_starts_replay(
                            starts_char, lead, route, interpret=interp_s,
                        )

                    v_dec_g = jax.jit(dec_general_stage)
                    v_expand = jax.jit(expand_stage)
            else:
                def starts_bits_stage(c, mm):
                    return piece_starts_bits(
                        c, mm, page_ids, pages, contractions=profile != "nocontract",
                        profile=profile, ascii_fast=af,
                    )

                v_starts = jax.jit(jax.vmap(starts_bits_stage))
        else:
            v_starts = jax.jit(jax.vmap(starts_stage))
        if compact_impl == "butterfly":
            # Pallas displacement-butterfly compaction (ops/compact_pallas):
            # replaces the 5-operand full-window sort.
            from .ops.compact_pallas import compact_piece_keys_butterfly

            interp = jax.default_backend() != "tpu"

            def compact_butterfly_stage(st, cob, boc, d, nb):
                return compact_piece_keys_butterfly(
                    st, d, nb, p_cap, interpret=interp,
                    packed=packed_flags,
                )

            v_compact = jax.jit(compact_butterfly_stage)
        else:
            v_compact = jax.jit(jax.vmap(compact_stage))
        if probe_impl == "chunks" or probe_hot_active:
            # the chunks probe is elementwise per slot: run it UN-vmapped
            # on the (B, P) batch directly — the vmap-wrapped form lowers
            # the row gather as a batched gather that costs ~25% more
            # in-pipeline than the direct 2-D form timed in
            # tools/probe_chunked.py. (The hot probe's compaction kernels
            # are batch-gridded and likewise take the (B, P) form.)
            v_probe = jax.jit(probe_stage)
        else:
            v_probe = jax.jit(jax.vmap(probe_stage))

        def run_probe(k0, k1, k2, k3, pl, npc):
            """rank, overflow-or-None (hot probe flags blown u_cap)."""
            if probe_hot_active:
                return v_probe(k0, k1, k2, k3, pl, npc)
            return v_probe(k0, k1, k2, k3, pl, npc), None
        if compact_impl == "butterfly":
            # miss-span compaction via the mask butterfly (no sort)
            from .ops.compact_pallas import finalize_butterfly

            interp_f = jax.default_backend() != "tpu"

            def finalize_butterfly_stage(sb, pl_, rank, npc):
                return finalize_butterfly(
                    sb, pl_, rank, npc, trim, p_cap=p_cap,
                    interpret=interp_f,
                )

            v_fin = jax.jit(finalize_butterfly_stage)
        else:
            v_fin = jax.jit(jax.vmap(fin_stage))

        # device_put (NOT jnp.stack): the timed/overlap paths feed
        # device_put arrays, and a device-computed stack can carry a
        # different layout — the first overlap-call then pays a full
        # ~76 s re-jit of all five stages (observed on the live rig)
        stk_dev = jax.device_put(np.stack(
            [np.asarray(wins[i % n_windows][0]) for i in range(batch)]
        ))
        stk_nb = jax.device_put(np.asarray(
            [int(wins[i % n_windows][1]) for i in range(batch)], np.int32
        ))
        jax.block_until_ready((stk_dev, stk_nb))

        if impl == "general":
            def pipeline_b(devs, nbs):
                cp, lead, m, route = v_dec_g(devs, nbs)
                cls_ovf = None
                if hot_cps is not None:
                    starts_c, cls_ovf = v_starts(cp, m)
                else:
                    starts_c = v_starts(cp, m)
                st_b = v_expand(starts_c, lead, route)
                sb, pl, k0, k1, k2, k3, npc = v_compact(
                    st_b, None, None, devs, nbs
                )
                rank, p_ovf = run_probe(k0, k1, k2, k3, pl, npc)
                out = v_fin(sb, pl, rank, npc)
                # a blown u_cap (class or probe compaction) corrupts that
                # window: demote it to the exact host fallback like any
                # other capacity overflow (host-exact sizing means this
                # never fires on the staged windows; belt+braces)
                for ovf in (cls_ovf, p_ovf):
                    if ovf is not None:
                        out = out[:5] + (out[5] | ovf,) + out[6:]
                return out
        elif fuse_dec:
            def pipeline_b(devs, nbs):
                starts = v_starts(devs, nbs)   # decode fused in
                sb, pl, k0, k1, k2, k3, npc = v_compact(
                    starts, None, None, devs, nbs
                )
                rank, p_ovf = run_probe(k0, k1, k2, k3, pl, npc)
                out = v_fin(sb, pl, rank, npc)
                if p_ovf is not None:
                    out = out[:5] + (out[5] | p_ovf,) + out[6:]
                return out
        else:
            def pipeline_b(devs, nbs):
                cp, cob, boc, m = v_dec(devs, nbs)
                starts = v_starts(cp, m)
                sb, pl, k0, k1, k2, k3, npc = v_compact(
                    starts, cob, boc, devs, nbs
                )
                rank, p_ovf = run_probe(k0, k1, k2, k3, pl, npc)
                out = v_fin(sb, pl, rank, npc)
                if p_ovf is not None:
                    out = out[:5] + (out[5] | p_ovf,) + out[6:]
                return out

    # calibration: trivial dispatch latency (pre-cliff; block, no D2H)
    xcal = jnp.arange(1024, dtype=jnp.int32)
    fcal = jax.jit(lambda x: (x * 3 + 1).sum())
    fcal(xcal).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(20):
        fcal(xcal).block_until_ready()
    calibration_ms = (time.perf_counter() - t0) / 20 * 1e3

    # compile + warm every stage (block_until_ready only; no reads)
    if batch > 1:
        out = pipeline_b(stk_dev, stk_nb)
    else:
        out = pipeline(*wins[0])
    jax.block_until_ready(out)

    # ---- on-device timing via the profiler trace -------------------------
    # The remote runtime dispatches speculatively (block_until_ready can
    # return before real completion) and any device->host read permanently
    # degrades the session, so wall-clock loops are either fiction or
    # tunnel-bound. The device trace records REAL per-program execution
    # times on the chip itself; trace collection cost is one-time.
    import tempfile

    trace_dir = tempfile.mkdtemp(prefix="td_resident_trace_")
    t0 = time.perf_counter()
    last = None
    with jax.profiler.trace(trace_dir):
        for r in range(reps):
            if batch > 1:
                last = pipeline_b(stk_dev, stk_nb)
            else:
                last = pipeline(*wins[r % n_windows])
        # drain: forces real completion (sole D2H read of the timed run)
        total_tokens = int(np.asarray(last[1]).sum())
    wall_ms = (time.perf_counter() - t0) / reps * 1e3
    # overflow accounting (ADVICE r4): windows that blew p_cap demote to
    # the exact host fallback — always exact, but a silent perf cliff if
    # the auto sizer ever disagrees with the device scanner. Post-drain
    # read, so it costs nothing in the timed region.
    _ovf = np.asarray(last[5])
    overflow_windows = int(_ovf.sum()) if _ovf.ndim else int(bool(_ovf))
    stage_tot = _device_times_from_trace(trace_dir)
    stage_us = {k: round(v / reps, 2) for k, v in sorted(stage_tot.items())}
    device_ms = sum(stage_tot.values()) / reps / 1e3

    # ---- H2D/compute overlap probe (VERDICT r2 item 2) -------------------
    # Three wall protocols over FRESH host batches: pure staging, serial
    # stage->compute, and double-buffered streaming (device_put of batch
    # k+1 issued before blocking on batch k's dispatches). Streaming wall
    # == max(transfer, compute) when the runtime overlaps; the delta vs
    # serial quantifies the hidden phase. Runs AFTER the trace loop's
    # drain read: the drain forces real completion of all prior work, so
    # these walls are not polluted by the warmup's ASYNC compile (which
    # otherwise lands on whichever protocol blocks for real first —
    # observed as a spurious ~90 s hit). Post-drain dispatches run in
    # the degraded ~30 ms/dispatch mode on this rig (docs/PERF.md),
    # which inflates all three walls equally; the transfer rate and the
    # stream-vs-serial delta remain meaningful.
    overlap_stats = None
    if batch > 1 and overlap_trial:
        n_stream = 4
        dev0 = jax.devices()[0]
        bats = []
        for k in range(n_stream):
            idx = [(k + i) % n_windows for i in range(batch)]
            d = np.stack([np.asarray(wins[j][0]) for j in idx])
            nbv = np.asarray([int(wins[j][1]) for j in idx], np.int32)
            bats.append((d, nbv))
        t0 = time.perf_counter()
        staged = [
            (jax.device_put(d, dev0), jax.device_put(nb, dev0))
            for d, nb in bats
        ]
        jax.block_until_ready(staged)
        t_transfer = time.perf_counter() - t0
        del staged
        # stream BEFORE serial: the serial protocol's per-phase blocking
        # can flip this proxied runtime into its degraded dispatch mode
        # (docs/PERF.md), which would poison every later wall number
        t0 = time.perf_counter()
        cur = (jax.device_put(bats[0][0], dev0),
               jax.device_put(bats[0][1], dev0))
        outs = []
        for k in range(n_stream):
            nxt = None
            if k + 1 < n_stream:
                nxt = (jax.device_put(bats[k + 1][0], dev0),
                       jax.device_put(bats[k + 1][1], dev0))
            outs.append(pipeline_b(*cur))
            cur = nxt
        jax.block_until_ready(outs)
        t_stream = time.perf_counter() - t0
        del outs
        t0 = time.perf_counter()
        for d, nb in bats:
            dd = jax.device_put(d, dev0)
            nn = jax.device_put(nb, dev0)
            jax.block_until_ready((dd, nn))
            jax.block_until_ready(pipeline_b(dd, nn))
        t_serial = time.perf_counter() - t0
        tot_mb = n_stream * batch * N / 1e6
        overlap_stats = {
            "n_batches": n_stream,
            "h2d_mbps": round(tot_mb / t_transfer, 2),
            "wall_serial_mbps": round(tot_mb / t_serial, 2),
            "wall_stream_mbps": round(tot_mb / t_stream, 2),
            "overlap_saved_ms": round((t_serial - t_stream) * 1e3, 1),
            "overlapped": bool(t_stream < 0.97 * t_serial),
        }


    match = True
    if verify:
        from .hostengine import HostEngine, byte_pair_merge
        from .ops.fused import SENTINEL

        host = HostEngine(pattern, ranks, specials)

        rdict = dict(ranks)

        def check_one(out, dev, nb):
            if bool(out[5]):
                return False  # capacity overflow: window must fall back
            ids = np.asarray(out[0][: int(out[1])])
            window_b = bytes(np.asarray(dev[: int(nb)]))
            n_sp = int(out[8])
            if n_sp:
                # splice host-merged miss/oversize spans (piece order).
                # List-based: miss-heavy corpora (emoji runs ~50-100k
                # misses per 1 MB window) made the old per-miss
                # np.concatenate splice the slowest phase of the whole
                # benchmark (minutes per batch, measured 2026-08-20).
                sp_s = np.asarray(out[6]).tolist()
                sp_l = np.asarray(out[7]).tolist()
                idl = ids.tolist()
                spliced: list[int] = []
                prev = 0
                for j, p in enumerate(np.nonzero(ids == SENTINEL)[0].tolist()):
                    spliced.extend(idl[prev:p])
                    piece = window_b[sp_s[j] : sp_s[j] + sp_l[j]]
                    r = rdict.get(piece)  # oracle: whole-piece lookup first
                    if r is not None:
                        spliced.append(r)
                    else:
                        spliced.extend(byte_pair_merge(piece, rdict))
                    prev = p + 1
                spliced.extend(idl[prev:])
                got = spliced
            else:
                got = ids.tolist()
            want = host.encode_ordinary(window_b.decode("utf-8"))
            return got == want

        if batch > 1:
            out = pipeline_b(stk_dev, stk_nb)
            match = all(
                check_one(
                    tuple(o[b] for o in out),
                    stk_dev[b], stk_nb[b],
                )
                for b in range(batch)
            )
        else:
            out = pipeline(*wins[0])
            match = check_one(out, *wins[0])

    per_dispatch_bytes = N * max(batch, 1)
    return ResidentResult(
        window_bytes=N,
        n_windows=n_windows,
        reps=reps,
        calibration_ms=round(calibration_ms, 3),
        device_ms=round(device_ms, 4),
        kernel_mbps=round(per_dispatch_bytes / 1e6 / (device_ms / 1e3), 2)
        if device_ms else 0.0,
        stage_us=stage_us,
        wall_ms=round(wall_ms, 3),
        wall_mbps=round(per_dispatch_bytes / 1e6 / (wall_ms / 1e3), 2),
        total_tokens=total_tokens,
        match_host=match,
        batch=max(batch, 1),
        impl=impl,
        starts_impl=starts_impl if batch > 1 else "jnp",
        compact_impl=compact_impl if batch > 1 else "sort",
        probe_impl="hot" if probe_hot_active else probe_impl,
        cap_bpp=cap_bytes_per_piece,
        overlap=overlap_stats,
        overflow_windows=overflow_windows,
        probe_hot=(
            dict(n_hot=len(probe_hot_cfg["hot_keys"]),
                 u_cap=probe_hot_cfg["u_cap"],
                 coverage=probe_hot_cfg["coverage"])
            if probe_hot_active else None
        ),
    )
