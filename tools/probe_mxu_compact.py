"""Chip probe: MXU one-hot-matmul tile compaction vs the displacement
butterfly (VERDICT r3 item 3 — the proposed lever to break the ~845 MB/s
stage-structure ceiling of docs/PERF.md "Round 3").

Two per-tile compaction kernels at the production shape (grid (B, G),
(256, 128) tiles, 5 value arrays, DMA at running row offsets — i.e.,
exactly compact_tiles' contract), trace-timed on the live chip:

  butterfly   the production kernel: raster incl-sum (2 MXU matmuls) +
              15 packed butterfly rounds for 5 arrays.
  mxu-row     stage A: within-row compaction as a per-row one-hot
              batched matmul, einsum('rdc,rc->rd') with
              onehot[r,d,c] = (rowpos[r,c]==d & live[r,c]) in bf16
              (values split into bf16 hi/lo halves to stay exact);
              stage B: rows packed to row-quantized offsets with ONE
              shared (R,R) one-hot permutation matmul per half-word
              array; leaves intra-tile row gaps < L per kept row, for
              a downstream degap (displacement < R*L — strictly MORE
              rounds than the butterfly's inter-tile degap pays today,
              so stage A+B must beat the butterfly by a margin to win).

Expected failure modes being measured (see the analysis in
docs/PERF.md): the batched matmul is 256 (1,128)@(128,128) passes per
array per tile — each pass underutilizes the MXU 128x — and the
(R,L,L) one-hot costs 4.2M element compares + 8 MB of VMEM per tile.
The butterfly's 15 rounds cost ~75 full-tile VPU ops total. If the
probe confirms the butterfly wins, the negative result + this log close
the VERDICT item; if mxu-* wins, it slots into compact_tiles unchanged
(same contract).

Usage: python tools/probe_mxu_compact.py [--b 8] [--reps 16]
Writes results/probe_mxu_compact.log
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

R, L = 256, 128
BLK = R * L


def _trace_times(trace_dir: str) -> dict[str, float]:
    from tokendagger_tpu.resident import _device_times_from_trace

    return _device_times_from_trace(trace_dir)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8, help="windows per dispatch")
    ap.add_argument("--g", type=int, default=32, help="tiles per window")
    ap.add_argument("--reps", type=int, default=16)
    ap.add_argument("--density", type=float, default=0.23,
                    help="live fraction (English ~1/4.4 B/piece)")
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tokendagger_tpu.engine import _enable_persistent_compile_cache
    from tokendagger_tpu.ops.compact_pallas import (
        _butterfly_packed, _iota2, _raster_incl_sum,
    )

    _enable_persistent_compile_cache(jax)
    interp = args.interpret or jax.default_backend() == "cpu"

    B, G = args.b, args.g
    N = G * BLK
    rng = np.random.default_rng(5)
    mask = (rng.random((B, N)) < args.density).astype(np.uint8)
    vals = [rng.integers(0, 1 << 20, (B, N)).astype(np.int32)
            for _ in range(4)]
    out_rows = -(-N // (4 * L)) + G + R  # ~cap-4.0 sizing + slack

    # ---- production butterfly tile kernel (compact_tiles' inner loop,
    # minus the DMA bookkeeping differences) --------------------------------
    def kern_butterfly(m_ref, w0, w1, w2, w3, *rest):
        out_refs = rest[:5]
        scratch = rest[5:10]
        sems = rest[10]
        carry = rest[11]
        b = pl.program_id(0)
        g = pl.program_id(1)
        row_off = jnp.where(g == 0, 0, carry[0])
        live = m_ref[0] != 0
        live_i = live.astype(jnp.int32)
        incl = _raster_incl_sum(live_i)
        cnt = incl[R - 1, L - 1]
        pos = incl - live_i
        row = _iota2((R, L), 0)
        col = _iota2((R, L), 1)
        lidx = row * L + col
        dl = (jnp.where(live, lidx - pos, 0) << 16) | lidx
        vs = _butterfly_packed(
            [dl, w0[0], w1[0], w2[0], w3[0]], BLK, disp_shift=16)
        vs[0] = vs[0] & 0xFFFF
        safe = jnp.minimum(row_off, out_rows - R)
        cps = []
        for i in range(5):
            scratch[i][...] = vs[i]
            c = pltpu.make_async_copy(
                scratch[i], out_refs[i].at[b, pl.ds(safe, R), :], sems.at[i])
            c.start()
            cps.append(c)
        for c in cps:
            c.wait()
        carry[0] = safe + (cnt + (L - 1)) // L

    # ---- MXU variants ------------------------------------------------------
    def mxu_stage_a(live, vs16):
        """Within-row compaction of bf16 half-words by per-row one-hot
        batched matmul. vs16: list of (R, L) bf16. Returns compacted
        bf16 arrays + per-row counts."""
        live_i = live.astype(jnp.int32)
        # per-row exclusive rank via MXU lane scan
        xb = live_i.astype(jnp.bfloat16)
        tri = (_iota2((L, L), 0) < _iota2((L, L), 1)).astype(jnp.bfloat16)
        rowpos = jnp.dot(xb, tri,
                         preferred_element_type=jnp.float32).astype(jnp.int32)
        cnts = rowpos[:, L - 1] + live_i[:, L - 1]
        # onehot[r, c, d] = live & (rowpos == d): (R, L, L) bf16
        d_iota = jax.lax.broadcasted_iota(jnp.int32, (R, L, L), 2)
        oh = ((rowpos[:, :, None] == d_iota) & live[:, :, None]).astype(
            jnp.bfloat16)
        outs = [
            jax.lax.dot_general(
                v[:, None, :], oh,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )[:, 0, :].astype(jnp.int32)
            for v in vs16
        ]
        return outs, cnts

    def split16(v):
        return (v >> 16).astype(jnp.bfloat16), (v & 0xFFFF).astype(
            jnp.float32).astype(jnp.bfloat16)

    def join16(hi, lo):
        return (hi.astype(jnp.int32) << 16) | lo.astype(jnp.int32)

    def kern_mxu():
        def kern(m_ref, w0, w1, w2, w3, *rest):
            out_refs = rest[:5]
            scratch = rest[5:10]
            sems = rest[10]
            carry = rest[11]
            b = pl.program_id(0)
            g = pl.program_id(1)
            row_off = jnp.where(g == 0, 0, carry[0])
            live = m_ref[0] != 0
            row = _iota2((R, L), 0)
            col = _iota2((R, L), 1)
            lidx = row * L + col
            halves = []
            for v in (lidx, w0[0], w1[0], w2[0], w3[0]):
                halves.extend(split16(v))
            comp, cnts = mxu_stage_a(live, halves)
            vs = [join16(comp[2 * i], comp[2 * i + 1]) for i in range(5)]
            # stage B: pack row prefixes to row-quantized offsets — the
            # dest row of source row r = number of NON-EMPTY rows before
            # r (row-quantized pack; < L gap slots per kept row remain,
            # for the shared degap afterwards). ONE shared (R, R)
            # one-hot permutation matmul per half-word array.
            nz = (cnts > 0).astype(jnp.int32)
            # exclusive prefix over R=256 0/1 entries via MXU tri-matmul
            # (cumsum has no Pallas TPU lowering; sums <= 256 are exact
            # in bf16 x bf16 -> f32)
            triR = (_iota2((R, R), 0) < _iota2((R, R), 1)).astype(
                jnp.bfloat16)
            dst = jnp.dot(
                nz.astype(jnp.bfloat16).reshape(1, R), triR,
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32).reshape(R)
            oh = ((dst[None, :] == _iota2((R, R), 0)) &
                  (nz[None, :] != 0)).astype(jnp.bfloat16)
            packed = []
            for v in vs:
                hi, lo = split16(v)
                ph = jnp.dot(oh, hi, preferred_element_type=jnp.float32)
                plo = jnp.dot(oh, lo, preferred_element_type=jnp.float32)
                packed.append(join16(ph.astype(jnp.bfloat16),
                                     plo.astype(jnp.bfloat16)))
            vs = packed
            kept_rows = jnp.sum(nz)
            safe = jnp.minimum(row_off, out_rows - R)
            cps = []
            for i in range(5):
                scratch[i][...] = vs[i]
                c = pltpu.make_async_copy(
                    scratch[i], out_refs[i].at[b, pl.ds(safe, R), :],
                    sems.at[i])
                c.start()
                cps.append(c)
            for c in cps:
                c.wait()
            carry[0] = safe + kept_rows

        return kern

    def run(name, kern):
        tile = pl.BlockSpec((1, R, L), lambda b, g: (b, g, 0))
        f = pl.pallas_call(
            kern,
            grid=(B, G),
            in_specs=[tile] * 5,
            out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5,
            out_shape=[jax.ShapeDtypeStruct((B, out_rows, L), jnp.int32)
                       for _ in range(5)],
            scratch_shapes=[pltpu.VMEM((R, L), jnp.int32)
                            for _ in range(5)]
            + [pltpu.SemaphoreType.DMA((5,)), pltpu.SMEM((1,), jnp.int32)],
            interpret=interp,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )
        jf = jax.jit(lambda m, a, b_, c, d: f(m, a, b_, c, d))
        ins = [jnp.asarray(mask.reshape(B, G * R, L))] + [
            jnp.asarray(v.reshape(B, G * R, L)) for v in vals
        ]
        t0 = time.perf_counter()
        out = jf(*ins)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        import tempfile

        td = tempfile.mkdtemp(prefix=f"mxu_{name}_")
        with jax.profiler.trace(td):
            for _ in range(args.reps):
                out = jf(*ins)
            jax.block_until_ready(out)
        times = _trace_times(td)
        dev_ms = sum(times.values()) / args.reps / 1e3
        line = (f"{name:<12} device {dev_ms:8.3f} ms/dispatch "
                f"({B} MB)  compile {compile_s:6.1f} s")
        print(line, flush=True)
        return line, dev_ms

    lines = [f"probe_mxu_compact B={B} G={G} density={args.density} "
             f"backend={jax.default_backend()} interpret={interp}"]
    for name, kern in [
        ("butterfly", kern_butterfly),
        ("mxu-row", kern_mxu()),
    ]:
        try:
            line, _ = run(name, kern)
        except Exception as e:  # noqa: BLE001 - log the failure, keep going
            line = f"{name:<12} FAILED: {str(e)[:220]}"
            print(line, flush=True)
        lines.append(line)

    log = REPO / "results" / "probe_mxu_compact.log"
    log.write_text("\n".join(lines) + "\n")
    print(f"wrote {log}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
