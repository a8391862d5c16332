"""Multi-chip scaling benchmark: sharded merge throughput vs mesh size.

On real pod hardware this produces the bytes/s/chip scaling-efficiency
numbers the north star asks for (>= 80% linear 1 chip -> N). On this dev
box it runs against virtual CPU devices (functional validation only — the
virtual devices share physical cores, so efficiency is not meaningful).

    python tests/scaling_test.py [--devices 1,2,4,8] [--rows 8192] [--mb 8]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--rows", type=int, default=1 << 13)
    ap.add_argument("--width", type=int, default=16)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--real", action="store_true",
                    help="use the real accelerator backend (pod slice or "
                         "single chip) instead of the default 8-device "
                         "virtual CPU mesh")
    ap.add_argument("--output", default=None)
    args = ap.parse_args()

    import os

    if args.real:
        # keep the real accelerator: tests.conftest (imported below for
        # make_tiny_vocab) pins jax to CPU unless this is set
        os.environ["TD_REAL_BACKEND"] = "1"

    import jax

    if not args.real:
        # default to virtual CPU devices unless running on a real pod slice
        import os

        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
        )
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:  # noqa: BLE001
            pass

    import numpy as np
    import jax.numpy as jnp

    from tests.conftest import make_tiny_vocab
    from tokendagger_tpu.parallel.mesh import (
        get_mesh, shard_rows, sharded_encode_step,
    )
    from tokendagger_tpu.tables import build_tables

    ranks, specials = make_tiny_vocab()
    tables = build_tables(ranks, specials)

    words = [b"hello world and", b"the quick brown", b"tokenization at",
             b"scale on a pod"]
    R, C = args.rows, args.width
    buf = np.zeros((R, C), dtype=np.uint8)
    lens = np.zeros(R, dtype=np.int32)
    for r in range(R):
        w = words[r % len(words)][:C]
        buf[r, : len(w)] = np.frombuffer(w, dtype=np.uint8)
        lens[r] = len(w)
    total_bytes = int(lens.sum())

    results = []
    for nd in [int(x) for x in args.devices.split(",")]:
        if nd > len(jax.devices()):
            print(f"skip {nd} devices (only {len(jax.devices())})")
            continue
        mesh = get_mesh(nd)
        step = sharded_encode_step(mesh)
        bb, ln = shard_rows(mesh, jnp.asarray(buf), jnp.asarray(lens))
        br = jnp.asarray(tables.byte_rank)
        pr = jnp.asarray(tables.pair.rows)
        out = step(bb, ln, br, pr, mask=tables.pair.mask)
        out[0].block_until_ready()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = step(bb, ln, br, pr, mask=tables.pair.mask)
        out[0].block_until_ready()
        dt = (time.perf_counter() - t0) / args.iters
        mbps = total_bytes / 1e6 / dt
        results.append({
            "devices": nd,
            "mb_per_s": round(mbps, 2),
            "mb_per_s_per_chip": round(mbps / nd, 2),
        })
        print(f"devices={nd}: {mbps:8.2f} MB/s  ({mbps/nd:6.2f} /chip)")

    if results:
        base = results[0]["mb_per_s"]
        for r in results:
            r["efficiency_vs_1chip"] = round(
                r["mb_per_s"] / base / r["devices"], 3
            )
    out_doc = {
        "workload": {"rows": R, "width": C, "bytes": total_bytes},
        "results": results,
        "platform": jax.default_backend(),
        "note": (
            "virtual CPU devices share physical cores: this artifact "
            "validates the sharded-step mechanics and records the "
            "protocol; efficiency_vs_1chip is only meaningful on real "
            "pod hardware (north star: >= 0.8 at every N)"
            if not args.real else
            "real-backend run; on this machine's remote single chip the "
            "wall time is dominated by the tunnel's per-dispatch latency "
            "(docs/PERF.md), so mb_per_s understates on-chip throughput "
            "- see artifacts/tpu_validation.json for trace-timed kernel "
            "numbers"
        ),
    }
    print(json.dumps(out_doc))
    if args.output:
        Path(args.output).write_text(json.dumps(out_doc, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
