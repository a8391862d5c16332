"""Tracing / profiling utilities.

The reference's only profiling support is a `make profile` build for
perf/uftrace (/root/reference/Makefile:13,53-54) and ad-hoc chrono timing in
the drivers. The TPU framework upgrades this to first-class helpers:

* ``profile_trace(dir)`` — context manager around ``jax.profiler`` emitting
  a TensorBoard-loadable trace of device kernels.
* ``Timer`` — nestable wall-clock section timer with a report.
* ``RateMeter`` — bytes/tokens throughput accounting; the schema mirrors
  the reference benchmark JSON (tokenizer_type / thread_counts / throughput
  arrays) so BASELINE comparisons stay mechanical.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Iterator


@contextlib.contextmanager
def profile_trace(log_dir: str, *, host_tracer_level: int = 2) -> Iterator[None]:
    """Capture a jax.profiler device trace into ``log_dir``.

    View with TensorBoard or Perfetto. No-op (with a warning) if jax is
    unavailable."""
    try:
        import jax
    except ImportError:  # pragma: no cover
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Nestable section timer: ``with timer("scan"): ...``; ``report()``."""

    def __init__(self) -> None:
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(
                f"{name:<24} total {total * 1e3:9.1f} ms  "
                f"n={n:<6} avg {total / n * 1e6:9.1f} µs"
            )
        return "\n".join(lines)


class RateMeter:
    """Throughput accounting with reference-compatible JSON output."""

    def __init__(self, tokenizer_type: str = "llama") -> None:
        self.tokenizer_type = tokenizer_type
        self.bytes = 0
        self.tokens = 0
        self.seconds = 0.0

    def add(self, nbytes: int, ntokens: int, seconds: float) -> None:
        self.bytes += nbytes
        self.tokens += ntokens
        self.seconds += seconds

    @property
    def mb_per_s(self) -> float:
        return self.bytes / 1e6 / self.seconds if self.seconds else 0.0

    @property
    def tokens_per_s(self) -> float:
        return self.tokens / self.seconds if self.seconds else 0.0

    def to_json(self) -> str:
        return json.dumps(
            {
                "tokenizer_type": self.tokenizer_type,
                "bytes": self.bytes,
                "tokens": self.tokens,
                "seconds": round(self.seconds, 4),
                "throughput_mb_s": round(self.mb_per_s, 2),
                "tokens_per_s": round(self.tokens_per_s, 1),
            }
        )
