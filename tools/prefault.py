"""Pre-fault guest memory so large-corpus benchmarks measure the tokenizer, not the hypervisor.

This Firecracker microVM's host grants fresh pages to the guest lazily at
~12-15 MB/s (single faulting stream; ~90 MB/s with 4 parallel processes).
Any benchmark whose peak footprint exceeds the guest's currently-granted
pages spends most of its wall clock in host-side demand faults — the GB-scale
list-mode collapse (single-digit MB/s at 1 GB for tokendagger AND tiktoken,
while the same code runs 100-200 MB/s at 256 MB) was exactly this.

Two mechanisms, both must be handled:

1. Lazy grant: first touch of a never-granted page costs ~80 us. Fix: fault
   the full benchmark footprint once, in parallel, before timing.
2. Free-page reporting: the kernel boots with
   `page_reporting.page_reporting_order` + a nonstandard
   `free_bitmap_enable=Y`, which hand freed >=2 MB blocks back to the host —
   so a grant does NOT survive `free()` for long. Fix: write N to
   /sys/module/page_reporting/parameters/free_bitmap_enable (root, this VM
   only, reversible). Measured on this VM: with Y, a freed 2 GB buffer
   re-touches at ~30 MB/s after 30 s; with N, a freed 12 GB buffer
   re-touches at 5.3 GB/s after 45 s. CAVEAT (measured 2026-08-20): the
   `N` knob silences only the bitmap variant — classic free-page
   reporting stays active at page_reporting_order=9, so freed >=2 MB
   blocks can STILL be handed back on a timescale/host-policy that
   varies by day; on a day with a slow grant path, GB-footprint
   benchmarks degrade ~2x no matter the prefault (docs/PERF.md "Cap
   validated at 1 GB"). Prefault remains necessary, not sufficient.

Usage:  python tools/prefault.py [GB_total] [workers]
Defaults: 24 GB, 4 workers. Idempotent — re-faulting granted pages is fast.
"""

import sys
import time
import numpy as np
import concurrent.futures as cf

GB = 1 << 30

FREE_BITMAP = "/sys/module/page_reporting/parameters/free_bitmap_enable"


def disable_free_page_reporting() -> bool:
    """Best-effort: stop the guest from handing freed pages back to the host
    so the pre-faulted grant persists. Returns True if reporting is off."""
    try:
        with open(FREE_BITMAP) as f:
            if f.read().strip() == "N":
                return True
        with open(FREE_BITMAP, "w") as f:
            f.write("N")
        return True
    except OSError:
        return False


def _touch(args):
    idx, per_worker_gb = args
    # Touch one byte per 4 KiB page; the value doesn't matter.
    a = np.empty(per_worker_gb * GB, dtype=np.uint8)
    a[::4096] = 1
    return a.nbytes


def prefault(total_gb: int = 24, workers: int = 4) -> float:
    if not disable_free_page_reporting():
        print("prefault: free-page reporting still on (param not writable); "
              "grant may decay after frees", flush=True)
    per = max(1, total_gb // workers)
    t0 = time.perf_counter()
    with cf.ProcessPoolExecutor(workers) as ex:
        sizes = list(ex.map(_touch, [(i, per) for i in range(workers)]))
    dt = time.perf_counter() - t0
    touched = sum(sizes) / GB
    print(f"prefaulted {touched:.0f} GB in {dt:.1f}s "
          f"({touched * 1024 / dt:.0f} MB/s aggregate)", flush=True)
    return dt


if __name__ == "__main__":
    total = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    nw = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    prefault(total, nw)
