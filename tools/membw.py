"""Memory-system saturation microbenchmark (BASELINE.md scaling evidence).

Two modes, same per-worker 64 MB working set, run at several process counts:

- ``stream``: read+write passes over ALREADY-TOUCHED arrays (numpy ``out=``
  multiply — the rollup's sketch/codec access pattern once buffers are
  warm).  Measured round 4: 17.6 / 33.4 / 101.8 / 359.0 GB/s aggregate at
  1/2/8/32 workers — near-linear, the DRAM bus is NOT the ceiling.
- ``touch``: FIRST-TOUCH of freshly allocated pages (np.empty + one write
  per 4 KB page — what every new Arrow batch, codec output buffer and
  object-store copy pays).  Measured round 4: 0.36 / 1.35 / 2.19 / 2.15
  GB/s at 1/2/8/32 workers — saturates by 8 workers and stays FLAT at 32.

The 8->32 rollup efficiency plateau therefore binds on the sandbox's
serialized page-fault/zeroing path, a per-kernel resource that a real
4N-node cluster multiplies per node (each node faults pages against its
own kernel), and which warm-buffer reuse (RollupStage round 4) sidesteps.

Usage: python tools/membw.py [stream|touch|both] [workers ...]
Prints one JSON line: {mode: {workers: GB/s aggregate}}.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np

ARR_MB = 64
PASSES = 8


def _stream(q: mp.Queue) -> None:
    n = ARR_MB * 1024 * 1024 // 8
    a = np.ones(n)
    b = np.empty(n)
    np.multiply(a, 1.0000001, out=b)  # first-touch both before timing
    t0 = time.perf_counter()
    for _ in range(PASSES):
        np.multiply(a, 1.0000001, out=b)
        np.multiply(b, 0.9999999, out=a)
    dt = time.perf_counter() - t0
    # each multiply reads 8n and writes 8n bytes
    q.put(2 * PASSES * 2 * 8 * n / dt)


def _touch(q: mp.Queue) -> None:
    n = ARR_MB * 1024 * 1024 // 8
    t0 = time.perf_counter()
    for _ in range(4):
        a = np.empty(n)
        a[::512] = 1.0  # one write per 4 KB page
        del a
    q.put(4 * 8 * n / (time.perf_counter() - t0))


def measure(target, workers: int) -> float:
    q: mp.Queue = mp.Queue()
    procs = [mp.Process(target=target, args=(q,)) for _ in range(workers)]
    for p in procs:
        p.start()
    total = sum(q.get() for _ in procs)
    for p in procs:
        p.join()
    return total / 1e9


if __name__ == "__main__":
    mode = next((a for a in sys.argv[1:] if a in ("stream", "touch", "both")), "both")
    counts = [int(x) for x in sys.argv[1:] if x.isdigit()] or [1, 2, 8, 32]
    targets = {"stream": _stream, "touch": _touch}
    modes = ("stream", "touch") if mode == "both" else (mode,)
    print(json.dumps(
        {m: {str(w): round(measure(targets[m], w), 2) for w in counts} for m in modes}))
