"""Environment compatibility shims.

``ray.data``'s path resolution probes ``fsspec.implementations.http`` on
every read/write.  In this container fsspec is present but aiohttp is not,
so that module import fails; under concurrent Dataset executions the
partially-initialized module makes the probe raise ImportError (which Ray
does not catch) instead of ModuleNotFoundError (which it does).  Seed a
minimal stub so the probe always succeeds deterministically — the stub
class is only ever used in isinstance checks, never instantiated (there is
no HTTP filesystem access in this sandbox).
"""

from __future__ import annotations

import sys
import types


def tune_malloc() -> None:
    """Keep large numpy temporaries on the heap instead of per-allocation
    mmaps.

    glibc malloc serves any allocation over ~128 KiB with a fresh mmap and
    munmaps it on free, so every (R, n) float64 temporary in the batched
    kernels pays the kernel's serialized page-fault/zeroing path — the
    measured ~2.2 GB/s AGGREGATE ceiling (tools/membw.py) that flattens
    8->32 worker scaling.  Raising M_MMAP_THRESHOLD (and M_TRIM_THRESHOLD,
    so freed blocks are not returned via brk trim either) lets freed
    blocks be reused warm: the batched SuperSmoother paths measure ~30%
    faster single-threaded, and every worker stops competing for the
    fault path.  Cost: per-process RSS holds its high-water mark (batch
    temporaries are tens of MB per worker — bounded).  No-op on non-glibc
    platforms."""
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD
        libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD
    except Exception:
        pass


def patch_fsspec_http() -> None:
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401

        return
    except Exception:
        pass
    mod = sys.modules.get("fsspec.implementations.http")
    if mod is None or not isinstance(mod, types.ModuleType):
        mod = types.ModuleType("fsspec.implementations.http")
        sys.modules["fsspec.implementations.http"] = mod
    if not hasattr(mod, "HTTPFileSystem"):
        mod.HTTPFileSystem = type("HTTPFileSystem", (), {})


tune_malloc()
patch_fsspec_http()
