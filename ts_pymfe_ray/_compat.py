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


patch_fsspec_http()
