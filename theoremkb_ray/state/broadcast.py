"""Per-worker-process broadcast cache.

``ray.put`` once on the driver; stateless map TASKS fetch the object
once per worker process via this module-level cache (Ray reuses worker
processes across tasks, so the fetch amortizes exactly like an actor
``__init__`` — without paying actor-pool startup or pinning a pool
size). Use for small lookup sides (links dict, canonical map).
"""

from __future__ import annotations

from typing import Any

import ray

_CACHE: dict[str, Any] = {}


def get_broadcast(ref: "ray.ObjectRef") -> Any:
    key = ref.hex()
    if key not in _CACHE:
        if len(_CACHE) >= 8:  # bound per-process footprint
            _CACHE.pop(next(iter(_CACHE)))
        _CACHE[key] = ray.get(ref)
    return _CACHE[key]
