"""Env-gated wall-clock marks (TKB_PROF=1) — zero cost when unset.

Used to attribute flagship wall time to pipeline phases without a
profiler run; the driver's bench logs pick the lines up from stderr.
"""

from __future__ import annotations

import os
import sys
import time

_T0 = time.perf_counter()


def mark(msg: str) -> None:
    if os.environ.get("TKB_PROF"):
        print(
            f"[prof +{time.perf_counter() - _T0:.1f}s "
            f"@{time.time() % 100000:.1f}] {msg}",
            file=sys.stderr,
            flush=True,
        )
