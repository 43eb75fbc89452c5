"""Phase timers (reference: ark_std start_timer/end_timer around records
allocation, assignment, and bench phases; enabled by the `profile` feature,
Cargo.toml:24). Here: HALO2ECC_TPU_PROFILE=1 enables stderr timing lines."""

from __future__ import annotations

import os
import sys
import time
from contextlib import contextmanager

_ENABLED = bool(os.environ.get("HALO2ECC_TPU_PROFILE"))


def profiling_enabled() -> bool:
    return _ENABLED


@contextmanager
def timer(label: str):
    if not _ENABLED:
        yield
        return
    t0 = time.perf_counter()
    print(f"[halo2ecc-tpu] start: {label}", file=sys.stderr)
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        print(f"[halo2ecc-tpu] end:   {label} ({dt*1000:.1f} ms)", file=sys.stderr)


class Timer:
    """Accumulating named timer for hot loops."""

    def __init__(self):
        self.totals = {}

    @contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - t0

    def report(self, file=sys.stderr):
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            print(f"[halo2ecc-tpu] {name}: {total*1000:.1f} ms", file=file)
