"""Structured metrics / observability (SURVEY.md SS5.5).

The reference prints residuals and dumps y(t) as JSON/npy; here every
subsystem can emit structured per-step records to a JSONL stream
(solver iterations, residuals, solves/s, costs), cheap enough to leave
on in production rollouts. Timing helpers wrap block_until_ready so
device work is actually measured (SURVEY.md SS5.1).
"""
from __future__ import annotations

import json
import time
from contextlib import contextmanager
from pathlib import Path


class MetricsLogger:
    """Append-only JSONL metrics stream with a wall-clock column."""

    def __init__(self, path: str | Path | None = None):
        self.path = Path(path) if path else None
        self._t0 = time.time()
        self.records: list[dict] = []
        if self.path:
            self.path.parent.mkdir(parents=True, exist_ok=True)

    def log(self, event: str, **fields) -> dict:
        rec = {"event": event, "wall_s": round(time.time() - self._t0, 4)}
        rec.update(fields)
        self.records.append(rec)
        if self.path:
            with self.path.open("a") as f:
                f.write(json.dumps(rec, default=float) + "\n")
        return rec

    @contextmanager
    def timed(self, event: str, **fields):
        """Context manager logging the elapsed wall time of a block."""
        t0 = time.time()
        yield
        self.log(event, seconds=round(time.time() - t0, 4), **fields)


def device_timeit(fn, *args, repeats: int = 3, warmup: int = 1):
    """Best-of-N wall time of fn(*args) with block_until_ready."""
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        best = min(best, time.time() - t0)
    return best
