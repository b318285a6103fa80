"""Training observability (SURVEY §5: the reference returns a bare scalar
with no logging anywhere). `MetricsLogger` turns the train step's metrics
dict into a JSONL stream + console lines without forcing a device sync per
step: metrics are staged and drained in bulk every `flush_every` steps, so
only one host round-trip is paid per flush window.
"""

from __future__ import annotations

import json
import sys
import time
from typing import IO, Optional

import jax
import numpy as np


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, *, flush_every: int = 20,
                 print_to: Optional[IO] = sys.stderr):
        self._file = open(path, "a") if path else None
        self._flush_every = max(1, flush_every)
        self._print_to = print_to
        self._staged: list = []
        self._t0 = time.perf_counter()

    def log(self, step: int, metrics: dict, batch_size: Optional[int] = None):
        """Stage one step's metrics (device arrays are NOT fetched here)."""
        scalars = {k: v for k, v in metrics.items()
                   if not isinstance(v, dict) and np.ndim(v) == 0}
        if not self._staged and not hasattr(self, "_started"):
            self._started = True
            self._t0 = time.perf_counter()  # exclude compile/setup time
        self._staged.append((step, scalars, batch_size))
        if len(self._staged) >= self._flush_every:
            self.flush()

    def flush(self):
        if not self._staged:
            return
        staged, self._staged = self._staged, []
        jax.block_until_ready([s for _, s, _ in staged])
        now = time.perf_counter()
        elapsed, self._t0 = now - self._t0, now
        pairs = sum(b for _, _, b in staged if b)
        for step, scalars, _ in staged:
            rec = {"step": step,
                   **{k: float(v) for k, v in scalars.items()}}
            if self._file:
                self._file.write(json.dumps(rec) + "\n")
        if self._file:
            self._file.flush()
        if self._print_to is not None:
            last = staged[-1]
            line = (f"step {last[0]:6d}  "
                    + "  ".join(f"{k} {float(v):.4f}"
                                for k, v in sorted(last[1].items())
                                if k in ("loss", "cl_loss", "grad_norm")))
            if pairs and elapsed > 0:
                line += f"  [{pairs / elapsed:.0f} pairs/s]"
            print(line, file=self._print_to)

    def close(self):
        self.flush()
        if self._file:
            self._file.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
