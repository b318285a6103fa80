"""Failure detection + checkpoint-and-restart recovery.

The reference has no process management at all (SURVEY §5: world size is
latched once at `CLIP.__init__`, x_clip.py:591, and a dead rank kills the
job). On TPU slices the idiomatic recovery model is NOT in-process elastic
resize — a jitted SPMD program's mesh is fixed at compile time and a lost
chip invalidates the backend — but **checkpoint-and-restart**: detect the
failure, relaunch the training process, restore the latest step. This
module provides the three pieces users otherwise hand-roll:

  * `CheckpointManager` — step-numbered save/restore-latest over the
    Orbax primitives in `checkpoint.py`, with retention.
  * `run_with_recovery(make_step_fn)` — in-process supervisor for
    transient failures (preemption notices, tunnel drops surfacing as
    `JaxRuntimeError`): reloads the latest checkpoint and replays.
  * `supervise(argv)` — process-level supervisor: relaunches a training
    command on nonzero exit with backoff, the pattern that covers real
    chip loss (the fresh process re-initializes the backend; the training
    script resumes via `CheckpointManager.restore_latest`).

`examples/train.py` + `tests/test_resilience.py` exercise the full loop:
a training process killed mid-run resumes from its last saved step and
finishes with the same final state as an uninterrupted run.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
import sys
import time
from typing import Any, Callable, List, Optional, Sequence

from .checkpoint import restore_checkpoint, save_checkpoint


class CheckpointManager:
    """Step-numbered checkpoints under one directory: `<dir>/step_<N>`.

    Keeps the newest `keep` checkpoints (Orbax dirs are atomic — a kill
    mid-save leaves a tmp dir that is ignored and cleaned on the next
    save, so restore_latest always sees a complete checkpoint).
    """

    def __init__(self, directory: str, *, keep: int = 3):
        if keep < 1:
            # keep=0 would mean "delete everything just saved"; the slice
            # [:-0] == [:0] would instead silently keep everything
            raise ValueError(f"keep must be >= 1, got {keep}")
        self.directory = os.path.abspath(directory)
        self.keep = keep
        os.makedirs(self.directory, exist_ok=True)

    def _step_dirs(self) -> List[tuple]:
        out = []
        for name in os.listdir(self.directory):
            m = re.fullmatch(r"step_(\d+)", name)
            path = os.path.join(self.directory, name)
            # Orbax marks finished checkpoints; unfinished ones keep a
            # tmp suffix or lack the commit marker file
            if m and os.path.isdir(path) and not name.endswith(".tmp"):
                out.append((int(m.group(1)), path))
        return sorted(out)

    def latest_step(self) -> Optional[int]:
        dirs = self._step_dirs()
        return dirs[-1][0] if dirs else None

    def save(self, step: int, state, *, loader_state: Optional[dict] = None) -> str:
        """`loader_state`: the `'loader_state'` dict from the last-consumed
        `TextImageLoader` batch — persisted as a JSON sidecar so a restart
        resumes the data order where it left off (`loader_state()` reads it
        back; pass it to the loader's `resume_from`)."""
        path = os.path.join(self.directory, f"step_{step}")
        save_checkpoint(path, state)
        if loader_state is not None:
            tmp = path + ".loader.json.tmp"
            with open(tmp, "w") as f:
                json.dump(loader_state, f)
            os.replace(tmp, path + ".loader.json")  # atomic like the ckpt
        for _, old in self._step_dirs()[: -self.keep]:
            shutil.rmtree(old, ignore_errors=True)
            try:
                os.remove(old + ".loader.json")
            except OSError:
                pass
        # clean interrupted-save debris (a kill mid-save leaves an Orbax
        # tmp dir that _step_dirs already ignores but would otherwise
        # accumulate forever) — skip anything belonging to the step just
        # written, which may still be finalizing
        for name in os.listdir(self.directory):
            if re.fullmatch(r"step_\d+(\.loader\.json)?", name):
                continue
            if "tmp" in name and name.startswith("step_") \
                    and not name.startswith(f"step_{step}."):
                p = os.path.join(self.directory, name)
                if os.path.isdir(p):
                    shutil.rmtree(p, ignore_errors=True)
                else:
                    try:
                        os.remove(p)
                    except OSError:
                        pass
        return path

    def restore_latest(self, target) -> tuple:
        """Returns (state, step) — (target, None) when no checkpoint yet."""
        dirs = self._step_dirs()
        if not dirs:
            return target, None
        step, path = dirs[-1]
        return restore_checkpoint(path, target), step

    def loader_state(self, step: Optional[int] = None) -> Optional[dict]:
        """The data-order state saved alongside `step` (latest when None) —
        None when the checkpoint carried none."""
        if step is None:
            step = self.latest_step()
        if step is None:
            return None
        sidecar = os.path.join(self.directory, f"step_{step}.loader.json")
        if not os.path.exists(sidecar):
            return None
        with open(sidecar) as f:
            return json.load(f)


def _default_is_transient(e: Exception) -> bool:
    """Failures worth an in-process retry: device/runtime errors (remote
    tunnel drops, preemption surfacing as INTERNAL/UNAVAILABLE), not
    Python bugs."""
    try:
        from jax.errors import JaxRuntimeError
    except ImportError:  # pragma: no cover - older jax spelling
        from jax._src.lib import xla_client
        JaxRuntimeError = xla_client.XlaRuntimeError
    return isinstance(e, JaxRuntimeError)


def run_with_recovery(train_chunk: Callable[[Any, int, int], Any],
                      manager: CheckpointManager, init_state,
                      *, total_steps: int, checkpoint_every: int,
                      max_restarts: int = 3,
                      is_transient: Callable[[Exception], bool] = None):
    """Drive `train_chunk(state, start_step, end_step) -> state` in
    checkpointed chunks; on a transient device failure, restore the latest
    checkpoint and replay from there (at most `max_restarts` times).

    The chunk bounds are explicit so the final (possibly short) chunk runs
    exactly `end_step - start_step` steps and the saved step number always
    matches the steps actually taken. `train_chunk` must be deterministic
    given its arguments for exact replay semantics — derive rng from the
    step counter.
    """
    is_transient = is_transient or _default_is_transient
    state, step = manager.restore_latest(init_state)
    step = 0 if step is None else step
    restarts = 0
    while step < total_steps:
        chunk_end = min(step + checkpoint_every, total_steps)
        try:
            state = train_chunk(state, step, chunk_end)
        except Exception as e:
            if restarts >= max_restarts or not is_transient(e):
                raise
            restarts += 1
            state, ck = manager.restore_latest(init_state)
            step = 0 if ck is None else ck
            continue
        step = chunk_end
        manager.save(step, state)
    return state


def supervise(argv: Sequence[str], *, max_restarts: int = 3,
              backoff_seconds: float = 1.0) -> int:
    """Process-level supervisor: run `argv`, relaunch on nonzero exit with
    exponential backoff. The child re-initializes the TPU backend from
    scratch — this is the recovery path for real chip loss, where the
    in-process handle is unrecoverable. Returns the final exit code."""
    attempt = 0
    while True:
        code = subprocess.call(list(argv))
        if code == 0 or attempt >= max_restarts:
            return code
        attempt += 1
        delay = backoff_seconds * (2 ** (attempt - 1))
        print(f"[resilience] training exited {code}; restart {attempt}/"
              f"{max_restarts} in {delay:.1f}s", file=sys.stderr)
        time.sleep(delay)
