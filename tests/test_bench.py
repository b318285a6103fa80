"""Unit tests for bench.py's config-ladder fallback logic.

bench.py produces the round's headline throughput artifact on a remote
device whose failure modes (OOM, transient remote-compile 500s) must map
to predictable ladder behavior — fall down on capacity errors, retry once
on compiler flakes, re-raise real bugs, and record every skipped rung.
The measurement itself needs a chip; the logic does not.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import bench


def _ok_run(pairs=1234.5, loss=1.4):
    def run_fn(batch_size, **cfg):
        return pairs, loss
    return run_fn


def test_first_rung_success():
    result = bench.run_ladder(256, run_fn=_ok_run())
    assert result["value"] == 1234.5
    assert result["batch_size"] == 256
    assert result["unit"] == "pairs/s"
    assert result["vs_baseline"] == round(1234.5 / 3000.0, 3)
    assert "skipped_configs" not in result


def test_oom_falls_to_next_rung_without_retry():
    calls = []

    def run_fn(batch_size, **cfg):
        calls.append(cfg)
        if cfg.get("ff_impl") == "block_stored":  # rung 1 only
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")
        return 999.0, 1.4

    result = bench.run_ladder(256, run_fn=run_fn)
    assert result["value"] == 999.0
    # rung 1 tried exactly once (OOM is deterministic — no retry)
    assert sum(c.get("ff_impl") == "block_stored" for c in calls) == 1
    (skip,) = result["skipped_configs"]
    assert skip["reason"] == "oom"
    assert skip["batch_size"] == 256


def test_remote_compile_retried_once_then_skipped():
    attempts = []

    def run_fn(batch_size, **cfg):
        if cfg.get("ff_impl") == "block_stored":
            attempts.append(1)
            raise RuntimeError("remote_compile: HTTP 500")
        return 500.0, 1.4

    result = bench.run_ladder(256, run_fn=run_fn)
    assert result["value"] == 500.0
    assert len(attempts) == 2  # one retry before falling down
    (skip,) = result["skipped_configs"]
    assert skip["reason"] == "remote_compile"


def test_real_bugs_reraise():
    def run_fn(batch_size, **cfg):
        raise ValueError("shape mismatch: this is a genuine bug")

    with pytest.raises(ValueError, match="genuine bug"):
        bench.run_ladder(256, run_fn=run_fn)


def test_oom_everywhere_halves_batch():
    batches = set()

    def run_fn(batch_size, **cfg):
        batches.add(batch_size)
        if batch_size > 64:
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")
        return 100.0, 1.4

    result = bench.run_ladder(256, run_fn=run_fn)
    assert result["batch_size"] == 64
    assert batches == {256, 128, 64}


def test_nothing_works_raises_with_skip_record():
    def run_fn(batch_size, **cfg):
        raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")

    with pytest.raises(RuntimeError, match="could not find a working"):
        bench.run_ladder(32, run_fn=run_fn)
