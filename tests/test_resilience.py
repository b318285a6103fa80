"""Failure detection / checkpoint-and-restart recovery
(`train/resilience.py`) — the subsystem the reference lacks entirely
(SURVEY §5: a dead rank kills the job).

The headline test launches a REAL training subprocess that crashes
mid-run, supervises its relaunch, and asserts the resumed run lands on
the same final state as an uninterrupted one.
"""

import os
import subprocess
import sys
import textwrap

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from xclip_tpu.train import (CheckpointManager, TrainState,
                             run_with_recovery, supervise)


def _tiny_state(value=0.0):
    return TrainState(params={"w": jnp.full((4,), value)},
                      opt_state=optax.sgd(0.1).init({"w": jnp.zeros((4,))}),
                      step=jnp.zeros((), jnp.int32))


def test_checkpoint_manager_roundtrip_and_retention(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    assert mgr.latest_step() is None
    target = _tiny_state()
    for step in (5, 10, 15):
        mgr.save(step, _tiny_state(float(step)))
    assert mgr.latest_step() == 15
    state, step = mgr.restore_latest(target)
    assert step == 15
    np.testing.assert_array_equal(np.asarray(state.params["w"]), 15.0)
    # retention: only the newest 2 remain
    names = sorted(os.listdir(mgr.directory))
    assert names == ["step_10", "step_15"]


def test_checkpoint_manager_rejects_keep_zero(tmp_path):
    with pytest.raises(ValueError):
        CheckpointManager(str(tmp_path / "ckpt"), keep=0)


def test_checkpoint_manager_loader_state_sidecar(tmp_path):
    """Data-order state rides the checkpoint: saved as a sidecar, read
    back for the restart, deleted with its step by retention."""
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    assert mgr.loader_state() is None
    for step in (5, 10, 15):
        mgr.save(step, _tiny_state(float(step)),
                 loader_state={"epoch": step // 10, "batch_index": step})
    assert mgr.loader_state() == {"epoch": 1, "batch_index": 15}
    assert mgr.loader_state(10) == {"epoch": 1, "batch_index": 10}
    names = sorted(os.listdir(mgr.directory))
    assert names == ["step_10", "step_10.loader.json",
                     "step_15", "step_15.loader.json"]


class _PairDataset:
    """Tiny indexable dataset: pre-tokenized text encodes the example id,
    so batch contents identify exactly which examples were consumed."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return [int(i) + 1], np.full((1, 2, 2), float(i), dtype=np.float32)


def test_loader_resume_consumes_exact_remainder():
    """A loader resumed from a mid-epoch checkpoint state must consume
    EXACTLY the unseen remainder of the stream — no replayed batches, no
    skipped tail (VERDICT r3: recovery that replays data is silently
    wrong training)."""
    from xclip_tpu.data import TextImageLoader

    def make(resume_from=None):
        return TextImageLoader(
            _PairDataset(20), 4, context_length=2, shuffle_seed=7,
            num_epochs=3, resume_from=resume_from)

    full = [(np.asarray(b["text"]).copy(), b["loader_state"])
            for b in make()]
    assert len(full) == 15          # 5 batches/epoch × 3 epochs
    assert full[0][1] == {"epoch": 0, "batch_index": 1}
    assert full[6][1] == {"epoch": 1, "batch_index": 2}

    # interrupt anywhere — including mid-epoch and at an epoch boundary —
    # and the resumed stream must equal the uninterrupted tail exactly
    for cut in (2, 4, 5, 7, 14):
        seen_state = full[cut - 1][1]
        resumed = [np.asarray(b["text"]).copy()
                   for b in make(resume_from=seen_state)]
        assert len(resumed) == 15 - cut, (cut, len(resumed))
        for a, (b, _) in zip(resumed, full[cut:]):
            np.testing.assert_array_equal(a, b)


def test_loader_resume_requires_indexable():
    from xclip_tpu.data import TextImageLoader

    stream = iter([([1], np.zeros((1, 2, 2), np.float32))])
    with pytest.raises(ValueError, match="resume_from requires"):
        TextImageLoader(stream, 1, context_length=2,
                        resume_from={"epoch": 0, "batch_index": 1})


def test_run_with_recovery_replays_transient_failures(tmp_path):
    """A chunk that dies with a device-style error twice must be replayed
    from the last checkpoint and produce the exact uninterrupted result."""
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=3)
    failures = {"left": 2}

    def chunk(state, start_step, end_step):
        # deterministic: +1 per step over the explicit bounds
        for s in range(start_step, end_step):
            state = TrainState(
                params={"w": state.params["w"] + 1.0},
                opt_state=state.opt_state, step=state.step + 1)
            if failures["left"] and s == 12:   # mid-chunk crash, twice
                failures["left"] -= 1
                raise _fake_device_error()
        return state

    # total_steps NOT divisible by checkpoint_every: the short final chunk
    # must run exactly its bounds, so step_18 holds exactly 18 steps
    final = run_with_recovery(chunk, mgr, _tiny_state(),
                              total_steps=18, checkpoint_every=5,
                              max_restarts=3)
    np.testing.assert_array_equal(np.asarray(final.params["w"]), 18.0)
    assert mgr.latest_step() == 18


def _fake_device_error():
    try:
        from jax.errors import JaxRuntimeError
    except ImportError:
        from jax._src.lib import xla_client
        JaxRuntimeError = xla_client.XlaRuntimeError
    try:
        return JaxRuntimeError("INTERNAL: fake device failure")
    except TypeError:  # some versions disallow direct construction
        e = JaxRuntimeError.__new__(JaxRuntimeError)
        return e


def test_run_with_recovery_reraises_real_bugs(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"))

    def chunk(state, start_step, end_step):
        raise ValueError("a Python bug, not a device failure")

    with pytest.raises(ValueError):
        run_with_recovery(chunk, mgr, _tiny_state(),
                          total_steps=5, checkpoint_every=5)


_CRASHY_TRAINER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, {repo!r})
    import numpy as np
    import jax, jax.numpy as jnp, optax
    from xclip_tpu.train import CheckpointManager, TrainState

    ckpt_dir, crash_flag = sys.argv[1], sys.argv[2]
    mgr = CheckpointManager(ckpt_dir, keep=2)
    opt = optax.sgd(0.5)
    params = {{"w": jnp.zeros((4,))}}
    init = TrainState(params=params, opt_state=opt.init(params),
                      step=jnp.zeros((), jnp.int32))
    state, step = mgr.restore_latest(init)
    step = 0 if step is None else step

    @jax.jit
    def train_step(state, s):
        # deterministic toy objective: w -> 1.0
        g = jax.grad(lambda p: ((p["w"] - 1.0) ** 2).sum())(state.params)
        u, o = opt.update(g, state.opt_state, state.params)
        return TrainState(params=optax.apply_updates(state.params, u),
                          opt_state=o, step=state.step + 1)

    TOTAL, EVERY = 12, 4
    while step < TOTAL:
        for s in range(step, step + EVERY):
            state = train_step(state, s)
            if s == 6 and os.path.exists(crash_flag):
                os.remove(crash_flag)     # crash exactly once
                print("simulated crash at step", s, flush=True)
                os._exit(17)
        step += EVERY
        mgr.save(step, state)
    print("final", float(state.params["w"][0]), int(state.step))
""")


def test_supervised_process_crash_and_resume(tmp_path, monkeypatch):
    """End-to-end: the training process is killed mid-run (exit 17),
    `supervise` relaunches it, and the resumed run reaches the same final
    state as an uninterrupted one — with the step counter continuous."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "trainer.py"
    script.write_text(_CRASHY_TRAINER.format(repo=repo))
    # the child must start life as a plain-CPU process: these are read by
    # sitecustomize at interpreter startup, so they must be in the
    # SUBPROCESS environment (in-script assignment is too late — the
    # remote-TPU plugin would grab the process and hang the test)
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "")
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.delenv("XLA_FLAGS", raising=False)

    def run_to_completion(ckpt_dir, crash: bool):
        flag = tmp_path / f"crash_{os.path.basename(ckpt_dir)}"
        if crash:
            flag.write_text("1")
        code = supervise([sys.executable, str(script), ckpt_dir, str(flag)],
                         max_restarts=2, backoff_seconds=0.05)
        assert code == 0
        out = subprocess.run(
            [sys.executable, str(script), ckpt_dir, str(flag)],
            capture_output=True, text=True)   # idempotent: already done
        return out.stdout

    clean = run_to_completion(str(tmp_path / "ck_clean"), crash=False)
    crashed = run_to_completion(str(tmp_path / "ck_crash"), crash=True)
    assert "final" in clean and "final" in crashed
    assert clean.strip().splitlines()[-1] == crashed.strip().splitlines()[-1]
