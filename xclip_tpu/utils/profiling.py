"""Tracing / profiling hooks (SURVEY §5: absent in the reference — its
forward returns a bare scalar with no instrumentation anywhere; these are the
TPU-native observability tools users otherwise bolt on).

  * `trace(logdir)` — context manager around `jax.profiler` producing a
    TensorBoard/XProf trace of everything dispatched inside.
  * `annotate(name)` — `jax.named_scope` wrapper used throughout the towers
    so HLO ops group by layer in profiles.
  * `step_timer(fn)` — wraps a jitted train step; returns (result, seconds)
    with a hard device sync, for quick throughput checks without a full
    profile.

All hooks are zero-cost when unused: named scopes only affect HLO metadata,
and nothing here is imported on the hot path unless asked for.
"""

from __future__ import annotations

import contextlib
import time

import jax


def annotate(name: str):
    """Alias of `jax.named_scope` — groups ops under `name` in profiles."""
    return jax.named_scope(name)


@contextlib.contextmanager
def trace(logdir: str, *, create_perfetto_link: bool = False):
    """Capture a device trace for everything dispatched inside the block.

        with trace("/tmp/xclip-trace"):
            state, metrics = step(state, text, image, rng)
            jax.block_until_ready(metrics["loss"])

    View with TensorBoard's profile plugin or xprof."""
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def step_timer(fn):
    """Wrap a step function to return (result, elapsed_seconds) with a full
    device sync — NOT for tight-loop throughput on remote backends (sync per
    call); see bench.py for the chained methodology."""
    def timed(*args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        return out, time.perf_counter() - t0
    return timed
