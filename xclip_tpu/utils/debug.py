"""Numerics-debugging hooks (SURVEY §5: the reference has no sanitizers;
pure-functional JAX has no data races, so the debugging surface is NaN/Inf
detection and value inspection).

  * `debug_nans(enable=True)` — context manager flipping `jax_debug_nans`:
    any NaN produced inside a jitted computation raises with the offending
    primitive's location (re-runs un-jitted to localize).
  * `assert_finite(tree, name)` — host-side check of a pytree (params,
    grads, metrics); raises listing every non-finite leaf path.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def assert_finite(tree, name: str = "tree") -> None:
    bad = []

    def check(path, x):
        if jnp.issubdtype(x.dtype, jnp.floating) and not bool(jnp.isfinite(x).all()):
            bad.append("/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                                for k in path))
        return x

    jax.tree_util.tree_map_with_path(check, tree)
    if bad:
        raise FloatingPointError(
            f"{name} contains non-finite values at: {', '.join(bad)}")
