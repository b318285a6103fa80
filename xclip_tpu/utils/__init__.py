"""Small numeric helpers shared across the framework.

Semantics mirror the reference helpers in `x_clip/x_clip.py:21-65` (eps values,
masked-mean behavior, batched diagonal extraction) but are implemented as pure
JAX functions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def exists(val):
    return val is not None


def default(val, d):
    return val if val is not None else d


def cast_tuple(t):
    return t if isinstance(t, (tuple, list)) else (t,)


def masked_mean(t: jax.Array, mask: jax.Array, axis: int = 1, eps: float = 1e-6) -> jax.Array:
    """Mean over `axis` counting only positions where `mask` is True.

    Matches reference `masked_mean` (x_clip.py:40-44): masked positions are
    zeroed, denominator is clamped to `eps`.
    """
    t = jnp.where(mask, t, 0.0)
    numer = t.sum(axis=axis)
    denom = jnp.clip(mask.sum(axis=axis), min=eps)
    return numer / denom


def log(t: jax.Array, eps: float = 1e-20) -> jax.Array:
    """`log(t + eps)` — reference x_clip.py:51-52."""
    return jnp.log(t + eps)


def l2norm(t: jax.Array) -> jax.Array:
    """L2-normalize along the last axis (torch F.normalize semantics: the norm
    is clamped to 1e-12 to avoid division by zero)."""
    norm = jnp.linalg.norm(t, axis=-1, keepdims=True)
    return t / jnp.clip(norm, min=1e-12)


def max_neg_value(dtype) -> float:
    return -float(jnp.finfo(dtype).max)


def matrix_diag(t: jax.Array) -> jax.Array:
    """Batched diagonal of the trailing two axes — reference x_clip.py:57-65."""
    return jnp.diagonal(t, axis1=-2, axis2=-1)
from .profiling import annotate, step_timer, trace  # noqa: F401
from .debug import assert_finite, debug_nans  # noqa: F401
