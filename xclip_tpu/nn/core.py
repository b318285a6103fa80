"""Functional NN core: initializers, RNG streams, dropout, layer norm.

Everything is a pure function over explicit parameter pytrees — no module
state, no hooks. Parameter initialization distributions match torch defaults
so that weight-transfer parity tests against the PyTorch reference are exact:
  * Linear:    kaiming-uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in))
               for both weight and bias (torch.nn.Linear.reset_parameters).
  * Embedding: N(0, 1).
Kernels are stored as (in_features, out_features) so the forward is `x @ w`
(the transpose of torch's layout — transfer code transposes).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


class RngStream:
    """Trace-time RNG dispenser: deterministically folds an increasing counter
    into a base key at each consumption site. Python-stateful only during
    tracing, so it is jit-safe for static program structure."""

    def __init__(self, key: Optional[jax.Array]):
        self._key = key
        self._count = 0

    def __bool__(self):
        return self._key is not None

    def next(self) -> jax.Array:
        assert self._key is not None, (
            "an rng key is required for this stochastic operation "
            "(pass rng=jax.random.PRNGKey(...) when training)"
        )
        sub = jax.random.fold_in(self._key, self._count)
        self._count += 1
        return sub


def _uniform(key, shape, bound, dtype):
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound, dtype=dtype)


def linear_init(key, d_in: int, d_out: int, use_bias: bool = False, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(d_in)
    if use_bias:
        kw, kb = jax.random.split(key)
        return {"w": _uniform(kw, (d_in, d_out), bound, dtype),
                "b": _uniform(kb, (d_out,), bound, dtype)}
    return {"w": _uniform(key, (d_in, d_out), bound, dtype)}


def linear_apply(params, x):
    y = x @ params["w"]
    if "b" in params:
        y = y + params["b"]
    return y


def embedding_init(key, num_embeddings: int, dim: int, dtype=jnp.float32):
    return {"emb": jax.random.normal(key, (num_embeddings, dim), dtype=dtype)}


def embedding_apply(params, ids):
    return jnp.take(params["emb"], ids, axis=0)


def layer_norm_init(dim: int, dtype=jnp.float32):
    """Gain-only LayerNorm (no bias) — reference x_clip.py:112-121."""
    return {"g": jnp.ones((dim,), dtype=dtype)}


def layer_norm_apply(params, x):
    """eps is dtype-dependent (1e-5 fp32, 1e-3 otherwise) for bf16 stability,
    variance is biased — reference x_clip.py:117-121. Statistics are computed
    in fp32 regardless of input dtype (a TPU-side improvement; identical for
    fp32 inputs — and strictly more accurate than the reference's all-bf16
    LN in mixed precision).

    HBM-traffic note: the fp32 upcast happens inside the reduction and the
    per-element normalize, but every tensor that crosses a fusion boundary
    stays in `x.dtype` — normalizing `xf` (the fp32 copy) instead makes XLA
    materialize fp32 activations across the whole network, doubling the
    bandwidth of this bandwidth-bound op (measured via device trace)."""
    eps = 1e-5 if x.dtype == jnp.float32 else 1e-3
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    inv = (jax.lax.rsqrt(var + eps) * params["g"].astype(jnp.float32)).astype(x.dtype)
    return (x - mean.astype(x.dtype)) * inv


def dropout(rng: Optional[jax.Array], x: jax.Array, rate: float, training: bool) -> jax.Array:
    if not training or rate == 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def batch_norm_init(dim: int, affine: bool = True, dtype=jnp.float32):
    """BatchNorm1d state (used only by the SSL projector/predictor MLPs —
    reference visual_ssl.py:113-135). Running stats live in the same tree but
    are updated out-of-band by the training step."""
    p = {"mean": jnp.zeros((dim,), dtype), "var": jnp.ones((dim,), dtype)}
    if affine:
        p["scale"] = jnp.ones((dim,), dtype)
        p["bias"] = jnp.zeros((dim,), dtype)
    return p


def batch_norm_apply(params, x, training: bool, eps: float = 1e-5):
    """Training mode normalizes with current-batch statistics (torch
    BatchNorm1d semantics, biased variance); eval mode uses running stats.
    Returns (out, (batch_mean, batch_var)) so callers can fold running-stat
    updates into their optimizer step."""
    if training:
        mean = jnp.mean(x, axis=0)
        var = jnp.var(x, axis=0)
    else:
        mean, var = params["mean"], params["var"]
    out = (x - mean) * jax.lax.rsqrt(var + eps)
    if "scale" in params:
        out = out * params["scale"] + params["bias"]
    return out, (mean, var)
