"""Minimal production train loop: optax optimizer, sharded global-batch train
step, loss-breakdown metrics.

The reference has no trainer at all (SURVEY §1 — it is a library); this is
the TPU-native subsystem users otherwise hand-roll. The train step is a
single jit over globally-sharded arrays: the batch shards over the 'data'
mesh axis, parameters follow `parallel.sharding` rules (replicated or
tensor-parallel), and XLA inserts every collective — the contrastive loss
over the global batch plays the role of the reference's explicit
all_gather-of-latents (distributed.py:41-56) with mathematically exact
global gradients.
"""

from __future__ import annotations

import dataclasses
import warnings
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from ..parallel.mesh import create_mesh, data_sharding
from ..parallel.sharding import (opt_state_shardings, param_shardings,
                                 shard_params)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array


def create_train_state(model, key, optimizer, dtype=jnp.float32) -> TrainState:
    params = model.init(key, dtype=dtype)
    return TrainState(params=params, opt_state=optimizer.init(params),
                      step=jnp.zeros((), dtype=jnp.int32))


def _merge_bn_stats(params, bn_updates):
    """Overwrite BatchNorm running-stat leaves with their new EMA values.
    `bn_updates` is a sparse subtree of the param tree holding only
    {..., 'bnN': {'mean': ..., 'var': ...}} nodes."""
    def merge(dst, src):
        out = dict(dst)
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                out[k] = merge(dst[k], v)
            else:
                out[k] = v.astype(dst[k].dtype)
        return out
    return merge(params, bn_updates)


def make_train_step(model, optimizer, *, donate: bool = True,
                    grad_accum: int = 1):
    """Returns `step(state, text, image, rng) -> (state, metrics)` (jitted).

    Place `state` with `shard_state` and the batch with `shard_batch` first;
    jit propagates those shardings, so the same step function runs 1-chip or
    N-chip unchanged.

    `grad_accum > 1` splits the batch into that many microbatches and
    averages their gradients before one optimizer update (lax.scan, so
    activation memory is one microbatch's worth). Note the contrastive
    negatives are then limited to each microbatch — the same trade a
    data-parallel reference setup WITHOUT the latent all_gather makes.

    Known deviation (grad_accum > 1 + visual SSL): BatchNorm running stats
    keep only the LAST microbatch's EMA, and each microbatch's EMA starts
    from the pre-step stored stats — torch would fold all N microbatches
    sequentially. Gradients are unaffected (stats carry none); only the
    stored running stats differ, and only on the grad-accum path.
    """
    if grad_accum > 1:
        # the contrastive objective is NOT invariant to this split: warn
        # loudly so "fit a bigger batch" users know what they are trading
        warnings.warn(
            f"grad_accum={grad_accum}: each microbatch sees only its OWN "
            f"1/{grad_accum} of the batch as contrastive negatives. This "
            "is a materially different (easier) InfoNCE objective than one "
            "full-batch step — if you wanted more negatives, raise the "
            "batch size or shard the loss over more chips instead. "
            "(See the make_train_step docstring.)",
            stacklevel=2)

    def grads_and_metrics(params, text, image, rng, valid=None):
        def loss_fn(p):
            loss, metrics = model.apply(
                p, text, image, return_loss=True, rng=rng,
                training=True, return_metrics=True, row_valid=valid)
            return loss, metrics
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return grads, metrics

    def train_step(state: TrainState, text, image, rng, valid=None):
        # `valid` (b,) bool: the loader's pad_remainder mask — padded rows
        # leave the contrastive loss (see clip_contrastive_loss row_valid)
        if grad_accum == 1:
            grads, metrics = grads_and_metrics(state.params, text, image,
                                               rng, valid)
        else:
            assert valid is None, (
                "pad-and-mask (valid=) is not supported with grad_accum > 1: "
                "a microbatch could end up fully padded (0/0 loss). Drop the "
                "final short batch instead.")
            assert text.shape[0] % grad_accum == 0, (
                f"batch size {text.shape[0]} must divide evenly into "
                f"grad_accum={grad_accum} microbatches (no silent drops)")
            mb = text.shape[0] // grad_accum
            texts = text[: mb * grad_accum].reshape(grad_accum, mb, *text.shape[1:])
            images = image[: mb * grad_accum].reshape(grad_accum, mb, *image.shape[1:])
            rngs = jax.random.split(rng, grad_accum)

            def micro(carry, xs):
                g_acc, m_acc, _ = carry
                t, im, r = xs
                grads, metrics = grads_and_metrics(state.params, t, im, r)
                bn = metrics.pop("bn_updates", None)
                g_acc = jax.tree.map(jnp.add, g_acc, grads)
                m_acc = jax.tree.map(jnp.add, m_acc, metrics)
                return (g_acc, m_acc, bn), None

            g0 = jax.tree.map(jnp.zeros_like, state.params)
            _, metrics_shape = jax.eval_shape(
                grads_and_metrics, state.params, texts[0], images[0], rngs[0])
            bn0 = jax.tree.map(lambda v: jnp.zeros(v.shape, v.dtype),
                               metrics_shape.pop("bn_updates", None))
            metrics0 = {k: jnp.zeros(v.shape, v.dtype)
                        for k, v in metrics_shape.items()}
            (grads, metrics, bn), _ = jax.lax.scan(
                micro, (g0, metrics0, bn0), (texts, images, rngs))
            grads = jax.tree.map(lambda g: g / grad_accum, grads)
            metrics = jax.tree.map(lambda m: m / grad_accum, metrics)
            if bn is not None:
                # BN running stats from the last microbatch (torch forwards
                # would fold sequentially; last-EMA is the jit-friendly form)
                metrics["bn_updates"] = bn
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        bn_updates = metrics.pop("bn_updates", None)
        if bn_updates is not None:
            # fold SSL-head BatchNorm running stats back into the param tree
            # (they carry zero gradient; the EMA from the forward replaces
            # whatever the optimizer left there), preserving stored dtype
            params = _merge_bn_stats(params, bn_updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def shard_state(state: TrainState, mesh) -> TrainState:
    """Place params AND optimizer state per the TP/DP sharding rules.

    Adam moments (and any other param-shaped optax sub-tree) get the same
    PartitionSpec as the parameter they track, so a TP-sharded `to_qkv.w`
    keeps its mu/nu sharded too — 3× the param bytes stay distributed
    instead of replicating (docs/SCALING.md has the v5e-16 arithmetic).
    """
    params = shard_params(state.params, mesh)
    opt_sh = opt_state_shardings(state.opt_state, state.params, mesh)
    opt_state = jax.tree.map(jax.device_put, state.opt_state, opt_sh)
    return TrainState(params=params, opt_state=opt_state, step=state.step)


def shard_batch(batch_arrays, mesh):
    """Shard each array's leading (batch) dim over the 'data' axis.

    The contrastive loss's sharded path requires EQUAL per-device batches —
    unlike the reference's variable-size all_gather (distributed.py:14-39,
    pad → gather → mask-select), SPMD positives are located by
    `row_offset = axis_index * b_local`, which is only correct when every
    shard holds exactly b_local real rows. Validate loudly here rather
    than letting a hand-built unequal batch compute a silently wrong
    global loss (the loader's equal-shard truncation guarantees this for
    pipeline users, data/pipeline.py)."""
    n_data = int(dict(mesh.shape).get("data", 1))
    out = []
    for a in batch_arrays:
        if a.shape[0] % n_data != 0:
            raise ValueError(
                f"global batch {a.shape[0]} is not divisible by the 'data' "
                f"mesh axis ({n_data}): the sharded contrastive loss "
                "requires equal per-device batches (positives are located "
                "by row offset). Pad or truncate the batch to a multiple — "
                "the TextImageLoader does this automatically.")
        out.append(jax.device_put(a, data_sharding(mesh, a.ndim)))
    return tuple(out)


def default_optimizer(learning_rate: float = 3e-4, weight_decay: float = 0.2,
                      b1: float = 0.9, b2: float = 0.98,
                      max_grad_norm: Optional[float] = 1.0,
                      warmup_steps: int = 0, total_steps: Optional[int] = None):
    """CLIP-style AdamW (decoupled weight decay, β2=0.98) with optional
    clipping and cosine schedule."""
    if warmup_steps and total_steps:
        # optax requires decay_steps > warmup_steps; short runs (e.g. smoke
        # tests with fewer total steps than the warmup) clamp the warmup.
        warmup_steps = min(warmup_steps, max(total_steps - 1, 1))
        schedule = optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, warmup_steps, total_steps)
    else:
        schedule = learning_rate
    chain = []
    if max_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(optax.adamw(schedule, b1=b1, b2=b2, weight_decay=weight_decay))
    return optax.chain(*chain)
