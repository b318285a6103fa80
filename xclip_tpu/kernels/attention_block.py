"""Whole-head fused attention for short sequences (Pallas TPU).

The flagship CLIP shapes (text seq 257, vision 33, dim_head 64) are far
below the regime where k-blocked flash attention pays off — an entire head's
score matrix fits in VMEM many times over. What actually costs time in the
XLA path (r2 device trace, batch 256) is HBM traffic around the math: the
(b, n, 3·h·d) qkv tensor is split and transposed into three (b, h, n, d)
copies, the (b, h, n, n) score and probability tensors round-trip HBM for
the softmax, and all of it is kept as backward residuals.

This kernel runs one (batch, head-group) pair per grid step, entirely in
VMEM. A head group is ``128 // dim_head`` consecutive heads, so every block
that touches HBM is 128 lanes wide (the TPU tiling granule):

  * q, k, v are read as 128-column SLICES of the fused qkv matmul output —
    no transposes, no separate q/k/v tensors in HBM;
  * per head, scores/softmax run in fp32 registers; only the output
    (written straight into (b, n, h·d) layout) and the per-row LSE touch
    HBM;
  * the backward recomputes probabilities per head and emits dqkv in the
    fused layout in a single kernel (no cross-program accumulation — a
    whole head is local to one grid step).

Semantics match `nn.layers.attention_apply`'s XLA path: key-padding mask
and causal mask applied before an fp32 softmax, scale applied to the scores
(the XLA path pre-scales q; identical up to fp32 rounding), output in qkv
dtype. Sequence is padded to a multiple of 128; padded rows/columns are
masked and their gradients vanish.

`supported(heads, dim_head)` tells callers whether the head-group tiling is
legal; `nn.layers.attention_apply` falls back to the XLA path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ._common import NEG_INF as _NEG_INF, round_up as _round_up


def heads_per_group(dim_head: int) -> int:
    return max(1, 128 // dim_head)


def supported(heads: int, dim_head: int) -> bool:
    """Head-group width must be a multiple of 128 lanes."""
    hpg = heads_per_group(dim_head)
    return (hpg * dim_head) % 128 == 0 and heads % hpg == 0


def _per_head_scores(q, k, mask_row, scale, causal):
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    valid = jnp.broadcast_to(mask_row > 0, s.shape)
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        valid = valid & (cols <= rows)
    return jnp.where(valid, s, _NEG_INF)


def _dead_rows(mask_row, causal, n_q_rows, n_pad, n_real):
    """(n_q_rows, 1) bool: rows with NO valid key, plus their XLA-parity
    UNIFORM probability row (1, n_pad) — computed from the mask once per
    program (head-independent). XLA softmaxes a constant -finfo.max row
    into uniform weights over the real columns, and its `where` mask
    passes zero gradient to the scores."""
    mvalid = (mask_row > 0).astype(jnp.int32)               # (1, n_pad)
    if causal:
        dead = (jnp.cumsum(mvalid, axis=-1) == 0)[:, :n_q_rows].reshape(-1, 1)
    else:
        dead = jnp.broadcast_to(jnp.max(mvalid) == 0, (n_q_rows, 1))
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
    uniform = (cols < n_real).astype(jnp.float32)
    return dead, uniform


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref,
                *, scale, causal, dim_head, hpg, n_rows, n_real,
                maybe_dead):
    # only the first n_rows (real sequence, sublane-aligned) of the padded
    # q block are computed — the tail rows are zero-filled, skipping ~1/3 of
    # the score/softmax work at the flagship 257→384 padding
    outs, lses = [], []
    if maybe_dead:
        dead, uniform = _dead_rows(mask_ref[0], causal, n_rows,
                                   q_ref.shape[1], n_real)
    for i in range(hpg):
        sl = slice(i * dim_head, (i + 1) * dim_head)
        q = q_ref[0][:n_rows, sl]
        k, v = k_ref[0][:, sl], v_ref[0][:, sl]
        s = _per_head_scores(q, k, mask_ref[0], scale, causal)
        m_safe = jnp.max(s, axis=-1, keepdims=True)
        if maybe_dead:
            m_safe = jnp.where(dead, 0.0, m_safe)
            p = jnp.where(dead, uniform, jnp.exp(s - m_safe))
        else:
            p = jnp.exp(s - m_safe)
        l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
        outs.append(jax.lax.dot_general(
            (p / l).astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        lses.append(m_safe + jnp.log(l))
    n_pad = q_ref.shape[1]
    o_ref[0, :n_rows] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)
    lse_ref[0, 0, :n_rows] = jnp.concatenate(lses, axis=-1)
    if n_rows < n_pad:
        o_ref[0, n_rows:] = jnp.zeros_like(o_ref[0, n_rows:])
        lse_ref[0, 0, n_rows:] = jnp.zeros_like(lse_ref[0, 0, n_rows:])


def _bwd_kernel(q_ref, k_ref, v_ref, mask_ref, lse_ref, o_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale, causal, dim_head, hpg,
                n_rows, n_real, maybe_dead):
    n_pad = q_ref.shape[1]
    dqs, dks, dvs = [], [], []
    if maybe_dead:
        dead, uniform = _dead_rows(mask_ref[0], causal, n_rows, n_pad,
                                   n_real)
    for i in range(hpg):
        sl = slice(i * dim_head, (i + 1) * dim_head)
        q = q_ref[0][:n_rows, sl]
        k, v = k_ref[0][:, sl], v_ref[0][:, sl]
        do = do_ref[0][:n_rows, sl]
        do32 = do.astype(jnp.float32)
        out = o_ref[0][:n_rows, sl].astype(jnp.float32)
        lse = lse_ref[0, 0][:n_rows, i:i + 1]

        s = _per_head_scores(q, k, mask_ref[0], scale, causal)
        p = jnp.exp(s - lse)
        if maybe_dead:
            # dead rows: exp(-inf - lse) = 0, but the fwd used uniform/n
            p = jnp.where(dead, uniform / n_real, p)

        delta = jnp.sum(do32 * out, axis=-1, keepdims=True)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale
        if maybe_dead:
            # XLA-parity: masked `where` passes no gradient to a dead row's
            # scores — dq/dk are zero there (dv still flows through p)
            ds = jnp.where(dead, 0.0, ds)
        ds = ds.astype(q.dtype)

        dqs.append(jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32))
        dks.append(jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32))
        dvs.append(jax.lax.dot_general(p.astype(do.dtype), do,
                                       (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32))
    dq_ref[0, :n_rows] = jnp.concatenate(dqs, axis=-1).astype(dq_ref.dtype)
    dk_ref[0] = jnp.concatenate(dks, axis=-1).astype(dk_ref.dtype)
    dv_ref[0] = jnp.concatenate(dvs, axis=-1).astype(dv_ref.dtype)
    if n_rows < n_pad:
        dq_ref[0, n_rows:] = jnp.zeros_like(dq_ref[0, n_rows:])


def _group_specs(n_groups, n_pad, gw):
    """q/k/v as gw(=hpg·dim_head)-column slices of the (b, n_pad, 3·h·d)
    qkv tensor; grid (batch, head-group)."""
    return [
        pl.BlockSpec((1, n_pad, gw), lambda b, g: (b, 0, g)),
        pl.BlockSpec((1, n_pad, gw), lambda b, g, G=n_groups: (b, 0, G + g)),
        pl.BlockSpec((1, n_pad, gw), lambda b, g, G=n_groups: (b, 0, 2 * G + g)),
        pl.BlockSpec((1, 1, n_pad), lambda b, g: (b, 0, 0)),
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def attention_core(qkv, mask, heads, dim_head, scale, causal=False,
                   interpret=None, maybe_dead=True):
    """qkv: (b, n, 3·heads·dim_head) fused projection output (q | k | v);
    mask: (b, n) key validity; returns (b, n, heads·dim_head) attention
    output in residual-stream layout. Differentiable w.r.t. qkv."""
    out, _ = _attention_fwd(qkv, mask, heads, dim_head, scale, causal,
                            interpret, maybe_dead)
    return out


def _prep(qkv, mask, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, _ = qkv.shape
    n_pad = _round_up(n, 128)
    qkv_p = jnp.pad(qkv, ((0, 0), (0, n_pad - n), (0, 0)))
    key_valid = jnp.pad(mask, ((0, 0), (0, n_pad - n)))
    key_valid = key_valid.reshape(b, 1, n_pad).astype(jnp.int32)
    return qkv_p, key_valid, n, n_pad, interpret


def _attention_fwd(qkv, mask, heads, dim_head, scale, causal, interpret,
                   maybe_dead):
    assert supported(heads, dim_head), (heads, dim_head)
    qkv_p, key_valid, n, n_pad, interp = _prep(qkv, mask, interpret)
    b = qkv.shape[0]
    hpg = heads_per_group(dim_head)
    n_groups, gw = heads // hpg, hpg * dim_head

    n_rows = min(_round_up(n, 16), n_pad)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, causal=causal,
                          dim_head=dim_head, hpg=hpg, n_rows=n_rows,
                          n_real=n, maybe_dead=maybe_dead),
        grid=(b, n_groups),
        in_specs=_group_specs(n_groups, n_pad, gw),
        out_specs=[
            pl.BlockSpec((1, n_pad, gw), lambda b, g: (b, 0, g)),
            pl.BlockSpec((1, 1, n_pad, hpg), lambda b, g: (g, b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, heads * dim_head), qkv.dtype),
            jax.ShapeDtypeStruct((n_groups, b, n_pad, hpg), jnp.float32),
        ],
        interpret=interp,
    )(qkv_p, qkv_p, qkv_p, key_valid)
    return out[:, :n], (qkv_p, key_valid, out, lse)


def _attention_bwd(heads, dim_head, scale, causal, interpret, maybe_dead,
                   res, dout):
    qkv_p, key_valid, out, lse = res
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n_pad, _ = qkv_p.shape
    n = dout.shape[1]
    hpg = heads_per_group(dim_head)
    n_groups, gw = heads // hpg, hpg * dim_head
    do_p = jnp.pad(dout.astype(qkv_p.dtype), ((0, 0), (0, n_pad - n), (0, 0)))

    n_rows = min(_round_up(n, 16), n_pad)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, causal=causal,
                          dim_head=dim_head, hpg=hpg, n_rows=n_rows,
                          n_real=n, maybe_dead=maybe_dead),
        grid=(b, n_groups),
        in_specs=_group_specs(n_groups, n_pad, gw) + [
            pl.BlockSpec((1, 1, n_pad, hpg), lambda b, g: (g, b, 0, 0)),
            pl.BlockSpec((1, n_pad, gw), lambda b, g: (b, 0, g)),
            pl.BlockSpec((1, n_pad, gw), lambda b, g: (b, 0, g)),
        ],
        out_specs=[
            pl.BlockSpec((1, n_pad, gw), lambda b, g: (b, 0, g)),
            pl.BlockSpec((1, n_pad, gw), lambda b, g: (b, 0, g)),
            pl.BlockSpec((1, n_pad, gw), lambda b, g: (b, 0, g)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, heads * dim_head), qkv_p.dtype),
            jax.ShapeDtypeStruct((b, n_pad, heads * dim_head), qkv_p.dtype),
            jax.ShapeDtypeStruct((b, n_pad, heads * dim_head), qkv_p.dtype),
        ],
        interpret=interpret,
    )(qkv_p, qkv_p, qkv_p, key_valid, lse, out, do_p)

    dqkv = jnp.concatenate([dq, dk, dv], axis=-1)[:, :n]
    dmask = np.zeros((qkv_p.shape[0], n), dtype=jax.dtypes.float0)
    return dqkv, dmask


attention_core.defvjp(
    lambda qkv, mask, heads, dim_head, scale, causal, interpret, maybe_dead:
        _attention_fwd(qkv, mask, heads, dim_head, scale, causal, interpret,
                       maybe_dead),
    _attention_bwd)
