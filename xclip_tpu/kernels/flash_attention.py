"""Block-tiled flash attention as Pallas TPU kernels, forward AND backward.

Replaces the dense O(n²)-materializing attention of the reference
(`x_clip/x_clip.py:225-243`) on the hot path: scores never hit HBM, the
softmax runs online (running max + normalizer) in fp32, and the (bq, d)
accumulator lives in VMEM scratch across the k-block grid dimension.

Semantics match the XLA fallback in `nn/layers.py:attention_apply`:
  * q arrives pre-scaled (dim_head ** -0.5)
  * key-padding mask: invalid keys contribute exp(-inf) = 0
  * causal: col > row masked out (triu(j - i + 1) in the reference)
  * softmax in fp32, output cast back to the input dtype

Training support is a `jax.custom_vjp`: the forward additionally emits the
per-row log-sum-exp; the backward runs two Pallas kernels (the standard
FlashAttention-2 recurrences):
    Δ  = rowsum(dO ∘ O)
    P  = exp(S − LSE)         (recomputed per block, never materialized)
    dV = Pᵀ dO
    dS = P ∘ (dO Vᵀ − Δ)
    dQ = dS K        dK = dSᵀ Q

Grids: (batch·heads, n_q_blocks, n_k_blocks) forward/dq and
(batch·heads, n_k_blocks, n_q_blocks) for dk/dv — the innermost grid
dimension is sequential on TPU, so VMEM scratch accumulates across it.
Sequence lengths are padded to the block size; padded keys are masked,
padded query rows carry zero cotangents, so all pad gradients vanish.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
_NEG_INF = float(-jnp.inf)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _dot(a, b, trans_b=False):
    dims = (((1,), (1 if trans_b else 0,)), ((), ()))
    return jax.lax.dot_general(a, b, dims, preferred_element_type=jnp.float32)


def _valid_mask(mask_block, shape, qi, ki, block_q, block_k, causal):
    valid = jnp.broadcast_to(mask_block > 0, shape)
    if causal:
        rows = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        cols = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        valid = valid & (cols <= rows)
    return valid


# ---------------------------------------------------------------- forward

def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr, *, causal, block_q, block_k,
                num_k_blocks):
    qi, ki = pl.program_id(1), pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    s = _dot(q, k, trans_b=True)                      # (bq, bk) fp32
    valid = _valid_mask(mask_ref[0], s.shape, qi, ki, block_q, block_k, causal)
    s = jnp.where(valid, s, _NEG_INF)

    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    m_safe = jnp.where(m_new == _NEG_INF, 0.0, m_new)

    p = jnp.where(valid, jnp.exp(s - m_safe), 0.0)
    correction = jnp.where(m_prev == _NEG_INF, 0.0, jnp.exp(m_prev - m_safe))

    l_scr[:] = l_scr[:] * correction + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * correction + _dot(p.astype(v.dtype), v)
    m_scr[:] = m_new

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        l = jnp.maximum(l_scr[:], 1e-30)
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)
        m_fin = jnp.where(m_scr[:] == _NEG_INF, 0.0, m_scr[:])
        lse_ref[0] = m_fin + jnp.log(l)


def _flash_forward(q, k, v, mask, causal, block_q, block_k, interpret):
    bh, n, d = q.shape
    nq, nk = n // block_q, n // block_k
    kernel = functools.partial(_fwd_kernel, causal=causal, block_q=block_q,
                               block_k=block_k, num_k_blocks=nk)
    return pl.pallas_call(
        kernel,
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b, i, j: (b, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, mask)


# ---------------------------------------------------------------- backward

def _bwd_dq_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, delta_ref,
                   dq_ref, acc_scr, *, causal, block_q, block_k, num_k_blocks):
    qi, ki = pl.program_id(1), pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    s = _dot(q, k, trans_b=True)
    valid = _valid_mask(mask_ref[0], s.shape, qi, ki, block_q, block_k, causal)
    p = jnp.where(valid, jnp.exp(s - lse_ref[0]), 0.0)

    dp = _dot(do, v, trans_b=True)                    # (bq, bk)
    ds = p * (dp - delta_ref[0])
    acc_scr[:] += _dot(ds.astype(k.dtype), k)

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        dq_ref[0] = acc_scr[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dk_scr, dv_scr, *, causal, block_q,
                    block_k, num_q_blocks):
    ji, qi = pl.program_id(1), pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    s = _dot(q, k, trans_b=True)                      # (bq, bk)
    valid = _valid_mask(mask_ref[0], s.shape, qi, ji, block_q, block_k, causal)
    p = jnp.where(valid, jnp.exp(s - lse_ref[0]), 0.0)

    dv_scr[:] += _dot(p.astype(do.dtype).T, do)
    dp = _dot(do, v, trans_b=True)
    ds = p * (dp - delta_ref[0])
    dk_scr[:] += _dot(ds.astype(q.dtype).T, q)

    @pl.when(qi == num_q_blocks - 1)
    def _finalize():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_backward(q, k, v, mask, out, lse, do, causal, block_q, block_k,
                    interpret):
    bh, n, d = q.shape
    nq, nk = n // block_q, n // block_k
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1, keepdims=True)                    # (bh, n, 1)

    dq_kernel = functools.partial(_bwd_dq_kernel, causal=causal,
                                  block_q=block_q, block_k=block_k,
                                  num_k_blocks=nk)
    dq = pl.pallas_call(
        dq_kernel,
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b, i, j: (b, 0, j)),
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=interpret,
    )(q, k, v, mask, do, lse, delta)

    dkv_kernel = functools.partial(_bwd_dkv_kernel, causal=causal,
                                   block_q=block_q, block_k=block_k,
                                   num_q_blocks=nq)
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(bh, nk, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b, j, i: (b, 0, j)),
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, j, i: (b, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n, d), k.dtype),
            jax.ShapeDtypeStruct((bh, n, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, mask, do, lse, delta)

    return dq, dk, dv


# ------------------------------------------------------------- custom vjp

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_core(q, k, v, mask, causal, block_q, block_k, interpret):
    out, _ = _flash_forward(q, k, v, mask, causal, block_q, block_k, interpret)
    return out


def _flash_core_fwd(q, k, v, mask, causal, block_q, block_k, interpret):
    out, lse = _flash_forward(q, k, v, mask, causal, block_q, block_k, interpret)
    return out, (q, k, v, mask, out, lse)


def _flash_core_bwd(causal, block_q, block_k, interpret, residuals, do):
    q, k, v, mask, out, lse = residuals
    dq, dk, dv = _flash_backward(q, k, v, mask, out, lse, do, causal,
                                 block_q, block_k, interpret)
    dmask = np.zeros(mask.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, dmask


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


# ---------------------------------------------------------------- wrapper

def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    mask: Optional[jax.Array] = None,
                    causal: bool = False,
                    block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K,
                    interpret: Optional[bool] = None) -> jax.Array:
    """q, k, v: (b, h, n, d) with q pre-scaled; mask: (b, n) key validity.

    Returns (b, h, n, d); differentiable w.r.t. q, k, v. Runs interpreted
    automatically off-TPU so tests exercise identical code paths on CPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    b, h, n, d = q.shape
    n_pad = max(_round_up(n, block_q), _round_up(n, block_k))

    def pad_seq(t):
        return jnp.pad(t, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))

    qp = pad_seq(q).reshape(b * h, n_pad, d)
    kp = pad_seq(k).reshape(b * h, n_pad, d)
    vp = pad_seq(v).reshape(b * h, n_pad, d)

    key_valid = mask if mask is not None else jnp.ones((b, n), dtype=bool)
    key_valid = jnp.pad(key_valid, ((0, 0), (0, n_pad - n)))
    key_valid = jnp.repeat(key_valid[:, None, :], h, axis=1)
    # int32: Mosaic on v5e cannot vector-compare int8 operands
    key_valid = key_valid.reshape(b * h, 1, n_pad).astype(jnp.int32)

    out = _flash_core(qp, kp, vp, key_valid, causal, block_q, block_k,
                      interpret)
    return out.reshape(b, h, n_pad, d)[:, :, :n, :]
