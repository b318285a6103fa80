"""Block-tiled flash attention as a Pallas TPU kernel.

Replaces the dense O(n²)-materializing attention of the reference
(`x_clip/x_clip.py:225-243`) on the hot path: scores never hit HBM, the
softmax runs online (running max + normalizer) in fp32, and the (bq, d)
accumulator lives in VMEM scratch across the k-block grid dimension.

Semantics match the XLA fallback in `nn/layers.py:attention_apply`:
  * q arrives pre-scaled (dim_head ** -0.5)
  * key-padding mask: invalid keys contribute exp(-inf) = 0
  * causal: col > row masked out (triu(j - i + 1) in the reference)
  * softmax in fp32, output cast back to the input dtype

Grid: (batch*heads, n_q_blocks, n_k_blocks) — the k dimension is innermost
and sequential on TPU, so scratch persists across it. Sequence lengths are
padded to the block size; padded key columns are masked, padded query rows
are sliced away on return.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
_NEG_INF = float(-jnp.inf)


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref,
                  m_scr, l_scr, acc_scr, *, causal: bool, block_q: int,
                  block_k: int, num_k_blocks: int):
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]            # (block_q, d)
    k = k_ref[0]            # (block_k, d)
    v = v_ref[0]            # (block_k, d)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (block_q, block_k)

    key_valid = mask_ref[0] > 0                       # (1, block_k) int8 -> bool
    valid = jnp.broadcast_to(key_valid, s.shape)
    if causal:
        rows = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        cols = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        valid = valid & (cols <= rows)
    s = jnp.where(valid, s, _NEG_INF)

    m_prev = m_scr[:]                                 # (block_q, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    # guard fully-masked rows: keep exp well-defined
    m_safe = jnp.where(m_new == _NEG_INF, 0.0, m_new)

    p = jnp.exp(s - m_safe)                           # (block_q, block_k)
    p = jnp.where(valid, p, 0.0)
    correction = jnp.where(m_prev == _NEG_INF, 0.0, jnp.exp(m_prev - m_safe))

    l_scr[:] = l_scr[:] * correction + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_scr[:] = acc_scr[:] * correction + pv
    m_scr[:] = m_new

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        denom = jnp.maximum(l_scr[:], 1e-30)
        o_ref[0] = (acc_scr[:] / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "block_q", "block_k", "interpret"))
def _flash_attention_padded(q, k, v, mask, *, causal: bool,
                            block_q: int, block_k: int, interpret: bool):
    bh, nq, d = q.shape
    nk = k.shape[1]
    num_q_blocks = nq // block_q
    num_k_blocks = nk // block_k

    kernel = functools.partial(
        _flash_kernel, causal=causal, block_q=block_q, block_k=block_k,
        num_k_blocks=num_k_blocks)

    return pl.pallas_call(
        kernel,
        grid=(bh, num_q_blocks, num_k_blocks),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b, i, j: (b, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, nq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, mask)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    mask: Optional[jax.Array] = None,
                    causal: bool = False,
                    block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K,
                    interpret: Optional[bool] = None) -> jax.Array:
    """q, k, v: (b, h, n, d) with q pre-scaled; mask: (b, n) key validity.

    Returns (b, h, n, d). Runs interpreted automatically off-TPU so tests
    exercise identical code paths on CPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    b, h, n, d = q.shape
    # one padded length divisible by both block sizes keeps the index maps trivial
    n_pad = max(_round_up(n, block_q), _round_up(n, block_k))

    def pad_seq(t):
        return jnp.pad(t, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))

    qp, kp, vp = pad_seq(q), pad_seq(k), pad_seq(v)
    qp = qp.reshape(b * h, n_pad, d)
    kp = kp.reshape(b * h, n_pad, d)
    vp = vp.reshape(b * h, n_pad, d)

    if mask is None:
        key_valid = jnp.ones((b, n), dtype=bool)
    else:
        key_valid = mask
    key_valid = jnp.pad(key_valid, ((0, 0), (0, n_pad - n)))
    key_valid = jnp.repeat(key_valid[:, None, :], h, axis=1).reshape(b * h, 1, n_pad)
    key_valid = key_valid.astype(jnp.int8)

    out = _flash_attention_padded(qp, kp, vp, key_valid, causal=causal,
                                  block_q=block_q, block_k=block_k,
                                  interpret=interpret)
    return out.reshape(b, h, n_pad, d)[:, :, :n, :]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
