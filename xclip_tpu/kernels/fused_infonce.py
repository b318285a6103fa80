"""Fused streaming log-sum-exp for the contrastive loss (Pallas TPU).

The InfoNCE denominator (reference `x_clip/x_clip.py:826-843`: literal
exp → row-sum → log over the full (B, B) similarity matrix) is the memory
hot spot at large batch: XLA materializes the (R, C) = (b_local, B_global)
similarity block in HBM between the matmul and the reduction. This kernel
computes

    lse[r] = log Σ_c exp(x[r]·y[c])        (optionally skipping c == diag(r))

with a flash-attention-style online softmax over column blocks — the scores
live only in VMEM, one (block_r, block_c) tile at a time, with fp32 running
max/normalizer scratch. HBM traffic drops from O(R·C) to O((R+C)·d).

Differentiability: callers pre-scale the row latents by the learned
temperature (`x * exp(τ)`), so the kernel itself only needs cotangents for
its two matrix inputs; d/dτ flows through the pre-scale by ordinary JAX AD.
The custom VJP recomputes P = exp(s − lse) per tile (never materialized) and
accumulates
    dx[r] = dlse[r] · Σ_c P[r,c] y[c]
    dy[c] = Σ_r dlse[r] P[r,c] x[r]
in two Pallas kernels mirroring the forward tiling.

The decoupled-contrastive-learning variant (diagonal removed from the
denominator, x_clip.py:834-836) masks the global diagonal in-kernel via
`row_offset` (the caller's shard offset into the gathered column axis).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_R = 256
DEFAULT_BLOCK_C = 256
_NEG_INF = float(-jnp.inf)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _dot(a, b, trans_b=False):
    dims = (((1,), (1 if trans_b else 0,)), ((), ()))
    return jax.lax.dot_general(a, b, dims, preferred_element_type=jnp.float32)


def _tile_valid(shape, ri, ci, block_r, block_c, row_offset, num_cols,
                decoupled):
    """Validity mask for one (block_r, block_c) score tile: padded columns
    out; under DCL also the global diagonal (col == row_offset + row)."""
    cols = ci * block_c + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    valid = cols < num_cols
    if decoupled:
        rows = ri * block_r + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        valid = valid & (cols != rows + row_offset)
    return valid


# ------------------------------------------------------------------ forward

def _lse_kernel(off_ref, x_ref, y_ref, lse_ref, m_scr, l_scr, *,
                block_r, block_c, num_cols, num_c_blocks, decoupled):
    ri, ci = pl.program_id(0), pl.program_id(1)

    @pl.when(ci == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)

    s = _dot(x_ref[...], y_ref[...], trans_b=True)        # (br, bc) fp32
    valid = _tile_valid(s.shape, ri, ci, block_r, block_c, off_ref[0],
                        num_cols, decoupled)
    s = jnp.where(valid, s, _NEG_INF)

    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    m_safe = jnp.where(m_new == _NEG_INF, 0.0, m_new)
    p = jnp.where(valid, jnp.exp(s - m_safe), 0.0)
    correction = jnp.where(m_prev == _NEG_INF, 0.0, jnp.exp(m_prev - m_safe))
    l_scr[:] = l_scr[:] * correction + jnp.sum(p, axis=-1, keepdims=True)
    m_scr[:] = m_new

    @pl.when(ci == num_c_blocks - 1)
    def _finalize():
        m_fin = jnp.where(m_scr[:] == _NEG_INF, 0.0, m_scr[:])
        lse_ref[...] = m_fin + jnp.log(jnp.maximum(l_scr[:], 1e-30))


def _lse_forward(x, y, row_offset, num_cols, decoupled, block_r, block_c,
                 interpret):
    r_pad, d = x.shape
    c_pad = y.shape[0]
    return pl.pallas_call(
        functools.partial(
            _lse_kernel, block_r=block_r, block_c=block_c,
            num_cols=num_cols, num_c_blocks=c_pad // block_c,
            decoupled=decoupled),
        grid=(r_pad // block_r, c_pad // block_c),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_r, d), lambda i, j: (i, 0)),
            pl.BlockSpec((block_c, d), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((block_r, 1), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block_r, 1), jnp.float32),
            pltpu.VMEM((block_r, 1), jnp.float32),
        ],
        interpret=interpret,
    )(row_offset, x, y)


# ----------------------------------------------------------------- backward

def _dx_kernel(off_ref, x_ref, y_ref, lse_ref, dlse_ref, dx_ref, acc_scr, *,
               block_r, block_c, num_cols, num_c_blocks, decoupled):
    ri, ci = pl.program_id(0), pl.program_id(1)

    @pl.when(ci == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    s = _dot(x_ref[...], y_ref[...], trans_b=True)
    valid = _tile_valid(s.shape, ri, ci, block_r, block_c, off_ref[0],
                        num_cols, decoupled)
    p = jnp.where(valid, jnp.exp(s - lse_ref[...]), 0.0)
    acc_scr[:] += _dot(p, y_ref[...])

    @pl.when(ci == num_c_blocks - 1)
    def _finalize():
        dx_ref[...] = acc_scr[:] * dlse_ref[...]


def _dy_kernel(off_ref, x_ref, y_ref, lse_ref, dlse_ref, dy_ref, acc_scr, *,
               block_r, block_c, num_cols, num_r_blocks, decoupled):
    ci, ri = pl.program_id(0), pl.program_id(1)

    @pl.when(ri == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    s = _dot(x_ref[...], y_ref[...], trans_b=True)        # (br, bc)
    valid = _tile_valid(s.shape, ri, ci, block_r, block_c, off_ref[0],
                        num_cols, decoupled)
    p = jnp.where(valid, jnp.exp(s - lse_ref[...]), 0.0)
    xw = x_ref[...] * dlse_ref[...]              # (br, d)
    # acc += pᵀ @ xw  (contract the row dim)
    acc_scr[:] += jax.lax.dot_general(
        p, xw, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(ri == num_r_blocks - 1)
    def _finalize():
        dy_ref[...] = acc_scr[:]


def _lse_backward(x, y, lse, dlse, row_offset, num_cols, decoupled, block_r,
                  block_c, interpret):
    r_pad, d = x.shape
    c_pad = y.shape[0]
    nr, nc = r_pad // block_r, c_pad // block_c

    dx = pl.pallas_call(
        functools.partial(
            _dx_kernel, block_r=block_r, block_c=block_c, num_cols=num_cols,
            num_c_blocks=nc, decoupled=decoupled),
        grid=(nr, nc),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_r, d), lambda i, j: (i, 0)),
            pl.BlockSpec((block_c, d), lambda i, j: (j, 0)),
            pl.BlockSpec((block_r, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((block_r, 1), lambda i, j: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block_r, d), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((r_pad, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_r, d), jnp.float32)],
        interpret=interpret,
    )(row_offset, x, y, lse, dlse)

    dy = pl.pallas_call(
        functools.partial(
            _dy_kernel, block_r=block_r, block_c=block_c, num_cols=num_cols,
            num_r_blocks=nr, decoupled=decoupled),
        grid=(nc, nr),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_r, d), lambda j, i: (i, 0)),
            pl.BlockSpec((block_c, d), lambda j, i: (j, 0)),
            pl.BlockSpec((block_r, 1), lambda j, i: (i, 0)),
            pl.BlockSpec((block_r, 1), lambda j, i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block_c, d), lambda j, i: (j, 0)),
        out_shape=jax.ShapeDtypeStruct((c_pad, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_c, d), jnp.float32)],
        interpret=interpret,
    )(row_offset, x, y, lse, dlse)

    return dx, dy


# -------------------------------------------------------------- public API

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def streaming_lse(x, y, row_offset, decoupled=False,
                  block_r=DEFAULT_BLOCK_R, block_c=DEFAULT_BLOCK_C,
                  interpret=None):
    """`lse[r] = logsumexp_c(x[r] · y[c])` without materializing the (R, C)
    score matrix. `x` rows should already carry the temperature scale.

    `row_offset` (traced scalar ok) gives the global column index of row 0's
    diagonal; with `decoupled=True` the diagonal entries are excluded from
    the sum (DCL). Rows/cols are padded internally to the block sizes.
    """
    lse, _ = _streaming_lse_fwd(x, y, row_offset, decoupled, block_r,
                                block_c, interpret)
    return lse


def _streaming_lse_fwd(x, y, row_offset, decoupled, block_r, block_c,
                       interpret):
    if interpret is None:  # run interpreted off-TPU (CPU tests, same code path)
        interpret = jax.default_backend() != "tpu"
    r, d = x.shape
    c = y.shape[0]
    block_r = min(block_r, _round_up(r, 8))
    block_c = min(block_c, _round_up(c, 128))
    x32 = jnp.pad(x.astype(jnp.float32),
                  ((0, _round_up(r, block_r) - r), (0, 0)))
    y32 = jnp.pad(y.astype(jnp.float32),
                  ((0, _round_up(c, block_c) - c), (0, 0)))
    off = jnp.asarray(row_offset, jnp.int32).reshape(1)
    lse_pad = _lse_forward(x32, y32, off, c, decoupled, block_r, block_c,
                           interpret)
    return lse_pad[:r, 0], (x, y, lse_pad, off)


def _streaming_lse_bwd(decoupled, block_r, block_c, interpret, res, dlse):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    x, y, lse_pad, off = res
    r, d = x.shape
    c = y.shape[0]
    block_r = min(block_r, _round_up(r, 8))
    block_c = min(block_c, _round_up(c, 128))
    x32 = jnp.pad(x.astype(jnp.float32),
                  ((0, _round_up(r, block_r) - r), (0, 0)))
    y32 = jnp.pad(y.astype(jnp.float32),
                  ((0, _round_up(c, block_c) - c), (0, 0)))
    dlse_pad = jnp.pad(dlse.astype(jnp.float32),
                       (0, _round_up(r, block_r) - r))[:, None]
    dx, dy = _lse_backward(x32, y32, lse_pad, dlse_pad, off, c, decoupled,
                           block_r, block_c, interpret)
    return dx[:r].astype(x.dtype), dy[:c].astype(y.dtype), None


streaming_lse.defvjp(
    lambda x, y, row_offset, decoupled, block_r, block_c, interpret:
        _streaming_lse_fwd(x, y, row_offset, decoupled, block_r, block_c,
                           interpret),
    _streaming_lse_bwd)
