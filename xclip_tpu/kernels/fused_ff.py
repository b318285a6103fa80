"""Fused GEGLU + inner-LayerNorm (Pallas TPU) — the feed-forward middle.

The reference FF is `w_in → GEGLU → LayerNorm(inner) → w_out`
(`x_clip/x_clip.py:180-199`, NormFormer inner norm). Between the two matmuls
XLA runs the GEGLU product and the two LayerNorm passes as separate
HBM-bound fusions: at the flagship shape that is ~5 ms/layer of pure
bandwidth (device-trace measured) on a (rows, 4096) bf16 tensor.

This kernel does the whole middle in one pass per row block: read the
`(block, 2·inner)` w_in output once, compute `a · gelu(b)` (exact erf
variant, matching torch F.gelu) and the row LayerNorm entirely in fp32
registers/VMEM, write the `(block, inner)` normalized result once. The
backward (custom VJP) mirrors it: one read of (h, dout) per block, one write
of dh, with the tiny gain gradient accumulated in VMEM scratch across the
sequential row grid.

eps follows the dtype rule of `nn.core.layer_norm_apply` (1e-5 fp32 /
1e-3 otherwise, reference x_clip.py:117-121).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_ROWS = 256
_INV_SQRT2 = 0.7071067811865476


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _erf(x):
    """erf via Abramowitz–Stegun 7.1.26 (max abs err 1.5e-7) — Mosaic has no
    erf primitive; built from exp/mul/div which lower fine."""
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
               + t * (-1.453152027 + t * 1.061405429))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * _INV_SQRT2))


def _forward_math(h32, g32, eps):
    """(block, 2·inner) fp32 → (normed·g, prod, mean, inv) all fp32."""
    inner = h32.shape[-1] // 2
    a, b = h32[:, :inner], h32[:, inner:]
    prod = a * _gelu_exact(b)
    mean = jnp.mean(prod, axis=-1, keepdims=True)
    # two-pass variance: E[(x-mean)^2] is non-negative by construction —
    # the one-pass E[x^2]-E[x]^2 form can go negative past eps under fp32
    # cancellation and NaN the rsqrt
    centered = prod - mean
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    return centered * inv * g32, prod, mean, inv


def _fwd_kernel(h_ref, g_ref, o_ref, *, eps):
    h32 = h_ref[...].astype(jnp.float32)
    g32 = g_ref[...].astype(jnp.float32)
    out, _, _, _ = _forward_math(h32, g32, eps)
    o_ref[...] = out.astype(o_ref.dtype)


def _bwd_kernel(h_ref, g_ref, do_ref, dh_ref, dg_scr, *, eps, num_blocks):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dg_scr[:] = jnp.zeros_like(dg_scr)

    h32 = h_ref[...].astype(jnp.float32)
    g32 = g_ref[...].astype(jnp.float32)
    do = do_ref[...].astype(jnp.float32)
    inner = h32.shape[-1] // 2
    a, b = h32[:, :inner], h32[:, inner:]

    # gelu value and derivative share ONE erf evaluation:
    # gelu = b·Φ(b), gelu' = Φ(b) + b·φ(b)
    phi = 0.5 * (1.0 + _erf(b * _INV_SQRT2))
    gelu_b = b * phi
    prod = a * gelu_b
    mean = jnp.mean(prod, axis=-1, keepdims=True)
    centered = prod - mean
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = centered * inv

    dg_scr[0, :] += jnp.sum(do * xhat, axis=0)

    # LayerNorm backward (row-local): dprod = inv·(dy − mean(dy) − x̂·mean(dy·x̂))
    dy = do * g32
    m1 = jnp.mean(dy, axis=-1, keepdims=True)
    m2 = jnp.mean(dy * xhat, axis=-1, keepdims=True)
    dprod = inv * (dy - m1 - xhat * m2)

    da = dprod * gelu_b
    pdf = jnp.exp(-0.5 * b * b) * 0.3989422804014327
    dgelu = phi + b * pdf
    db = dprod * a * dgelu
    dh_ref[...] = jnp.concatenate([da, db], axis=-1).astype(dh_ref.dtype)


def _dg_out_kernel(h_ref, g_ref, do_ref, dh_ref, dg_ref, dg_scr, *, eps,
                   num_blocks):
    # variant of _bwd_kernel that also emits the accumulated dg at the end
    _bwd_kernel(h_ref, g_ref, do_ref, dh_ref, dg_scr, eps=eps,
                num_blocks=num_blocks)

    @pl.when(pl.program_id(0) == num_blocks - 1)
    def _emit():
        dg_ref[...] = dg_scr[...]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def geglu_layernorm(h, g, eps=None, block_rows=DEFAULT_BLOCK_ROWS,
                    interpret=None):
    """`h`: (..., 2·inner) w_in output; `g`: (inner,) LayerNorm gain.
    Returns (..., inner) = LayerNorm(a · gelu_exact(b)) · g with fp32 math
    and `h.dtype` storage. Differentiable w.r.t. h and g."""
    out, _ = _geglu_ln_fwd(h, g, eps, block_rows, interpret)
    return out


def _resolve(h, eps, interpret):
    if eps is None:
        eps = 1e-5 if h.dtype == jnp.float32 else 1e-3
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return eps, interpret


def _geglu_ln_fwd(h, g, eps, block_rows, interpret):
    eps, interpret = _resolve(h, eps, interpret)
    *lead, width = h.shape
    inner = width // 2
    rows = 1
    for d in lead:
        rows *= d
    h2 = h.reshape(rows, width)
    rows_pad = _round_up(rows, block_rows)
    h2p = jnp.pad(h2, ((0, rows_pad - rows), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(rows_pad // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, width), lambda i: (i, 0)),
            pl.BlockSpec((inner,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((block_rows, inner), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows_pad, inner), h.dtype),
        interpret=interpret,
    )(h2p, g)
    return out[:rows].reshape(*lead, inner), (h, g)


def _geglu_ln_bwd(eps, block_rows, interpret, res, dout):
    h, g = res
    eps, interpret = _resolve(h, eps, interpret)
    # the backward body keeps ~12 fp32 (block, inner) temporaries live in
    # VMEM; halve the block to stay under the 16MB scoped-vmem limit
    block_rows = max(8, block_rows // 2)
    *lead, width = h.shape
    inner = width // 2
    rows = 1
    for d in lead:
        rows *= d
    rows_pad = _round_up(rows, block_rows)
    h2p = jnp.pad(h.reshape(rows, width), ((0, rows_pad - rows), (0, 0)))
    dop = jnp.pad(dout.reshape(rows, inner).astype(h.dtype),
                  ((0, rows_pad - rows), (0, 0)))
    nb = rows_pad // block_rows

    dh, dg = pl.pallas_call(
        functools.partial(_dg_out_kernel, eps=eps, num_blocks=nb),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block_rows, width), lambda i: (i, 0)),
            pl.BlockSpec((inner,), lambda i: (0,)),
            pl.BlockSpec((block_rows, inner), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, width), lambda i: (i, 0)),
            pl.BlockSpec((1, inner), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows_pad, width), h.dtype),
            jax.ShapeDtypeStruct((1, inner), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((1, inner), jnp.float32)],
        interpret=interpret,
    )(h2p, g, dop)

    return (dh[:rows].reshape(h.shape),
            dg[0].astype(g.dtype))


geglu_layernorm.defvjp(
    lambda h, g, eps, block_rows, interpret:
        _geglu_ln_fwd(h, g, eps, block_rows, interpret),
    _geglu_ln_bwd)
