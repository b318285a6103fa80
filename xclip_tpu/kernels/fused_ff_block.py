"""Whole-FF-block Pallas TPU kernel: PreNorm LayerNorm → w_in matmul → GEGLU
→ inner LayerNorm → w_out matmul → residual add, in ONE pass over the rows.

Motivation (r2 device trace, flagship shape 65792×512, inner 2048, bf16):
the XLA feed-forward materializes the (rows, 2048) value / gate / product /
normalized tensors in HBM (~1.1 GB per layer per direction) and — with no
rematerialization — keeps them as backward residuals, which overflows HBM at
batch 256 and spills to slow host-attached memory (the S(1) copies gating the
step at ~190 ms). This kernel keeps every inner-dim tensor in VMEM: HBM
traffic per row tile is x in, out out, and the two weight matrices stay
resident across the sequential row grid.

Semantics match `nn.layers.feed_forward_apply` + the surrounding PreNorm and
residual (reference x_clip.py:180-199 FeedForward with NormFormer inner LN,
:123-130 PreNorm, :285-289 residual):

    out = x + (LN_g_inner(a · gelu_exact(b)) @ w_out),
    [a, b] = LN_g_pre(x) @ w_in

with fp32 LayerNorm statistics, fp32 GEGLU, dtype-dependent eps
(nn/core.py layer_norm_apply), and `x.dtype` storage for everything that
crosses HBM.

The backward is a custom VJP in two Pallas passes that recompute the inner
activations tile-wise (never materializing them):
  * pass 1 (row grid): dx (+ residual), dg_pre, dg_inner, and the per-row
    inner-LN backward statistics;
  * pass 2 (inner-column × row grid): dW_in and dW_out, accumulated in fp32
    VMEM scratch per column block — the inner LayerNorm's row coupling is
    factored out through the pass-1 statistics, so columns are independent.

Pass 2 of the recompute variant has two modes (r5): FED — pass 1 emits the
dh/y/xn operands it already materialized for its own dots, and pass 2 is
pure dW dots (half the MXU work; the hand-off is a per-layer transient,
never a forward residual; +20% at dim-768 b128: 349.9 → 420.0 pairs/s) —
vs SELF-CONTAINED, which re-derives a/b/dy per column block from x and
the weights. `_p2_fed_choice` gates the hand-off on HBM size (single
shot ≤ 1 GB, env XCLIP_FF_P2_FED / XCLIP_FF_P2_FED_MAX_MB; above that
CHUNKED — the pass-1/pass-2 pair runs per equal row chunk, serialized
so one ≤256 MB hand-off is alive at a time, dW partials summed — e.g.
32 chunks at the 32k-batch 2048-row shard whose single-shot hand-off
would be ~6.9 GB) and on the fed pass 1 fitting scoped VMEM (halving
its row tile if needed): fed single-shot at the dim-768 b128 shape
under a ≥40 MiB limit.

`store_h=True` trades HBM traffic for the recompute tax: the forward ALSO
emits `h = LN(x) @ w_in` in the storage dtype, and both backward passes read
it instead of redoing the x@w_in matmuls (pass 1: 4.19 MFLOP/row; pass 2:
another 4.19 MFLOP/row at the flagship 512→2048 shape — together ~80% of
the ideal backward FLOPs). The (rows, 2·inner) tensor streams through the
row grid, so the added DMA overlaps the dW dots; whether that wins is
chip-bandwidth-dependent — both variants are benched in README Performance.

Precision note (ADVICE r4): with `store_h=True` the four stored per-row LN
statistics (mp/ip/mi/ii) are computed from the fp32 h in the FORWARD, but
the backward rebuilds prod from the bf16-downcast stored h — so the
reconstructed xhat_in = (prod − mi)·ii no longer exactly satisfies the
zero-mean/unit-variance identities the LN-backward formula assumes
(bf16-level error; gradient tests pass within tolerance, and the stored
stats arguably put the result CLOSER to the true gradient than re-reducing
the downcast h would). Start precision debugging here. The `store_h=False`
variant does not have this interaction: its backward recomputes h with the
forward's exact fp32 op sequence, so the stored stats are bitwise
consistent with the recomputed activations.

Measured dead end (r3, don't retry): a per-batch-element 3D layout
(blocks of the exact (1, n, d) shape, no flatten) removes the ~6 ms/step
of relayout reshapes that flattening a sublane-misaligned (b, 257, d)
array costs — but the per-element kernels run 7.5 ms/step SLOWER (M=257
tiles, 516→1024-program grids), a net loss. The flat layout stays.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._common import (eps_for as _eps_for, ln_fp32 as _ln_fp32,
                      round_up as _round_up, scoped_vmem_limit_bytes)
from .fused_ff import _gelu_exact, _erf, _INV_SQRT2

DEFAULT_BLOCK_ROWS = 256


def _gelu_grad(b):
    pdf = jnp.exp(-0.5 * b * b) * 0.3989422804014327
    return 0.5 * (1.0 + _erf(b * _INV_SQRT2)) + b * pdf


def _gelu_val_grad(b):
    """(gelu(b), gelu'(b)) sharing ONE erf/exp evaluation.

    The backward passes need both the value (for da) and the derivative
    (for db); calling _gelu_exact + _gelu_grad separately evaluates the
    ~13-op erf polynomial twice per element — on the flagship backward
    that is ~143M redundant erf evaluations per layer of pure VPU work
    serialized against the MXU dots. Same math: gelu = b·Φ(b),
    gelu' = Φ(b) + b·φ(b)."""
    phi = 0.5 * (1.0 + _erf(b * _INV_SQRT2))
    pdf = jnp.exp(-0.5 * b * b) * 0.3989422804014327
    return b * phi, phi + b * pdf


def _stats_transposed(block_rows):
    """Whether the packed per-row stats use the TRANSPOSED (k, rows)
    layout. A (rows, k) fp32 output/input gets the T(8,128) tiled layout —
    the lane dim pads k=4 → 128, a 32× HBM/DMA expansion (measured fatal
    at the 2048-local-batch shard: 4 stats × 6 layers ≈ 6.5 GB of
    padding). Stats-as-ROWS pad only the sublane dim (k → 8), a ≤2× cost,
    at the price of one small in-kernel transpose per tile.

    BUT Mosaic requires a block's lane dim to be 128-divisible (or equal
    to the full array dim), and the transposed tile's lane dim is the ROW
    block: the forward tile, its half (backward pass 1), and its double
    (stored pass 2) must all stay 128-divisible, i.e. block_rows % 256
    == 0 — true for the bf16 perf path (tile 256), false for fp32 inputs
    (clamped to 128) and sub-tile row counts, which keep the legacy
    (rows, k) layout: its lane padding is irrelevant at those shapes."""
    return block_rows % 256 == 0


def _pack_stats(cols, transposed):
    """k (rows, 1) fp32 per-row statistics → ONE packed tensor:
    (k, rows) if transposed else (rows, k). See _stats_transposed."""
    cat = jnp.concatenate(cols, axis=1)
    return cat.T if transposed else cat


def _unpack_stats(st, transposed):
    """Packed stats tile → k (block_rows, 1) columns."""
    stT = st.T if transposed else st
    return tuple(stT[:, i:i + 1] for i in range(stT.shape[1]))


# ------------------------------------------------------------------ forward

def _fwd_kernel(x_ref, gpre_ref, win_ref, gin_ref, wout_ref, o_ref,
                *, eps_pre, eps_in):
    x = x_ref[...]
    x32 = x.astype(jnp.float32)
    xn32, _, _ = _ln_fp32(x32, gpre_ref[...].astype(jnp.float32), eps_pre)
    xn = xn32.astype(x.dtype)

    h = jax.lax.dot_general(xn, win_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    inner = h.shape[-1] // 2
    a, b = h[:, :inner], h[:, inner:]
    prod = a * _gelu_exact(b)
    y32, _, _ = _ln_fp32(prod, gin_ref[...].astype(jnp.float32), eps_in)
    y = y32.astype(x.dtype)

    out = jax.lax.dot_general(y, wout_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[...] = out.astype(x.dtype) + x


def _fwd_kernel_stats(x_ref, gpre_ref, win_ref, gin_ref, wout_ref,
                      o_ref, stats_ref, *, eps_pre, eps_in, stats_T):
    """Recompute-variant forward: emits out plus ONLY the four fp32 per-row
    LN statistics (no h) — 16 bytes/row of extra DMA buys the backward an
    elementwise stored-stat LayerNorm in both passes (VERDICT r4 #2). The
    dead h downcast inside _fwd_store_core is DCE'd by Mosaic. Stats are
    packed mp / ip / mi / ii (see _stats_transposed)."""
    out, _h, mp, ip, mi, ii = _fwd_store_core(
        x_ref[...], gpre_ref[...], win_ref[...], gin_ref[...], wout_ref[...],
        eps_pre, eps_in)
    o_ref[...] = out
    stats_ref[...] = _pack_stats((mp, ip, mi, ii), stats_T)


def _ff_block_fwd_call(x2, g_pre, w_in, g_inner, w_out, block_rows, interpret,
                       need_stats=False):
    rows, d = x2.shape
    two_inner = w_in.shape[-1]
    inner = two_inner // 2
    eps = _eps_for(x2.dtype)
    nb = rows // block_rows

    out_specs = pl.BlockSpec((block_rows, d), lambda i: (i, 0))
    out_shape = jax.ShapeDtypeStruct((rows, d), x2.dtype)
    kernel = functools.partial(_fwd_kernel, eps_pre=eps, eps_in=eps)
    if need_stats:
        stats_T = _stats_transposed(block_rows)
        if stats_T:
            out_specs = [out_specs,
                         pl.BlockSpec((4, block_rows), lambda i: (0, i))]
            out_shape = [out_shape,
                         jax.ShapeDtypeStruct((4, rows), jnp.float32)]
        else:
            out_specs = [out_specs,
                         pl.BlockSpec((block_rows, 4), lambda i: (i, 0))]
            out_shape = [out_shape,
                         jax.ShapeDtypeStruct((rows, 4), jnp.float32)]
        kernel = functools.partial(_fwd_kernel_stats, eps_pre=eps, eps_in=eps,
                                   stats_T=stats_T)
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block_rows, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((d, two_inner), lambda i: (0, 0)),
            pl.BlockSpec((1, inner), lambda i: (0, 0)),
            pl.BlockSpec((inner, d), lambda i: (0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(x2, g_pre[None, :], w_in, g_inner[None, :], w_out)


def _fwd_store_core(x, gpre, win, gin, wout, eps_pre, eps_in):
    """Stored-forward math on one 2D tile: returns (out, h) in x.dtype plus
    the fp32 per-row LN statistics (mean_pre, inv_pre, mean_in, inv_in) —
    both LayerNorms' mean and rsqrt(var+eps), stored so the backward passes
    replace every row REDUCTION that does not depend on the cotangent
    (pre-LN mean/var of x, inner-LN mean/var of the GEGLU product) with an
    elementwise (v − mean)·inv reuse of the forward's exact value."""
    x32 = x.astype(jnp.float32)
    gpre32 = gpre.astype(jnp.float32)
    # inline _ln_fp32 (bit-identical op sequence) to also keep the means
    mean_pre = jnp.mean(x32, axis=-1, keepdims=True)
    c_pre = x32 - mean_pre
    var_pre = jnp.mean(c_pre * c_pre, axis=-1, keepdims=True)
    inv_pre = jax.lax.rsqrt(var_pre + eps_pre)
    xn = ((c_pre * inv_pre) * gpre32).astype(x.dtype)

    h = jax.lax.dot_general(xn, win, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    inner = h.shape[-1] // 2
    a, b = h[:, :inner], h[:, inner:]
    prod = a * _gelu_exact(b)
    mean_in = jnp.mean(prod, axis=-1, keepdims=True)
    c_in = prod - mean_in
    var_in = jnp.mean(c_in * c_in, axis=-1, keepdims=True)
    inv_in = jax.lax.rsqrt(var_in + eps_in)
    y = ((c_in * inv_in) * gin.astype(jnp.float32)).astype(x.dtype)

    out = jax.lax.dot_general(y, wout, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return (out.astype(x.dtype) + x, h.astype(x.dtype),
            mean_pre, inv_pre, mean_in, inv_in)


def _fwd_kernel_store(x_ref, gpre_ref, win_ref, gin_ref, wout_ref,
                      o_ref, h_ref, stats_ref, *, eps_pre, eps_in, stats_T):
    """Forward that also emits h = LN(x)@w_in (storage dtype) and the four
    fp32 per-row LN statistics (packed — see _stats_transposed) for a
    recompute-free, reduction-free backward."""
    out, h, mp, ip, mi, ii = _fwd_store_core(
        x_ref[...], gpre_ref[...], win_ref[...], gin_ref[...], wout_ref[...],
        eps_pre, eps_in)
    o_ref[...] = out
    h_ref[...] = h
    stats_ref[...] = _pack_stats((mp, ip, mi, ii), stats_T)


def _fwd_store_geglu_core(x, gpre, win, gin, wout, eps_pre, eps_in):
    """store_h='geglu' forward math on one 2D tile: like _fwd_store_core
    but the stored activation is the GEGLU triple (prod = a·gelu(b),
    gelu(b), a·gelu'(b)) instead of h — 3·inner lanes instead of 2·inner,
    and the forward additionally evaluates exp(−b²/2) (gelu' needs the
    pdf). In exchange BOTH backward passes lose every transcendental
    (erf + exp over (rows, inner) each — the dominant VPU term the r4
    trace left in them): da = dprod·gelu_b and db = dprod·agdb become
    two multiplies. The stored values come from the fp32 forward h, so
    they are MORE precise than the store_h=True path's
    recompute-from-bf16-h (see the module precision note)."""
    x32 = x.astype(jnp.float32)
    gpre32 = gpre.astype(jnp.float32)
    mean_pre = jnp.mean(x32, axis=-1, keepdims=True)
    c_pre = x32 - mean_pre
    var_pre = jnp.mean(c_pre * c_pre, axis=-1, keepdims=True)
    inv_pre = jax.lax.rsqrt(var_pre + eps_pre)
    xn = ((c_pre * inv_pre) * gpre32).astype(x.dtype)

    h = jax.lax.dot_general(xn, win, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    inner = h.shape[-1] // 2
    a, b = h[:, :inner], h[:, inner:]
    gelu_b, gelu_db = _gelu_val_grad(b)
    prod = a * gelu_b
    mean_in = jnp.mean(prod, axis=-1, keepdims=True)
    c_in = prod - mean_in
    var_in = jnp.mean(c_in * c_in, axis=-1, keepdims=True)
    inv_in = jax.lax.rsqrt(var_in + eps_in)
    y = ((c_in * inv_in) * gin.astype(jnp.float32)).astype(x.dtype)

    out = jax.lax.dot_general(y, wout, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return (out.astype(x.dtype) + x,
            prod.astype(x.dtype), gelu_b.astype(x.dtype),
            (a * gelu_db).astype(x.dtype),
            mean_pre, inv_pre, mean_in, inv_in)


def _fwd_kernel_store_geglu(x_ref, gpre_ref, win_ref, gin_ref, wout_ref,
                            o_ref, prod_ref, gb_ref, agdb_ref, stats_ref,
                            *, eps_pre, eps_in, stats_T):
    out, prod, gb, agdb, mp, ip, mi, ii = _fwd_store_geglu_core(
        x_ref[...], gpre_ref[...], win_ref[...], gin_ref[...], wout_ref[...],
        eps_pre, eps_in)
    o_ref[...] = out
    prod_ref[...] = prod
    gb_ref[...] = gb
    agdb_ref[...] = agdb
    stats_ref[...] = _pack_stats((mp, ip, mi, ii), stats_T)


def _ff_block_fwd_store_call(x2, g_pre, w_in, g_inner, w_out, block_rows,
                             interpret, geglu=False):
    rows, d = x2.shape
    two_inner = w_in.shape[-1]
    inner = two_inner // 2
    eps = _eps_for(x2.dtype)
    nb = rows // block_rows

    stats_T = _stats_transposed(block_rows)
    if stats_T:
        stats_spec = pl.BlockSpec((4, block_rows), lambda i: (0, i))
        stats_shape = jax.ShapeDtypeStruct((4, rows), jnp.float32)
    else:
        stats_spec = pl.BlockSpec((block_rows, 4), lambda i: (i, 0))
        stats_shape = jax.ShapeDtypeStruct((rows, 4), jnp.float32)
    if geglu:
        kernel = functools.partial(_fwd_kernel_store_geglu,
                                   eps_pre=eps, eps_in=eps, stats_T=stats_T)
        act_specs = [pl.BlockSpec((block_rows, inner), lambda i: (i, 0))
                     for _ in range(3)]
        act_shape = [jax.ShapeDtypeStruct((rows, inner), x2.dtype)
                     for _ in range(3)]
    else:
        kernel = functools.partial(_fwd_kernel_store, eps_pre=eps, eps_in=eps,
                                   stats_T=stats_T)
        act_specs = [pl.BlockSpec((block_rows, two_inner), lambda i: (i, 0))]
        act_shape = [jax.ShapeDtypeStruct((rows, two_inner), x2.dtype)]
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block_rows, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((d, two_inner), lambda i: (0, 0)),
            pl.BlockSpec((1, inner), lambda i: (0, 0)),
            pl.BlockSpec((inner, d), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, d), lambda i: (i, 0)),
            *act_specs,
            stats_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, d), x2.dtype),
            *act_shape,
            stats_shape,
        ],
        interpret=interpret,
    )(x2, g_pre[None, :], w_in, g_inner[None, :], w_out)


# ---------------------------------------------------- backward pass 1 (dx)

def _p1_recompute_core(x, do, gpre, gin, win, wout, mp, ip, mi, ii):
    """Recompute pass-1 math on one 2D tile, LNs from the forward-stored
    statistics (mp/ip/mi/ii): the x@w_in matmul and GEGLU are recomputed
    tile-wise (no O(rows·inner) residual — the memory-lean contract), but
    both LayerNorms become elementwise (v − mean)·inv reuses of the
    forward's fp32 values — bitwise identical to a fresh reduction since
    the recomputed h/prod repeat the forward's exact op sequence on the
    same inputs. Only the cotangent-dependent reductions (m1/m2, p1/p2,
    the dg sums) remain. Returns everything either pass-2 variant needs:
    (dx, m1, m2, dh, y, xn, dgpre_tile, dgin_tile) — unused returns are
    dead code the compiler strips in the non-fed wrapper."""
    do32 = do.astype(jnp.float32)
    gpre32 = gpre.astype(jnp.float32)
    gin32 = gin.astype(jnp.float32)

    x32 = x.astype(jnp.float32)
    xhat_pre = (x32 - mp) * ip
    xn = (xhat_pre * gpre32).astype(x.dtype)
    h = jax.lax.dot_general(xn, win, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    inner = h.shape[-1] // 2
    a, b = h[:, :inner], h[:, inner:]
    gelu_b, gelu_db = _gelu_val_grad(b)
    prod = a * gelu_b
    xhat_in = (prod - mi) * ii

    # d(inner normalized · g) = do @ w_out^T
    dy = jax.lax.dot_general(do, wout, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dgin_tile = jnp.sum(dy * xhat_in, axis=0, keepdims=True)

    # inner LayerNorm backward
    dyg = dy * gin32
    m1 = jnp.mean(dyg, axis=-1, keepdims=True)
    m2 = jnp.mean(dyg * xhat_in, axis=-1, keepdims=True)
    dprod = ii * (dyg - m1 - xhat_in * m2)

    # GEGLU backward → dh, then dxn = dh @ w_in^T
    da = dprod * gelu_b
    db = dprod * a * gelu_db
    dh = jnp.concatenate([da, db], axis=-1).astype(x.dtype)
    y = (xhat_in * gin32).astype(x.dtype)
    dxn = jax.lax.dot_general(dh, win, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)

    dgpre_tile = jnp.sum(dxn * xhat_pre, axis=0, keepdims=True)

    # pre LayerNorm backward + residual
    dyg2 = dxn * gpre32
    p1 = jnp.mean(dyg2, axis=-1, keepdims=True)
    p2 = jnp.mean(dyg2 * xhat_pre, axis=-1, keepdims=True)
    dx = ip * (dyg2 - p1 - xhat_pre * p2) + do32
    return (dx.astype(x.dtype), m1, m2, dh, y, xn, dgpre_tile, dgin_tile)


def _bwd_dx_kernel(x_ref, gpre_ref, win_ref, gin_ref, wout_ref, do_ref,
                   stats_ref,
                   dx_ref, m12_ref,
                   dgpre_ref, dgin_ref,
                   dgpre_scr, dgin_scr, *, num_blocks, stats_T):
    """Recompute pass 1 (see _p1_recompute_core); pass 2 re-derives the
    activations itself from x + the stored stats, so this emits only the
    cotangent-dependent m1/m2 row terms for it."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dgpre_scr[...] = jnp.zeros_like(dgpre_scr)
        dgin_scr[...] = jnp.zeros_like(dgin_scr)

    mp, ip, mi, ii = _unpack_stats(stats_ref[...], stats_T)
    dx, m1, m2, _dh, _y, _xn, dgpre_tile, dgin_tile = _p1_recompute_core(
        x_ref[...], do_ref[...], gpre_ref[...], gin_ref[...],
        win_ref[...], wout_ref[...], mp, ip, mi, ii)
    # emit the cotangent-dependent per-row terms for the dW pass (packed
    # — see _stats_transposed)
    m12_ref[...] = _pack_stats((m1, m2), stats_T)
    dx_ref[...] = dx
    dgpre_scr[...] += dgpre_tile
    dgin_scr[...] += dgin_tile

    @pl.when(i == num_blocks - 1)
    def _emit():
        dgpre_ref[...] = dgpre_scr[...]
        dgin_ref[...] = dgin_scr[...]


def _bwd_dx_kernel_fed(x_ref, gpre_ref, win_ref, gin_ref, wout_ref, do_ref,
                       stats_ref,
                       dx_ref, dh_ref, y_ref, xn_ref,
                       dgpre_ref, dgin_ref,
                       dgpre_scr, dgin_scr, *, num_blocks, stats_T):
    """Recompute pass 1 that FEEDS pass 2: additionally emits the tensors
    it already materialized for its own dots — dh = (da‖db), y = x̂_in·g,
    and xn = LN(x)·g_pre, all in the storage dtype — so pass 2 becomes the
    three dW dots with zero recompute (same FLOPs as the stored-residual
    pass 2, without any O(rows·inner) residual surviving the FORWARD: the
    hand-off lives only for the one layer's backward). m1/m2 are not
    emitted — fed pass 2 doesn't rebuild dprod. Numerics are bitwise
    identical to the unfed pair: both cast da/db/y/xn to the storage dtype
    before the dW dots, here vs inside _bwd_dw_kernel."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dgpre_scr[...] = jnp.zeros_like(dgpre_scr)
        dgin_scr[...] = jnp.zeros_like(dgin_scr)

    mp, ip, mi, ii = _unpack_stats(stats_ref[...], stats_T)
    dx, _m1, _m2, dh, y, xn, dgpre_tile, dgin_tile = _p1_recompute_core(
        x_ref[...], do_ref[...], gpre_ref[...], gin_ref[...],
        win_ref[...], wout_ref[...], mp, ip, mi, ii)
    dx_ref[...] = dx
    dh_ref[...] = dh
    y_ref[...] = y
    xn_ref[...] = xn
    dgpre_scr[...] += dgpre_tile
    dgin_scr[...] += dgin_tile

    @pl.when(i == num_blocks - 1)
    def _emit():
        dgpre_ref[...] = dgpre_scr[...]
        dgin_ref[...] = dgin_scr[...]


def _p1_stored_core(x, do, gpre, gin, win, wout, h_raw, mp, ip, mi, ii):
    """Stored pass-1 math on one 2D tile. Returns
    (dx, dprod_cast, dgpre_tile, dgin_tile). `mp/ip/mi/ii` are the
    forward-stored per-row LN statistics: both LayerNorms' normalized
    activations become elementwise (v − mean)·inv — the only row
    reductions left are the four that contract the cotangent (m1/m2,
    p1/p2) and the two column-contracted dg sums."""
    do32 = do.astype(jnp.float32)
    gpre32 = gpre.astype(jnp.float32)
    gin32 = gin.astype(jnp.float32)

    x32 = x.astype(jnp.float32)
    xhat_pre = (x32 - mp) * ip

    h = h_raw.astype(jnp.float32)
    inner = h.shape[-1] // 2
    a, b = h[:, :inner], h[:, inner:]
    gelu_b, gelu_db = _gelu_val_grad(b)
    prod = a * gelu_b
    xhat_in = (prod - mi) * ii

    dy = jax.lax.dot_general(do, wout, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dgin_tile = jnp.sum(dy * xhat_in, axis=0, keepdims=True)

    dyg = dy * gin32
    m1 = jnp.mean(dyg, axis=-1, keepdims=True)
    m2 = jnp.mean(dyg * xhat_in, axis=-1, keepdims=True)
    dprod = ii * (dyg - m1 - xhat_in * m2)

    da = dprod * gelu_b
    db = dprod * a * gelu_db
    dh = jnp.concatenate([da, db], axis=-1).astype(x.dtype)
    dxn = jax.lax.dot_general(dh, win, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)

    dgpre_tile = jnp.sum(dxn * xhat_pre, axis=0, keepdims=True)

    dyg2 = dxn * gpre32
    p1 = jnp.mean(dyg2, axis=-1, keepdims=True)
    p2 = jnp.mean(dyg2 * xhat_pre, axis=-1, keepdims=True)
    dx = ip * (dyg2 - p1 - xhat_pre * p2) + do32
    return (dx.astype(x.dtype), dprod.astype(x.dtype),
            dgpre_tile, dgin_tile)


def _bwd_dx_kernel_stored(x_ref, gpre_ref, win_ref, gin_ref, wout_ref,
                          do_ref, h_ref, stats_ref,
                          dx_ref, dprod_ref, dgpre_ref, dgin_ref,
                          dgpre_scr, dgin_scr, *, num_blocks, stats_T,
                          row_split=1):
    """Pass 1 with the forward-stored h and LN statistics: identical math
    to _bwd_dx_kernel but the x@w_in recompute is replaced by a read of h
    and every cotangent-independent row reduction (pre-LN mean/var of x,
    inner-LN mean/var of the GEGLU product) by an elementwise reuse of
    the stored mean/inv. Also emits dprod (storage dtype) so pass 2 can
    skip the dy = do@w_out^T dot and the inner-LN backward entirely.

    `row_split` > 1 computes the tile in that many independent row slices:
    each row's math is self-contained, and splitting breaks the tile's
    serial MXU-dot → VPU-elementwise → MXU-dot dependency chain into
    independent per-slice chains the Mosaic scheduler can overlap
    (slice k's GEGLU/LN backward against slice k+1's dy dot)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dgpre_scr[...] = jnp.zeros_like(dgpre_scr)
        dgin_scr[...] = jnp.zeros_like(dgin_scr)

    rows = x_ref.shape[0]
    assert rows % row_split == 0
    step = rows // row_split
    mp_a, ip_a, mi_a, ii_a = _unpack_stats(stats_ref[...], stats_T)
    for s in range(row_split):
        sl = slice(s * step, (s + 1) * step)
        dx, dprod, dgpre_t, dgin_t = _p1_stored_core(
            x_ref[sl], do_ref[sl], gpre_ref[...], gin_ref[...],
            win_ref[...], wout_ref[...], h_ref[sl],
            mp_a[sl], ip_a[sl], mi_a[sl], ii_a[sl])
        dx_ref[sl] = dx
        dprod_ref[sl] = dprod
        dgpre_scr[...] += dgpre_t
        dgin_scr[...] += dgin_t

    @pl.when(i == num_blocks - 1)
    def _emit():
        dgpre_ref[...] = dgpre_scr[...]
        dgin_ref[...] = dgin_scr[...]


def _p1_geglu_core(x, do, gpre, gin, win, wout, prod_raw, gb_raw, agdb_raw,
                   mp, ip, mi, ii):
    """store_h='geglu' pass-1 math on one 2D tile: the GEGLU triple is read
    (no h, no erf/exp — da and db are two multiplies), both LNs are
    elementwise stored-stat reuses. Returns (dx, dprod_cast, dgpre_tile,
    dgin_tile); the only row reductions left are cotangent-dependent."""
    do32 = do.astype(jnp.float32)
    gpre32 = gpre.astype(jnp.float32)
    gin32 = gin.astype(jnp.float32)

    x32 = x.astype(jnp.float32)
    xhat_pre = (x32 - mp) * ip
    prod = prod_raw.astype(jnp.float32)
    xhat_in = (prod - mi) * ii

    dy = jax.lax.dot_general(do, wout, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dgin_tile = jnp.sum(dy * xhat_in, axis=0, keepdims=True)

    dyg = dy * gin32
    m1 = jnp.mean(dyg, axis=-1, keepdims=True)
    m2 = jnp.mean(dyg * xhat_in, axis=-1, keepdims=True)
    dprod = ii * (dyg - m1 - xhat_in * m2)

    da = dprod * gb_raw.astype(jnp.float32)
    db = dprod * agdb_raw.astype(jnp.float32)
    dh = jnp.concatenate([da, db], axis=-1).astype(x.dtype)
    dxn = jax.lax.dot_general(dh, win, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)

    dgpre_tile = jnp.sum(dxn * xhat_pre, axis=0, keepdims=True)

    dyg2 = dxn * gpre32
    p1 = jnp.mean(dyg2, axis=-1, keepdims=True)
    p2 = jnp.mean(dyg2 * xhat_pre, axis=-1, keepdims=True)
    dx = ip * (dyg2 - p1 - xhat_pre * p2) + do32
    return (dx.astype(x.dtype), dprod.astype(x.dtype),
            dgpre_tile, dgin_tile)


def _bwd_dx_kernel_geglu(x_ref, gpre_ref, win_ref, gin_ref, wout_ref,
                         do_ref, prod_ref, gb_ref, agdb_ref, stats_ref,
                         dx_ref, dprod_ref, dgpre_ref, dgin_ref,
                         dgpre_scr, dgin_scr, *, num_blocks, stats_T):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dgpre_scr[...] = jnp.zeros_like(dgpre_scr)
        dgin_scr[...] = jnp.zeros_like(dgin_scr)

    mp, ip, mi, ii = _unpack_stats(stats_ref[...], stats_T)
    dx, dprod, dgpre_t, dgin_t = _p1_geglu_core(
        x_ref[...], do_ref[...], gpre_ref[...], gin_ref[...],
        win_ref[...], wout_ref[...], prod_ref[...], gb_ref[...],
        agdb_ref[...], mp, ip, mi, ii)
    dx_ref[...] = dx
    dprod_ref[...] = dprod
    dgpre_scr[...] += dgpre_t
    dgin_scr[...] += dgin_t

    @pl.when(i == num_blocks - 1)
    def _emit():
        dgpre_ref[...] = dgpre_scr[...]
        dgin_ref[...] = dgin_scr[...]


# ---------------------------------------------------- backward pass 2 (dW)

def _bwd_dw_kernel(x_ref, gpre_ref, wina_ref, winb_ref, gin_ref, wout_ref,
                   do_ref, stats_ref, m12_ref,
                   dwina_ref, dwinb_ref, dwout_ref,
                   dwina_scr, dwinb_scr, dwout_scr,
                   *, num_row_blocks, stats_T):
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _init():
        dwina_scr[...] = jnp.zeros_like(dwina_scr)
        dwinb_scr[...] = jnp.zeros_like(dwinb_scr)
        dwout_scr[...] = jnp.zeros_like(dwout_scr)

    x = x_ref[...]
    do = do_ref[...]
    gpre32 = gpre_ref[...].astype(jnp.float32)
    gin32 = gin_ref[...].astype(jnp.float32)        # (1, cb) column slice
    mp, ip, mean_in, inv_in = _unpack_stats(stats_ref[...], stats_T)
    m1, m2 = _unpack_stats(m12_ref[...], stats_T)

    # pre-LN from the forward-stored stats: without this the kernel
    # re-reduced the x tile once per COLUMN block (×ncb)
    x32 = x.astype(jnp.float32)
    xn = (((x32 - mp) * ip) * gpre32).astype(x.dtype)

    # recompute only this column block of the inner activations
    a = jax.lax.dot_general(xn, wina_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    b = jax.lax.dot_general(xn, winb_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    gelu_b, gelu_db = _gelu_val_grad(b)
    prod = a * gelu_b
    xhat = (prod - mean_in) * inv_in

    # dy over this column block: do @ w_out[cols]^T
    dy = jax.lax.dot_general(do, wout_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dprod = inv_in * (dy * gin32 - m1 - xhat * m2)

    da = (dprod * gelu_b).astype(x.dtype)
    db = (dprod * a * gelu_db).astype(x.dtype)
    y = (xhat * gin32).astype(x.dtype)              # normalized inner · g

    dwina_scr[...] += jax.lax.dot_general(
        xn, da, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dwinb_scr[...] += jax.lax.dot_general(
        xn, db, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dwout_scr[...] += jax.lax.dot_general(
        y, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(r == num_row_blocks - 1)
    def _emit():
        dwina_ref[...] = dwina_scr[...].astype(dwina_ref.dtype)
        dwinb_ref[...] = dwinb_scr[...].astype(dwinb_ref.dtype)
        dwout_ref[...] = dwout_scr[...].astype(dwout_ref.dtype)


def _bwd_dw_kernel_fed(xn_ref, do_ref, da_ref, db_ref, y_ref,
                       dwina_ref, dwinb_ref, dwout_ref,
                       dwina_scr, dwinb_scr, dwout_scr, *, num_row_blocks):
    """Pass 2 fed by pass 1 (_bwd_dx_kernel_fed): every operand arrives
    precomputed in the storage dtype, so the kernel body is exactly the
    three dW dots + fp32 VMEM accumulation — half the MXU work of the
    self-contained _bwd_dw_kernel (which re-derives a/b/dy per column
    block). da/db are column slices of the one (rows, 2·inner) dh tensor
    (offset index maps, like the stored kernel's h halves)."""
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _init():
        dwina_scr[...] = jnp.zeros_like(dwina_scr)
        dwinb_scr[...] = jnp.zeros_like(dwinb_scr)
        dwout_scr[...] = jnp.zeros_like(dwout_scr)

    xn = xn_ref[...]
    dwina_scr[...] += jax.lax.dot_general(
        xn, da_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dwinb_scr[...] += jax.lax.dot_general(
        xn, db_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dwout_scr[...] += jax.lax.dot_general(
        y_ref[...], do_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(r == num_row_blocks - 1)
    def _emit():
        dwina_ref[...] = dwina_scr[...].astype(dwina_ref.dtype)
        dwinb_ref[...] = dwinb_scr[...].astype(dwinb_ref.dtype)
        dwout_ref[...] = dwout_scr[...].astype(dwout_ref.dtype)


def _p2_stored_core(x, do, gpre, gin_slice, ha, hb, dprod_raw,
                    mean_in, inv_in, mean_pre, inv_pre):
    """Stored pass-2 math on one (rows × column-slice) tile: returns the
    (dwina, dwinb, dwout) contributions of this row block. The pre-LN is
    an elementwise reuse of the forward-stored mean_pre/inv_pre — without
    it this kernel re-reduced the x tile once per COLUMN block (×ncb)."""
    gpre32 = gpre.astype(jnp.float32)
    gin32 = gin_slice.astype(jnp.float32)

    x32 = x.astype(jnp.float32)
    xn = (((x32 - mean_pre) * inv_pre) * gpre32).astype(x.dtype)

    a = ha.astype(jnp.float32)
    b = hb.astype(jnp.float32)
    gelu_b, gelu_db = _gelu_val_grad(b)
    prod = a * gelu_b
    xhat = (prod - mean_in) * inv_in

    dprod = dprod_raw.astype(jnp.float32)

    da = (dprod * gelu_b).astype(x.dtype)
    db = (dprod * a * gelu_db).astype(x.dtype)
    y = (xhat * gin32).astype(x.dtype)

    dwina = jax.lax.dot_general(
        xn, da, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dwinb = jax.lax.dot_general(
        xn, db, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dwout = jax.lax.dot_general(
        y, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return dwina, dwinb, dwout


def _bwd_dw_kernel_stored(x_ref, gpre_ref, gin_ref, do_ref,
                          ha_ref, hb_ref, dprod_ref, stats_ref,
                          dwina_ref, dwinb_ref, dwout_ref,
                          dwina_scr, dwinb_scr, dwout_scr,
                          *, num_row_blocks, stats_T):
    """Pass 2 with the forward-stored h, LN statistics, and pass-1-stored
    dprod: the per-column-block a/b recompute (two x@w_in slices) becomes
    reads of h's column slices, the dy = do@w_out^T dot and inner-LN
    backward become a read of dprod, and xn is an ELEMENTWISE stored-stat
    LN of the x tile — leaving only the three dW dots as matmul work."""
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _init():
        dwina_scr[...] = jnp.zeros_like(dwina_scr)
        dwinb_scr[...] = jnp.zeros_like(dwinb_scr)
        dwout_scr[...] = jnp.zeros_like(dwout_scr)

    mp, ip, mi, ii = _unpack_stats(stats_ref[...], stats_T)
    dwina, dwinb, dwout = _p2_stored_core(
        x_ref[...], do_ref[...], gpre_ref[...], gin_ref[...],
        ha_ref[...], hb_ref[...], dprod_ref[...],
        mi, ii, mp, ip)
    dwina_scr[...] += dwina
    dwinb_scr[...] += dwinb
    dwout_scr[...] += dwout

    @pl.when(r == num_row_blocks - 1)
    def _emit():
        dwina_ref[...] = dwina_scr[...].astype(dwina_ref.dtype)
        dwinb_ref[...] = dwinb_scr[...].astype(dwinb_ref.dtype)
        dwout_ref[...] = dwout_scr[...].astype(dwout_ref.dtype)


def _p2_geglu_core(x, do, gpre, gin_slice, prod_s, gb_s, agdb_s, dprod_raw,
                   mean_in, inv_in, mean_pre, inv_pre):
    """store_h='geglu' pass-2 math on one (rows × column-slice) tile: like
    _p2_stored_core but the GEGLU triple slices replace ha/hb — no gelu
    recompute; the tile is pure multiplies plus the three dW dots."""
    gpre32 = gpre.astype(jnp.float32)
    gin32 = gin_slice.astype(jnp.float32)

    x32 = x.astype(jnp.float32)
    xn = (((x32 - mean_pre) * inv_pre) * gpre32).astype(x.dtype)

    prod = prod_s.astype(jnp.float32)
    xhat = (prod - mean_in) * inv_in
    dprod = dprod_raw.astype(jnp.float32)

    da = (dprod * gb_s.astype(jnp.float32)).astype(x.dtype)
    db = (dprod * agdb_s.astype(jnp.float32)).astype(x.dtype)
    y = (xhat * gin32).astype(x.dtype)

    dwina = jax.lax.dot_general(
        xn, da, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dwinb = jax.lax.dot_general(
        xn, db, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dwout = jax.lax.dot_general(
        y, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return dwina, dwinb, dwout


def _bwd_dw_kernel_geglu(x_ref, gpre_ref, gin_ref, do_ref,
                         prod_ref, gb_ref, agdb_ref, dprod_ref, stats_ref,
                         dwina_ref, dwinb_ref, dwout_ref,
                         dwina_scr, dwinb_scr, dwout_scr,
                         *, num_row_blocks, stats_T):
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _init():
        dwina_scr[...] = jnp.zeros_like(dwina_scr)
        dwinb_scr[...] = jnp.zeros_like(dwinb_scr)
        dwout_scr[...] = jnp.zeros_like(dwout_scr)

    mp, ip, mi, ii = _unpack_stats(stats_ref[...], stats_T)
    dwina, dwinb, dwout = _p2_geglu_core(
        x_ref[...], do_ref[...], gpre_ref[...], gin_ref[...],
        prod_ref[...], gb_ref[...], agdb_ref[...], dprod_ref[...],
        mi, ii, mp, ip)
    dwina_scr[...] += dwina
    dwinb_scr[...] += dwinb
    dwout_scr[...] += dwout

    @pl.when(r == num_row_blocks - 1)
    def _emit():
        dwina_ref[...] = dwina_scr[...].astype(dwina_ref.dtype)
        dwinb_ref[...] = dwinb_scr[...].astype(dwinb_ref.dtype)
        dwout_ref[...] = dwout_scr[...].astype(dwout_ref.dtype)


# --------------------------------------------------------------- custom vjp

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def ff_block(x, g_pre, w_in, g_inner, w_out,
             block_rows=DEFAULT_BLOCK_ROWS, block_cols=512, interpret=None,
             store_h=False):
    """x: (..., d); g_pre: (d,); w_in: (d, 2·inner); g_inner: (inner,);
    w_out: (inner, d). Returns x + FF(LN(x)) with the whole block fused.
    Differentiable w.r.t. all five tensor arguments. `store_h=True` keeps
    the (rows, 2·inner) pre-GEGLU activation (storage dtype) as a backward
    residual instead of recomputing it twice; `store_h='geglu'` stores the
    (rows, 3·inner) GEGLU triple (prod, gelu(b), a·gelu'(b)) instead,
    removing every transcendental from both backward passes — see module
    docstring."""
    out, _ = _ff_block_fwd(x, g_pre, w_in, g_inner, w_out,
                           block_rows, block_cols, interpret, store_h,
                           need_residuals=False)
    return out


def _resolve_interpret(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def _flatten_pad(x, block_rows):
    *lead, d = x.shape
    rows = 1
    for s in lead:
        rows *= s
    x2 = x.reshape(rows, d)
    rows_pad = _round_up(rows, block_rows)
    if rows_pad != rows:
        x2 = jnp.pad(x2, ((0, rows_pad - rows), (0, 0)))
    return x2, rows, lead


def pick_block_cols(inner: int, block_cols: int = 512):
    """Largest divisor of the inner width ≤ block_cols (the dW pass needs
    column blocks that tile the inner dim exactly). None if no usable
    divisor ≥ 8 exists — callers fall back to the XLA path."""
    for bc in range(min(block_cols, inner), 7, -1):
        if inner % bc == 0:
            return bc
    return None


def supported(dim: int, inner: int) -> bool:
    return pick_block_cols(inner) is not None


def _p1_fed_vmem_bytes(block_rows: int, d: int, two_inner: int,
                       itemsize: int) -> int:
    """Scoped-VMEM stack estimate for the FED pass-1 kernel: weight
    matrices (single-buffered — constant index map), double-buffered
    row-tile IO (x/do in; dx/dh/y/xn out), and the fp32 body temporaries
    (h, the GELU value/derivative pair, dy, x̂_in, dprod, the da‖db
    concat, y, plus three d-wide fp32 rows). Calibrated against the
    compiler's reported 36.85 MiB at (128, 768, 6144, bf16) — the 1.08
    factor covers what this accounting misses there (~3%) plus margin."""
    inner = two_inner // 2
    weights = (d * two_inner + inner * d) * itemsize
    io = 2 * itemsize * block_rows * (4 * d + two_inner + inner)
    body = 4 * block_rows * (3 * two_inner + 4 * inner + 3 * d)
    return int(1.08 * (weights + io + body))


def _p2_fed_choice(rows_pad: int, d: int, two_inner: int, dtype,
                   block_rows: int, interpret: bool, min_rows: int = 32,
                   fwd_block_rows: int = None):
    """Whether the recompute backward runs its dW pass FED by pass 1
    (pass 1 emits dh/y/xn; pass 2 is pure dW dots at half the MXU work —
    +20% at the dim-768 b128 shape) vs SELF-CONTAINED (pass 2 re-derives
    a/b/dy per column block). Returns (fed, pass1_block_rows, n_chunks).

    Two gates:
      * HBM: the hand-off tensor is (rows, 2·inner + inner + d) in the
        storage dtype, alive only between the two passes of ONE layer's
        backward — unlike the store_h forward residual it never
        multiplies by depth, but at the 32k-batch shard (557k rows) it
        would be ~6.9 GB in one piece. Single-shot below
        XCLIP_FF_P2_FED_MAX_MB (1024 — covers the dim-768 b128 text
        tower's 663 MB); above it, CHUNKED: the row range is split into
        the fewest equal chunks (each a multiple of the forward tile,
        dividing rows_pad) whose hand-off stays under
        XCLIP_FF_P2_FED_CHUNK_MB (256 — ~6.7 MB/step of extra HBM at the
        32k shard), and the backward runs the pass-1/pass-2 pair
        per-chunk, serialized so one hand-off is alive at a time.
        XCLIP_FF_P2_FED_CHUNKED=0 disables chunking (falls back to
        self-contained above MAX_MB).
      * scoped VMEM: the fed pass 1 carries ~5 MiB more of double-
        buffered outputs than the self-contained kernel (36.85 vs ~32 MiB
        at dim-768's 128-row tile) — if the estimate exceeds the active
        limit, the row tile is halved while it still divides rows_pad
        and stays >= min_rows (128 when the forward stored TRANSPOSED
        (k, rows) stats: their block's LANE dim is the row tile, which
        Mosaic requires 128-divisible — measured lowering failure at
        br=64, dim-768 b128, 32 MiB); if even the smallest legal tile
        doesn't fit, fall back to self-contained. XCLIP_FF_P2_FED=0
        forces off; =1 forces on, single-shot (the tile still
        auto-halves to fit).
    """
    mode = os.environ.get("XCLIP_FF_P2_FED", "auto")
    if mode == "0":
        return False, block_rows, 1
    itemsize = jnp.dtype(dtype).itemsize
    fwd_block_rows = fwd_block_rows or block_rows
    n_chunks = 1
    if mode != "1":
        transient_mb = (rows_pad * (two_inner + two_inner // 2 + d)
                        * itemsize / 2**20)
        if transient_mb > float(
                os.environ.get("XCLIP_FF_P2_FED_MAX_MB", "1024")):
            if os.environ.get("XCLIP_FF_P2_FED_CHUNKED", "1") == "0":
                return False, block_rows, 1
            chunk_mb = float(
                os.environ.get("XCLIP_FF_P2_FED_CHUNK_MB", "256"))
            want = max(2, math.ceil(transient_mb / chunk_mb))
            n_chunks = 0
            for n in range(want, min(want + 229, rows_pad) + 1):
                if (rows_pad % n == 0
                        and (rows_pad // n) % fwd_block_rows == 0):
                    n_chunks = n
                    break
            if not n_chunks:
                return False, block_rows, 1
    if interpret:  # no VMEM on the CPU interpreter
        return True, block_rows, n_chunks
    limit = scoped_vmem_limit_bytes()
    br = block_rows
    while (_p1_fed_vmem_bytes(br, d, two_inner, itemsize) > limit
           and br > min_rows and br % 2 == 0
           and (br // 2) % min_rows == 0
           and rows_pad % (br // 2) == 0):
        br //= 2
    if _p1_fed_vmem_bytes(br, d, two_inner, itemsize) > limit:
        return mode == "1", br, n_chunks  # forced: let the compiler try
    return True, br, n_chunks


def _clamp_blocks(x, w_in, block_rows, block_cols):
    inner = w_in.shape[-1] // 2
    block_cols = pick_block_cols(inner, block_cols)
    assert block_cols is not None, (inner,)
    if x.dtype == jnp.float32:
        # fp32 doubles every VMEM-resident tensor; halve the row tile
        block_rows = max(8, block_rows // 2)
    return block_rows, block_cols


def _ff_block_fwd(x, g_pre, w_in, g_inner, w_out,
                  block_rows, block_cols, interpret, store_h=False,
                  need_residuals=True):
    interpret = _resolve_interpret(interpret)
    block_rows, block_cols = _clamp_blocks(x, w_in, block_rows, block_cols)
    x2, rows, lead = _flatten_pad(x, block_rows)
    if not need_residuals:  # primal-only (inference): leanest forward
        out = _ff_block_fwd_call(x2, g_pre, w_in, g_inner, w_out,
                                 block_rows, interpret)
        return out[:rows].reshape(x.shape), None
    if store_h == 'geglu':
        out, prod2, gb2, agdb2, stats = _ff_block_fwd_store_call(
            x2, g_pre, w_in, g_inner, w_out, block_rows, interpret,
            geglu=True)
        return (out[:rows].reshape(x.shape),
                (x, g_pre, w_in, g_inner, w_out,
                 (prod2, gb2, agdb2, stats)))
    if store_h:
        out, h2, stats = _ff_block_fwd_store_call(
            x2, g_pre, w_in, g_inner, w_out, block_rows, interpret)
        # h/stats stay flat-padded: the backward re-pads x to the same layout
        return (out[:rows].reshape(x.shape),
                (x, g_pre, w_in, g_inner, w_out, (h2, stats)))
    # recompute variant: still emit the four fp32 per-row LN stats (16
    # bytes/row, packed (4, rows)) so both backward passes get elementwise
    # LayerNorms (VERDICT r4 #2)
    out, stats = _ff_block_fwd_call(
        x2, g_pre, w_in, g_inner, w_out, block_rows, interpret,
        need_stats=True)
    return (out[:rows].reshape(x.shape),
            (x, g_pre, w_in, g_inner, w_out, (stats,)))


def _ff_block_bwd_fed(x, x2, do2, g_pre, w_in, g_inner, w_out, f_stats,
                      rows, rows_pad, block_rows, block_cols,
                      fwd_block_rows, stats_T, n_chunks, interpret):
    """The FED recompute backward (see _p2_fed_choice): pass 1 emits the
    dh/y/xn operands it already materialized, pass 2 is pure dW dots. Run
    over `n_chunks` equal row ranges — inputs are never sliced (the chunk
    is addressed through BlockSpec index-map offsets over the full
    arrays); per-chunk outputs are dx (written back into one buffer via
    dynamic_update_slice) and fp32 dW/dg partials (summed). Chunks are
    serialized with an optimization_barrier tying chunk c's pass 1 to
    chunk c-1's dW partial, so exactly one hand-off is alive at a time —
    the HBM high-water mark is one chunk (~XCLIP_FF_P2_FED_CHUNK_MB), not
    the 6.9 GB a single-shot hand-off would cost at the 32k-batch shard."""
    d = x.shape[-1]
    two_inner = w_in.shape[-1]
    inner = two_inner // 2
    ncb = inner // block_cols
    assert inner % block_cols == 0, (inner, block_cols)
    chunk_rows = rows_pad // n_chunks
    assert chunk_rows % block_rows == 0, (chunk_rows, block_rows)
    nbc = chunk_rows // block_rows
    # pass 2 at the full forward tile (or double when the chunk allows) —
    # same policy as the stored path
    brows2 = fwd_block_rows
    if chunk_rows % (2 * fwd_block_rows) == 0:
        brows2 = 2 * fwd_block_rows
    nb2c = chunk_rows // brows2

    dw_out_specs = [
        pl.BlockSpec((d, block_cols), lambda j, r: (0, j)),
        pl.BlockSpec((d, block_cols), lambda j, r: (0, j)),
        pl.BlockSpec((block_cols, d), lambda j, r: (j, 0)),
    ]
    dw_out_shape = [
        jax.ShapeDtypeStruct((d, inner), jnp.float32),
        jax.ShapeDtypeStruct((d, inner), jnp.float32),
        jax.ShapeDtypeStruct((inner, d), jnp.float32),
    ]
    dw_scratch = [
        pltpu.VMEM((d, block_cols), jnp.float32),
        pltpu.VMEM((d, block_cols), jnp.float32),
        pltpu.VMEM((block_cols, d), jnp.float32),
    ]

    def run_chunk(c, x2c, do2c):
        off1 = c * nbc  # pass-1 row-block offset into the full arrays
        row_in = lambda w: pl.BlockSpec((block_rows, w),
                                        lambda i, o=off1: (i + o, 0))
        out_row = lambda w: pl.BlockSpec((block_rows, w), lambda i: (i, 0))
        if stats_T:
            sspec = pl.BlockSpec((4, block_rows),
                                 lambda i, o=off1: (0, i + o))
        else:
            sspec = pl.BlockSpec((block_rows, 4),
                                 lambda i, o=off1: (i + o, 0))
        dxc, dh, y, xn, dgpre_c, dgin_c = pl.pallas_call(
            functools.partial(_bwd_dx_kernel_fed, num_blocks=nbc,
                              stats_T=stats_T),
            grid=(nbc,),
            in_specs=[
                row_in(d),
                pl.BlockSpec((1, d), lambda i: (0, 0)),
                pl.BlockSpec((d, two_inner), lambda i: (0, 0)),
                pl.BlockSpec((1, inner), lambda i: (0, 0)),
                pl.BlockSpec((inner, d), lambda i: (0, 0)),
                row_in(d),
                sspec,
            ],
            out_specs=[
                out_row(d), out_row(two_inner), out_row(inner), out_row(d),
                pl.BlockSpec((1, d), lambda i: (0, 0)),
                pl.BlockSpec((1, inner), lambda i: (0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((chunk_rows, d), x.dtype),
                jax.ShapeDtypeStruct((chunk_rows, two_inner), x.dtype),
                jax.ShapeDtypeStruct((chunk_rows, inner), x.dtype),
                jax.ShapeDtypeStruct((chunk_rows, d), x.dtype),
                jax.ShapeDtypeStruct((1, d), jnp.float32),
                jax.ShapeDtypeStruct((1, inner), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((1, d), jnp.float32),
                pltpu.VMEM((1, inner), jnp.float32),
            ],
            interpret=interpret,
        )(x2c, g_pre[None, :], w_in, g_inner[None, :], w_out, do2c,
          f_stats)

        off2 = c * nb2c  # pass-2 row-block offset (do2 is the full array)
        dwina_c, dwinb_c, dwout_c = pl.pallas_call(
            functools.partial(_bwd_dw_kernel_fed, num_row_blocks=nb2c),
            grid=(ncb, nb2c),
            in_specs=[
                pl.BlockSpec((brows2, d), lambda j, r: (r, 0)),
                pl.BlockSpec((brows2, d), lambda j, r, o=off2: (r + o, 0)),
                # dh column slices: da-half then db-half (offset by inner)
                pl.BlockSpec((brows2, block_cols), lambda j, r: (r, j)),
                pl.BlockSpec((brows2, block_cols),
                             lambda j, r: (r, j + ncb)),
                pl.BlockSpec((brows2, block_cols), lambda j, r: (r, j)),
            ],
            out_specs=dw_out_specs,
            out_shape=dw_out_shape,
            scratch_shapes=dw_scratch,
            interpret=interpret,
        )(xn, do2c, dh, dh, y)
        return dxc, dgpre_c, dgin_c, dwina_c, dwinb_c, dwout_c

    if n_chunks == 1:
        dx, dgpre, dgin, dwina, dwinb, dwout = run_chunk(0, x2, do2)
    else:
        dx = jnp.empty((rows_pad, d), x.dtype)
        dgpre = dgin = dwina = dwinb = dwout = None
        x2c, do2c = x2, do2
        for c in range(n_chunks):
            if c:
                # serialize: chunk c's pass 1 waits for chunk c-1's dW so
                # only one dh/y/xn hand-off is alive at a time
                x2c, do2c, _ = jax.lax.optimization_barrier(
                    (x2, do2, dwina))
            dxc, *partials = run_chunk(c, x2c, do2c)
            dx = jax.lax.dynamic_update_slice(dx, dxc,
                                              (c * chunk_rows, 0))
            acc = (dgpre, dgin, dwina, dwinb, dwout)
            dgpre, dgin, dwina, dwinb, dwout = (
                partials if c == 0 else
                [a + p for a, p in zip(acc, partials)])

    dw_in = jnp.concatenate([dwina, dwinb], axis=-1).astype(w_in.dtype)
    return (dx[:rows].reshape(x.shape),
            dgpre[0].astype(g_pre.dtype),
            dw_in,
            dgin[0].astype(g_inner.dtype),
            dwout.astype(w_out.dtype))


def _ff_block_bwd(block_rows, block_cols, interpret, store_h, res, dout):
    x, g_pre, w_in, g_inner, w_out, stored = res
    h2 = prod2 = gb2 = agdb2 = None
    if store_h == 'geglu':
        prod2, gb2, agdb2, f_stats = stored
    elif store_h:
        h2, f_stats = stored
    else:
        (f_stats,) = stored
    interpret = _resolve_interpret(interpret)
    block_rows, block_cols = _clamp_blocks(x, w_in, block_rows, block_cols)
    fwd_block_rows = block_rows
    # the dx pass keeps w_in, w_out, the fp32 h and dh tiles and ~10 smaller
    # temporaries live at once — at (256, 512→4096) that lands 32K over the
    # 16M scoped-vmem limit, so the backward runs at half the forward tile
    # (full-tile pass 1 was tried under a 48MB scoped limit: 1841 vs 1855
    # pairs/s — the halved tile pipelines better; keep it)
    block_rows = max(8, block_rows // 2)
    d = x.shape[-1]
    two_inner = w_in.shape[-1]
    inner = two_inner // 2

    # x/do must match the stored h/stats row padding (the FORWARD tile's
    # round-up — divisible by the halved backward tile, so the grid still
    # tiles exactly and no copy of the residuals is needed)
    pad_unit = fwd_block_rows
    x2, rows, lead = _flatten_pad(x, pad_unit)
    do2, _, _ = _flatten_pad(dout.astype(x.dtype), pad_unit)
    rows_pad = x2.shape[0]
    # recompute path only: decide the dW-pass mode (fed vs self-contained)
    # now — fed may halve the pass-1 row tile to fit its extra output
    # buffers in scoped VMEM (see _p2_fed_choice)
    fed, fed_chunks = False, 1
    if not store_h:
        # transposed-stats blocks put the ROW tile in the lane dim, which
        # Mosaic requires 128-divisible — bound the fed auto-halving there
        min_rows = 128 if _stats_transposed(fwd_block_rows) else 32
        fed, block_rows, fed_chunks = _p2_fed_choice(
            rows_pad, d, two_inner, x.dtype, block_rows, interpret,
            min_rows=min_rows, fwd_block_rows=fwd_block_rows)
    # rows were padded to the FORWARD tile; the halved backward tile must
    # divide that padding exactly or the pass-1 grid silently drops tail
    # rows (nb truncates) — defaults (256→128) are fine, but a custom odd
    # block_rows would not be
    assert rows_pad % block_rows == 0, (
        f"backward block_rows={block_rows} does not divide the "
        f"forward-padded row count {rows_pad} (forward tile "
        f"{fwd_block_rows}); pass a block_rows whose half divides it")
    nb = rows_pad // block_rows
    assert h2 is None or h2.shape[0] == rows_pad, (h2.shape, rows_pad)
    # the forward chose the stats layout from the SAME post-clamp tile
    stats_T = _stats_transposed(fwd_block_rows)
    expect = (4, rows_pad) if stats_T else (rows_pad, 4)
    assert f_stats.shape == expect, (f_stats.shape, expect)

    if stats_T:
        stats_spec = lambda k: pl.BlockSpec((k, block_rows),
                                            lambda i: (0, i))
        stats_shape = lambda k: jax.ShapeDtypeStruct((k, rows_pad),
                                                     jnp.float32)
    else:
        stats_spec = lambda k: pl.BlockSpec((block_rows, k),
                                            lambda i: (i, 0))
        stats_shape = lambda k: jax.ShapeDtypeStruct((rows_pad, k),
                                                     jnp.float32)

    if fed:
        return _ff_block_bwd_fed(
            x, x2, do2, g_pre, w_in, g_inner, w_out, f_stats, rows,
            rows_pad, block_rows, block_cols, fwd_block_rows, stats_T,
            fed_chunks, interpret)

    dx_in_specs = [
        pl.BlockSpec((block_rows, d), lambda i: (i, 0)),
        pl.BlockSpec((1, d), lambda i: (0, 0)),
        pl.BlockSpec((d, two_inner), lambda i: (0, 0)),
        pl.BlockSpec((1, inner), lambda i: (0, 0)),
        pl.BlockSpec((inner, d), lambda i: (0, 0)),
        pl.BlockSpec((block_rows, d), lambda i: (i, 0)),
    ]
    dx_args = [x2, g_pre[None, :], w_in, g_inner[None, :], w_out, do2]
    dx_out_specs = [pl.BlockSpec((block_rows, d), lambda i: (i, 0))]
    dx_out_shape = [jax.ShapeDtypeStruct((rows_pad, d), x.dtype)]
    if store_h == 'geglu':
        kernel1 = functools.partial(_bwd_dx_kernel_geglu, num_blocks=nb,
                                    stats_T=stats_T)
        inner_spec = lambda: pl.BlockSpec((block_rows, inner),
                                          lambda i: (i, 0))
        dx_in_specs += [inner_spec(), inner_spec(), inner_spec(),
                        stats_spec(4)]
        dx_args += [prod2, gb2, agdb2, f_stats]
        dx_out_specs.append(inner_spec())
        dx_out_shape.append(jax.ShapeDtypeStruct((rows_pad, inner), x.dtype))
    elif store_h:
        # measured on the real chip (r4, flagship b256): split=1 2070
        # pairs/s, split=2 2059, split=4 1853 — Mosaic already overlaps
        # the VPU GEGLU/LN backward with the dots at the full tile, and
        # sub-tiling only shrinks the MXU dots. Keep 1; knob retained for
        # other shapes.
        row_split = int(os.environ.get("XCLIP_FF_P1_SPLIT", "1"))
        if block_rows % row_split != 0:
            row_split = 1
        kernel1 = functools.partial(_bwd_dx_kernel_stored, num_blocks=nb,
                                    stats_T=stats_T, row_split=row_split)
        dx_in_specs += [
            pl.BlockSpec((block_rows, two_inner), lambda i: (i, 0)),
            stats_spec(4),
        ]
        dx_args += [h2, f_stats]
        # extra output: dprod for the dW pass (no per-row stats to emit —
        # pass 2 reads the forward-stored ones)
        dx_out_specs.append(pl.BlockSpec((block_rows, inner), lambda i: (i, 0)))
        dx_out_shape.append(jax.ShapeDtypeStruct((rows_pad, inner), x.dtype))
    else:
        dx_in_specs += [stats_spec(4)]
        dx_args += [f_stats]
        kernel1 = functools.partial(_bwd_dx_kernel, num_blocks=nb,
                                    stats_T=stats_T)
        # extra output: only the cotangent-dependent m1/m2 (the LN
        # mean/inv the dW pass needs are forward-stored)
        dx_out_specs += [stats_spec(2)]
        dx_out_shape += [stats_shape(2)]
    dx_out_specs += [
        pl.BlockSpec((1, d), lambda i: (0, 0)),
        pl.BlockSpec((1, inner), lambda i: (0, 0)),
    ]
    dx_out_shape += [
        jax.ShapeDtypeStruct((1, d), jnp.float32),
        jax.ShapeDtypeStruct((1, inner), jnp.float32),
    ]
    outs = pl.pallas_call(
        kernel1,
        grid=(nb,),
        in_specs=dx_in_specs,
        out_specs=dx_out_specs,
        out_shape=dx_out_shape,
        scratch_shapes=[
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.VMEM((1, inner), jnp.float32),
        ],
        interpret=interpret,
    )(*dx_args)
    if store_h:
        dx, dprod2, dgpre, dgin = outs
        m12 = None
    else:
        dx, m12, dgpre, dgin = outs
        dprod2 = None

    # pass 2: dW over (column blocks × row blocks); columns of the inner dim
    # are independent given the per-row stats, so each column block
    # accumulates its dW slice across the sequential row grid
    ncb = inner // block_cols
    assert inner % block_cols == 0, (inner, block_cols)

    # stored path: pass 2 reads precomputed operands instead of the
    # weight matrices, so its VMEM footprint is tiny — run it at the FULL
    # forward row tile (divides rows_pad by construction), doubling the K
    # of the dW dots; when the row count happens to be 512-divisible (it
    # is for both flagship towers once transformer_apply sublane-aligns
    # the sequence), go to K=512
    block_rows2 = fwd_block_rows if store_h else block_rows
    if store_h and rows_pad % (2 * fwd_block_rows) == 0:
        block_rows2 = 2 * fwd_block_rows
    nb2 = rows_pad // block_rows2

    if stats_T:
        stats_spec2 = lambda k: pl.BlockSpec((k, block_rows2),
                                             lambda j, r: (0, r))
    else:
        stats_spec2 = lambda k: pl.BlockSpec((block_rows2, k),
                                             lambda j, r: (r, 0))
    dw_out_specs = [
        pl.BlockSpec((d, block_cols), lambda j, r: (0, j)),
        pl.BlockSpec((d, block_cols), lambda j, r: (0, j)),
        pl.BlockSpec((block_cols, d), lambda j, r: (j, 0)),
    ]
    dw_out_shape = [
        jax.ShapeDtypeStruct((d, inner), jnp.float32),
        jax.ShapeDtypeStruct((d, inner), jnp.float32),
        jax.ShapeDtypeStruct((inner, d), jnp.float32),
    ]
    dw_scratch = [
        pltpu.VMEM((d, block_cols), jnp.float32),
        pltpu.VMEM((d, block_cols), jnp.float32),
        pltpu.VMEM((block_cols, d), jnp.float32),
    ]
    if store_h == 'geglu':
        cspec = lambda: pl.BlockSpec((block_rows2, block_cols),
                                     lambda j, r: (r, j))
        dwina, dwinb, dwout = pl.pallas_call(
            functools.partial(_bwd_dw_kernel_geglu, num_row_blocks=nb2,
                              stats_T=stats_T),
            grid=(ncb, nb2),
            in_specs=[
                pl.BlockSpec((block_rows2, d), lambda j, r: (r, 0)),
                pl.BlockSpec((1, d), lambda j, r: (0, 0)),
                pl.BlockSpec((1, block_cols), lambda j, r: (0, j)),
                pl.BlockSpec((block_rows2, d), lambda j, r: (r, 0)),
                cspec(), cspec(), cspec(), cspec(),
                stats_spec2(4),
            ],
            out_specs=dw_out_specs,
            out_shape=dw_out_shape,
            scratch_shapes=dw_scratch,
            interpret=interpret,
        )(x2, g_pre[None, :], g_inner[None, :], do2,
          prod2, gb2, agdb2, dprod2, f_stats)
    elif store_h:
        dwina, dwinb, dwout = pl.pallas_call(
            functools.partial(_bwd_dw_kernel_stored, num_row_blocks=nb2,
                              stats_T=stats_T),
            grid=(ncb, nb2),
            in_specs=[
                pl.BlockSpec((block_rows2, d), lambda j, r: (r, 0)),
                pl.BlockSpec((1, d), lambda j, r: (0, 0)),
                pl.BlockSpec((1, block_cols), lambda j, r: (0, j)),
                pl.BlockSpec((block_rows2, d), lambda j, r: (r, 0)),
                # h column slices: a-half then b-half (offset by inner)
                pl.BlockSpec((block_rows2, block_cols), lambda j, r: (r, j)),
                pl.BlockSpec((block_rows2, block_cols),
                             lambda j, r: (r, j + ncb)),
                pl.BlockSpec((block_rows2, block_cols), lambda j, r: (r, j)),
                stats_spec2(4),
            ],
            out_specs=dw_out_specs,
            out_shape=dw_out_shape,
            scratch_shapes=dw_scratch,
            interpret=interpret,
        )(x2, g_pre[None, :], g_inner[None, :], do2, h2, h2, dprod2,
          f_stats)
    else:
        w_in_a, w_in_b = w_in[:, :inner], w_in[:, inner:]
        dwina, dwinb, dwout = pl.pallas_call(
            functools.partial(_bwd_dw_kernel, num_row_blocks=nb,
                              stats_T=stats_T),
            grid=(ncb, nb),
            in_specs=[
                pl.BlockSpec((block_rows, d), lambda j, r: (r, 0)),
                pl.BlockSpec((1, d), lambda j, r: (0, 0)),
                pl.BlockSpec((d, block_cols), lambda j, r: (0, j)),
                pl.BlockSpec((d, block_cols), lambda j, r: (0, j)),
                pl.BlockSpec((1, block_cols), lambda j, r: (0, j)),
                pl.BlockSpec((block_cols, d), lambda j, r: (j, 0)),
                pl.BlockSpec((block_rows, d), lambda j, r: (r, 0)),
                stats_spec2(4), stats_spec2(2),
            ],
            out_specs=dw_out_specs,
            out_shape=dw_out_shape,
            scratch_shapes=dw_scratch,
            interpret=interpret,
        )(x2, g_pre[None, :], w_in_a, w_in_b, g_inner[None, :], w_out, do2,
          f_stats, m12)

    dw_in = jnp.concatenate([dwina, dwinb], axis=-1).astype(w_in.dtype)
    return (dx[:rows].reshape(x.shape),
            dgpre[0].astype(g_pre.dtype),
            dw_in,
            dgin[0].astype(g_inner.dtype),
            dwout.astype(w_out.dtype))


ff_block.defvjp(
    lambda x, g_pre, w_in, g_inner, w_out, block_rows, block_cols, interpret,
           store_h:
        _ff_block_fwd(x, g_pre, w_in, g_inner, w_out, block_rows, block_cols,
                      interpret, store_h),
    _ff_block_bwd)
