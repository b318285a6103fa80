"""Whole-attention-block Pallas TPU kernel: PreNorm LayerNorm → fused qkv
projection → per-head attention → output projection → output LayerNorm →
residual, one batch element per grid step, entirely in VMEM.

This subsumes kernels/attention_block.py for the non-rotary case (the
dominant one: the flagship text tower uses absolute positions, the vision
tower always). Relative to that kernel it additionally absorbs the qkv
matmul, the output projection, both LayerNorms, and the residual add — per
layer the only HBM traffic is x in, out out, and the weights (resident
across the sequential grid), plus the stored residuals below.

Three backward variants (`store_qkv`):

  * STORED, `store_qkv=True` (the training default where VMEM allows):
    the forward also emits qkv, attnout, and the pre-LN projection
    (storage dtype); the backward reads them — no LN+qkv, p@v, or
    projection recompute — and emits dqkv per batch element instead of
    accumulating dW_qkv in VMEM (the caller computes
    dW_qkv = LN(x)^T @ dqkv as one large XLA dot).
  * QKV-ONLY, `store_qkv="qkv"` (`attn_impl='fused_qkv'`): the forward
    emits ONLY qkv (+ the fp32 row stats); the backward reads it instead
    of re-deriving LN + xn@w_qkv — the single largest dot of the
    recompute backward (2·n·dim·3·hd FLOPs/row vs an O(n·3hd) read) —
    while keeping the recompute variant's in-VMEM dW accumulation (no
    dqkv round-trip through HBM). The middle point on the speed/HBM
    curve: O(b·n·3hd) residual per layer vs full-store's O(b·n·5hd) —
    built for the dim-768 class where full-store residuals blow HBM but
    qkv alone fits (docs/SCALING.md).
  * RECOMPUTE (`attn_impl='fused_recompute'`, inference, or tight VMEM):
    a SINGLE kernel per layer re-derives everything and accumulates
    dW_qkv/dW_out as constant-index fp32 output blocks — no O(b·n·hd)
    residuals in HBM, the memory-lean choice for large batches
    (docs/SCALING.md has the measured budgets).

`supported()` gates both on the ACTIVE Mosaic scoped-VMEM limit.

Semantics match `nn.layers.attention_apply`'s XLA path (key-padding +
causal masks, fp32 softmax, scale on scores, dtype-eps LayerNorms, fp32 LN
statistics). Arrays are UNPADDED: the pallas_call uses 128-aligned blocks
on true (b, n, ·) shapes (partial-block writes hardware-masked, garbage
reads zeroed in-kernel — see _fwd_common); only the first `n_rows`
(16-aligned) rows are computed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ._common import (NEG_INF as _NEG_INF, eps_for as _eps_for,
                      ln_bwd as _ln_bwd, ln_fp32 as _ln_fp32,
                      round_up as _round_up,
                      scoped_vmem_limit_bytes as _vmem_limit)


def supported(heads: int, dim_head: int, dim: int, n_pad: int,
              dtype, store_qkv: bool = False) -> bool:
    """VMEM budget check for the (tighter) backward kernel: weights + fp32
    dW accumulators + row tiles + fp32 temporaries + one score matrix,
    gated at 98.4% of the ACTIVE scoped-VMEM limit (the flagship text
    shape — 8×64 heads, dim 512, n_pad 384 — estimates ~15.9MB with the
    bookkeeping margin and compiles under the 24MB limit that
    xclip_tpu/__init__ requests; under a hard 16MB environment the gate
    fails closed and layers fall back to the whole-head kernel).

    `store_qkv=True` (the stored-backward variant): the dW_qkv accumulator
    leaves VMEM (computed outside from the emitted dqkv) but qkv becomes a
    double-buffered input and dqkv a double-buffered output, and the
    forward-stored attnout/proj tiles two more inputs.

    `store_qkv="qkv"` (the qkv-only variant): the recompute budget plus a
    double-buffered stored-qkv input; both dW accumulators stay in VMEM
    and there is no dqkv output.

    The budget tracks the ACTIVE Mosaic scoped-VMEM limit (16MB default;
    bench.py raises it to 24MB via LIBTPU_INIT_ARGS — _common.py)."""
    itemsize = 2 if dtype == jnp.bfloat16 else 4
    inner = heads * dim_head
    weights = (dim * 3 * inner + inner * dim) * itemsize
    dw = (dim * 3 * inner + inner * dim) * 4
    row_tiles = 6 * n_pad * dim * itemsize          # x/do/dx double-buffered
    qkv_tiles = 2 * n_pad * 3 * inner * itemsize    # qkv + dqkv
    f32_tmp = 5 * n_pad * dim * 4 + 2 * n_pad * n_pad * 4
    f32_tmp += 2 * n_pad * (2 * heads + 4) * 4      # fp32 row stats input
    if store_qkv == "qkv":
        # recompute-variant budget + the stored-qkv input double-buffered
        # (the in-kernel qkv temporary it replaces is already counted)
        qkv_tiles += 2 * n_pad * 3 * inner * itemsize
    elif store_qkv:
        dw = inner * dim * 4                        # only dW_out stays
        qkv_tiles *= 2                              # both double-buffered
        qkv_tiles += 4 * n_pad * dim * itemsize     # attnout + proj inputs
    # partial-block DMA bookkeeping measured ~0.4MB beyond the tile
    # arithmetic ON THE STORED-BACKWARD variant (it compiled at 16.16M when
    # this estimated 15.75M) — margin applies only there: the recompute
    # variant at the flagship shape (~15.9MB est) is known to compile and
    # run under a hard 16MB limit (rounds 1-2 shipped it), and charging it
    # the margin would silently downgrade it to the whole-head kernel
    # whenever the 24MB request could not apply (ADVICE r3)
    bookkeeping = 512 * 1024 if store_qkv else 0
    total = weights + dw + row_tiles + qkv_tiles + f32_tmp + bookkeeping
    return total < 0.984 * _vmem_limit()


def _masked_scores(q, k, mask_row, scale, causal):
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    valid = jnp.broadcast_to(mask_row > 0, s.shape)
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        valid = valid & (cols <= rows)
    return jnp.where(valid, s, _NEG_INF)


def _dot(a, b, *, ta=False, tb=False):
    dims = (((0 if ta else 1,), (1 if tb else 0,)), ((), ()))
    return jax.lax.dot_general(a, b, dims,
                               preferred_element_type=jnp.float32)


def _delta_all_heads(dattn, attnout, heads, dim_head, scale):
    """Softmax-backward row term δ_h = scale·Σ_d(do_h ⊙ o_h) for ALL heads
    at once: one full-lane (n, h·d) multiply + one tiny MXU dot against a
    block-diagonal 0/1 selector, replacing `heads` separate 64-lane VPU
    rowsums (sub-128-lane reductions waste half the VPU). Returns
    (n, heads) fp32, scale folded in."""
    hd = heads * dim_head
    elprod = dattn * attnout.astype(jnp.float32)       # (n, hd) fp32
    sel = (jax.lax.broadcasted_iota(jnp.int32, (hd, heads), 0) // dim_head
           == jax.lax.broadcasted_iota(jnp.int32, (hd, heads), 1))
    sel = sel.astype(jnp.float32) * scale
    return jax.lax.dot_general(elprod, sel, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dead_rows(mask_row, causal, n_rows, n_real):
    """(n_rows, 1) bool: rows with NO valid key, plus the uniform row
    (1, n_rows) used as their XLA-parity probability — computed from the
    mask ONCE per program (head-independent), not from per-head score
    maxima. A dead row arises from an all-padding caption; XLA softmaxes
    its constant -finfo.max scores into UNIFORM weights over the real
    columns, and its `where` mask passes zero gradient to the scores."""
    mvalid = (mask_row > 0).astype(jnp.int32)               # (1, n_rows)
    if causal:
        dead = (jnp.cumsum(mvalid, axis=-1) == 0).reshape(-1, 1)
    else:
        dead = jnp.broadcast_to(jnp.max(mvalid) == 0, (n_rows, 1))
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, n_rows), 1)
    uniform = (cols < n_real).astype(jnp.float32)
    return dead, uniform


def _fwd_common(x, gpre32, wqkv, mask_row, scale, causal, heads, dim_head,
                n_rows, eps, n_real, maybe_dead, qkv=None, need_o=True,
                stats=None, collect_stats=False):
    """Shared fwd recompute: returns (xhat_pre, inv_pre, xn, qkv,
    per-head (q, k, v, p, o) list, attnout, dead, row_valid, stats_parts).
    When `qkv` is given (forward-stored variant), the xn@w_qkv dot is
    skipped and xn is returned as None.

    `stats` (fp32 (n_rows, 2·heads+4), the forward-stored row statistics —
    cols [0:h) per-head softmax max m, [h:2h) normalizer l, then mean_pre /
    inv_pre / mean_o / inv_o): every VPU row REDUCTION (softmax max+sum,
    pre-LN mean/var) is replaced by elementwise reuse of the stored value —
    p = exp(s−m)/l and xhat = (x−mean)·inv are bitwise the forward's.
    Garbage rows (partial-block DMA beyond n_real) are sanitized to
    neutral (m=0, l=1, mean=0, inv=1) so they stay finite; their dqkv/dx
    rows are provably zero (do/qkv are zeroed) and never written anyway.
    `collect_stats` makes the fresh-compute path also return
    (mean_pre, inv_pre, ms, ls) for the forward to store.

    The kernel runs on UNPADDED (b, n, dim) arrays with an n_pad-sized
    block: rows/cols in [n_real, n_rows) hold whatever the partial-block
    DMA left there (possibly NaN), so they are zeroed here ONCE per
    program — qkv rows (kills garbage q/k/v), the mask's tail columns, and
    xhat_pre rows (the dgpre accumulation would otherwise read them).
    Output writes beyond n_real are hardware-masked."""
    # STATIC partial-block test: when the 16-aligned row count equals the
    # true row count (the flagship towers after sublane alignment), there
    # are NO garbage rows inside [:n_rows] and every sanitizing `where`
    # below is a provable no-op — skip them at trace time (they are
    # full-width VPU selects, several per program)
    partial = n_real < n_rows
    row_valid = (jax.lax.broadcasted_iota(jnp.int32, (n_rows, 1), 0)
                 < n_real) if partial else None
    # zeroing x BEFORE the LN makes xhat_pre/xn naturally zero in the
    # garbage rows (one where instead of two — the bwd kernel sits ~150K
    # from the scoped-VMEM limit at the flagship shape)
    x32 = x[:n_rows].astype(jnp.float32)
    if partial:
        x32 = jnp.where(row_valid, x32, 0.0)
    if stats is not None:
        mean_pre = stats[:, 2 * heads:2 * heads + 1]
        inv_pre = stats[:, 2 * heads + 1:2 * heads + 2]
        if partial:
            mean_pre = jnp.where(row_valid, mean_pre, 0.0)
            inv_pre = jnp.where(row_valid, inv_pre, 1.0)
        xhat_pre = (x32 - mean_pre) * inv_pre
        # the recompute-backward variant passes stats but NOT a stored qkv:
        # it still needs xn for the qkv dot (elementwise from the stats)
        xn32 = xhat_pre * gpre32 if qkv is None else None
    elif collect_stats:
        # inline _ln_fp32 (same op sequence, bit-identical) to also keep
        # the mean for storage
        mean_pre = jnp.mean(x32, axis=-1, keepdims=True)
        c_pre = x32 - mean_pre
        var_pre = jnp.mean(c_pre * c_pre, axis=-1, keepdims=True)
        inv_pre = jax.lax.rsqrt(var_pre + eps)
        xhat_pre = c_pre * inv_pre
        xn32 = xhat_pre * gpre32
    else:
        xn32, xhat_pre, inv_pre = _ln_fp32(x32, gpre32, eps)
    if qkv is None:
        xn = xn32.astype(x.dtype)
        qkv = _dot(xn, wqkv).astype(x.dtype)      # (n_rows, 3·h·d)
    else:
        xn = None
        qkv = qkv[:n_rows]
        if partial:
            qkv = jnp.where(row_valid, qkv, 0)
        qkv = qkv.astype(x.dtype)
    mask_row = mask_row[:, :n_rows]               # keys exist for n_rows only
    if partial:
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, n_rows), 1)
        mask_row = jnp.where(col_iota < n_real, mask_row, 0)
    dead = uniform = None
    if maybe_dead:
        dead, uniform = _dead_rows(mask_row, causal, n_rows, n_real)
    hd = heads * dim_head
    if stats is not None:
        sm_m = stats[:, 0:heads]
        sm_l = stats[:, heads:2 * heads]
        if partial:
            sm_m = jnp.where(row_valid, sm_m, 0.0)
            sm_l = jnp.where(row_valid, sm_l, 1.0)
    po = []
    ms, ls = [], []
    for h in range(heads):
        q = qkv[:, h * dim_head:(h + 1) * dim_head]
        k = qkv[:, hd + h * dim_head:hd + (h + 1) * dim_head]
        v = qkv[:, 2 * hd + h * dim_head:2 * hd + (h + 1) * dim_head]
        s = _masked_scores(q, k, mask_row, scale, causal)
        if stats is not None:
            m = sm_m[:, h:h + 1]
            if maybe_dead:
                p = jnp.where(dead, uniform, jnp.exp(s - m))
            else:
                p = jnp.exp(s - m)
            p = p / sm_l[:, h:h + 1]
        else:
            m = jnp.max(s, axis=-1, keepdims=True)
            if maybe_dead:
                m = jnp.where(dead, 0.0, m)
                p = jnp.where(dead, uniform, jnp.exp(s - m))
            else:
                p = jnp.exp(s - m)
            l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
            p = p / l
            if collect_stats:
                ms.append(m)
                ls.append(l)
        # need_o=False: caller reads the forward-stored attnout, so the
        # p@v dots are skipped entirely
        o = _dot(p.astype(v.dtype), v) if need_o else None
        po.append((q, k, v, p, o))
    attnout = (jnp.concatenate([o for (_, _, _, _, o) in po],
                               axis=-1).astype(x.dtype) if need_o else None)
    stats_parts = (mean_pre, inv_pre, ms, ls) if collect_stats else None
    return (xhat_pre, inv_pre, xn, qkv, po, attnout, dead, row_valid,
            stats_parts)


def _fwd_kernel(x_ref, gpre_ref, wqkv_ref, wout_ref, gout_ref, mask_ref,
                o_ref, *, scale, causal, heads, dim_head, n_rows, eps,
                n_real, maybe_dead):
    x = x_ref[0]
    gpre32 = gpre_ref[...].astype(jnp.float32)
    gout32 = gout_ref[...].astype(jnp.float32)

    _, _, _, _, po, attnout, _, _, _ = _fwd_common(
        x, gpre32, wqkv_ref[...], mask_ref[0], scale, causal, heads,
        dim_head, n_rows, eps, n_real, maybe_dead)

    proj = _dot(attnout, wout_ref[...])           # fp32 (n_rows, dim)
    y32, _, _ = _ln_fp32(proj, gout32, eps)
    o_ref[0, :n_rows] = y32.astype(o_ref.dtype) + x[:n_rows]


def _fwd_kernel_stats(x_ref, gpre_ref, wqkv_ref, wout_ref, gout_ref,
                      mask_ref, o_ref, stats_ref, *, scale, causal, heads,
                      dim_head, n_rows, eps, n_real, maybe_dead):
    """Recompute-variant forward: emits out plus ONLY the fp32 row
    statistics (per-head softmax max/normalizer + both LN mean/inv —
    (2·heads+4)·4 bytes/row, no O(n·hd) residuals). The recompute backward
    re-derives qkv/p/attnout/proj but reuses these stats elementwise, so
    every cotangent-independent VPU row reduction disappears from it too
    (VERDICT r4 #2)."""
    x = x_ref[0]
    gpre32 = gpre_ref[...].astype(jnp.float32)
    gout32 = gout_ref[...].astype(jnp.float32)

    _, _, _, _, po, attnout, _, _, stats_parts = _fwd_common(
        x, gpre32, wqkv_ref[...], mask_ref[0], scale, causal, heads,
        dim_head, n_rows, eps, n_real, maybe_dead, collect_stats=True)

    proj = _dot(attnout, wout_ref[...])           # fp32 (n_rows, dim)
    # inline _ln_fp32 (bit-identical op sequence) to keep mean_o/inv_o
    mean_o = jnp.mean(proj, axis=-1, keepdims=True)
    c_o = proj - mean_o
    var_o = jnp.mean(c_o * c_o, axis=-1, keepdims=True)
    inv_o = jax.lax.rsqrt(var_o + eps)
    y32 = (c_o * inv_o) * gout32
    o_ref[0, :n_rows] = y32.astype(o_ref.dtype) + x[:n_rows]
    mean_pre, inv_pre, ms, ls = stats_parts
    # stats are stored TRANSPOSED, (n_stats, n): a (n, n_stats) layout
    # pads the 2·heads+4 lanes to 128 (6.4× HBM/DMA waste); as rows they
    # pad only the sublane dim, at the cost of one small transpose here
    # and one in the backward
    stats_ref[0, :, :n_rows] = jnp.concatenate(
        ms + ls + [mean_pre, inv_pre, mean_o, inv_o], axis=-1).T


def _fwd_kernel_qkv(x_ref, gpre_ref, wqkv_ref, wout_ref, gout_ref,
                    mask_ref, o_ref, qkv_ref, stats_ref, *, scale, causal,
                    heads, dim_head, n_rows, eps, n_real, maybe_dead):
    """Qkv-only stored forward: emits out, the fused qkv tensor (storage
    dtype), and the fp32 row statistics — but NOT attnout/proj. The
    backward (_bwd_kernel_qkv) reads qkv instead of re-deriving
    LN + xn@w_qkv and recomputes the (cheaper) p@v / projection dots,
    accumulating both dW matrices in VMEM like the recompute variant."""
    x = x_ref[0]
    gpre32 = gpre_ref[...].astype(jnp.float32)
    gout32 = gout_ref[...].astype(jnp.float32)

    _, _, _, qkv, po, attnout, _, _, stats_parts = _fwd_common(
        x, gpre32, wqkv_ref[...], mask_ref[0], scale, causal, heads,
        dim_head, n_rows, eps, n_real, maybe_dead, collect_stats=True)
    qkv_ref[0, :n_rows] = qkv

    proj = _dot(attnout, wout_ref[...])           # fp32 (n_rows, dim)
    # inline _ln_fp32 (bit-identical op sequence) to keep mean_o/inv_o
    mean_o = jnp.mean(proj, axis=-1, keepdims=True)
    c_o = proj - mean_o
    var_o = jnp.mean(c_o * c_o, axis=-1, keepdims=True)
    inv_o = jax.lax.rsqrt(var_o + eps)
    y32 = (c_o * inv_o) * gout32
    o_ref[0, :n_rows] = y32.astype(o_ref.dtype) + x[:n_rows]
    mean_pre, inv_pre, ms, ls = stats_parts
    # stats stored TRANSPOSED, (n_stats, n) — see _fwd_kernel_stats
    stats_ref[0, :, :n_rows] = jnp.concatenate(
        ms + ls + [mean_pre, inv_pre, mean_o, inv_o], axis=-1).T


def _fwd_kernel_stored(x_ref, gpre_ref, wqkv_ref, wout_ref, gout_ref,
                       mask_ref, o_ref, qkv_ref, attnout_ref, proj_ref,
                       stats_ref, *, scale, causal, heads,
                       dim_head, n_rows, eps, n_real, maybe_dead):
    """Forward that also emits the fused qkv tensor, the concatenated
    attention output, the pre-LN projection (all storage dtype), and the
    fp32 row statistics (per-head softmax max/normalizer + both LN
    mean/inv pairs) so the backward skips the LN + xn@w_qkv, per-head
    p@v, and attnout@w_out recomputes AND every VPU row reduction."""
    x = x_ref[0]
    gpre32 = gpre_ref[...].astype(jnp.float32)
    gout32 = gout_ref[...].astype(jnp.float32)

    _, _, _, qkv, po, attnout, _, _, stats_parts = _fwd_common(
        x, gpre32, wqkv_ref[...], mask_ref[0], scale, causal, heads,
        dim_head, n_rows, eps, n_real, maybe_dead, collect_stats=True)
    qkv_ref[0, :n_rows] = qkv
    attnout_ref[0, :n_rows] = attnout

    proj = _dot(attnout, wout_ref[...])           # fp32 (n_rows, dim)
    proj_ref[0, :n_rows] = proj.astype(x.dtype)
    # inline _ln_fp32 (bit-identical op sequence) to keep mean_o/inv_o
    mean_o = jnp.mean(proj, axis=-1, keepdims=True)
    c_o = proj - mean_o
    var_o = jnp.mean(c_o * c_o, axis=-1, keepdims=True)
    inv_o = jax.lax.rsqrt(var_o + eps)
    y32 = (c_o * inv_o) * gout32
    o_ref[0, :n_rows] = y32.astype(o_ref.dtype) + x[:n_rows]
    mean_pre, inv_pre, ms, ls = stats_parts
    # stats are stored TRANSPOSED, (n_stats, n): a (n, n_stats) layout
    # pads the 2·heads+4 lanes to 128 (6.4× HBM/DMA waste); as rows they
    # pad only the sublane dim, at the cost of one small transpose here
    # and one in the backward
    stats_ref[0, :, :n_rows] = jnp.concatenate(
        ms + ls + [mean_pre, inv_pre, mean_o, inv_o], axis=-1).T


def _bwd_kernel_stored(x_ref, gpre_ref, wqkv_ref, wout_ref, gout_ref,
                       mask_ref, do_ref, qkv_ref, attnout_ref, proj_ref,
                       stats_ref,
                       dx_ref, dqkv_ref, dwout_ref, dgpre_ref, dgout_ref,
                       *, scale, causal, heads, dim_head, n_rows, eps,
                       n_real, maybe_dead):
    """Backward with the forward-stored qkv/attnout/proj/stats: identical
    math to _bwd_kernel but the attention inputs, per-head outputs, and
    projection are read instead of recomputed, every VPU row reduction
    (softmax max/sum, LN mean/var) reuses the forward-stored fp32 value,
    and dW_qkv is NOT accumulated here — dqkv is emitted per batch element
    and the caller computes dW_qkv = LN(x)^T @ dqkv as one large XLA
    matmul (freeing the 3MB fp32 accumulator that made the two variants
    mutually exclusive in VMEM)."""
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        dwout_ref[...] = jnp.zeros_like(dwout_ref)
        dgpre_ref[...] = jnp.zeros_like(dgpre_ref)
        dgout_ref[...] = jnp.zeros_like(dgout_ref)

    x = x_ref[0]
    gpre32 = gpre_ref[...].astype(jnp.float32)
    gout32 = gout_ref[...].astype(jnp.float32)
    hd = heads * dim_head
    stats32 = stats_ref[0][:, :n_rows].T        # stored (n_stats, n)

    xhat_pre, inv_pre, _, _, po, _, dead, row_valid, _ = _fwd_common(
        x, gpre32, wqkv_ref[...], mask_ref[0], scale, causal, heads,
        dim_head, n_rows, eps, n_real, maybe_dead,
        qkv=qkv_ref[0][:n_rows], need_o=False, stats=stats32)
    # garbage rows would poison every row-contracted accumulation
    # (row_valid is None when there are none — _fwd_common's static test)
    attnout = attnout_ref[0][:n_rows]
    do = do_ref[0][:n_rows].astype(jnp.float32)
    proj = proj_ref[0][:n_rows].astype(jnp.float32)
    mean_o = stats32[:, 2 * heads + 2:2 * heads + 3]
    inv_o = stats32[:, 2 * heads + 3:2 * heads + 4]
    if row_valid is not None:
        attnout = jnp.where(row_valid, attnout, 0)
        do = jnp.where(row_valid, do, 0.0)
        proj = jnp.where(row_valid, proj, 0.0)
        mean_o = jnp.where(row_valid, mean_o, 0.0)
        inv_o = jnp.where(row_valid, inv_o, 1.0)
    xhat_o = (proj - mean_o) * inv_o

    dproj, dg_out = _ln_bwd(do, xhat_o, inv_o, gout32)
    dgout_ref[...] += dg_out

    dattn = _dot(dproj.astype(x.dtype), wout_ref[...], tb=True)
    dwout_ref[...] += _dot(attnout, dproj.astype(x.dtype), ta=True)

    delta_all = _delta_all_heads(dattn, attnout, heads, dim_head, scale)
    dqkv_parts_q, dqkv_parts_k, dqkv_parts_v = [], [], []
    for h in range(heads):
        q, k, v, p, _ = po[h]
        do_h = dattn[:, h * dim_head:(h + 1) * dim_head].astype(jnp.float32)
        # dp and delta carry the softmax scale already (folded into do_h /
        # the delta dot) — saves one n×n multiply per head
        dp = _dot((do_h * scale).astype(v.dtype), v, tb=True)
        ds = p * (dp - delta_all[:, h:h + 1])
        if maybe_dead:
            ds = jnp.where(dead, 0.0, ds)
        ds = ds.astype(x.dtype)
        dqkv_parts_q.append(_dot(ds, k))
        dqkv_parts_k.append(_dot(ds, q, ta=True))
        dqkv_parts_v.append(_dot(p.astype(x.dtype), do_h.astype(x.dtype),
                                 ta=True))
    dqkv = jnp.concatenate(
        dqkv_parts_q + dqkv_parts_k + dqkv_parts_v, axis=-1).astype(x.dtype)
    dqkv_ref[0, :n_rows] = dqkv

    dxn = _dot(dqkv, wqkv_ref[...], tb=True)
    dx_pre, dg_pre = _ln_bwd(dxn, xhat_pre, inv_pre, gpre32)
    dgpre_ref[...] += dg_pre

    dx_ref[0, :n_rows] = (dx_pre + do).astype(dx_ref.dtype)


def _bwd_kernel(x_ref, gpre_ref, wqkv_ref, wout_ref, gout_ref, mask_ref,
                do_ref, stats_ref,
                dx_ref, dwqkv_ref, dwout_ref, dgpre_ref, dgout_ref,
                *, scale, causal, heads, dim_head, n_rows, eps, n_real,
                maybe_dead):
    """Recompute backward with the forward-stored fp32 row statistics:
    qkv/p/attnout/proj are still re-derived in-kernel (no O(n·hd) HBM
    residuals — the memory-lean contract) and dW_qkv/dW_out accumulate in
    VMEM, but the softmax max/sum and both LN mean/var reductions reuse
    the stored values elementwise — bitwise the forward's, since the
    recomputed tensors repeat its exact op sequence on the same inputs."""
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dwout_ref[...] = jnp.zeros_like(dwout_ref)
        dgpre_ref[...] = jnp.zeros_like(dgpre_ref)
        dgout_ref[...] = jnp.zeros_like(dgout_ref)

    x = x_ref[0]
    gpre32 = gpre_ref[...].astype(jnp.float32)
    gout32 = gout_ref[...].astype(jnp.float32)
    hd = heads * dim_head
    stats32 = stats_ref[0][:, :n_rows].T

    xhat_pre, inv_pre, xn, qkv, po, attnout, dead, row_valid, _ = \
        _fwd_common(
            x, gpre32, wqkv_ref[...], mask_ref[0], scale, causal, heads,
            dim_head, n_rows, eps, n_real, maybe_dead, stats=stats32)
    # garbage do rows would poison every row-contracted accumulation
    # (row_valid is None when there are none — _fwd_common's static test)
    do = do_ref[0][:n_rows].astype(jnp.float32)
    if row_valid is not None:
        do = jnp.where(row_valid, do, 0.0)
    # recompute the projection; its LN stats come stored
    proj = _dot(attnout, wout_ref[...])
    mean_o = stats32[:, 2 * heads + 2:2 * heads + 3]
    inv_o = stats32[:, 2 * heads + 3:2 * heads + 4]
    if row_valid is not None:
        mean_o = jnp.where(row_valid, mean_o, 0.0)
        inv_o = jnp.where(row_valid, inv_o, 1.0)
    xhat_o = (proj - mean_o) * inv_o

    # out LayerNorm backward (residual handled at the end)
    dproj, dg_out = _ln_bwd(do, xhat_o, inv_o, gout32)
    dgout_ref[...] += dg_out

    dattn = _dot(dproj.astype(x.dtype), wout_ref[...], tb=True)
    dwout_ref[...] += _dot(attnout, dproj.astype(x.dtype), ta=True)

    # per-head attention backward using the forward-saved lse is implicit:
    # p was recomputed above with the identical max/normalizer math
    delta_all = _delta_all_heads(dattn, attnout, heads, dim_head, scale)
    dqkv_parts_q, dqkv_parts_k, dqkv_parts_v = [], [], []
    for h in range(heads):
        q, k, v, p, o = po[h]
        do_h = dattn[:, h * dim_head:(h + 1) * dim_head].astype(jnp.float32)
        # dp/delta carry the softmax scale (folded into do_h / the delta
        # dot) — saves one n×n multiply per head
        dp = _dot((do_h * scale).astype(v.dtype), v, tb=True)
        ds = p * (dp - delta_all[:, h:h + 1])
        if maybe_dead:
            # XLA-parity: a dead row's scores all come from the masked
            # branch of `where`, which passes NO gradient — dq/dk are zero
            # there (dv still flows through the uniform probabilities)
            ds = jnp.where(dead, 0.0, ds)
        ds = ds.astype(x.dtype)
        dqkv_parts_q.append(_dot(ds, k))
        dqkv_parts_k.append(_dot(ds, q, ta=True))
        dqkv_parts_v.append(_dot(p.astype(x.dtype), do_h.astype(x.dtype),
                                 ta=True))
    dqkv = jnp.concatenate(
        dqkv_parts_q + dqkv_parts_k + dqkv_parts_v, axis=-1).astype(x.dtype)

    dxn = _dot(dqkv, wqkv_ref[...], tb=True)
    dwqkv_ref[...] += _dot(xn, dqkv, ta=True)

    dx_pre, dg_pre = _ln_bwd(dxn, xhat_pre, inv_pre, gpre32)
    dgpre_ref[...] += dg_pre

    dx_ref[0, :n_rows] = (dx_pre + do).astype(dx_ref.dtype)


def _bwd_kernel_qkv(x_ref, gpre_ref, wqkv_ref, wout_ref, gout_ref, mask_ref,
                    do_ref, qkv_ref, stats_ref,
                    dx_ref, dwqkv_ref, dwout_ref, dgpre_ref, dgout_ref,
                    *, scale, causal, heads, dim_head, n_rows, eps, n_real,
                    maybe_dead):
    """Backward with the forward-stored qkv (+ fp32 row stats): identical
    math to _bwd_kernel, but the LN + xn@w_qkv recompute — its single
    largest dot — is replaced by reading the stored qkv; p/attnout/proj
    are still re-derived (their dots are ~half the qkv projection's
    FLOPs) and dW_qkv/dW_out accumulate in VMEM, so the only HBM
    residual beyond the recompute variant's is qkv itself. xn for the
    dW_qkv dot is rebuilt ELEMENTWISE from x and the stored LN stats —
    bitwise the forward's (same op sequence on the same inputs)."""
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dwout_ref[...] = jnp.zeros_like(dwout_ref)
        dgpre_ref[...] = jnp.zeros_like(dgpre_ref)
        dgout_ref[...] = jnp.zeros_like(dgout_ref)

    x = x_ref[0]
    gpre32 = gpre_ref[...].astype(jnp.float32)
    gout32 = gout_ref[...].astype(jnp.float32)
    stats32 = stats_ref[0][:, :n_rows].T        # stored (n_stats, n)

    xhat_pre, inv_pre, _, _, po, attnout, dead, row_valid, _ = _fwd_common(
        x, gpre32, wqkv_ref[...], mask_ref[0], scale, causal, heads,
        dim_head, n_rows, eps, n_real, maybe_dead,
        qkv=qkv_ref[0][:n_rows], stats=stats32)
    do = do_ref[0][:n_rows].astype(jnp.float32)
    if row_valid is not None:
        do = jnp.where(row_valid, do, 0.0)
    # recompute the projection; its LN stats come stored
    proj = _dot(attnout, wout_ref[...])
    mean_o = stats32[:, 2 * heads + 2:2 * heads + 3]
    inv_o = stats32[:, 2 * heads + 3:2 * heads + 4]
    if row_valid is not None:
        mean_o = jnp.where(row_valid, mean_o, 0.0)
        inv_o = jnp.where(row_valid, inv_o, 1.0)
    xhat_o = (proj - mean_o) * inv_o

    dproj, dg_out = _ln_bwd(do, xhat_o, inv_o, gout32)
    dgout_ref[...] += dg_out

    dattn = _dot(dproj.astype(x.dtype), wout_ref[...], tb=True)
    dwout_ref[...] += _dot(attnout, dproj.astype(x.dtype), ta=True)

    delta_all = _delta_all_heads(dattn, attnout, heads, dim_head, scale)
    dqkv_parts_q, dqkv_parts_k, dqkv_parts_v = [], [], []
    for h in range(heads):
        q, k, v, p, _ = po[h]
        do_h = dattn[:, h * dim_head:(h + 1) * dim_head].astype(jnp.float32)
        # dp/delta carry the softmax scale (folded into do_h / the delta
        # dot) — saves one n×n multiply per head
        dp = _dot((do_h * scale).astype(v.dtype), v, tb=True)
        ds = p * (dp - delta_all[:, h:h + 1])
        if maybe_dead:
            ds = jnp.where(dead, 0.0, ds)
        ds = ds.astype(x.dtype)
        dqkv_parts_q.append(_dot(ds, k))
        dqkv_parts_k.append(_dot(ds, q, ta=True))
        dqkv_parts_v.append(_dot(p.astype(x.dtype), do_h.astype(x.dtype),
                                 ta=True))
    dqkv = jnp.concatenate(
        dqkv_parts_q + dqkv_parts_k + dqkv_parts_v, axis=-1).astype(x.dtype)

    # _fwd_common returns xn=None when qkv is stored; rebuild it
    # elementwise (xhat_pre is already sanitized and fp32)
    xn = (xhat_pre * gpre32).astype(x.dtype)
    dxn = _dot(dqkv, wqkv_ref[...], tb=True)
    dwqkv_ref[...] += _dot(xn, dqkv, ta=True)

    dx_pre, dg_pre = _ln_bwd(dxn, xhat_pre, inv_pre, gpre32)
    dgpre_ref[...] += dg_pre

    dx_ref[0, :n_rows] = (dx_pre + do).astype(dx_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12))
def attention_block(x, g_pre, w_qkv, w_out, g_out, mask,
                    heads, dim_head, scale, causal=False, interpret=None,
                    maybe_dead=True, store_qkv=False):
    """x: (b, n, dim); returns x + LN(W_out · attention(LN(x)·W_qkv)).
    Differentiable w.r.t. the five tensor arguments. `maybe_dead=False`
    (static) skips the all-keys-masked row handling — pass it when the
    mask is known to be all-True (e.g. synthesized for mask=None).
    `store_qkv=True` keeps the fused qkv tensor (+ attnout/proj) as
    backward residuals instead of recomputing LN + xn@w_qkv per batch
    element; `store_qkv="qkv"` keeps ONLY qkv and recomputes the rest
    with in-VMEM dW accumulation (check `supported(..., store_qkv=...)`
    with the matching value)."""
    out, _ = _mega_fwd(x, g_pre, w_qkv, w_out, g_out, mask,
                       heads, dim_head, scale, causal, interpret, maybe_dead,
                       store_qkv, need_residuals=False)
    return out


def _prep(x, mask, interpret):
    """No host-side padding: the pallas_call uses an n_pad-sized block on
    the TRUE (b, n, ·) arrays — partial-block writes are hardware-masked
    and the garbage in partial-block READS is zeroed in-kernel
    (_fwd_common). The explicit jnp.pad/slice pair this replaces cost
    ~1.6 ms/step of copies at the flagship shape (r3 device trace); 128
    block alignment is kept (16-sublane alignment was tried and made the
    bwd kernel overflow scoped VMEM via Mosaic relayout scratch, 17.75M).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, _ = x.shape
    n_pad = _round_up(n, 128)
    key_valid = mask.reshape(b, 1, n).astype(jnp.int32)
    return x, key_valid, n, n_pad, interpret


def _mega_fwd(x, g_pre, w_qkv, w_out, g_out, mask,
              heads, dim_head, scale, causal, interpret, maybe_dead,
              store_qkv=False, need_residuals=True):
    x_p, key_valid, n, n_pad, interp = _prep(x, mask, interpret)
    b, _, dim = x_p.shape
    n_rows = min(_round_up(n, 16), n_pad)
    eps = _eps_for(x.dtype)
    hd = w_qkv.shape[-1] // 3

    if not need_residuals:  # primal-only (inference): leanest forward
        store_qkv = False
        kernel = _fwd_kernel
    elif store_qkv == "qkv":
        kernel = _fwd_kernel_qkv
    else:
        kernel = _fwd_kernel_stored if store_qkv else _fwd_kernel_stats
    out_specs = pl.BlockSpec((1, n_pad, dim), lambda i: (i, 0, 0))
    out_shape = jax.ShapeDtypeStruct((b, n, dim), x.dtype)
    n_stats = 2 * heads + 4
    if not need_residuals:
        pass
    elif store_qkv == "qkv":
        out_specs = [out_specs,
                     pl.BlockSpec((1, n_pad, 3 * hd), lambda i: (i, 0, 0)),
                     pl.BlockSpec((1, n_stats, n_pad), lambda i: (i, 0, 0))]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((b, n, 3 * hd), x.dtype),
                     jax.ShapeDtypeStruct((b, n_stats, n), jnp.float32)]
    elif store_qkv:
        out_specs = [out_specs,
                     pl.BlockSpec((1, n_pad, 3 * hd), lambda i: (i, 0, 0)),
                     pl.BlockSpec((1, n_pad, hd), lambda i: (i, 0, 0)),
                     pl.BlockSpec((1, n_pad, dim), lambda i: (i, 0, 0)),
                     pl.BlockSpec((1, n_stats, n_pad), lambda i: (i, 0, 0))]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((b, n, 3 * hd), x.dtype),
                     jax.ShapeDtypeStruct((b, n, hd), x.dtype),
                     jax.ShapeDtypeStruct((b, n, dim), x.dtype),
                     jax.ShapeDtypeStruct((b, n_stats, n), jnp.float32)]
    else:
        # recompute variant: out + fp32 row stats only (VERDICT r4 #2);
        # stats transposed (n_stats, n) — lane-padding a 20-wide last dim
        # to 128 wastes 6.4x HBM/DMA
        out_specs = [out_specs,
                     pl.BlockSpec((1, n_stats, n_pad), lambda i: (i, 0, 0))]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((b, n_stats, n), jnp.float32)]
    res = pl.pallas_call(
        functools.partial(kernel, scale=scale, causal=causal,
                          heads=heads, dim_head=dim_head, n_rows=n_rows,
                          eps=eps, n_real=n, maybe_dead=maybe_dead),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n_pad, dim), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, dim), lambda i: (0, 0)),
            pl.BlockSpec(w_qkv.shape, lambda i: (0, 0)),
            pl.BlockSpec(w_out.shape, lambda i: (0, 0)),
            pl.BlockSpec((1, dim), lambda i: (0, 0)),
            pl.BlockSpec((1, 1, n_pad), lambda i: (i, 0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interp,
    )(x_p, g_pre[None, :], w_qkv, w_out, g_out[None, :], key_valid)
    if not need_residuals:
        return res, (x_p, key_valid, None)
    if store_qkv == "qkv":
        out, qkv, stats = res
        return out, (x_p, key_valid, (qkv, stats))
    if store_qkv:
        out, qkv, attnout, proj, stats = res
        return out, (x_p, key_valid, (qkv, attnout, proj, stats))
    out, stats = res
    return out, (x_p, key_valid, (stats,))


# the weights are needed in the backward: carry them as residuals
def _mega_fwd_vjp(x, g_pre, w_qkv, w_out, g_out, mask,
                  heads, dim_head, scale, causal, interpret, maybe_dead,
                  store_qkv):
    out, (x_p, key_valid, qkv) = _mega_fwd(
        x, g_pre, w_qkv, w_out, g_out, mask,
        heads, dim_head, scale, causal, interpret, maybe_dead, store_qkv)
    return out, (x_p, key_valid, qkv, g_pre, w_qkv, w_out, g_out, x.shape)


def _mega_bwd_vjp(heads, dim_head, scale, causal, interpret, maybe_dead,
                  store_qkv, res, dout):
    x_p, key_valid, qkv, g_pre, w_qkv, w_out, g_out, x_shape = res
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, dim = x_p.shape
    n_pad = _round_up(n, 128)
    n_rows = min(_round_up(n, 16), n_pad)
    eps = _eps_for(x_p.dtype)
    hd = heads * dim_head
    do_p = dout.astype(x_p.dtype)

    in_specs = [
        pl.BlockSpec((1, n_pad, dim), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, dim), lambda i: (0, 0)),
        pl.BlockSpec((dim, 3 * hd), lambda i: (0, 0)),
        pl.BlockSpec((hd, dim), lambda i: (0, 0)),
        pl.BlockSpec((1, dim), lambda i: (0, 0)),
        pl.BlockSpec((1, 1, n_pad), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, n_pad, dim), lambda i: (i, 0, 0)),
    ]
    args = [x_p, g_pre[None, :], w_qkv, w_out, g_out[None, :], key_valid,
            do_p]
    if store_qkv == "qkv":
        qkv, stats = qkv
        n_stats = 2 * heads + 4
        in_specs += [
            pl.BlockSpec((1, n_pad, 3 * hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, n_stats, n_pad), lambda i: (i, 0, 0)),
        ]
        args += [qkv, stats]
        dx, dwqkv, dwout, dgpre, dgout = pl.pallas_call(
            functools.partial(_bwd_kernel_qkv, scale=scale, causal=causal,
                              heads=heads, dim_head=dim_head, n_rows=n_rows,
                              eps=eps, n_real=n, maybe_dead=maybe_dead),
            grid=(b,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, n_pad, dim), lambda i: (i, 0, 0)),
                pl.BlockSpec((dim, 3 * hd), lambda i: (0, 0)),
                pl.BlockSpec((hd, dim), lambda i: (0, 0)),
                pl.BlockSpec((1, dim), lambda i: (0, 0)),
                pl.BlockSpec((1, dim), lambda i: (0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, n, dim), x_p.dtype),
                jax.ShapeDtypeStruct((dim, 3 * hd), jnp.float32),
                jax.ShapeDtypeStruct((hd, dim), jnp.float32),
                jax.ShapeDtypeStruct((1, dim), jnp.float32),
                jax.ShapeDtypeStruct((1, dim), jnp.float32),
            ],
            interpret=interpret,
        )(*args)
    elif store_qkv:
        qkv, attnout, proj, stats = qkv
        n_stats = 2 * heads + 4
        in_specs += [
            pl.BlockSpec((1, n_pad, 3 * hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, n_pad, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, n_pad, dim), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, n_stats, n_pad), lambda i: (i, 0, 0)),
        ]
        args += [qkv, attnout, proj, stats]
        dx, dqkv, dwout, dgpre, dgout = pl.pallas_call(
            functools.partial(_bwd_kernel_stored, scale=scale, causal=causal,
                              heads=heads, dim_head=dim_head, n_rows=n_rows,
                              eps=eps, n_real=n, maybe_dead=maybe_dead),
            grid=(b,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, n_pad, dim), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, n_pad, 3 * hd), lambda i: (i, 0, 0)),
                pl.BlockSpec((hd, dim), lambda i: (0, 0)),
                pl.BlockSpec((1, dim), lambda i: (0, 0)),
                pl.BlockSpec((1, dim), lambda i: (0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, n, dim), x_p.dtype),
                jax.ShapeDtypeStruct((b, n, 3 * hd), x_p.dtype),
                jax.ShapeDtypeStruct((hd, dim), jnp.float32),
                jax.ShapeDtypeStruct((1, dim), jnp.float32),
                jax.ShapeDtypeStruct((1, dim), jnp.float32),
            ],
            interpret=interpret,
        )(*args)
        # dW_qkv = LN(x)^T @ dqkv — one big clean XLA matmul (both arrays
        # carry their true n rows; the kernel's partial-block writes never
        # leak garbage into dqkv). The (b, n) pair contracts IN the dot:
        # a reshape(-1, dim) first would be a physical relayout copy
        # (n=257 is not sublane-aligned) costing ~10 ms/step at b256.
        # The pre-LN is elementwise from the forward-stored stats (bitwise
        # the kernel's mean/inv) — no XLA re-reduction over x.
        gpre32 = g_pre.astype(jnp.float32)
        # stats are (b, n_stats, n): row 2h = mean_pre, 2h+1 = inv_pre
        mean_pre = stats[:, 2 * heads, :, None]
        inv_pre = stats[:, 2 * heads + 1, :, None]
        xn = ((x_p.astype(jnp.float32) - mean_pre) * inv_pre) * gpre32
        dwqkv = jax.lax.dot_general(
            xn.astype(x_p.dtype), dqkv,
            (((0, 1), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        (stats,) = qkv
        n_stats = 2 * heads + 4
        in_specs += [
            pl.BlockSpec((1, n_stats, n_pad), lambda i: (i, 0, 0)),
        ]
        args += [stats]
        dx, dwqkv, dwout, dgpre, dgout = pl.pallas_call(
            functools.partial(_bwd_kernel, scale=scale, causal=causal,
                              heads=heads, dim_head=dim_head, n_rows=n_rows,
                              eps=eps, n_real=n, maybe_dead=maybe_dead),
            grid=(b,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, n_pad, dim), lambda i: (i, 0, 0)),
                pl.BlockSpec((dim, 3 * hd), lambda i: (0, 0)),
                pl.BlockSpec((hd, dim), lambda i: (0, 0)),
                pl.BlockSpec((1, dim), lambda i: (0, 0)),
                pl.BlockSpec((1, dim), lambda i: (0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, n, dim), x_p.dtype),
                jax.ShapeDtypeStruct((dim, 3 * hd), jnp.float32),
                jax.ShapeDtypeStruct((hd, dim), jnp.float32),
                jax.ShapeDtypeStruct((1, dim), jnp.float32),
                jax.ShapeDtypeStruct((1, dim), jnp.float32),
            ],
            interpret=interpret,
        )(*args)

    dmask = np.zeros((b, n), dtype=jax.dtypes.float0)
    return (dx, dgpre[0].astype(g_pre.dtype),
            dwqkv.astype(w_qkv.dtype), dwout.astype(w_out.dtype),
            dgout[0].astype(g_out.dtype), dmask)


attention_block.defvjp(_mega_fwd_vjp, _mega_bwd_vjp)
