"""Transformer building blocks: rotary embedding, GEGLU feed-forward,
multi-head attention, sandwich-norm transformer stack, FLIP patch dropout.

Behavioral parity targets (reference `x_clip/x_clip.py`):
  * RotaryEmbedding / rotate_half / apply_rotary_pos_emb — x_clip.py:155-176.
    Quirk reproduced: rotary is applied to q, k AND v (x_clip.py:223).
  * GEGLU + FeedForward with NormFormer inner LayerNorm — x_clip.py:180-199.
    GELU is the exact (erf) variant, matching torch F.gelu's default.
  * Attention — x_clip.py:201-245: fused qkv (no bias), q pre-scaled, key
    padding + causal masks filled with -finfo.max, softmax in fp32 then cast
    back, output proj (no bias) followed by LayerNorm.
  * Transformer — x_clip.py:247-291: norm_in → depth×(PreNorm-Attn + res,
    PreNorm-FF + res) → norm_out, per-block gradient checkpointing.
  * PatchDropout — x_clip.py:134-151: keeps max(1, int(n*(1-p))) patches,
    uniformly random, unordered.

TPU-first design notes: per-layer parameters are STACKED along a leading
depth axis and the block loop is a `lax.scan` (one compiled block body
regardless of depth — fast compiles, and the stacked weights give clean
tensor-parallel sharding rules). The attention inner product can be routed
to a Pallas flash-attention kernel via `attn_impl='flash'`.
"""

from __future__ import annotations

import os
import warnings
from typing import Optional

import jax
import jax.numpy as jnp

from .core import (RngStream, dropout, layer_norm_apply, layer_norm_init,
                   linear_init)

_warned_fallbacks = set()


def _warn_fallback(requested: str, reason: str):
    """Warn (once per distinct cause, at trace time) when a requested Pallas
    impl silently routes to the XLA path — VERDICT r1: a user who sets both
    `attn_impl='flash'` and attention dropout got XLA with no signal."""
    if (requested, reason) not in _warned_fallbacks:
        _warned_fallbacks.add((requested, reason))
        warnings.warn(f"{requested} requested but falling back to the XLA "
                      f"path: {reason}", stacklevel=3)


# --------------------------------------------------------------------------
# rotary positional embedding
# --------------------------------------------------------------------------

def rotary_freqs(seq_len: int, rot_dim: int, dtype=jnp.float32) -> jax.Array:
    """`cat((freqs, freqs), -1)` of shape (seq_len, rot_dim) with
    inv_freq = 1/10000^(2i/rot_dim) — reference x_clip.py:155-165."""
    inv_freq = 1.0 / (10000 ** (jnp.arange(0, rot_dim, 2, dtype=jnp.float32) / rot_dim))
    t = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = jnp.einsum("i,j->ij", t, inv_freq)
    return jnp.concatenate([freqs, freqs], axis=-1).astype(dtype)


def _rotate_half(x: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary_pos_emb(freqs: jax.Array, t: jax.Array) -> jax.Array:
    """Partial-dim rotation: first rot_dim features rotated, rest passed
    through — reference x_clip.py:172-176."""
    rot_dim = freqs.shape[-1]
    t_rot, t_pass = t[..., :rot_dim], t[..., rot_dim:]
    cos = jnp.cos(freqs).astype(t.dtype)
    sin = jnp.sin(freqs).astype(t.dtype)
    t_rot = t_rot * cos + _rotate_half(t_rot) * sin
    return jnp.concatenate([t_rot, t_pass], axis=-1)


# --------------------------------------------------------------------------
# feed forward (GEGLU + inner LayerNorm)
# --------------------------------------------------------------------------

def feed_forward_init(key, dim: int, mult: int = 4, dtype=jnp.float32):
    inner = int(dim * mult)
    k1, k2 = jax.random.split(key)
    return {
        "norm": layer_norm_init(dim, dtype),          # PreNorm
        "w_in": linear_init(k1, dim, inner * 2, dtype=dtype),
        "inner_norm": layer_norm_init(inner, dtype),
        "w_out": linear_init(k2, inner, dim, dtype=dtype),
    }


def _ff_middle(x, w, g_inner):
    """w_in matmul → GEGLU → inner LayerNorm: everything whose width is the
    O(4·dim) inner dimension. Split out so `remat_wide` can recompute exactly
    this segment in the backward pass — the r1 device trace showed these
    (rows, 2048) residuals overflowing HBM at batch 256 and spilling to slow
    host-attached memory. Two weight-slice matmuls instead of one matmul +
    jnp.split keep the value/gate activations contiguous (same math
    bit-for-bit; the weight stays stored fused for checkpoint parity)."""
    inner = w.shape[-1] // 2
    v, gate = x @ w[:, :inner], x @ w[:, inner:]
    v = v * jax.nn.gelu(gate, approximate=False)
    return layer_norm_apply({"g": g_inner}, v)


def feed_forward_apply(params, x, *, ff_dropout: float = 0.0,
                       rngs: Optional[RngStream] = None, training: bool = False,
                       ff_impl: str = "xla", remat_wide: bool = False):
    x = layer_norm_apply(params["norm"], x)
    ff_dropout_active = bool(training and ff_dropout > 0.0 and rngs)
    if ff_impl == "fused" and ff_dropout_active:
        _warn_fallback("ff_impl='fused'",
                       "ff_dropout > 0 in training mode (the fused GEGLU+LN "
                       "kernel has no dropout epilogue)")
    if ff_impl == "fused" and not ff_dropout_active:
        # one-pass Pallas GEGLU+inner-LN (kernels/fused_ff.py): saves the
        # separate product/stat/normalize HBM round trips between the matmuls
        from ..kernels.fused_ff import geglu_layernorm
        x = geglu_layernorm(x @ params["w_in"]["w"], params["inner_norm"]["g"])
    else:
        middle = jax.checkpoint(_ff_middle) if remat_wide else _ff_middle
        x = middle(x, params["w_in"]["w"], params["inner_norm"]["g"])
        if training and ff_dropout > 0.0 and rngs:
            x = dropout(rngs.next(), x, ff_dropout, training)
    return x @ params["w_out"]["w"]


# --------------------------------------------------------------------------
# attention
# --------------------------------------------------------------------------

def attention_init(key, dim: int, dim_head: int = 64, heads: int = 8, dtype=jnp.float32):
    inner = dim_head * heads
    k1, k2 = jax.random.split(key)
    return {
        "norm": layer_norm_init(dim, dtype),          # PreNorm
        "to_qkv": linear_init(k1, dim, inner * 3, dtype=dtype),
        "to_out": linear_init(k2, inner, dim, dtype=dtype),
        "out_norm": layer_norm_init(dim, dtype),
    }


def attention_apply(params, x, *, heads: int, dim_head: int,
                    causal: bool = False,
                    mask: Optional[jax.Array] = None,
                    rotary: Optional[jax.Array] = None,
                    attn_dropout: float = 0.0,
                    rngs: Optional[RngStream] = None,
                    training: bool = False,
                    attn_impl: str = "xla",
                    remat_wide: bool = False):
    b, n, _ = x.shape
    scale = dim_head ** -0.5
    if attn_impl in ("fused_recompute", "fused_qkv"):
        # the store/recompute/qkv distinction only exists for the megablock
        # (transformer_apply); here it means the whole-head fused kernel
        attn_impl = "fused"

    x = layer_norm_apply(params["norm"], x)
    qkv = x @ params["to_qkv"]["w"]

    dropout_active = bool(training and attn_dropout > 0.0 and rngs)
    if attn_impl == "fused":
        from ..kernels.attention_block import supported as _fused_ok
        if dropout_active:
            _warn_fallback("attn_impl='fused'",
                           "attn_dropout > 0 in training mode (the fused "
                           "whole-head kernel has no attention dropout)")
        elif not _fused_ok(heads, dim_head):
            _warn_fallback("attn_impl='fused'",
                           f"heads={heads}, dim_head={dim_head} does not "
                           "tile into 128-lane head groups")
    if (attn_impl == "fused" and not dropout_active
            and _fused_ok(heads, dim_head)):
        # whole-head Pallas attention (kernels/attention_block.py): q/k/v
        # stay as column slices of the fused qkv tensor (no transposes) and
        # the O(n²) scores never touch HBM in either direction
        from ..kernels.attention_block import attention_core
        if rotary is not None:
            # quirk parity: the SAME rotation applies to q, k and v
            # (x_clip.py:223), so it acts elementwise on every 64-wide head
            # slice of the fused tensor
            qkv4 = qkv.reshape(b, n, 3 * heads, dim_head)
            qkv4 = apply_rotary_pos_emb(rotary[:, None, :], qkv4)
            qkv = qkv4.reshape(b, n, 3 * heads * dim_head)
        key_mask = mask if mask is not None else jnp.ones((b, n), dtype=bool)
        out = attention_core(qkv, key_mask, heads, dim_head, scale, causal,
                             None, mask is not None)
        out = out @ params["to_out"]["w"]
        return layer_norm_apply(params["out_norm"], out)

    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (t.reshape(b, n, heads, dim_head).transpose(0, 2, 1, 3) for t in (q, k, v))

    q = q * scale

    if rotary is not None:
        # quirk parity: rotary applied to q, k AND v (x_clip.py:223)
        q, k, v = (apply_rotary_pos_emb(rotary, t) for t in (q, k, v))

    if attn_impl == "flash" and dropout_active:
        _warn_fallback("attn_impl='flash'",
                       "attn_dropout > 0 in training mode (the flash kernel "
                       "does not implement attention-weight dropout)")
    use_flash = attn_impl == "flash" and not dropout_active
    if use_flash:
        from ..kernels.flash_attention import flash_attention
        out = flash_attention(q, k, v, mask=mask, causal=causal)
    else:
        def attn_inner(q, k, v):
            sim = jnp.einsum("bhid,bhjd->bhij", q, k)
            big_neg = -jnp.finfo(sim.dtype).max
            if mask is not None:
                sim = jnp.where(mask[:, None, None, :], sim, big_neg)
            if causal:
                i = jnp.arange(n)[:, None]
                j = jnp.arange(n)[None, :]
                sim = jnp.where(j > i, big_neg, sim)
            # fp32-accurate softmax with bf16 storage: the max/normalizer
            # reductions accumulate in fp32, the exp runs in fp32 registers,
            # but the only materialized tensors are the bf16 scores and
            # weights — `softmax(sim.astype(f32))` would store the full fp32
            # score tensor (O(b·h·n²) extra HBM traffic; device-trace found)
            if sim.dtype == jnp.float32:
                attn = jax.nn.softmax(sim, axis=-1)
            else:
                m = jax.lax.stop_gradient(sim.max(axis=-1, keepdims=True))
                shifted = (sim - m).astype(jnp.float32)
                denom = jnp.log(jnp.sum(jnp.exp(shifted), axis=-1,
                                        keepdims=True))
                attn = jnp.exp(shifted - denom).astype(sim.dtype)
            if training and attn_dropout > 0.0 and rngs:
                attn = dropout(rngs.next(), attn, attn_dropout, training)
            return jnp.einsum("bhij,bhjd->bhid", attn, v)

        if remat_wide and not (training and attn_dropout > 0.0 and rngs):
            # recompute the O(n²) score/weight tensors in the backward pass
            # instead of keeping them as residuals (flash-attention-style
            # memory, XLA compute) — see _ff_middle for the rationale
            attn_inner = jax.checkpoint(attn_inner)
        out = attn_inner(q, k, v)

    out = out.transpose(0, 2, 1, 3).reshape(b, n, heads * dim_head)
    out = out @ params["to_out"]["w"]
    return layer_norm_apply(params["out_norm"], out)


# --------------------------------------------------------------------------
# transformer stack (scan over stacked per-layer params)
# --------------------------------------------------------------------------

def transformer_init(key, dim: int, *, depth: int, dim_head: int = 64,
                     heads: int = 8, ff_mult: int = 4, dtype=jnp.float32):
    keys = jax.random.split(key, depth)

    def layer_init(k):
        ka, kf = jax.random.split(k)
        return {
            "attn": attention_init(ka, dim, dim_head=dim_head, heads=heads, dtype=dtype),
            "ff": feed_forward_init(kf, dim, mult=ff_mult, dtype=dtype),
        }

    layers = [layer_init(k) for k in keys]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return {
        "layers": stacked,
        "norm_in": layer_norm_init(dim, dtype),
        "norm_out": layer_norm_init(dim, dtype),
    }


def transformer_apply(params, x, *, heads: int, dim_head: int,
                      causal: bool = False,
                      mask: Optional[jax.Array] = None,
                      rotary: Optional[jax.Array] = None,
                      attn_dropout: float = 0.0,
                      ff_dropout: float = 0.0,
                      rng: Optional[jax.Array] = None,
                      training: bool = False,
                      checkpoint_during_training: bool = False,
                      remat_policy: Optional[str] = None,
                      attn_impl: str = "xla",
                      ff_impl: str = "xla",
                      scan_layers: bool = True,
                      return_hidden: Optional[int] = None):
    """Sandwich-norm transformer. If `return_hidden` is an int, also returns
    the residual-stream activation after that block index (0-based; supports
    negatives), used by the visual-SSL hidden-layer tap (reference
    visual_ssl.py:141-203's forward hooks, made explicit here)."""
    depth = jax.tree.leaves(params["layers"])[0].shape[0]
    x = layer_norm_apply(params["norm_in"], x)

    needs_dropout_rng = training and (attn_dropout > 0.0 or ff_dropout > 0.0) and rng is not None
    if needs_dropout_rng:
        layer_rngs = jax.random.split(rng, depth)
    else:
        layer_rngs = jnp.zeros((depth, 2), dtype=jnp.uint32)

    collect_hidden = return_hidden is not None

    # remat_policy selects what the backward pass recomputes (with
    # checkpoint_during_training):
    #   'wide' — recompute ONLY the O(n·inner) FF middle and the O(n²)
    #     attention score/weight tensors (the residuals the r1 device trace
    #     showed spilling to slow memory at batch 256), via fine-grained
    #     jax.checkpoint wraps INSIDE the block; every narrow matmul output
    #     stays resident, so recompute FLOPs are minimal.
    #   'dots' — per-block remat keeping batch-free dot outputs.
    #   None  — full per-block remat (save only block inputs).
    remat_wide = (training and checkpoint_during_training
                  and remat_policy == "wide")

    use_mega = mega_store = False
    if attn_impl in ("fused", "fused_recompute", "fused_qkv") and \
            rotary is None and not (
            training and attn_dropout > 0.0 and rng is not None):
        from ..kernels.attention_megablock import supported as _mega_ok
        n_pad = ((x.shape[1] + 127) // 128) * 128
        # 'fused' prefers the full stored backward (skips the LN+qkv, p@v
        # and projection recomputes; the freed dW_qkv accumulator pays for
        # the extra buffers), degrading to qkv-only store then recompute
        # as VMEM tightens. 'fused_qkv' forces the qkv-only store — the
        # middle point on the speed/HBM curve (O(b·n·3hd) residual vs
        # full-store's O(b·n·5hd)), for shapes like dim-768 b128 where the
        # full residuals blow HBM but qkv alone fits (docs/SCALING.md).
        # 'fused_recompute' forces the recompute backward — no O(b·n·hd)
        # residuals at all, the memory-bound large-batch choice.
        # stored backwards only pay off when a backward will run: at
        # inference the forward would write qkv/attnout/proj residuals to
        # HBM that nothing reads (an opaque pallas output XLA cannot DCE)
        if training and attn_impl != "fused_recompute":
            if (attn_impl == "fused"
                    and _mega_ok(heads, dim_head, x.shape[-1], n_pad,
                                 x.dtype, store_qkv=True)):
                mega_store = True
            elif _mega_ok(heads, dim_head, x.shape[-1], n_pad, x.dtype,
                          store_qkv="qkv"):
                mega_store = "qkv"
        use_mega = bool(mega_store) or _mega_ok(heads, dim_head,
                                                x.shape[-1], n_pad, x.dtype)

    # sublane-align the sequence for the Pallas-kernel stack: the FF block
    # flattens (b, n, d) → (b·n, d), which is a free bitcast when n is a
    # multiple of the sublane tile but a physical relayout copy otherwise
    # (~6 ms/step at the flagship b256 shape, r3 device trace). Padding
    # with masked-out rows once per tower trades ~6% extra FF rows for
    # zero relayouts; pad rows receive zero cotangents from the final
    # slice, so every weight-gradient contribution from them is zero.
    n_orig = x.shape[1]
    sublane = 16 if x.dtype == jnp.bfloat16 else 8
    seq_pad = (-n_orig) % sublane
    align_seq = (seq_pad > 0 and n_orig >= 128 and use_mega
                 and ff_impl in ("block", "block_stored")
                 and return_hidden is None)
    if align_seq:
        x = jnp.pad(x, ((0, 0), (0, seq_pad), (0, 0)))
        mask = jnp.pad(mask if mask is not None
                       else jnp.ones((x.shape[0], n_orig), dtype=bool),
                       ((0, 0), (0, seq_pad)))

    def block(x, layer):
        p, lrng = layer
        rngs = RngStream(lrng) if needs_dropout_rng else None
        with jax.named_scope("attention"):
            if use_mega:
                # whole-attention-block kernel (attention_megablock.py):
                # PreNorm + qkv proj + all heads + out proj + out LN +
                # residual in one pallas_call; single-kernel backward with
                # in-VMEM dW accumulation
                from ..kernels.attention_megablock import attention_block
                key_mask = (mask if mask is not None
                            else jnp.ones(x.shape[:2], dtype=bool))
                x = attention_block(
                    x, p["attn"]["norm"]["g"], p["attn"]["to_qkv"]["w"],
                    p["attn"]["to_out"]["w"], p["attn"]["out_norm"]["g"],
                    key_mask, heads, dim_head, dim_head ** -0.5, causal,
                    None, mask is not None, mega_store)
            else:
                x = attention_apply(
                    p["attn"], x, heads=heads, dim_head=dim_head,
                    causal=causal, mask=mask, rotary=rotary,
                    attn_dropout=attn_dropout, rngs=rngs, training=training,
                    attn_impl=attn_impl, remat_wide=remat_wide) + x
        with jax.named_scope("feed_forward"):
            from ..kernels.fused_ff_block import supported as _ffb_ok
            ff_inner = p["ff"]["w_in"]["w"].shape[-1] // 2
            ffb_dropout = bool(training and ff_dropout > 0.0 and rngs)
            if (ff_impl in ("block", "block_stored") and not ffb_dropout
                    and _ffb_ok(x.shape[-1], ff_inner)):
                # whole-FF-block Pallas kernel (kernels/fused_ff_block.py):
                # PreNorm LN → w_in → GEGLU → inner LN → w_out → residual in
                # one pass; backward recomputes the inner activations
                # tile-wise ('block') or reads the forward-stored h
                # ('block_stored' — trades HBM traffic for the ~80% dW-pass
                # recompute tax; see the kernel module docstring)
                from ..kernels.fused_ff_block import ff_block
                store_h = ff_impl == "block_stored" and training
                if store_h and os.environ.get("XCLIP_FF_STORE", "") != "h":
                    # stored residual: the GEGLU triple instead of h —
                    # removes every transcendental from both backward
                    # passes for 1.5× the residual bytes
                    # (XCLIP_FF_STORE=h restores the r4 h residual)
                    store_h = "geglu"
                x = ff_block(x, p["ff"]["norm"]["g"], p["ff"]["w_in"]["w"],
                             p["ff"]["inner_norm"]["g"], p["ff"]["w_out"]["w"],
                             store_h=store_h)
            else:
                if ff_impl in ("block", "block_stored"):
                    _warn_fallback(
                        f"ff_impl='{ff_impl}'",
                        "ff_dropout active in training mode" if ffb_dropout
                        else f"inner width {ff_inner} has no usable column "
                             "block divisor for the dW pass")
                x = feed_forward_apply(
                    p["ff"], x, ff_dropout=ff_dropout, rngs=rngs,
                    training=training, ff_impl=ff_impl,
                    remat_wide=remat_wide) + x
        return x, (x if collect_hidden else None)

    if training and checkpoint_during_training and remat_policy != "wide":
        policy = (jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                  if remat_policy == "dots" else None)
        block = jax.checkpoint(block, policy=policy)

    if scan_layers:
        x, hiddens = jax.lax.scan(block, x, (params["layers"], layer_rngs))
    else:
        # unrolled loop: static param slices, no while op — larger HLO but
        # lets XLA schedule across layers, and (unlike the scan) the no-remat
        # variant of this graph compiles on the remote TPU toolchain
        hs = []
        for i in range(depth):
            layer_p = jax.tree.map(lambda a: a[i], params["layers"])
            x, h = block(x, (layer_p, layer_rngs[i]))
            hs.append(h)
        hiddens = jnp.stack(hs) if collect_hidden else None
    if align_seq:
        x = x[:, :n_orig]
    out = layer_norm_apply(params["norm_out"], x)

    if return_hidden is not None:
        idx = return_hidden if return_hidden >= 0 else depth + return_hidden
        return out, hiddens[idx]
    return out


# --------------------------------------------------------------------------
# FLIP patch dropout
# --------------------------------------------------------------------------

def patch_dropout(rng: jax.Array, x: jax.Array, prob: float) -> jax.Array:
    """Keep a uniformly random, unordered subset of max(1, int(n*(1-prob)))
    patch tokens per image — reference x_clip.py:134-151 (randn+topk). The
    kept count is static given `prob`, so shapes stay jit-friendly."""
    assert 0.0 <= prob < 1.0
    b, n, _ = x.shape
    num_keep = max(1, int(n * (1 - prob)))
    scores = jax.random.uniform(rng, (b, n))
    _, keep_idx = jax.lax.top_k(scores, num_keep)  # unordered subset (parity quirk ok)
    return jnp.take_along_axis(x, keep_idx[:, :, None], axis=1)
