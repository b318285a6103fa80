"""Text transformer tower — behavioral parity with reference
`x_clip/x_clip.py:295-338` (TextTransformer):

  * token embedding over `num_tokens`
  * EITHER learned absolute position embedding OR rotary
    (`RotaryEmbedding(min(dim_head, 32))`, freqs computed for n+1 so the
    prepended CLS gets position 0 — x_clip.py:310-311,328)
  * learned CLS token prepended only when NOT causal (x_clip.py:313,330-335),
    with the padding mask extended by a leading True
  * returns the full (b, n[+1], dim) sequence.

Implemented as a frozen-dataclass config (static/hashable for jit) with pure
`init`/`apply` functions.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .core import embedding_init, layer_norm_apply  # noqa: F401 (layer_norm re-export)
from .layers import rotary_freqs, transformer_init, transformer_apply


@dataclasses.dataclass(frozen=True)
class TextTransformer:
    dim: int
    num_tokens: int
    max_seq_len: int
    depth: int = 6
    heads: int = 8
    dim_head: int = 64
    rotary_pos_emb: bool = False
    causal: bool = False
    ff_mult: int = 4
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    checkpoint_during_training: bool = False
    remat_policy: Optional[str] = None
    scan_layers: bool = True
    ff_impl: str = "xla"

    @property
    def has_cls_token(self) -> bool:
        return not self.causal

    def init(self, key, dtype=jnp.float32):
        k_tok, k_cls, k_tr = jax.random.split(key, 3)
        params = {
            "token_emb": embedding_init(k_tok, self.num_tokens, self.dim, dtype),
            "transformer": transformer_init(
                k_tr, self.dim, depth=self.depth, dim_head=self.dim_head,
                heads=self.heads, ff_mult=self.ff_mult, dtype=dtype),
        }
        if not self.rotary_pos_emb:
            k_pos, _ = jax.random.split(k_tok)
            params["abs_pos_emb"] = embedding_init(k_pos, self.max_seq_len, self.dim, dtype)
        if not self.causal:
            params["cls_token"] = jax.random.normal(k_cls, (self.dim,), dtype)
        return params

    def apply(self, params, x: jax.Array, mask: Optional[jax.Array] = None, *,
              rng: Optional[jax.Array] = None, training: bool = False,
              attn_impl: str = "xla"):
        b, n = x.shape
        h = jnp.take(params["token_emb"]["emb"], x, axis=0)

        if "abs_pos_emb" in params:
            pos = params["abs_pos_emb"]["emb"][:n]
            h = h + pos[None, :, :]

        rotary = None
        if self.rotary_pos_emb:
            # freqs for n+1 so the prepended CLS gets position 0
            # (x_clip.py:328) — but in causal mode there IS no CLS and the
            # reference's unconditional n+1 crashes on broadcast against
            # the n-length q/k/v (same bug class as the undefined-`b` EOS
            # pooling, SURVEY §2.7.2); build for the real sequence length
            rotary = rotary_freqs(n + (0 if self.causal else 1),
                                  min(self.dim_head, 32))

        if not self.causal:
            cls = jnp.broadcast_to(params["cls_token"].astype(h.dtype), (b, 1, self.dim))
            h = jnp.concatenate([cls, h], axis=1)
            if mask is not None:
                mask = jnp.pad(mask, ((0, 0), (1, 0)), constant_values=True)

        return transformer_apply(
            params["transformer"], h,
            heads=self.heads, dim_head=self.dim_head, causal=self.causal,
            mask=mask, rotary=rotary,
            attn_dropout=self.attn_dropout, ff_dropout=self.ff_dropout,
            rng=rng, training=training,
            checkpoint_during_training=self.checkpoint_during_training,
            remat_policy=self.remat_policy,
            scan_layers=self.scan_layers,
            ff_impl=self.ff_impl,
            attn_impl=attn_impl)
