"""Vision transformer tower — behavioral parity with reference
`x_clip/x_clip.py:340-390` (VisionTransformer):

  * patchify via `b c (h p1) (w p2) -> b (h w) (p1 p2 c)` + Linear (with bias)
  * learned absolute position embedding over `num_patches`
  * FLIP PatchDropout applied AFTER the pos-emb add (x_clip.py:385), training
    only, bypassable via `keep_all_patches`
  * CLS is DERIVED: mean-pool over output tokens → Linear (no bias) → prepend
    (x_clip.py:366-370,389-390)
  * returns (b, n_kept + 1, dim).

Input layout is NCHW for reference-API parity; the patchify transpose is a
one-time relayout that XLA folds into the first matmul.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .core import embedding_init, linear_init
from .layers import transformer_init, transformer_apply


@dataclasses.dataclass(frozen=True)
class VisionTransformer:
    dim: int
    image_size: int
    patch_size: int
    channels: int = 3
    patch_dropout: float = 0.5
    depth: int = 6
    heads: int = 8
    dim_head: int = 64
    ff_mult: int = 4
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    checkpoint_during_training: bool = False
    remat_policy: Optional[str] = None
    scan_layers: bool = True
    ff_impl: str = "xla"

    def __post_init__(self):
        assert self.image_size % self.patch_size == 0, \
            "Image dimensions must be divisible by the patch size."

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def patch_dim(self) -> int:
        return self.channels * self.patch_size ** 2

    def init(self, key, dtype=jnp.float32):
        k_patch, k_pos, k_cls, k_tr = jax.random.split(key, 4)
        return {
            "patch_proj": linear_init(k_patch, self.patch_dim, self.dim,
                                      use_bias=True, dtype=dtype),
            "pos_emb": embedding_init(k_pos, self.num_patches, self.dim, dtype),
            "transformer": transformer_init(
                k_tr, self.dim, depth=self.depth, dim_head=self.dim_head,
                heads=self.heads, ff_mult=self.ff_mult, dtype=dtype),
            "to_cls": linear_init(k_cls, self.dim, self.dim, dtype=dtype),
        }

    def patchify(self, x: jax.Array) -> jax.Array:
        """(b, c, H, W) -> (b, h*w, p*p*c) with per-patch feature order
        (p1, p2, c) — matching the reference einops rearrange."""
        b, c, H, W = x.shape
        p = self.patch_size
        h, w = H // p, W // p
        x = x.reshape(b, c, h, p, w, p)
        x = x.transpose(0, 2, 4, 3, 5, 1)  # b h w p1 p2 c
        return x.reshape(b, h * w, p * p * c)

    def apply(self, params, x: jax.Array, *,
              keep_all_patches: bool = False,
              rng: Optional[jax.Array] = None, training: bool = False,
              attn_impl: str = "xla",
              return_hidden: Optional[int] = None):
        rng_pd = rng_tr = None
        if rng is not None:
            rng_pd, rng_tr = jax.random.split(rng)

        patches = self.patchify(x)
        n = patches.shape[1]

        if training and self.patch_dropout > 0.0 and not keep_all_patches:
            # FLIP patch dropout as a token GATHER BEFORE the patch projection:
            # the projection and pos-emb add commute with the gather, so this
            # is numerically identical to the reference's drop-after-pos-emb
            # (x_clip.py:383-385) while also skipping the dropped patches'
            # projection FLOPs (the BASELINE.json north-star optimization).
            assert rng_pd is not None, "patch dropout requires an rng during training"
            b = patches.shape[0]
            num_keep = max(1, int(n * (1 - self.patch_dropout)))
            scores = jax.random.uniform(rng_pd, (b, n))
            _, keep_idx = jax.lax.top_k(scores, num_keep)
            patches = jnp.take_along_axis(patches, keep_idx[:, :, None], axis=1)
            pos = jnp.take(params["pos_emb"]["emb"], keep_idx, axis=0)
            tokens = (patches @ params["patch_proj"]["w"]
                      + params["patch_proj"]["b"] + pos)
        else:
            tokens = patches @ params["patch_proj"]["w"] + params["patch_proj"]["b"]
            tokens = tokens + params["pos_emb"]["emb"][None, :n, :]

        out = transformer_apply(
            params["transformer"], tokens,
            heads=self.heads, dim_head=self.dim_head,
            attn_dropout=self.attn_dropout, ff_dropout=self.ff_dropout,
            rng=rng_tr, training=training,
            checkpoint_during_training=self.checkpoint_during_training,
            remat_policy=self.remat_policy,
            scan_layers=self.scan_layers,
            ff_impl=self.ff_impl,
            attn_impl=attn_impl,
            return_hidden=return_hidden)
        if return_hidden is not None:
            out, hidden = out

        cls = jnp.mean(out, axis=1) @ params["to_cls"]["w"]
        full = jnp.concatenate([cls[:, None, :], out], axis=1)
        if return_hidden is not None:
            return full, hidden
        return full
