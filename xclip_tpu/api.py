"""User-facing `CLIP` — the exact constructor/forward surface of the
reference (`x_clip/x_clip.py:413-455` kwargs with identical defaults;
`x_clip.py:597-608` forward flags), wrapped around the functional
`CLIPModel` core.

JAX-specific additions (keyword-only, all optional):
  * `key`          — PRNG key for parameter init (default PRNGKey(0))
  * `param_dtype`  — parameter dtype (default float32)
  * `compute_dtype` — e.g. 'bfloat16': params/images cast at apply entry,
    fp32 statistics kept in registers (see docs/DESIGN.md)
  * `attn_impl`    — 'xla' (default); 'fused' = whole-attention-block
    Pallas kernels (megablock/head-group, the short-seq winners — see
    README Performance); 'fused_recompute' = megablock with the
    recompute backward (no stored-qkv residual — the memory-lean choice
    for large local batches, docs/SCALING.md); 'fused_qkv' = megablock
    storing ONLY qkv (the speed/HBM middle point — the dim-768 winner);
    'flash' = k-blocked flash (long seq, ≳2k)
  * `loss_impl`    — 'xla' (default) or 'fused' (Pallas streaming-LSE)
  * `ff_impl`      — 'xla' (default); 'block' = whole-FF-block Pallas
    kernel (LN+GEGLU+LN+matmuls+residual, tile-wise recompute backward);
    'block_stored' = same kernel keeping the pre-GEGLU activation as a
    backward residual (fastest measured — README Performance); 'fused' =
    GEGLU+inner-LN only
  * `filip_block`  — column-block the FILIP score reductions
  * `scan_layers`  — False unrolls the layer loop (fastest with no remat)
  * `remat_policy` — None or 'dots' (with checkpoint_during_training)
  * forward: `rng=`, `params=`, `training=` for explicit functional use;
    when omitted during training, an internal host-side key counter supplies
    fresh randomness per call (the torch reference relies on global RNG the
    same way).

For training loops, use the functional pair directly:
    model, params = clip.model, clip.params
    loss = model.apply(params, text, image, return_loss=True, rng=key)
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .model import CLIPModel
from .nn.text import TextTransformer
from .nn.vision import VisionTransformer
from .objectives.mlm import MLM
from .objectives.ssl import SimCLR, SimSiam


def groupby_prefix_and_trim(prefix: str, d: dict):
    """kwargs routing helper — reference x_clip.py:83-104."""
    with_prefix = {k[len(prefix):]: v for k, v in d.items() if k.startswith(prefix)}
    without = {k: v for k, v in d.items() if not k.startswith(prefix)}
    return with_prefix, without


@partial(jax.jit, static_argnames=(
    "model", "return_loss", "return_encodings", "return_latents",
    "freeze_image_encoder", "freeze_text_encoder", "text_to_image",
    "training", "axis_name", "return_metrics"))
def _jitted_apply(model, params, text, image, rng, aug_text, aug_image, *,
                  return_loss, return_encodings, return_latents,
                  freeze_image_encoder, freeze_text_encoder, text_to_image,
                  training, axis_name, return_metrics):
    return model.apply(
        params, text, image, rng=rng, aug_text=aug_text, aug_image=aug_image,
        return_loss=return_loss, return_encodings=return_encodings,
        return_latents=return_latents, freeze_image_encoder=freeze_image_encoder,
        freeze_text_encoder=freeze_text_encoder, text_to_image=text_to_image,
        training=training, axis_name=axis_name, return_metrics=return_metrics)


class CLIP:
    def __init__(
        self,
        *,
        image_encoder=None,
        text_encoder=None,
        dim_text=512,
        dim_image=512,
        dim_latent=512,
        num_text_tokens=10000,
        text_enc_depth=6,
        text_seq_len=256,
        text_heads=8,
        text_dim_head=64,
        text_has_cls_token=True,
        text_pad_id=0,
        text_rotary_pos_emb=False,
        text_causal_mask=False,
        text_eos_id=None,
        text_encode_without_mask=False,
        visual_enc_depth=6,
        visual_heads=8,
        visual_dim_head=64,
        visual_image_size=256,
        visual_patch_size=32,
        visual_patch_dropout=0.5,
        visual_has_cls_token=True,
        channels=3,
        use_all_token_embeds=False,
        downsample_image_embeds=False,
        decoupled_contrastive_learning=False,
        extra_latent_projection=False,
        use_mlm=False,
        text_ssl_loss_weight=0.05,
        use_visual_ssl=False,
        visual_ssl=None,
        visual_ssl_type='simsiam',
        visual_ssl_hidden_layer=-1,
        simclr_temperature=0.1,
        image_ssl_loss_weight=0.05,
        multiview_loss_weight=0.1,
        checkpoint_during_training=False,
        sim_reg_loss_weight=0.,
        # JAX-specific extras (keyword-only, optional)
        key: Optional[jax.Array] = None,
        param_dtype=jnp.float32,
        attn_impl: str = "xla",
        visual_attn_impl: Optional[str] = None,
        loss_impl: str = "xla",
        filip_block: Optional[int] = None,
        remat_policy: Optional[str] = None,
        scan_layers: bool = True,
        ff_impl: str = "xla",
        compute_dtype: Optional[str] = None,
        **kwargs,
    ):
        if text_encoder is None:
            text_encoder = TextTransformer(
                dim=dim_text,
                num_tokens=num_text_tokens + (1 if use_mlm else 0),
                max_seq_len=text_seq_len,
                depth=text_enc_depth,
                heads=text_heads,
                causal=text_causal_mask,
                dim_head=text_dim_head,
                rotary_pos_emb=text_rotary_pos_emb,
                checkpoint_during_training=checkpoint_during_training,
                remat_policy=remat_policy,
                scan_layers=scan_layers,
                ff_impl=ff_impl,
            )

        if image_encoder is None:
            image_encoder = VisionTransformer(
                dim=dim_image,
                image_size=visual_image_size,
                patch_size=visual_patch_size,
                channels=channels,
                depth=visual_enc_depth,
                heads=visual_heads,
                dim_head=visual_dim_head,
                patch_dropout=visual_patch_dropout,
                checkpoint_during_training=checkpoint_during_training,
                remat_policy=remat_policy,
                scan_layers=scan_layers,
                ff_impl=ff_impl,
            )

        mlm = None
        if use_mlm:
            mlm_kwargs, kwargs = groupby_prefix_and_trim('mlm_', kwargs)
            if 'mask_ignore_token_ids' in mlm_kwargs:
                mlm_kwargs['mask_ignore_token_ids'] = tuple(
                    mlm_kwargs['mask_ignore_token_ids'])
            mlm = MLM(dim=dim_text, num_tokens=num_text_tokens, **mlm_kwargs)

        use_visual_ssl = use_visual_ssl or (visual_ssl is not None)
        if visual_ssl is None and use_visual_ssl:
            if visual_ssl_type == 'simsiam':
                visual_ssl = SimSiam(
                    image_size=visual_image_size, channels=channels,
                    hidden_layer=visual_ssl_hidden_layer)
            elif visual_ssl_type == 'simclr':
                visual_ssl = SimCLR(
                    image_size=visual_image_size, channels=channels,
                    temperature=simclr_temperature,
                    hidden_layer=visual_ssl_hidden_layer)
            else:
                raise ValueError('unknown visual_ssl_type')

        if kwargs:
            raise TypeError(f"unexpected CLIP kwargs: {sorted(kwargs)}")

        self.model = CLIPModel(
            text_encoder=text_encoder,
            visual_encoder=image_encoder,
            dim_text=dim_text,
            dim_image=dim_image,
            dim_latent=dim_latent,
            text_pad_id=text_pad_id,
            text_has_cls_token=text_has_cls_token,
            visual_has_cls_token=visual_has_cls_token,
            text_causal_mask=text_causal_mask,
            text_eos_id=text_eos_id,
            text_encode_without_mask=text_encode_without_mask,
            use_all_token_embeds=use_all_token_embeds,
            downsample_image_embeds=downsample_image_embeds,
            decoupled_contrastive_learning=decoupled_contrastive_learning,
            extra_latent_projection=extra_latent_projection,
            mlm=mlm,
            text_ssl_loss_weight=text_ssl_loss_weight if use_mlm else 0,
            visual_ssl=visual_ssl,
            image_ssl_loss_weight=image_ssl_loss_weight if use_visual_ssl else 0,
            multiview_loss_weight=multiview_loss_weight,
            sim_reg_loss_weight=sim_reg_loss_weight,
            attn_impl=attn_impl,
            visual_attn_impl=visual_attn_impl,
            loss_impl=loss_impl,
            filip_block=filip_block,
            compute_dtype=compute_dtype,
        )

        key = key if key is not None else jax.random.PRNGKey(0)
        init_key, self._call_key = jax.random.split(key)
        self.params = self.model.init(init_key, dtype=param_dtype)
        self._call_count = 0

    # reference-style attribute aliases
    @property
    def text_transformer(self):
        return self.model.text_encoder

    @property
    def visual_transformer(self):
        return self.model.visual_encoder

    @property
    def temperature(self):
        return self.params["temperature"]

    def init(self, key, dtype=jnp.float32):
        return self.model.init(key, dtype=dtype)

    def save(self, path: str) -> None:
        """Persist `self.params` with Orbax (the torch.save analogue —
        the reference leaves checkpointing entirely to user code)."""
        from .train.checkpoint import save_checkpoint
        save_checkpoint(path, self.params)

    def load(self, path: str) -> None:
        """Restore params saved by `save` into this model (in place).
        The param-tree structure is stable across feature flags (extra
        latent heads always allocated, model.py init)."""
        from .train.checkpoint import restore_checkpoint
        self.params = restore_checkpoint(path, self.params)

    def apply(self, params, text, image, **kwargs):
        return self.model.apply(params, text, image, **kwargs)

    def __call__(self, text, image,
                 return_loss=False,
                 return_encodings=False,
                 return_latents=False,
                 freeze_image_encoder=False,
                 freeze_text_encoder=False,
                 text_to_image=True,
                 aug_text=None,
                 aug_image=None,
                 *,
                 rng=None,
                 params=None,
                 training=None,
                 axis_name=None,
                 return_metrics=False):
        params = params if params is not None else self.params
        training = return_loss if training is None else training
        if rng is None and training:
            rng = jax.random.fold_in(self._call_key, self._call_count)
            self._call_count += 1
        if aug_text is not None and not isinstance(aug_text, tuple):
            aug_text = tuple(aug_text) if isinstance(aug_text, list) else (aug_text,)
        if aug_image is not None and not isinstance(aug_image, tuple):
            aug_image = tuple(aug_image) if isinstance(aug_image, list) else (aug_image,)
        return _jitted_apply(
            self.model, params, text, image, rng, aug_text, aug_image,
            return_loss=return_loss, return_encodings=return_encodings,
            return_latents=return_latents,
            freeze_image_encoder=freeze_image_encoder,
            freeze_text_encoder=freeze_text_encoder,
            text_to_image=text_to_image, training=training,
            axis_name=axis_name, return_metrics=return_metrics)
