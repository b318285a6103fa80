"""Functional CLIP orchestrator — the TPU-native equivalent of the reference
`CLIP` module (`x_clip/x_clip.py:412-875`), expressed as a frozen-dataclass
config with pure `init`/`apply`.

Capability parity (each mirrors a reference mechanism):
  * pluggable text/image towers (internal ones built by `api.CLIP` when absent)
  * FLIP patch dropout (in the vision tower), LiT frozen towers
    (freeze_* → `stop_gradient`, x_clip.py:394-408)
  * FILIP `use_all_token_embeds`, `downsample_image_embeds` (depthwise 4×4 s2
    conv + 1×1 conv latent head, x_clip.py:560-568)
  * DCL, CLOOB `extra_latent_projection` (extra heads ALWAYS allocated, init
    as copies of the main heads, matching x_clip.py:585-586 for
    checkpoint-shape parity), similarity regularization
  * DeCLIP MLM text SSL + SimSiam/SimCLR visual SSL over the SHARED towers,
    multiview augmented losses (leading `m` view axis end-to-end)
  * causal text with EOS-token pooling (EOS embedding moved to position 0,
    x_clip.py:670-685 — the reference's undefined-`b` bug fixed, §2.7.2)
  * return modes: loss / encodings / latents / similarity scores × exp(τ)
  * cross-device negatives via `axis_name` (lax.all_gather over the mesh)

The reference's implicit `self.training` becomes an explicit `training` flag
(defaulting to `return_loss`) plus an rng key threaded through every
stochastic branch.

NOTE on SSL-head BatchNorm running statistics: they are pure bookkeeping
(zero gradient) and only flow OUT of `apply` via `return_metrics=True`
(`metrics["bn_updates"]`), which `train.make_train_step` folds back into the
param tree each step. A bare `apply(..., return_loss=True)` trains correctly
(train-mode BN normalizes with current-batch stats, like torch) but leaves
the stored running stats at their initial (0, 1) — use the train step, or
pass `return_metrics=True` and merge, if you need torch-parity running stats
for later eval-mode use of the SSL heads.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from .nn.core import RngStream, linear_init
from .objectives.contrastive import clip_contrastive_loss
from .utils import cast_tuple, l2norm


def _conv_init(key, out_c, in_c_per_group, kh, kw, use_bias, dtype=jnp.float32):
    fan_in = in_c_per_group * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    kw_, kb_ = jax.random.split(key)
    p = {"w": jax.random.uniform(kw_, (out_c, in_c_per_group, kh, kw),
                                 minval=-bound, maxval=bound, dtype=dtype)}
    if use_bias:
        p["b"] = jax.random.uniform(kb_, (out_c,), minval=-bound, maxval=bound, dtype=dtype)
    return p


@dataclasses.dataclass(frozen=True)
class CLIPModel:
    text_encoder: Any
    visual_encoder: Any
    dim_text: int = 512
    dim_image: int = 512
    dim_latent: int = 512
    text_pad_id: int = 0
    text_has_cls_token: bool = True
    visual_has_cls_token: bool = True
    text_causal_mask: bool = False
    text_eos_id: Optional[int] = None
    text_encode_without_mask: bool = False
    use_all_token_embeds: bool = False
    downsample_image_embeds: bool = False
    decoupled_contrastive_learning: bool = False
    extra_latent_projection: bool = False
    mlm: Any = None                       # objectives.mlm.MLM or None
    text_ssl_loss_weight: float = 0.0
    visual_ssl: Any = None                # objectives.ssl.SimSiam/SimCLR or None
    image_ssl_loss_weight: float = 0.0
    multiview_loss_weight: float = 0.1
    sim_reg_loss_weight: float = 0.0
    attn_impl: str = "xla"
    # vision-tower override (None = inherit attn_impl). The flagship vision
    # tower runs 33-token sequences: per-image Pallas grid steps put 48 rows
    # on 128-row MXU tiles, while XLA batches the qkv/projection matmuls
    # across the whole batch — measured faster there (docs/DESIGN.md).
    visual_attn_impl: Optional[str] = None
    loss_impl: str = "xla"               # "fused" = Pallas streaming-LSE InfoNCE
    filip_block: Optional[int] = None    # column-blocked FILIP reductions
    compute_dtype: Optional[str] = None  # e.g. "bfloat16" for MXU-rate matmuls

    def __post_init__(self):
        assert self.use_all_token_embeds or self.visual_has_cls_token or self.text_has_cls_token, (
            "CLS token must be included on both vision and text transformers if you "
            "are not using fine-grained contrastive learning loss")
        assert not (self.text_causal_mask and self.text_eos_id is None), (
            "text EOS token id must be given if using causal mask in text transformer")
        if self.downsample_image_embeds:
            assert self.use_all_token_embeds, (
                "must be using all token embeds for contrastive learning in order to downsampling")

    # ------------------------------------------------------------------ init
    def init(self, key, dtype=jnp.float32):
        k_text, k_vis, k_tl, k_vl, k_mlm, k_ssl = jax.random.split(key, 6)

        params = {
            "text": self.text_encoder.init(k_text, dtype=dtype),
            "visual": self.visual_encoder.init(k_vis, dtype=dtype),
            "to_text_latent": linear_init(k_tl, self.dim_text, self.dim_latent, dtype=dtype),
            "temperature": jnp.ones((), dtype=dtype),
        }

        if self.downsample_image_embeds:
            kd, kp = jax.random.split(k_vl)
            params["to_visual_latent"] = {
                "dw": _conv_init(kd, self.dim_image, 1, 4, 4, use_bias=False, dtype=dtype),
                "pw": _conv_init(kp, self.dim_latent, self.dim_image, 1, 1,
                                 use_bias=True, dtype=dtype),
            }
        else:
            params["to_visual_latent"] = linear_init(
                k_vl, self.dim_image, self.dim_latent, dtype=dtype)

        # extra heads are unconditionally allocated, initialized as copies of
        # the main heads (deepcopy in the reference, x_clip.py:585-586)
        params["to_text_latent_extra"] = jax.tree.map(jnp.copy, params["to_text_latent"])
        params["to_visual_latent_extra"] = jax.tree.map(jnp.copy, params["to_visual_latent"])

        if self.mlm is not None:
            params["mlm"] = self.mlm.init(k_mlm, dtype=dtype)
        if self.visual_ssl is not None:
            params["visual_ssl"] = self.visual_ssl.init(k_ssl, self.visual_encoder, dtype=dtype)
        return params

    # -------------------------------------------------------------- latents
    def _visual_latent(self, head, image_embeds):
        """`head` is the to_visual_latent (or _extra) param subtree."""
        if not self.downsample_image_embeds:
            return image_embeds @ head["w"]
        b, i, d = image_embeds.shape
        h = int(math.sqrt(i))
        assert h * h == i, "downsample_image_embeds requires a square token grid " \
                           "(disable patch dropout on this path)"
        x = image_embeds.transpose(0, 2, 1).reshape(b, d, h, h)
        x = jax.lax.conv_general_dilated(
            x, head["dw"]["w"], window_strides=(2, 2),
            padding=((1, 1), (1, 1)), feature_group_count=d,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = jax.lax.conv_general_dilated(
            x, head["pw"]["w"], window_strides=(1, 1),
            padding="VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = x + head["pw"]["b"][None, :, None, None]
        b, c, hh, ww = x.shape
        return x.reshape(b, c, hh * ww).transpose(0, 2, 1)

    def _eos_reorder(self, enc_text, text):
        """Causal-text pooling: move the FIRST EOS position's embedding to
        index 0 so downstream CLS-style pooling reads it (x_clip.py:670-685;
        the reference's undefined-`b` bug fixed, SURVEY §2.7.2). The
        remaining rows keep their original order after it.

        Contract: every row SHOULD contain `text_eos_id` — the reference
        silently requires this (its masked argmax reads garbage otherwise).
        Defined fallback here (VERDICT r3): a row with no EOS pools its LAST
        non-pad token instead (the natural causal summary position); that
        position's embedding then also remains at its original place among
        the per-token embeddings. An all-pad row pools its final position.
        """
        eos_mask = text == self.text_eos_id
        eos_onehot = (jnp.cumsum(eos_mask, axis=-1) == 1) & eos_mask
        eos_idx = jnp.argmax(eos_onehot, axis=-1)
        has_eos = eos_mask.any(axis=-1)
        nonpad = text != self.text_pad_id
        last_valid = text.shape[-1] - 1 - jnp.argmax(nonpad[:, ::-1], axis=-1)
        eos_idx = jnp.where(has_eos, eos_idx, last_valid)
        eos_tokens = jnp.take_along_axis(enc_text, eos_idx[:, None, None], axis=1)
        rest_order = jnp.argsort(eos_onehot.astype(jnp.int32), axis=-1,
                                 stable=True)[:, : text.shape[-1] - 1]
        rest = jnp.take_along_axis(enc_text, rest_order[:, :, None], axis=1)
        return jnp.concatenate([eos_tokens, rest], axis=1)

    # ------------------------------------------------------ single-tower API
    def _cast_params(self, params):
        if self.compute_dtype is None:
            return params
        cdtype = jnp.dtype(self.compute_dtype)
        return jax.tree.map(
            lambda x: x.astype(cdtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, params)

    def encode_text(self, params, text, *, rng=None, training=False):
        """Text-only encoding → l2-normed latents (the text half of
        `apply`'s latent path, x_clip.py:662-685,702-716) — for retrieval /
        zero-shot use where images aren't paired with the texts."""
        params = self._cast_params(params)
        text_mask = text != self.text_pad_id
        enc_mask = None if self.text_encode_without_mask else text_mask
        enc_text = self.text_encoder.apply(
            params["text"], text, enc_mask, rng=rng, training=training,
            attn_impl=self.attn_impl)
        if self.text_causal_mask:
            enc_text = self._eos_reorder(enc_text, text)
        if self.use_all_token_embeds:
            embeds = enc_text[:, 1:] if self.text_has_cls_token else enc_text
        else:
            embeds = enc_text[:, 0] if enc_text.ndim == 3 else enc_text
        return l2norm((embeds @ params["to_text_latent"]["w"]).astype(jnp.float32))

    def encode_image(self, params, image, *, rng=None, training=False):
        """Image-only encoding → l2-normed latents (x_clip.py:689-718)."""
        params = self._cast_params(params)
        if self.compute_dtype is not None:
            image = image.astype(jnp.dtype(self.compute_dtype))
        enc_image = self.visual_encoder.apply(
            params["visual"], image, rng=rng, training=training,
            attn_impl=self.visual_attn_impl or self.attn_impl)
        if self.use_all_token_embeds:
            embeds = enc_image[:, 1:] if self.visual_has_cls_token else enc_image
        else:
            embeds = enc_image[:, 0] if enc_image.ndim == 3 else enc_image
        return l2norm(self._visual_latent(
            params["to_visual_latent"], embeds).astype(jnp.float32))

    # --------------------------------------------------------------- apply
    def apply(self, params, text, image, *,
              return_loss: bool = False,
              return_encodings: bool = False,
              return_latents: bool = False,
              freeze_image_encoder: bool = False,
              freeze_text_encoder: bool = False,
              text_to_image: bool = True,
              aug_text: Optional[Tuple[jax.Array, ...]] = None,
              aug_image: Optional[Tuple[jax.Array, ...]] = None,
              rng: Optional[jax.Array] = None,
              training: Optional[bool] = None,
              axis_name: Optional[str] = None,
              gather_impl: str = "sharded",
              return_metrics: bool = False,
              row_valid: Optional[jax.Array] = None):
        training = return_loss if training is None else training
        rngs = RngStream(rng)
        if row_valid is not None:
            # pad-and-mask escape hatch for a final short batch (reference
            # distributed.py:14-39 spirit): rows marked invalid leave the
            # contrastive numerators, denominators, and the mean count, so
            # the padded step's loss equals the truncated batch's. Only the
            # plain InfoNCE path masks rows — the aux objectives would
            # still average over padding, so they must be off.
            assert self.mlm is None and self.visual_ssl is None, \
                "row_valid only masks the contrastive loss; disable " \
                "use_mlm / use_visual_ssl or drop the final short batch"
        metrics = {}

        # mixed precision: params/images cast to the compute dtype on entry;
        # LayerNorm stats, softmax, and the contrastive loss stay fp32
        # (nn/core.py, nn/layers.py, the .astype(f32) below)
        if self.compute_dtype is not None:
            cdtype = jnp.dtype(self.compute_dtype)
            params = jax.tree.map(
                lambda x: x.astype(cdtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
            image = image.astype(cdtype)

        # ---- text padding mask (x_clip.py:614)
        text_mask = text != self.text_pad_id

        # ---- auxiliary SSL losses (x_clip.py:618-623)
        text_ssl_loss = jnp.zeros(())
        image_ssl_loss = jnp.zeros(())
        if return_loss and self.mlm is not None:
            text_ssl_loss = self.mlm.apply(
                params["mlm"], self.text_encoder, params["text"], text,
                mask=text_mask, rng=rngs.next(), training=training,
                attn_impl=self.attn_impl)
        bn_updates = None
        if return_loss and self.visual_ssl is not None:
            image_ssl_loss = self.visual_ssl.apply(
                params["visual_ssl"], self.visual_encoder, params["visual"],
                image, rng=rngs.next(), training=training,
                attn_impl=self.visual_attn_impl or self.attn_impl,
                return_bn_updates=return_metrics)
            if return_metrics:
                image_ssl_loss, bn_updates = image_ssl_loss

        # ---- multiview concat (x_clip.py:629-653)
        num_batch_texts = num_batch_images = 1
        if aug_text is not None:
            aug_text = cast_tuple(aug_text)
            assert all(t.shape == text.shape for t in aug_text)
            num_batch_texts = len(aug_text) + 1
            text = jnp.concatenate([text, *aug_text], axis=0)
            text_mask = text != self.text_pad_id
        if aug_image is not None:
            aug_image = cast_tuple(aug_image)
            assert all(i.shape == image.shape for i in aug_image)
            num_batch_images = len(aug_image) + 1
            image = jnp.concatenate([image, *aug_image], axis=0)

        is_multiview = num_batch_texts > 1 or num_batch_images > 1
        assert not (return_loss and not training), "loss cannot be used if not training"
        assert not (not return_loss and is_multiview), \
            "do not pass in augmented texts or images if not training"
        assert not (self.multiview_loss_weight == 0 and is_multiview), \
            "multiview loss weight cannot be 0 if augmented text or images passed in"

        # ---- encode text
        enc_mask = None if self.text_encode_without_mask else text_mask
        with jax.named_scope("text_tower"):
            enc_text = self.text_encoder.apply(
                params["text"], text, enc_mask,
                rng=rngs.next() if rng is not None else None,
                training=training, attn_impl=self.attn_impl)
        if freeze_text_encoder:
            enc_text = jax.lax.stop_gradient(enc_text)

        # ---- causal text: move EOS embedding to position 0 (x_clip.py:670-685)
        if self.text_causal_mask:
            enc_text = self._eos_reorder(enc_text, text)

        # ---- encode image
        with jax.named_scope("vision_tower"):
            enc_image = self.visual_encoder.apply(
                params["visual"], image,
                rng=rngs.next() if rng is not None else None,
                training=training,
                attn_impl=self.visual_attn_impl or self.attn_impl)
        if freeze_image_encoder:
            enc_image = jax.lax.stop_gradient(enc_image)

        if return_encodings:
            return enc_text, enc_image

        # ---- select embeddings: all tokens (FILIP) vs CLS (x_clip.py:702-709)
        if self.use_all_token_embeds:
            text_embeds = enc_text[:, 1:] if self.text_has_cls_token else enc_text
            image_embeds = enc_image[:, 1:] if self.visual_has_cls_token else enc_image
        else:
            text_embeds = enc_text[:, 0] if enc_text.ndim == 3 else enc_text
            image_embeds = enc_image[:, 0] if enc_image.ndim == 3 else enc_image

        # ---- latent projections + l2norm (x_clip.py:713-724); the projection
        # matmul runs in the compute dtype, normalization and everything
        # downstream (similarities, LSE) in fp32
        def to_f32(x):
            return x.astype(jnp.float32)

        text_latents = l2norm(to_f32(text_embeds @ params["to_text_latent"]["w"]))
        image_latents = l2norm(to_f32(
            self._visual_latent(params["to_visual_latent"], image_embeds)))

        text_latents_extra, image_latents_extra = text_latents, image_latents
        if self.extra_latent_projection:
            text_latents_extra = l2norm(to_f32(
                text_embeds @ params["to_text_latent_extra"]["w"]))
            image_latents_extra = l2norm(to_f32(
                self._visual_latent(params["to_visual_latent_extra"], image_embeds)))

        if return_latents:
            if self.extra_latent_projection:
                return text_latents, image_latents, text_latents_extra, image_latents_extra
            return text_latents, image_latents

        temp = jnp.exp(params["temperature"].astype(jnp.float32))

        # ---- inference scoring (x_clip.py:740-746)
        if not return_loss:
            use_extra = self.extra_latent_projection and not text_to_image
            tl = text_latents_extra if use_extra else text_latents
            il = image_latents_extra if use_extra else image_latents
            if self.use_all_token_embeds:
                return jnp.einsum("btd,bid->bti", tl, il) * temp
            return jnp.einsum("bd,bd->b", tl, il) * temp

        # ---- multiview split (x_clip.py:750-755)
        def split_views(t, m):
            return t.reshape(m, t.shape[0] // m, *t.shape[1:])

        text_latents = split_views(text_latents, num_batch_texts)
        image_latents = split_views(image_latents, num_batch_images)
        if self.extra_latent_projection:
            text_latents_extra = split_views(text_latents_extra, num_batch_texts)
            image_latents_extra = split_views(image_latents_extra, num_batch_images)

        with jax.named_scope("contrastive_loss"):
            cl_losses, sim_reg_loss = clip_contrastive_loss(
                text_latents, image_latents, temp,
                text_mask=text_mask if self.use_all_token_embeds else None,
                use_all_token_embeds=self.use_all_token_embeds,
                decoupled_contrastive_learning=self.decoupled_contrastive_learning,
                text_latents_extra=text_latents_extra if self.extra_latent_projection else None,
                image_latents_extra=image_latents_extra if self.extra_latent_projection else None,
                sim_reg=self.sim_reg_loss_weight > 0.0,
                axis_name=axis_name, gather_impl=gather_impl,
                loss_impl=self.loss_impl, filip_block=self.filip_block,
                row_valid=row_valid)

        cl_loss, multiview_cl_loss = cl_losses[0], cl_losses[1:]

        # distributed SSL semantics: the MLM / visual-SSL losses are computed
        # on the LOCAL shard; average them over the data axis so gradients
        # match DDP's grad-averaging (the reference's torch.distributed
        # setup). Without this, shard_map grads would SUM the per-device SSL
        # terms — world_size× too strong.
        if axis_name is not None:
            text_ssl_loss = jax.lax.pmean(text_ssl_loss, axis_name)
            image_ssl_loss = jax.lax.pmean(image_ssl_loss, axis_name)

        # ---- weighted total (x_clip.py:851-875)
        text_ssl_w = self.text_ssl_loss_weight if self.mlm is not None else 0.0
        image_ssl_w = self.image_ssl_loss_weight if self.visual_ssl is not None else 0.0
        multiview_w = self.multiview_loss_weight if is_multiview else 0.0
        cl_loss_weight = 1.0 - (text_ssl_w + image_ssl_w + multiview_w)

        loss = (cl_loss * cl_loss_weight
                + text_ssl_loss * text_ssl_w
                + image_ssl_loss * image_ssl_w)
        if is_multiview:
            loss = loss + multiview_cl_loss.mean() * multiview_w
        if self.sim_reg_loss_weight > 0.0:
            loss = loss + sim_reg_loss * self.sim_reg_loss_weight

        if return_metrics:
            metrics = {
                "loss": loss,
                "cl_loss": cl_loss,
                "text_ssl_loss": text_ssl_loss,
                "image_ssl_loss": image_ssl_loss,
                "multiview_cl_loss": (multiview_cl_loss.mean()
                                      if is_multiview else jnp.zeros(())),
                "sim_reg_loss": sim_reg_loss,
                "temperature": temp,
            }
            if bn_updates is not None:
                # SSL-head BatchNorm running stats (torch-exact sequential
                # EMA) — consumed by the train step, which folds them back
                # into params["visual_ssl"]
                metrics["bn_updates"] = {"visual_ssl": bn_updates}
            return loss, metrics
        return loss
