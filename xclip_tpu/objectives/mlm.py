"""DeCLIP-style masked-language-modeling head over a shared text tower.

Behavioral parity with reference `x_clip/mlm.py`:
  * `get_mask_subset_with_prob` (mlm.py:18-32): per-row selection of ≈prob
    fraction of eligible positions, with the ceil cap + cumsum excess trick
    and the (seq+1)-buffer scatter where index 0 is the discard slot.
  * `MLM.forward` (mlm.py:68-109): labels are the original tokens where
    masked else pad_id; optional random-token corruption; [mask] substitution
    with prob `replace_prob`; shared text transformer runs on the corrupted
    sequence; `to_logits` is a biased Linear(dim → num_tokens); position 0 of
    the logits is DROPPED (assumes a prepended CLS, mlm.py:101);
    cross-entropy ignores `pad_token_id` labels.

The transformer is passed in functionally (encoder config + its params) —
weight sharing with the CLIP text tower is by construction, not by holding a
module reference.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn.core import linear_init


def mask_with_tokens(t: jax.Array, token_ids: Tuple[int, ...]) -> jax.Array:
    """True where t equals any of token_ids — mlm.py:13-16."""
    mask = jnp.zeros(t.shape, dtype=bool)
    for tid in token_ids:
        mask = mask | (t == tid)
    return mask


def get_mask_subset_with_prob(rng: jax.Array, mask: jax.Array, prob: float) -> jax.Array:
    """JAX port of mlm.py:18-32 (same excess-suppression semantics)."""
    b, seq_len = mask.shape
    max_masked = math.ceil(prob * seq_len)

    num_tokens = mask.sum(axis=-1, keepdims=True)
    mask_excess = jnp.cumsum(mask, axis=-1) > jnp.ceil(num_tokens * prob)
    mask_excess = mask_excess[:, :max_masked]

    rand = jnp.where(mask, jax.random.uniform(rng, (b, seq_len)), -1e9)
    _, sampled = jax.lax.top_k(rand, max_masked)
    sampled = jnp.where(mask_excess, 0, sampled + 1)

    new_mask = jnp.zeros((b, seq_len + 1), dtype=bool)
    new_mask = new_mask.at[jnp.arange(b)[:, None], sampled].set(True)
    return new_mask[:, 1:]


@dataclasses.dataclass(frozen=True)
class MLM:
    dim: int
    num_tokens: int
    mask_prob: float = 0.15
    replace_prob: float = 0.9
    random_token_prob: float = 0.0
    mask_token_id: int = 2
    pad_token_id: int = 0
    mask_ignore_token_ids: Tuple[int, ...] = ()

    @property
    def ignore_ids(self) -> Tuple[int, ...]:
        return tuple({*self.mask_ignore_token_ids, self.pad_token_id})

    def init(self, key, dtype=jnp.float32):
        return {"to_logits": linear_init(key, self.dim, self.num_tokens,
                                         use_bias=True, dtype=dtype)}

    def apply(self, params, text_encoder, text_params, seq: jax.Array, *,
              mask: Optional[jax.Array] = None, rng: jax.Array,
              training: bool = True, attn_impl: str = "xla") -> jax.Array:
        r_subset, r_random, r_replace, r_enc = jax.random.split(rng, 4)

        no_mask = mask_with_tokens(seq, self.ignore_ids)
        mlm_mask = get_mask_subset_with_prob(r_subset, ~no_mask, self.mask_prob)

        labels = jnp.where(mlm_mask, seq, self.pad_token_id)
        masked_seq = seq

        if self.random_token_prob > 0:
            r_rand_p, r_rand_tok = jax.random.split(r_random)
            random_token_prob = jax.random.uniform(r_rand_p, seq.shape) < self.random_token_prob
            random_tokens = jax.random.randint(r_rand_tok, seq.shape, 0, self.num_tokens)
            random_no_mask = mask_with_tokens(random_tokens, self.ignore_ids)
            random_token_prob = random_token_prob & ~random_no_mask
            masked_seq = jnp.where(random_token_prob, random_tokens, masked_seq)
            mlm_mask = mlm_mask & ~random_token_prob

        replace = jax.random.uniform(r_replace, seq.shape) < self.replace_prob
        masked_seq = jnp.where(mlm_mask & replace, self.mask_token_id, masked_seq)

        embedding = text_encoder.apply(text_params, masked_seq, mask,
                                       rng=r_enc, training=training,
                                       attn_impl=attn_impl)

        logits = embedding @ params["to_logits"]["w"] + params["to_logits"]["b"]
        logits = logits[:, 1:]  # drop CLS position (mlm.py:101)

        # cross-entropy with ignore_index=pad_token_id (mean over kept labels)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        picked = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        keep = labels != self.pad_token_id
        count = jnp.clip(keep.sum(), min=1)
        return -(jnp.where(keep, picked, 0.0).sum() / count).astype(embedding.dtype)
