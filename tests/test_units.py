"""Unit tests for primitives: numerics vs small oracles, property tests for
the stochastic components (SURVEY §4), and the Pallas flash-attention kernel
vs the XLA reference path.
"""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from xclip_tpu.nn.core import layer_norm_apply, layer_norm_init
from xclip_tpu.nn.layers import (apply_rotary_pos_emb, attention_apply,
                                 attention_init, patch_dropout, rotary_freqs)
from xclip_tpu.objectives.mlm import get_mask_subset_with_prob
from xclip_tpu.utils import l2norm, masked_mean, matrix_diag


# ---------------------------------------------------------------- layer norm

def test_layer_norm_numerics():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 8).astype(np.float32))
    params = layer_norm_init(8)
    out = layer_norm_apply(params, x)
    ref = (x - x.mean(-1, keepdims=True)) / jnp.sqrt(x.var(-1, keepdims=True) + 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_layer_norm_bf16_eps():
    # dtype-dependent eps (x_clip.py:118): bf16 inputs use 1e-3
    x = jnp.ones((2, 8), dtype=jnp.bfloat16) * 3.0  # zero variance
    out = layer_norm_apply(layer_norm_init(8), x)
    assert out.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


# ------------------------------------------------------------------- rotary

def test_rotary_preserves_norm_on_rotated_dims():
    freqs = rotary_freqs(10, 8)
    t = jnp.asarray(np.random.RandomState(0).randn(2, 3, 10, 16).astype(np.float32))
    out = apply_rotary_pos_emb(freqs, t)
    # rotation preserves the norm of the rotated sub-vector
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out[..., :8]), axis=-1),
        np.linalg.norm(np.asarray(t[..., :8]), axis=-1), rtol=1e-5)
    # pass-through dims untouched
    np.testing.assert_array_equal(np.asarray(out[..., 8:]), np.asarray(t[..., 8:]))


def test_rotary_position_zero_is_identity():
    freqs = rotary_freqs(4, 8)
    t = jnp.asarray(np.random.RandomState(0).randn(1, 1, 4, 8).astype(np.float32))
    out = apply_rotary_pos_emb(freqs, t)
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), np.asarray(t[0, 0, 0]),
                               atol=1e-6)


# ------------------------------------------------------------- patch dropout

@pytest.mark.fast
def test_patch_dropout_keep_count():
    x = jnp.asarray(np.random.randn(3, 64, 8).astype(np.float32))
    for prob, expect in [(0.5, 32), (0.75, 16), (0.9, 6), (0.99, 1)]:
        out = patch_dropout(jax.random.PRNGKey(0), x, prob)
        assert out.shape == (3, expect if expect > 0 else 1, 8)
        assert out.shape[1] == max(1, int(64 * (1 - prob)))


def test_patch_dropout_rows_are_subsets():
    x = jnp.arange(2 * 16).reshape(2, 16, 1).astype(jnp.float32)
    out = patch_dropout(jax.random.PRNGKey(1), x, 0.5)
    for b in range(2):
        vals = set(np.asarray(out[b, :, 0]).tolist())
        full = set(np.asarray(x[b, :, 0]).tolist())
        assert vals <= full and len(vals) == 8  # unique subset


def test_patch_dropout_random_across_keys():
    x = jnp.arange(64, dtype=jnp.float32).reshape(1, 64, 1)
    a = patch_dropout(jax.random.PRNGKey(0), x, 0.5)
    b = patch_dropout(jax.random.PRNGKey(1), x, 0.5)
    assert not np.array_equal(np.asarray(a), np.asarray(b))


# ------------------------------------------------------------ MLM mask subset

@pytest.mark.fast
def test_mask_subset_prob_bounds():
    rng = np.random.RandomState(0)
    eligible = jnp.asarray(rng.rand(8, 32) > 0.3)
    for prob in [0.15, 0.5]:
        out = get_mask_subset_with_prob(jax.random.PRNGKey(0), eligible, prob)
        out = np.asarray(out)
        elig = np.asarray(eligible)
        per_row = out.sum(-1)
        cap = math.ceil(prob * 32)
        # hard cap from topk size (mlm.py:20,27)
        assert (per_row <= cap).all()
        # when a row has >= cap eligible positions, selection stays eligible
        for r in range(8):
            if elig[r].sum() >= cap:
                assert not (out[r] & ~elig[r]).any()


def test_mask_subset_all_eligible_hits_cap_exactly():
    eligible = jnp.ones((4, 32), dtype=bool)
    for prob in [0.15, 0.5]:
        out = get_mask_subset_with_prob(jax.random.PRNGKey(0), eligible, prob)
        cap = math.ceil(prob * 32)
        assert (np.asarray(out).sum(-1) == cap).all()


def test_mask_subset_full_prob_selects_everything():
    eligible = jnp.ones((2, 8), dtype=bool)
    out = get_mask_subset_with_prob(jax.random.PRNGKey(0), eligible, 1.0)
    assert bool(out.all())


# ------------------------------------------------------------------ helpers

def test_masked_mean():
    t = jnp.asarray([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    mask = jnp.asarray([[True, True, False], [False, False, False]])
    out = masked_mean(t, mask, axis=1)
    np.testing.assert_allclose(np.asarray(out), [1.5, 0.0], atol=1e-5)


def test_matrix_diag():
    t = jnp.asarray(np.random.randn(3, 4, 4).astype(np.float32))
    out = matrix_diag(t)
    expected = np.stack([np.diag(np.asarray(t[i])) for i in range(3)])
    np.testing.assert_array_equal(np.asarray(out), expected)


def test_l2norm_zero_safe():
    out = l2norm(jnp.zeros((2, 4)))
    assert bool(jnp.isfinite(out).all())


# -------------------------------------------------------- flash attention

@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("seq", [16, 65, 257])
def test_flash_attention_matches_xla(causal, seq):
    from xclip_tpu.kernels.flash_attention import flash_attention
    rng = np.random.RandomState(0)
    b, h, d = 2, 2, 32
    q = jnp.asarray(rng.randn(b, h, seq, d).astype(np.float32)) * d ** -0.5
    k = jnp.asarray(rng.randn(b, h, seq, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, seq, d).astype(np.float32))
    mask = jnp.asarray(rng.rand(b, seq) > 0.2)
    mask = mask.at[:, 0].set(True)  # at least one valid key per row

    out = flash_attention(q, k, v, mask=mask, causal=causal, interpret=True)

    # XLA oracle (the nn/layers.py dense path)
    sim = jnp.einsum("bhid,bhjd->bhij", q, k)
    neg = -jnp.finfo(sim.dtype).max
    sim = jnp.where(mask[:, None, None, :], sim, neg)
    if causal:
        i = jnp.arange(seq)[:, None]
        j = jnp.arange(seq)[None, :]
        sim = jnp.where(j > i, neg, sim)
    attn = jax.nn.softmax(sim.astype(jnp.float32), -1)
    expected = jnp.einsum("bhij,bhjd->bhid", attn, v)

    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               atol=2e-5, rtol=2e-4)


def test_flash_attention_inside_model():
    """attn_impl='flash' produces the same loss as 'xla' on the mock config."""
    from xclip_tpu import CLIP
    import numpy as np
    cfg = dict(dim_text=32, dim_image=32, dim_latent=32, num_text_tokens=50,
               text_enc_depth=1, text_seq_len=8, text_heads=2, text_dim_head=16,
               visual_enc_depth=1, visual_heads=2, visual_dim_head=16,
               visual_image_size=16, visual_patch_size=8,
               visual_patch_dropout=0.0)
    a = CLIP(**cfg, attn_impl="xla", key=jax.random.PRNGKey(3))
    b = CLIP(**cfg, attn_impl="flash", key=jax.random.PRNGKey(3))
    rng = np.random.RandomState(0)
    text = jnp.asarray(rng.randint(1, 50, (4, 8)))
    image = jnp.asarray(rng.randn(4, 3, 16, 16).astype(np.float32))
    la = a(text, image, return_loss=True, params=a.params)
    lb = b(text, image, return_loss=True, params=a.params)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-4)


def test_visual_attn_impl_override():
    """`visual_attn_impl` routes ONLY the vision tower: with the text tower
    on 'flash' and vision overridden to 'xla', the loss matches all-'xla'
    bit-for-bit on the vision side and to flash tolerance on text. The
    flagship bench uses fused text + xla vision (the 33-token vision
    sequences put 48-row tiles on the 128-row MXU in per-image Pallas grid
    steps; XLA batches those matmuls across the batch — README)."""
    from xclip_tpu import CLIP
    import numpy as np
    cfg = dict(dim_text=32, dim_image=32, dim_latent=32, num_text_tokens=50,
               text_enc_depth=1, text_seq_len=8, text_heads=2, text_dim_head=16,
               visual_enc_depth=1, visual_heads=2, visual_dim_head=16,
               visual_image_size=16, visual_patch_size=8,
               visual_patch_dropout=0.0)
    a = CLIP(**cfg, attn_impl="xla", key=jax.random.PRNGKey(3))
    b = CLIP(**cfg, attn_impl="flash", visual_attn_impl="xla",
             key=jax.random.PRNGKey(3))
    rng = np.random.RandomState(0)
    text = jnp.asarray(rng.randint(1, 50, (4, 8)))
    image = jnp.asarray(rng.randn(4, 3, 16, 16).astype(np.float32))
    la = a(text, image, return_loss=True, params=a.params)
    lb = b(text, image, return_loss=True, params=a.params)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-4)
    # vision-only path: identical impl → identical latents
    ia = a.model.encode_image(a.params, image)
    ib = b.model.encode_image(a.params, image)
    np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))


# ------------------------------------------------------------- augmentations

def test_default_augment_shapes_and_finite():
    from xclip_tpu.objectives.augment import default_augment
    x = jnp.asarray(np.random.RandomState(0).rand(2, 3, 32, 32).astype(np.float32))
    out = default_augment(jax.random.PRNGKey(0), x, 32)
    assert out.shape == x.shape
    assert bool(jnp.isfinite(out).all())
    out2 = default_augment(jax.random.PRNGKey(1), x, 32)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_grayscale_augment_channels():
    from xclip_tpu.objectives.augment import default_augment
    x = jnp.asarray(np.random.RandomState(0).rand(2, 1, 16, 16).astype(np.float32))
    out = default_augment(jax.random.PRNGKey(0), x, 16, channels=1)
    assert out.shape == x.shape


@pytest.mark.fast
@pytest.mark.parametrize("causal", [False, True])
def test_flash_attention_gradients_match_xla(causal):
    from xclip_tpu.kernels.flash_attention import flash_attention
    rng = np.random.RandomState(0)
    b, h, seq, d = 2, 2, 65, 16
    q = jnp.asarray(rng.randn(b, h, seq, d).astype(np.float32)) * d ** -0.5
    k = jnp.asarray(rng.randn(b, h, seq, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, seq, d).astype(np.float32))
    mask = jnp.asarray(rng.rand(b, seq) > 0.2).at[:, 0].set(True)
    cot = jnp.asarray(rng.randn(b, h, seq, d).astype(np.float32))

    def dense(q, k, v):
        sim = jnp.einsum("bhid,bhjd->bhij", q, k)
        neg = -jnp.finfo(sim.dtype).max
        sim = jnp.where(mask[:, None, None, :], sim, neg)
        if causal:
            i = jnp.arange(seq)[:, None]
            j = jnp.arange(seq)[None, :]
            sim = jnp.where(j > i, neg, sim)
        attn = jax.nn.softmax(sim.astype(jnp.float32), -1)
        return jnp.einsum("bhij,bhjd->bhid", attn, v)

    def flash(q, k, v):
        return flash_attention(q, k, v, mask=mask, causal=causal, interpret=True)

    g_dense = jax.grad(lambda *a: jnp.vdot(dense(*a), cot), argnums=(0, 1, 2))(q, k, v)
    g_flash = jax.grad(lambda *a: jnp.vdot(flash(*a), cot), argnums=(0, 1, 2))(q, k, v)
    for gd, gf, name in zip(g_dense, g_flash, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gd),
                                   atol=5e-5, rtol=5e-4, err_msg=f"d{name}")


@pytest.mark.fast
def test_fused_ff_geglu_layernorm_matches_oracle():
    """kernels/fused_ff.geglu_layernorm (one-pass GEGLU + inner LayerNorm)
    must match the XLA path in both output and grads (fp32, interpret)."""
    from xclip_tpu.kernels.fused_ff import geglu_layernorm
    from xclip_tpu.nn.core import layer_norm_apply

    rng = np.random.RandomState(0)
    h = jnp.asarray(rng.randn(7, 13, 64).astype(np.float32))
    g = jnp.asarray(rng.randn(32).astype(np.float32))
    dl = jnp.asarray(rng.randn(7, 13, 32).astype(np.float32))

    def oracle(h_, g_):
        a, b = jnp.split(h_, 2, -1)
        prod = a * jax.nn.gelu(b, approximate=False)
        return layer_norm_apply({"g": g_}, prod)

    out = geglu_layernorm(h, g, None, 8, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle(h, g)),
                               rtol=2e-5, atol=1e-5)

    f1 = lambda h_, g_: (geglu_layernorm(h_, g_, None, 8, True) * dl).sum()
    f2 = lambda h_, g_: (oracle(h_, g_) * dl).sum()
    g1h, g1g = jax.grad(f1, (0, 1))(h, g)
    g2h, g2g = jax.grad(f2, (0, 1))(h, g)
    np.testing.assert_allclose(np.asarray(g1h), np.asarray(g2h),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g1g), np.asarray(g2g),
                               rtol=1e-4, atol=1e-5)


def test_ff_impl_fused_end_to_end():
    from xclip_tpu import CLIP
    kw = dict(dim_text=32, dim_image=32, dim_latent=32, num_text_tokens=50,
              text_enc_depth=1, text_seq_len=8, text_heads=2, text_dim_head=16,
              visual_enc_depth=1, visual_heads=2, visual_dim_head=16,
              visual_image_size=16, visual_patch_size=8,
              visual_patch_dropout=0.0)
    a = CLIP(**kw)
    b = CLIP(ff_impl="fused", **kw)
    rng = np.random.RandomState(0)
    text = jnp.asarray(rng.randint(1, 50, (4, 8)))
    image = jnp.asarray(rng.randn(4, 3, 16, 16).astype(np.float32))
    la = a.model.apply(a.params, text, image, return_loss=True)
    lb = b.model.apply(a.params, text, image, return_loss=True)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-5)


def test_pluggable_external_encoders():
    """Reference capability x_clip.py:482-514: user-supplied towers. The
    encoder protocol is `init(key, dtype)` + `apply(params, x, [mask], *,
    rng, training, attn_impl) -> (b, n, d)`."""
    import dataclasses
    from xclip_tpu import CLIP

    @dataclasses.dataclass(frozen=True)
    class ToyVision:
        dim: int = 16
        patch: int = 8
        size: int = 16

        def init(self, key, dtype=jnp.float32):
            d_in = 3 * self.patch * self.patch
            return {"w": jax.random.normal(key, (d_in, self.dim), dtype) * 0.02}

        def apply(self, params, x, *, rng=None, training=False, attn_impl="xla"):
            b, c, h, w = x.shape
            p = self.patch
            x = x.reshape(b, c, h // p, p, w // p, p)
            x = x.transpose(0, 2, 4, 3, 5, 1).reshape(b, -1, p * p * c)
            return x @ params["w"]

    @dataclasses.dataclass(frozen=True)
    class ToyText:
        dim: int = 16
        vocab: int = 50

        def init(self, key, dtype=jnp.float32):
            return {"emb": jax.random.normal(key, (self.vocab, self.dim), dtype) * 0.02}

        def apply(self, params, text, mask=None, *, rng=None, training=False,
                  attn_impl="xla"):
            return params["emb"][text]

    clip = CLIP(image_encoder=ToyVision(), text_encoder=ToyText(),
                dim_text=16, dim_image=16, dim_latent=16,
                visual_has_cls_token=True, text_has_cls_token=True)
    rng = np.random.RandomState(0)
    text = jnp.asarray(rng.randint(1, 50, (4, 8)))
    image = jnp.asarray(rng.randn(4, 3, 16, 16).astype(np.float32))
    loss = clip(text, image, return_loss=True)
    assert bool(jnp.isfinite(loss))
    sims = clip(text, image)
    assert sims.shape == (4,)
    g = jax.grad(lambda p: clip.model.apply(p, text, image, return_loss=True,
                                            rng=jax.random.PRNGKey(0)))(clip.params)
    assert bool(jnp.isfinite(jax.tree.leaves(g)[0]).all())


def test_debug_utilities():
    from xclip_tpu.utils import assert_finite, debug_nans
    assert_finite({"a": jnp.ones(3)})
    try:
        assert_finite({"a": {"b": jnp.array([1.0, float("nan")])}})
        assert False, "should have raised"
    except FloatingPointError as e:
        assert "a/b" in str(e)
    with debug_nans():
        try:
            jax.jit(jnp.log)(jnp.zeros(()) - 1.0).block_until_ready()
            assert False, "should have raised"
        except FloatingPointError:
            pass
    assert not jax.config.jax_debug_nans
