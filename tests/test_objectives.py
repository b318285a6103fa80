"""Parity + behavior tests for the auxiliary objectives: MLM text SSL,
SimSiam/SimCLR visual SSL, and their integration into the CLIP loss.

Stochastic parts are made deterministic for exact parity:
  * MLM with mask_prob=1.0, replace_prob=1.0 masks every eligible position
    (the reference's topk+scatter then selects all positions), so both sides
    compute the same cross-entropy.
  * SSL with identity augmentations, patch_dropout=0 → both views identical,
    loss deterministic given the transferred weights.
Statistical behavior of the random paths is covered by unit tests.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from reference_shim import (install_reference, make_mock_pair, rand_batch,
                            transfer_clip)

x_clip = install_reference()
import torch  # noqa: E402

ATOL, RTOL = 5e-5, 5e-4


def assert_close(ref_t, ours, atol=ATOL, rtol=RTOL):
    np.testing.assert_allclose(
        np.asarray(ours), ref_t.detach().cpu().numpy(), atol=atol, rtol=rtol)


def test_mlm_loss_parity_deterministic():
    ref, jclip, params = make_mock_pair(use_mlm=True, mlm_mask_prob=1.0,
                                        mlm_replace_prob=1.0)
    (t_text, t_img), (j_text, j_img) = rand_batch()
    t_text[1, -4:] = 0
    j_text = jnp.asarray(t_text.numpy())

    r = ref(t_text, t_img, return_loss=True)
    o = jclip(j_text, j_img, return_loss=True, params=params,
              rng=jax.random.PRNGKey(0))
    assert_close(r, o)


def test_mlm_vocab_grows_by_one():
    _, jclip, _ = make_mock_pair(use_mlm=True, mlm_mask_prob=1.0,
                                 mlm_replace_prob=1.0)
    assert jclip.model.text_encoder.num_tokens == 101  # 100 + 1 (x_clip.py:487)


def test_mlm_random_prob_runs():
    _, jclip, params = make_mock_pair(use_mlm=True, mlm_random_token_prob=0.1)
    (_, _), (j_text, j_img) = rand_batch()
    loss = jclip(j_text, j_img, return_loss=True, params=params,
                 rng=jax.random.PRNGKey(0))
    assert bool(jnp.isfinite(loss))


def _identity_aug(rng, x):
    return x


def _make_ssl_pair(ssl_type, hidden_layer=-1, seed=0):
    """Reference CLIP with use_visual_ssl (torchvision stubs = identity augs)
    vs ours with an explicitly identity-augmented SSL module."""
    from xclip_tpu import CLIP as JClip
    from xclip_tpu.objectives.ssl import SimCLR, SimSiam

    cfg = dict(
        dim_text=64, dim_image=64, dim_latent=64, num_text_tokens=100,
        text_enc_depth=2, text_seq_len=16, text_heads=2, text_dim_head=16,
        visual_enc_depth=2, visual_heads=2, visual_dim_head=16,
        visual_image_size=32, visual_patch_size=16, visual_patch_dropout=0.0,
    )
    torch.manual_seed(seed)
    ref = x_clip.CLIP(**cfg, use_visual_ssl=True, visual_ssl_type=ssl_type,
                      visual_ssl_hidden_layer=hidden_layer)
    ref.train()

    if ssl_type == "simsiam":
        ssl = SimSiam(image_size=32, channels=3, hidden_layer=hidden_layer,
                      augment_fn=_identity_aug, augment_fn2=_identity_aug)
    else:
        ssl = SimCLR(image_size=32, channels=3, hidden_layer=hidden_layer,
                     temperature=0.1, augment_fn=_identity_aug)

    jclip = JClip(**cfg, visual_ssl=ssl)
    params = transfer_clip(ref)
    for k in jclip.params:
        if k not in params:
            params[k] = jclip.params[k]
    return ref, jclip, params


def test_simsiam_loss_parity():
    ref, jclip, params = _make_ssl_pair("simsiam")
    (t_text, t_img), (j_text, j_img) = rand_batch()
    r = ref(t_text, t_img, return_loss=True)
    o = jclip(j_text, j_img, return_loss=True, params=params,
              rng=jax.random.PRNGKey(0))
    assert_close(r, o, atol=2e-4, rtol=2e-3)


def test_simclr_loss_parity():
    ref, jclip, params = _make_ssl_pair("simclr")
    (t_text, t_img), (j_text, j_img) = rand_batch()
    r = ref(t_text, t_img, return_loss=True)
    o = jclip(j_text, j_img, return_loss=True, params=params,
              rng=jax.random.PRNGKey(0))
    assert_close(r, o, atol=2e-4, rtol=2e-3)


def test_ssl_with_real_augmentations_runs():
    from xclip_tpu import CLIP as JClip
    jclip = JClip(
        dim_text=64, dim_image=64, dim_latent=64, num_text_tokens=100,
        text_enc_depth=1, text_seq_len=16, text_heads=2, text_dim_head=16,
        visual_enc_depth=1, visual_heads=2, visual_dim_head=16,
        visual_image_size=32, visual_patch_size=16, visual_patch_dropout=0.5,
        use_visual_ssl=True, visual_ssl_type="simsiam", use_mlm=True)
    (_, _), (j_text, j_img) = rand_batch()
    loss = jclip(j_text, j_img, return_loss=True, rng=jax.random.PRNGKey(0))
    assert bool(jnp.isfinite(loss))
    # different rng → different stochastic loss
    loss2 = jclip(j_text, j_img, return_loss=True, rng=jax.random.PRNGKey(1))
    assert float(loss) != float(loss2)


@pytest.mark.fast
def test_loss_weighting_assembly():
    """Weighted total = cl*(1 - w_t - w_i) + mlm*w_t + ssl*w_i (x_clip.py:851-875)."""
    _, jclip, params = make_mock_pair(use_mlm=True, mlm_mask_prob=1.0,
                                      mlm_replace_prob=1.0,
                                      text_ssl_loss_weight=0.2)
    (_, _), (j_text, j_img) = rand_batch()
    rng = jax.random.PRNGKey(0)
    loss, metrics = jclip(j_text, j_img, return_loss=True, params=params,
                          rng=rng, return_metrics=True)
    expected = metrics["cl_loss"] * 0.8 + metrics["text_ssl_loss"] * 0.2
    np.testing.assert_allclose(float(loss), float(expected), rtol=1e-6)


@pytest.mark.fast
def test_metrics_breakdown_keys():
    _, jclip, params = make_mock_pair()
    (_, _), (j_text, j_img) = rand_batch()
    loss, metrics = jclip(j_text, j_img, return_loss=True, params=params,
                          return_metrics=True)
    for key in ["loss", "cl_loss", "text_ssl_loss", "image_ssl_loss",
                "multiview_cl_loss", "sim_reg_loss", "temperature"]:
        assert key in metrics
    np.testing.assert_allclose(float(loss), float(metrics["loss"]))


def test_bn_running_stats_match_torch():
    """The sequential-EMA BatchNorm running-stat folding must match
    torch.nn.BatchNorm1d train-mode updates call-for-call (momentum 0.1,
    unbiased batch variance)."""
    from xclip_tpu.nn.core import batch_norm_init
    from xclip_tpu.objectives.ssl import _bn

    dim, n = 8, 16
    rng = np.random.RandomState(0)
    xs = [rng.randn(n, dim).astype(np.float32) for _ in range(3)]

    tbn = torch.nn.BatchNorm1d(dim)
    tbn.train()
    outs_t = [tbn(torch.tensor(x)).detach().numpy() for x in xs]

    params = batch_norm_init(dim)
    updates = {}
    outs_j = []
    for x in xs:
        # each call sees the latest running values, like repeated torch calls
        live = dict(params)
        if "bn" in updates:
            live["mean"], live["var"] = updates["bn"]
        outs_j.append(np.asarray(_bn(live, jnp.asarray(x), True, updates, "bn")))

    np.testing.assert_allclose(
        np.asarray(updates["bn"][0]), tbn.running_mean.numpy(),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(updates["bn"][1]), tbn.running_var.numpy(),
        rtol=1e-5, atol=1e-6)
    for a, b in zip(outs_j, outs_t):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_train_step_updates_ssl_bn_stats():
    """Running stats flow out of the jitted train step and back into the
    param tree; they start at (0, 1) and must move after one step."""
    from xclip_tpu import CLIP
    from xclip_tpu.train import (create_train_state, default_optimizer,
                                 make_train_step)

    clip = CLIP(dim_text=32, dim_image=32, dim_latent=32, num_text_tokens=50,
                text_enc_depth=1, text_seq_len=8, text_heads=2, text_dim_head=16,
                visual_enc_depth=1, visual_heads=2, visual_dim_head=16,
                visual_image_size=16, visual_patch_size=8,
                visual_patch_dropout=0.0, use_visual_ssl=True,
                visual_ssl_type="simclr", visual_ssl_hidden_layer=-1)
    opt = default_optimizer(learning_rate=1e-3)
    state = create_train_state(clip.model, jax.random.PRNGKey(0), opt)
    step = make_train_step(clip.model, opt, donate=False)

    rng = np.random.RandomState(0)
    text = jnp.asarray(rng.randint(1, 50, (8, 8)))
    image = jnp.asarray(rng.randn(8, 3, 16, 16).astype(np.float32))
    new_state, metrics = step(state, text, image, jax.random.PRNGKey(1))

    bn = new_state.params["visual_ssl"]["projector"]["bn1"]
    assert not np.allclose(np.asarray(bn["mean"]), 0.0)
    assert not np.allclose(np.asarray(bn["var"]), 1.0)
    assert "bn_updates" not in metrics
    assert bool(jnp.isfinite(metrics["loss"]))


def test_single_tower_encoders_match_apply_latents():
    """encode_text/encode_image must equal apply(return_latents) — including
    the causal-EOS pooling path."""
    from xclip_tpu import CLIP
    for over in (dict(), dict(text_causal_mask=True, text_eos_id=49,
                              text_has_cls_token=False)):
        clip = CLIP(dim_text=32, dim_image=32, dim_latent=32, num_text_tokens=50,
                    text_enc_depth=1, text_seq_len=8, text_heads=2,
                    text_dim_head=16, visual_enc_depth=1, visual_heads=2,
                    visual_dim_head=16, visual_image_size=16, visual_patch_size=8,
                    visual_patch_dropout=0.0, **over)
        rng = np.random.RandomState(0)
        text = jnp.asarray(rng.randint(1, 49, (4, 8)))
        if over:
            text = text.at[:, -1].set(49)  # EOS
        image = jnp.asarray(rng.randn(4, 3, 16, 16).astype(np.float32))
        tl, il = clip.model.apply(clip.params, text, image, return_latents=True)
        tl2 = clip.model.encode_text(clip.params, text)
        il2 = clip.model.encode_image(clip.params, image)
        np.testing.assert_allclose(np.asarray(tl), np.asarray(tl2),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(il), np.asarray(il2),
                                   rtol=1e-5, atol=1e-6)


def test_zero_shot_and_retrieval_utilities():
    from xclip_tpu import CLIP
    from xclip_tpu.eval import (build_zero_shot_classifier, retrieval_metrics,
                                zero_shot_accuracy)
    clip = CLIP(dim_text=32, dim_image=32, dim_latent=32, num_text_tokens=50,
                text_enc_depth=1, text_seq_len=8, text_heads=2, text_dim_head=16,
                visual_enc_depth=1, visual_heads=2, visual_dim_head=16,
                visual_image_size=16, visual_patch_size=8,
                visual_patch_dropout=0.0)
    rng = np.random.RandomState(0)
    prompts = jnp.asarray(rng.randint(1, 50, (6, 8)))   # 3 classes × 2 templates
    classifier = build_zero_shot_classifier(clip.model, clip.params, prompts,
                                            templates_per_class=2)
    assert classifier.shape == (3, 32)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(classifier, axis=-1)), 1.0, rtol=1e-5)

    images = jnp.asarray(rng.randn(8, 3, 16, 16).astype(np.float32))
    acc = zero_shot_accuracy(clip.model, clip.params, images,
                             rng.randint(3, size=8), classifier, topk=(1, 3))
    assert 0.0 <= acc["top1"] <= acc["top3"] <= 1.0

    text = jnp.asarray(rng.randint(1, 50, (8, 8)))
    tl, il = clip.model.apply(clip.params, text, images, return_latents=True)
    m = retrieval_metrics(tl, il)
    assert set(m) == {f"{d}_r@{k}" for d in ("t2i", "i2t") for k in (1, 5, 10)}
    assert m["t2i_r@10"] >= m["t2i_r@1"]


def test_clip_save_load_roundtrip(tmp_path):
    from xclip_tpu import CLIP
    kw = dict(dim_text=32, dim_image=32, dim_latent=32, num_text_tokens=50,
              text_enc_depth=1, text_seq_len=8, text_heads=2, text_dim_head=16,
              visual_enc_depth=1, visual_heads=2, visual_dim_head=16,
              visual_image_size=16, visual_patch_size=8, visual_patch_dropout=0.0)
    a = CLIP(**kw)
    a.save(str(tmp_path / "p"))
    b = CLIP(key=jax.random.PRNGKey(7), **kw)
    b.load(str(tmp_path / "p"))
    for x, y in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_hidden_layer_tap_by_name_matches_int():
    """Reference visual_ssl.py:152-171 accepts the hidden layer by NAME as
    well as index; names map onto this tower's scopes (objectives/ssl.py
    resolve_hidden_layer)."""
    import numpy as np
    from xclip_tpu.objectives.ssl import SimCLR

    from xclip_tpu import CLIP as JClip

    cfg = dict(
        dim_text=64, dim_image=64, dim_latent=64, num_text_tokens=100,
        text_enc_depth=2, text_seq_len=16, text_heads=2, text_dim_head=16,
        visual_enc_depth=2, visual_heads=2, visual_dim_head=16,
        visual_image_size=32, visual_patch_size=16, visual_patch_dropout=0.0,
    )

    def loss_for(hidden_layer):
        ssl = SimCLR(image_size=32, channels=3, hidden_layer=hidden_layer,
                     temperature=0.1, augment_fn=_identity_aug)
        clip = JClip(**cfg, visual_ssl=ssl, key=jax.random.PRNGKey(7))
        npr = np.random.RandomState(3)
        text = jnp.asarray(npr.randint(1, 100, (4, 16)))
        image = jnp.asarray(npr.randn(4, 3, 32, 32).astype(np.float32))
        return float(clip(text, image, return_loss=True,
                          rng=jax.random.PRNGKey(0)))

    # block-index tap: "transformer/<i>" == int i
    assert loss_for("transformer/1") == loss_for(1)
    # stack-output tap: "transformer" / "norm_out" == -2
    assert loss_for("transformer") == loss_for(-2)
    assert loss_for("norm_out") == loss_for(-2)

    import pytest
    with pytest.raises(ValueError):
        loss_for("no_such_layer")


def test_eval_guards_against_filip_latents():
    """FILIP models encode per-token (b, n, d) latents; the pooled-latent
    eval utilities must refuse them loudly instead of computing garbage
    shapes (eval.py guard)."""
    import pytest
    from xclip_tpu import CLIP
    from xclip_tpu.eval import (build_zero_shot_classifier, retrieval_metrics,
                                zero_shot_logits)
    clip = CLIP(dim_text=32, dim_image=32, dim_latent=32, num_text_tokens=50,
                text_enc_depth=1, text_seq_len=8, text_heads=2, text_dim_head=16,
                visual_enc_depth=1, visual_heads=2, visual_dim_head=16,
                visual_image_size=16, visual_patch_size=8,
                visual_patch_dropout=0.0, use_all_token_embeds=True)
    rng = np.random.RandomState(0)
    prompts = jnp.asarray(rng.randint(1, 50, (6, 8)))
    images = jnp.asarray(rng.randn(4, 3, 16, 16).astype(np.float32))
    with pytest.raises(ValueError, match="use_all_token_embeds"):
        build_zero_shot_classifier(clip.model, clip.params, prompts)
    with pytest.raises(ValueError, match="use_all_token_embeds"):
        zero_shot_logits(clip.model, clip.params, images,
                         jnp.zeros((3, 32)))
    # per-token latents passed directly are rejected by shape
    tl = clip.model.encode_text(clip.params, prompts[:4])
    il = clip.model.encode_image(clip.params, images)
    assert tl.ndim == 3 and il.ndim == 3
    with pytest.raises(ValueError, match="pooled"):
        retrieval_metrics(tl, il)


def test_simclr_accepts_use_nt_xent_loss():
    """Reference SimCLR accepts (and ignores) use_nt_xent_loss
    (visual_ssl.py:272); our constructor surface must too."""
    from xclip_tpu.objectives.ssl import SimCLR
    a = SimCLR(image_size=16)
    b = SimCLR(image_size=16, use_nt_xent_loss=True)
    assert a.use_nt_xent_loss is False       # reference default
    assert b.temperature == a.temperature    # everything else unchanged
