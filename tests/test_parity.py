"""Reference-parity tests: the PyTorch reference and xclip_tpu run with
IDENTICAL weights (transferred tensor-by-tensor) on identical inputs; losses,
similarity scores, encodings, and latents must agree to fp32 tolerance.

This is the strongest form of the SURVEY.md §4 parity strategy — it checks
the full math of every loss feature, not just finiteness.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from reference_shim import install_reference, make_mock_pair, rand_batch

x_clip = install_reference()
import torch  # noqa: E402

ATOL, RTOL = 5e-5, 5e-4


def padded_batch(batch=4, seq=16, vocab=100, seed=0):
    (t_text, t_img), (j_text, j_img) = rand_batch(batch, seq, seed=seed, vocab=vocab)
    # zero-pad the tail of some rows so padding masks are exercised
    t_text[1, seq - 4:] = 0
    t_text[3, seq - 7:] = 0
    j_text = jnp.asarray(t_text.numpy())
    return (t_text, t_img), (j_text, j_img)


def assert_close(ref_t, ours, atol=ATOL, rtol=RTOL):
    np.testing.assert_allclose(
        np.asarray(ours), ref_t.detach().cpu().numpy(), atol=atol, rtol=rtol)


# ---------------------------------------------------------------------------


def test_encodings_parity():
    ref, jclip, params = make_mock_pair()
    (t_text, t_img), (j_text, j_img) = padded_batch()
    with torch.no_grad():
        r_text, r_img = ref(t_text, t_img, return_encodings=True)
    o_text, o_img = jclip(j_text, j_img, return_encodings=True, params=params)
    assert_close(r_text, o_text)
    assert_close(r_img, o_img)


@pytest.mark.fast
def test_coarse_loss_parity():
    ref, jclip, params = make_mock_pair()
    (t_text, t_img), (j_text, j_img) = padded_batch()
    r_loss = ref(t_text, t_img, return_loss=True)
    o_loss = jclip(j_text, j_img, return_loss=True, params=params)
    assert_close(r_loss, o_loss)


def test_inference_scores_parity():
    ref, jclip, params = make_mock_pair()
    (t_text, t_img), (j_text, j_img) = padded_batch()
    ref.eval()
    with torch.no_grad():
        r = ref(t_text, t_img)
    o = jclip(j_text, j_img, params=params)
    assert_close(r, o)


def test_latents_parity():
    ref, jclip, params = make_mock_pair()
    (t_text, t_img), (j_text, j_img) = padded_batch()
    ref.eval()
    with torch.no_grad():
        r_tl, r_il = ref(t_text, t_img, return_latents=True)
    o_tl, o_il = jclip(j_text, j_img, return_latents=True, params=params)
    assert_close(r_tl, o_tl)
    assert_close(r_il, o_il)


def test_dcl_loss_parity():
    ref, jclip, params = make_mock_pair(decoupled_contrastive_learning=True)
    (t_text, t_img), (j_text, j_img) = padded_batch()
    r = ref(t_text, t_img, return_loss=True)
    o = jclip(j_text, j_img, return_loss=True, params=params)
    assert_close(r, o)


def test_extra_latent_projection_parity():
    ref, jclip, params = make_mock_pair(extra_latent_projection=True)
    (t_text, t_img), (j_text, j_img) = padded_batch()
    r = ref(t_text, t_img, return_loss=True)
    o = jclip(j_text, j_img, return_loss=True, params=params)
    assert_close(r, o)
    # directional inference scores differ between t2i and i2t
    ref.eval()
    with torch.no_grad():
        r_t2i = ref(t_text, t_img, text_to_image=True)
        r_i2t = ref(t_text, t_img, text_to_image=False)
    assert_close(r_t2i, jclip(j_text, j_img, text_to_image=True, params=params))
    assert_close(r_i2t, jclip(j_text, j_img, text_to_image=False, params=params))


@pytest.mark.fast
def test_filip_loss_parity():
    ref, jclip, params = make_mock_pair(use_all_token_embeds=True)
    (t_text, t_img), (j_text, j_img) = padded_batch()
    r = ref(t_text, t_img, return_loss=True)
    o = jclip(j_text, j_img, return_loss=True, params=params)
    assert_close(r, o)
    # fine-grained inference scores (b, t, i)
    ref.eval()
    with torch.no_grad():
        r_sims = ref(t_text, t_img)
    assert_close(r_sims, jclip(j_text, j_img, params=params))


def test_filip_extra_projection_parity():
    ref, jclip, params = make_mock_pair(use_all_token_embeds=True,
                                        extra_latent_projection=True)
    (t_text, t_img), (j_text, j_img) = padded_batch()
    r = ref(t_text, t_img, return_loss=True)
    o = jclip(j_text, j_img, return_loss=True, params=params)
    assert_close(r, o)


def test_downsample_image_embeds_parity():
    ref, jclip, params = make_mock_pair(use_all_token_embeds=True,
                                        downsample_image_embeds=True)
    (t_text, t_img), (j_text, j_img) = padded_batch()
    r = ref(t_text, t_img, return_loss=True)
    o = jclip(j_text, j_img, return_loss=True, params=params)
    assert_close(r, o)


def test_sim_reg_loss_parity():
    # NOTE: the reference's sim-reg path crashes unless extra_latent_projection
    # is on (x_clip.py:720 aliases the PRE-reshape latents, so :779 sees 2D
    # tensors) — parity is checked on the working configuration.
    ref, jclip, params = make_mock_pair(sim_reg_loss_weight=0.1,
                                        extra_latent_projection=True)
    (t_text, t_img), (j_text, j_img) = padded_batch()
    r = ref(t_text, t_img, return_loss=True)
    o = jclip(j_text, j_img, return_loss=True, params=params)
    assert_close(r, o)


def test_sim_reg_without_extra_projection_works():
    # ours FIXES the reference crash: with the flag off the extra latents
    # alias the mains, so sim-reg degenerates to the main-pair MSE.
    _, jclip, params = make_mock_pair(sim_reg_loss_weight=0.1)
    (_, _), (j_text, j_img) = padded_batch()
    loss = jclip(j_text, j_img, return_loss=True, params=params)
    assert bool(jnp.isfinite(loss))


def test_multiview_loss_parity():
    ref, jclip, params = make_mock_pair()
    (t_text, t_img), (j_text, j_img) = padded_batch()
    (t_aug_text, t_aug_img), (j_aug_text, j_aug_img) = padded_batch(seed=7)
    r = ref(t_text, t_img, aug_text=t_aug_text, aug_image=t_aug_img,
            return_loss=True)
    o = jclip(j_text, j_img, aug_text=(j_aug_text,), aug_image=(j_aug_img,),
              return_loss=True, params=params)
    assert_close(r, o)


def test_freeze_towers_parity():
    ref, jclip, params = make_mock_pair()
    (t_text, t_img), (j_text, j_img) = padded_batch()
    r = ref(t_text, t_img, return_loss=True,
            freeze_image_encoder=True, freeze_text_encoder=True)
    o = jclip(j_text, j_img, return_loss=True, params=params,
              freeze_image_encoder=True, freeze_text_encoder=True)
    assert_close(r, o)


def test_rotary_pos_emb_parity():
    ref, jclip, params = make_mock_pair(text_rotary_pos_emb=True)
    (t_text, t_img), (j_text, j_img) = padded_batch()
    r = ref(t_text, t_img, return_loss=True)
    o = jclip(j_text, j_img, return_loss=True, params=params)
    assert_close(r, o)


@pytest.mark.fast
def test_causal_eos_parity():
    eos_id = 99
    ref, jclip, params = make_mock_pair(text_causal_mask=True, text_eos_id=eos_id)
    (t_text, t_img), (j_text, j_img) = padded_batch()
    # place an EOS in every row (reference requires it, x_clip.py:672)
    for row, pos in enumerate([5, 9, 3, 12]):
        t_text[row, pos] = eos_id
    j_text = jnp.asarray(t_text.numpy())
    # work around the reference's undefined-`b` bug (SURVEY §2.7.2)
    x_clip.x_clip.b = t_text.shape[0]
    try:
        r = ref(t_text, t_img, return_loss=True)
    finally:
        del x_clip.x_clip.b
    o = jclip(j_text, j_img, return_loss=True, params=params)
    assert_close(r, o)


def test_causal_eos_fallback_pools_last_valid_token():
    """Contract guard (VERDICT r3): a causal-text row WITHOUT an EOS must
    pool its last non-pad token (defined fallback), not position-0 garbage
    — the reference silently requires an EOS everywhere (x_clip.py:670-685)."""
    from xclip_tpu import CLIP

    eos_id = 99
    clip = CLIP(dim_text=16, dim_image=16, dim_latent=16, num_text_tokens=128,
                text_enc_depth=1, text_seq_len=8, text_heads=2,
                text_dim_head=8, visual_enc_depth=1, visual_heads=2,
                visual_dim_head=8, visual_image_size=8, visual_patch_size=4,
                visual_patch_dropout=0.0, text_causal_mask=True,
                text_eos_id=eos_id, scan_layers=False)
    n = 8
    text = jnp.asarray([
        [5, 6, eos_id, 7, 0, 0, 0, 0],   # EOS at 2
        [5, 6, 7, 8, 9, 10, 0, 0],       # no EOS; last non-pad at 5
        [0, 0, 0, 0, 0, 0, 0, 0],        # degenerate all-pad row
    ])
    # position-coded fake encodings make the selected index directly readable
    enc = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.float32)[None, :, None], (3, n, 4))
    out = clip.model._eos_reorder(enc, text)
    assert float(out[0, 0, 0]) == 2.0     # first EOS position
    assert float(out[1, 0, 0]) == 5.0     # fallback: last non-pad
    assert float(out[2, 0, 0]) == n - 1   # all-pad: final position


def test_rotary_causal_composes():
    """rotary + causal crashes the reference outright: x_clip.py:328 builds
    n+1 freqs for a CLS that causal mode never prepends, and the (n+1, d)
    freqs fail to broadcast against (.., n, d) q/k/v. Fixed here by sizing
    freqs to the real sequence (nn/text.py) — assert the combination runs
    and trains finite."""
    from xclip_tpu import CLIP

    clip = CLIP(dim_text=16, dim_image=16, dim_latent=16, num_text_tokens=128,
                text_enc_depth=1, text_seq_len=8, text_heads=2,
                text_dim_head=8, visual_enc_depth=1, visual_heads=2,
                visual_dim_head=8, visual_image_size=8, visual_patch_size=4,
                visual_patch_dropout=0.0, text_rotary_pos_emb=True,
                text_causal_mask=True, text_eos_id=99, scan_layers=False)
    npr = np.random.RandomState(0)
    text = npr.randint(1, 99, (4, 8))
    text[:, -1] = 99                      # honor the EOS contract
    image = jnp.asarray(npr.randn(4, 3, 8, 8).astype(np.float32))

    def loss_fn(p):
        return clip.model.apply(p, jnp.asarray(text), image, return_loss=True)

    loss, grads = jax.value_and_grad(loss_fn)(clip.params)
    assert bool(jnp.isfinite(loss))
    assert all(bool(jnp.isfinite(g).all()) for g in jax.tree.leaves(grads))


@pytest.mark.fast
def test_grads_finite_and_match_reference():
    ref, jclip, params = make_mock_pair()
    (t_text, t_img), (j_text, j_img) = padded_batch()

    r_loss = ref(t_text, t_img, return_loss=True)
    r_loss.backward()
    r_grad = ref.to_text_latent.weight.grad.detach().numpy()

    def loss_fn(p):
        return jclip.model.apply(p, j_text, j_img, return_loss=True)

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    np.testing.assert_allclose(
        np.asarray(grads["to_text_latent"]["w"]).T, r_grad, atol=1e-4, rtol=1e-3)


def test_temperature_learnable():
    _, jclip, params = make_mock_pair()
    (_, _), (j_text, j_img) = padded_batch()

    def loss_fn(p):
        return jclip.model.apply(p, j_text, j_img, return_loss=True)

    grads = jax.grad(loss_fn)(params)
    assert bool(jnp.abs(grads["temperature"]) > 0)


@pytest.mark.fast
def test_constructor_surface_matches_reference():
    """Every reference CLIP.__init__ kwarg must exist on our CLIP with the
    identical default (SURVEY §2.2: the kwargs ARE the public API contract).
    JAX-specific extras are allowed on top but must be keyword-only with
    defaults."""
    import inspect
    x_clip = install_reference()
    import xclip_tpu

    ref_sig = inspect.signature(x_clip.CLIP.__init__)
    our_sig = inspect.signature(xclip_tpu.CLIP.__init__)
    our_params = our_sig.parameters

    missing, wrong_default = [], []
    for name, p in ref_sig.parameters.items():
        if name in ("self", "kwargs"):
            continue
        if name not in our_params:
            missing.append(name)
            continue
        ours = our_params[name].default
        theirs = p.default
        if ours != theirs and not (ours is None and theirs is None):
            wrong_default.append((name, theirs, ours))
    assert not missing, f"missing reference kwargs: {missing}"
    assert not wrong_default, f"defaults differ: {wrong_default}"

    # extras must not silently shadow future reference names: all keyword-only
    # with defaults
    ref_names = set(ref_sig.parameters)
    for name, p in our_params.items():
        if name in ref_names or name in ("self", "kwargs"):
            continue
        assert p.default is not inspect.Parameter.empty, \
            f"extra kwarg {name} must have a default"


@pytest.mark.fast
def test_forward_flag_surface_matches_reference():
    """The reference CLIP.forward flags (x_clip.py:597-608) must all be
    accepted by our __call__ with the same defaults."""
    import inspect
    x_clip = install_reference()
    import xclip_tpu

    ref_sig = inspect.signature(x_clip.CLIP.forward)
    our_sig = inspect.signature(xclip_tpu.CLIP.__call__)
    for name, p in ref_sig.parameters.items():
        if name == "self":
            continue
        assert name in our_sig.parameters, f"missing forward flag: {name}"
        if p.default is not inspect.Parameter.empty:
            assert our_sig.parameters[name].default == p.default, name


@pytest.mark.fast
def test_pallas_kernel_paths_match_reference():
    """The whole-block Pallas kernels (attention megablock + fused FF block)
    vs the PyTorch reference DIRECTLY, with transferred weights — not just
    vs our own XLA path. Head config sized so the kernels engage
    (attention_megablock.supported)."""
    from reference_shim import transfer_clip
    from xclip_tpu import CLIP as JClip

    cfg = dict(
        dim_text=64, dim_image=64, dim_latent=64, num_text_tokens=100,
        text_enc_depth=2, text_seq_len=16, text_heads=8, text_dim_head=16,
        visual_enc_depth=2, visual_heads=8, visual_dim_head=16,
        visual_image_size=32, visual_patch_size=16, visual_patch_dropout=0.0,
    )
    torch.manual_seed(0)
    ref = x_clip.CLIP(**cfg)
    ref.train()
    jclip = JClip(**cfg, attn_impl="fused", ff_impl="block")
    params = transfer_clip(ref)
    for k in jclip.params:
        params.setdefault(k, jclip.params[k])

    (t_text, t_img), (j_text, j_img) = padded_batch()
    r_loss = ref(t_text, t_img, return_loss=True)
    o_loss = jclip(j_text, j_img, return_loss=True, params=params)
    assert_close(r_loss, o_loss)

    ref.eval()
    with torch.no_grad():
        r_scores = ref(t_text, t_img)
    o_scores = jclip(j_text, j_img, params=params)
    assert_close(r_scores, o_scores)
