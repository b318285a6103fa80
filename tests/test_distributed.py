"""Distributed tests on the 8-fake-device CPU mesh (SURVEY §4): the loss and
gradients computed over a sharded global batch must equal the single-device
computation, both via GSPMD (sharded global arrays under jit) and via the
explicit shard_map + all_gather path (the reference's distributed.py
semantics, which were untestable there — the gather path is broken in the
snapshot, SURVEY §2.7.1).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from xclip_tpu import CLIP
from xclip_tpu.parallel import create_mesh, data_sharding, shard_params
from xclip_tpu.train import (create_train_state, default_optimizer,
                             make_train_step, shard_batch)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 fake CPU devices")


def mock_clip(**over):
    cfg = dict(dim_text=32, dim_image=32, dim_latent=32, num_text_tokens=50,
               text_enc_depth=1, text_seq_len=8, text_heads=2, text_dim_head=16,
               visual_enc_depth=1, visual_heads=2, visual_dim_head=16,
               visual_image_size=16, visual_patch_size=8,
               visual_patch_dropout=0.0)
    cfg.update(over)
    return CLIP(**cfg)


def global_batch(b=8, seed=0):
    rng = np.random.RandomState(seed)
    text = jnp.asarray(rng.randint(1, 50, (b, 8)))
    image = jnp.asarray(rng.randn(b, 3, 16, 16).astype(np.float32))
    return text, image


def test_gspmd_sharded_loss_matches_single_device():
    clip = mock_clip()
    text, image = global_batch()

    loss_single = clip.model.apply(clip.params, text, image, return_loss=True)

    mesh = create_mesh((8, 1))
    params = shard_params(clip.params, mesh)
    text_s = jax.device_put(text, data_sharding(mesh, text.ndim))
    image_s = jax.device_put(image, data_sharding(mesh, image.ndim))

    loss_sharded = jax.jit(
        lambda p, t, i: clip.model.apply(p, t, i, return_loss=True)
    )(params, text_s, image_s)

    np.testing.assert_allclose(float(loss_single), float(loss_sharded),
                               rtol=1e-5, atol=1e-6)


def test_gspmd_sharded_grads_match_single_device():
    clip = mock_clip(decoupled_contrastive_learning=True)
    text, image = global_batch()

    def loss_fn(p, t, i):
        return clip.model.apply(p, t, i, return_loss=True)

    g_single = jax.grad(loss_fn)(clip.params, text, image)

    mesh = create_mesh((8, 1))
    params = shard_params(clip.params, mesh)
    text_s = jax.device_put(text, data_sharding(mesh, text.ndim))
    image_s = jax.device_put(image, data_sharding(mesh, image.ndim))
    g_sharded = jax.jit(jax.grad(loss_fn))(params, text_s, image_s)

    for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_sharded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=1e-6)


def test_shard_map_all_gather_path_matches_global():
    """Explicit-collective DP: each device holds batch/8, the loss all_gathers
    latents over 'data' (contrastive.py axis_name path) — every device must
    produce the single-device global-batch loss."""
    clip = mock_clip()
    text, image = global_batch()
    loss_global = clip.model.apply(clip.params, text, image, return_loss=True)

    mesh = create_mesh((8,), axis_names=("data",))

    def local_loss(params, t, i):
        return clip.model.apply(params, t, i, return_loss=True,
                                axis_name="data")

    sharded = shard_map(
        local_loss, mesh=mesh,
        in_specs=(P(), P("data"), P("data")),
        out_specs=P(), check_vma=False)
    loss = jax.jit(sharded)(clip.params, text, image)
    np.testing.assert_allclose(float(loss_global), float(loss), rtol=1e-5,
                               atol=1e-6)


def test_shard_map_filip_gathers_text_mask():
    clip = mock_clip(use_all_token_embeds=True)
    rng = np.random.RandomState(1)
    text = jnp.asarray(rng.randint(1, 50, (8, 8)))
    text = text.at[2, 5:].set(0).at[5, 3:].set(0)  # pads across shards
    image = jnp.asarray(rng.randn(8, 3, 16, 16).astype(np.float32))

    loss_global = clip.model.apply(clip.params, text, image, return_loss=True)
    mesh = create_mesh((8,), axis_names=("data",))
    sharded = shard_map(
        lambda p, t, i: clip.model.apply(p, t, i, return_loss=True,
                                         axis_name="data"),
        mesh=mesh, in_specs=(P(), P("data"), P("data")),
        out_specs=P(), check_vma=False)
    loss = jax.jit(sharded)(clip.params, text, image)
    np.testing.assert_allclose(float(loss_global), float(loss), rtol=1e-5,
                               atol=1e-6)


def _shard_map_loss(clip, text, image, gather_impl="sharded", grad=False):
    mesh = create_mesh((8,), axis_names=("data",))

    def local_loss(params, t, i):
        return clip.model.apply(params, t, i, return_loss=True,
                                axis_name="data", gather_impl=gather_impl)

    fn = shard_map(local_loss, mesh=mesh,
                   in_specs=(P(), P("data"), P("data")),
                   out_specs=P(), check_vma=False)
    if grad:
        return jax.jit(jax.grad(fn))(clip.params, text, image)
    return jax.jit(fn)(clip.params, text, image)


@pytest.mark.parametrize("gather_impl", ["sharded", "replicated"])
@pytest.mark.parametrize("over", [
    dict(),
    dict(decoupled_contrastive_learning=True, extra_latent_projection=True),
    dict(sim_reg_loss_weight=0.1, extra_latent_projection=True),
    dict(use_all_token_embeds=True, extra_latent_projection=True),
])
def test_sharded_loss_feature_matrix(gather_impl, over):
    """Row-sharded (and replicated) distributed losses must equal the
    single-device global-batch loss across the DCL/CLOOB/sim-reg/FILIP
    feature matrix."""
    clip = mock_clip(**over)
    text, image = global_batch(seed=3)
    text = text.at[2, 5:].set(0).at[5, 3:].set(0)  # pads across shards
    loss_global = clip.model.apply(clip.params, text, image, return_loss=True)
    loss = _shard_map_loss(clip, text, image, gather_impl)
    np.testing.assert_allclose(float(loss_global), float(loss),
                               rtol=1e-5, atol=1e-6)


def test_sharded_loss_grads_match_global():
    """Gradients through the sharded loss (AD through all_gather = psum of
    the transpose) must equal single-device global-batch gradients."""
    clip = mock_clip(decoupled_contrastive_learning=True)
    text, image = global_batch(seed=4)
    g_single = jax.grad(
        lambda p: clip.model.apply(p, text, image, return_loss=True)
    )(clip.params)
    g_sharded = _shard_map_loss(clip, text, image, grad=True)
    for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_sharded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=1e-6)


def test_sharded_multiview_loss_matches_global():
    clip = mock_clip(multiview_loss_weight=0.1)
    text, image = global_batch(seed=5)
    aug_text, _ = global_batch(seed=6)
    _, aug_image = global_batch(seed=7)

    loss_global = clip.model.apply(clip.params, text, image, return_loss=True,
                                   aug_text=aug_text, aug_image=aug_image)

    mesh = create_mesh((8,), axis_names=("data",))
    fn = shard_map(
        lambda p, t, i, at, ai: clip.model.apply(
            p, t, i, return_loss=True, aug_text=at, aug_image=ai,
            axis_name="data"),
        mesh=mesh, in_specs=(P(), P("data"), P("data"), P("data"), P("data")),
        out_specs=P(), check_vma=False)
    loss = jax.jit(fn)(clip.params, text, image, aug_text, aug_image)
    np.testing.assert_allclose(float(loss_global), float(loss),
                               rtol=1e-5, atol=1e-6)


def test_train_step_dp_tp_mesh():
    """One optimizer step on a 4×2 (data × model) mesh: tensor-parallel
    params + sharded batch, loss finite, params actually update."""
    clip = mock_clip()
    mesh = create_mesh((4, 2))
    optimizer = default_optimizer(learning_rate=1e-3)
    state = create_train_state(clip.model, jax.random.PRNGKey(0), optimizer)
    from xclip_tpu.train import shard_state
    state = shard_state(state, mesh)

    text, image = global_batch()
    text, image = shard_batch((text, image), mesh)

    step = make_train_step(clip.model, optimizer, donate=False)
    new_state, metrics = step(state, text, image, jax.random.PRNGKey(1))

    assert bool(jnp.isfinite(metrics["loss"]))
    assert int(new_state.step) == 1
    before = jax.tree.leaves(state.params)[0]
    after = jax.tree.leaves(new_state.params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_opt_state_sharded_like_params():
    """Adam mu/nu must inherit each param's TP PartitionSpec (round-1 gap:
    place_opt was an identity no-op, leaving moments replicated), and one
    train step must preserve those shardings."""
    import optax
    from xclip_tpu.train import shard_state
    clip = mock_clip()
    mesh = create_mesh((4, 2))
    optimizer = default_optimizer(learning_rate=1e-3)
    state = create_train_state(clip.model, jax.random.PRNGKey(0), optimizer)
    state = shard_state(state, mesh)

    def adam_state(opt_state):
        hits = [x for x in jax.tree.leaves(
            opt_state, is_leaf=lambda y: isinstance(y, optax.ScaleByAdamState))
            if isinstance(x, optax.ScaleByAdamState)]
        assert hits, "no ScaleByAdamState found in opt_state"
        return hits[0]

    def check(st):
        adam = adam_state(st.opt_state)
        nontrivial = 0
        for p, mu, nu in zip(jax.tree.leaves(st.params),
                             jax.tree.leaves(adam.mu),
                             jax.tree.leaves(adam.nu)):
            assert mu.sharding == p.sharding, (p.shape, p.sharding, mu.sharding)
            assert nu.sharding == p.sharding
            if not p.sharding.is_fully_replicated:
                nontrivial += 1
        assert nontrivial >= 4  # qkv/out/w_in/w_out are actually TP-sharded

    check(state)
    text, image = global_batch()
    text, image = shard_batch((text, image), mesh)
    step = make_train_step(clip.model, optimizer, donate=False)
    new_state, _ = step(state, text, image, jax.random.PRNGKey(1))
    check(new_state)


def test_large_batch_sharded_loss_memory_scaling():
    """The 32k-batch enabler (BASELINE.json configs[4]): the row-sharded loss
    holds O(B_local × B_global) similarities per device vs the replicated
    gather's O(B_global²). At global batch 4096 on 8 devices, XLA's compiled
    temp allocation for the sharded path must be a fraction of the replicated
    path's (which materializes the full 4096² matrix). docs/SCALING.md has
    the corresponding v5e-16 HBM arithmetic at 32k."""
    clip = mock_clip()
    text, image = global_batch(b=4096, seed=11)
    mesh = create_mesh((8,), axis_names=("data",))

    def compiled(gather_impl):
        fn = shard_map(
            lambda p, t, i: clip.model.apply(p, t, i, return_loss=True,
                                             axis_name="data",
                                             gather_impl=gather_impl),
            mesh=mesh, in_specs=(P(), P("data"), P("data")),
            out_specs=P(), check_vma=False)
        return jax.jit(fn).lower(clip.params, text, image).compile()

    sharded = compiled("sharded").memory_analysis().temp_size_in_bytes
    replicated = compiled("replicated").memory_analysis().temp_size_in_bytes
    assert sharded < replicated / 2, (sharded, replicated)


def test_checkpoint_roundtrip(tmp_path):
    from xclip_tpu.train import restore_checkpoint, save_checkpoint
    clip = mock_clip()
    optimizer = default_optimizer()
    state = create_train_state(clip.model, jax.random.PRNGKey(0), optimizer)

    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state)
    restored = restore_checkpoint(path, state)

    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == 0


def test_sharded_ssl_losses_are_device_averaged():
    """MLM / visual-SSL losses computed per shard must be pmean'd over the
    data axis (DDP grad-average semantics) — with a deterministic MLM
    (mask_prob=1, replace_prob=1) and uniform shards the sharded total must
    equal the single-device loss."""
    clip = mock_clip(use_mlm=True, mlm_mask_prob=1.0, mlm_replace_prob=1.0,
                     mlm_random_token_prob=0.0)
    rng = np.random.RandomState(8)
    text = jnp.asarray(rng.randint(3, 50, (8, 8)))   # no pads: uniform shards
    image = jnp.asarray(rng.randn(8, 3, 16, 16).astype(np.float32))
    key = jax.random.PRNGKey(0)

    loss_global = clip.model.apply(clip.params, text, image, return_loss=True,
                                   rng=key)
    mesh = create_mesh((8,), axis_names=("data",))
    fn = shard_map(
        lambda p, t, i: clip.model.apply(p, t, i, return_loss=True, rng=key,
                                         axis_name="data"),
        mesh=mesh, in_specs=(P(), P("data"), P("data")),
        out_specs=P(), check_vma=False)
    loss = jax.jit(fn)(clip.params, text, image)
    np.testing.assert_allclose(float(loss_global), float(loss), rtol=1e-5,
                               atol=1e-6)


def test_grad_accumulation_matches_ddp_semantics():
    """grad_accum=2 must equal averaging the two microbatches' gradients
    (DDP-without-gather semantics); BN stats still flow through. Gradients
    are extracted through an identity-SGD update (lr=1) so the comparison
    is not distorted by adamw normalization."""
    import optax
    from xclip_tpu.train import create_train_state
    clip = mock_clip(use_visual_ssl=True, visual_ssl_type="simclr",
                     visual_ssl_hidden_layer=-1)
    opt = optax.sgd(1.0)
    state = create_train_state(clip.model, jax.random.PRNGKey(0), opt)

    rng = np.random.RandomState(9)
    text = jnp.asarray(rng.randint(1, 50, (8, 8)))
    image = jnp.asarray(rng.randn(8, 3, 16, 16).astype(np.float32))
    key = jax.random.PRNGKey(3)

    step2 = make_train_step(clip.model, opt, donate=False, grad_accum=2)
    s2, m2 = step2(state, text, image, key)
    g_acc = jax.tree.map(lambda a, b: a - b, state.params, s2.params)

    keys = jax.random.split(key, 2)
    def grads_of(t, im, r):
        return jax.grad(lambda p: clip.model.apply(
            p, t, im, return_loss=True, rng=r, training=True))(state.params)
    g0 = grads_of(text[:4], image[:4], keys[0])
    g1 = grads_of(text[4:], image[4:], keys[1])
    g_ref = jax.tree.map(lambda a, b: (a + b) / 2, g0, g1)

    skip = ("mean", "var")  # BN running stats are EMA-written, not optimized
    def walk(a, b, path=()):
        if isinstance(a, dict):
            for k in a:
                walk(a[k], b[k], path + (k,))
        else:
            if path[-1] in skip:
                return
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-4, err_msg=str(path))
    walk(g_ref, g_acc)
    assert bool(jnp.isfinite(m2["loss"]))
    bn = s2.params["visual_ssl"]["projector"]["bn1"]
    assert not np.allclose(np.asarray(bn["mean"]), 0.0)


def test_grad_accum_warns_about_microbatch_negatives():
    """grad_accum>1 silently shrinks the contrastive negative set to the
    microbatch — make_train_step must warn at build time."""
    import warnings
    import optax
    clip = mock_clip()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        make_train_step(clip.model, optax.sgd(1.0), grad_accum=2)
    assert any("negatives" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        make_train_step(clip.model, optax.sgd(1.0))
    assert not any("negatives" in str(x.message) for x in w)


def test_shard_batch_rejects_indivisible_batch():
    """Equal-batch contract (VERDICT r3): the sharded loss locates positives
    structurally (row_offset = axis_index * b_local), so an unequal split
    would be silently wrong math — shard_batch must refuse it loudly.
    (Conscious divergence from the reference's variable-size all_gather,
    distributed.py:14-39.)"""
    mesh = create_mesh((8, 1))
    text, image = global_batch(b=12)        # 12 % 8 != 0
    with pytest.raises(ValueError, match="not divisible"):
        shard_batch((text, image), mesh)
    # divisible passes and lands sharded
    text, image = global_batch(b=16)
    st, si = shard_batch((text, image), mesh)
    assert st.sharding.spec[0] == "data"
    assert si.sharding.spec[0] == "data"


# ---------------------------------------------------------------- pad & mask

def _truncated_vs_padded(b_real=12, b_pad=16, **over):
    """(truncated-batch loss, padded text/image/valid) for the same rows."""
    clip = mock_clip(**over)
    text, image = global_batch(b=b_pad, seed=3)
    # padding rows are DIFFERENT real-looking examples — the mask, not the
    # row contents, must make them invisible
    valid = jnp.arange(b_pad) < b_real
    loss_trunc = clip.model.apply(clip.params, text[:b_real], image[:b_real],
                                  return_loss=True)
    return clip, loss_trunc, text, image, valid


@pytest.mark.fast
@pytest.mark.parametrize("over", [dict(),
                                  dict(decoupled_contrastive_learning=True)])
def test_pad_and_mask_dense_matches_truncated(over):
    """Pad-and-mask escape hatch (reference distributed.py:14-39 spirit):
    a padded batch with row_valid scores EXACTLY the truncated batch of its
    real rows — numerators, denominators, and the mean count all exclude
    padding."""
    clip, loss_trunc, text, image, valid = _truncated_vs_padded(**over)
    loss_pad = clip.model.apply(clip.params, text, image, return_loss=True,
                                row_valid=valid)
    np.testing.assert_allclose(float(loss_trunc), float(loss_pad),
                               rtol=1e-6, atol=1e-7)


def test_pad_and_mask_sharded_matches_truncated():
    """Same equality through the row-sharded 8-device loss: the padded rows
    sit on the LAST shards, every device contributes masked rows/columns."""
    clip, loss_trunc, text, image, valid = _truncated_vs_padded()
    mesh = create_mesh((8,), axis_names=("data",))
    fn = shard_map(
        lambda p, t, i, v: clip.model.apply(p, t, i, return_loss=True,
                                            axis_name="data", row_valid=v),
        mesh=mesh, in_specs=(P(), P("data"), P("data"), P("data")),
        out_specs=P(), check_vma=False)
    loss_pad = jax.jit(fn)(clip.params, text, image, valid)
    np.testing.assert_allclose(float(loss_trunc), float(loss_pad),
                               rtol=1e-5, atol=1e-6)


def test_pad_and_mask_grads_match_truncated():
    """The padded step's PARAMETER gradients equal the truncated batch's:
    padding contributes exactly zero to every weight gradient."""
    clip, _, text, image, valid = _truncated_vs_padded()

    def loss_pad(p):
        return clip.model.apply(p, text, image, return_loss=True,
                                row_valid=valid)

    def loss_trunc(p):
        return clip.model.apply(p, text[:12], image[:12], return_loss=True)

    g_pad = jax.grad(loss_pad)(clip.params)
    g_trunc = jax.grad(loss_trunc)(clip.params)
    for a, b in zip(jax.tree.leaves(g_pad), jax.tree.leaves(g_trunc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=1e-6)


def test_pad_and_mask_train_step_runs():
    """make_train_step threads valid= through to the loss (loader
    pad_remainder consumers)."""
    import optax
    clip = mock_clip()
    text, image = global_batch(b=8, seed=4)
    valid = jnp.arange(8) < 6
    state = create_train_state(clip.model, jax.random.PRNGKey(0),
                               optax.sgd(1e-3))
    step = make_train_step(clip.model, optax.sgd(1e-3), donate=False)
    _, m_pad = step(state, text, image, jax.random.PRNGKey(1), valid)
    _, m_trunc = step(state, text[:6], image[:6], jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m_pad["cl_loss"]),
                               float(m_trunc["cl_loss"]),
                               rtol=1e-5, atol=1e-6)


def test_pad_and_mask_rejects_unsupported_losses():
    clip = mock_clip(use_all_token_embeds=True)
    text, image = global_batch(b=8)
    with pytest.raises(AssertionError, match="row_valid"):
        clip.model.apply(clip.params, text, image, return_loss=True,
                         row_valid=jnp.ones(8, bool))
