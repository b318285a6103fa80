"""Fused streaming-LSE contrastive loss (kernels/fused_infonce.py): kernel
numerics vs an XLA oracle, and end-to-end loss/grad parity of
`loss_impl='fused'` against the default XLA path, single-device and on the
8-device mesh (sharded rows × gathered columns)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from xclip_tpu import CLIP
from xclip_tpu.kernels.fused_infonce import streaming_lse
from xclip_tpu.parallel import create_mesh


@pytest.mark.parametrize("r,c,d,decoupled,off", [
    (8, 8, 16, False, 0),
    (100, 300, 64, False, 0),
    (100, 300, 64, True, 37),       # DCL diag at a shard offset
    (64, 512, 512, True, 448),      # last shard's rows
])
def test_streaming_lse_matches_oracle(r, c, d, decoupled, off):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(r, d).astype(np.float32))
    y = jnp.asarray(rng.randn(c, d).astype(np.float32))

    lse = streaming_lse(x, y, off, decoupled, 32, 128)

    s = np.array(x @ y.T)
    if decoupled:
        rows = np.arange(r)
        cols = rows + off
        ok = cols < c
        s[rows[ok], cols[ok]] = -np.inf
    ref = jax.nn.logsumexp(jnp.asarray(s), axis=-1)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.fast
def test_streaming_lse_grads_match_oracle():
    r, c, d, off = 100, 300, 64, 37
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(r, d).astype(np.float32))
    y = jnp.asarray(rng.randn(c, d).astype(np.float32))
    dl = jnp.asarray(rng.randn(r).astype(np.float32))

    def fused(x_, y_):
        return (streaming_lse(x_, y_, off, True, 32, 128) * dl).sum()

    def oracle(x_, y_):
        s = jnp.where(jnp.arange(c)[None, :] == (jnp.arange(r)[:, None] + off),
                      -jnp.inf, x_ @ y_.T)
        return (jax.nn.logsumexp(s, axis=-1) * dl).sum()

    gx, gy = jax.grad(fused, argnums=(0, 1))(x, y)
    gxr, gyr = jax.grad(oracle, argnums=(0, 1))(x, y)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gxr),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(gyr),
                               rtol=1e-4, atol=1e-5)


def _mock_pair(**over):
    kw = dict(dim_text=32, dim_image=32, dim_latent=32, num_text_tokens=50,
              text_enc_depth=1, text_seq_len=8, text_heads=2, text_dim_head=16,
              visual_enc_depth=1, visual_heads=2, visual_dim_head=16,
              visual_image_size=16, visual_patch_size=8,
              visual_patch_dropout=0.0)
    kw.update(over)
    clip_x = CLIP(**kw)
    clip_f = CLIP(loss_impl="fused", **kw)
    return clip_x, clip_f, clip_x.params


@pytest.mark.parametrize("over", [
    dict(),
    dict(decoupled_contrastive_learning=True, extra_latent_projection=True),
    dict(multiview_loss_weight=0.1),
])
def test_fused_loss_impl_matches_xla(over):
    clip_x, clip_f, params = _mock_pair(**over)
    rng = np.random.RandomState(0)
    text = jnp.asarray(rng.randint(1, 50, (8, 8)))
    image = jnp.asarray(rng.randn(8, 3, 16, 16).astype(np.float32))
    kw = {}
    if "multiview_loss_weight" in over:
        kw = dict(aug_text=jnp.asarray(rng.randint(1, 50, (8, 8))),
                  aug_image=jnp.asarray(rng.randn(8, 3, 16, 16).astype(np.float32)))

    lx = clip_x.model.apply(params, text, image, return_loss=True, **kw)
    lf = clip_f.model.apply(params, text, image, return_loss=True, **kw)
    np.testing.assert_allclose(float(lx), float(lf), rtol=1e-5)

    gx = jax.grad(lambda p: clip_x.model.apply(p, text, image,
                                               return_loss=True, **kw))(params)
    gf = jax.grad(lambda p: clip_f.model.apply(p, text, image,
                                               return_loss=True, **kw))(params)
    for a, b in zip(jax.tree.leaves(gx), jax.tree.leaves(gf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 fake CPU devices")
def test_fused_sharded_loss_matches_global():
    clip_x, clip_f, params = _mock_pair(decoupled_contrastive_learning=True)
    rng = np.random.RandomState(2)
    text = jnp.asarray(rng.randint(1, 50, (8, 8)))
    image = jnp.asarray(rng.randn(8, 3, 16, 16).astype(np.float32))

    loss_global = clip_x.model.apply(params, text, image, return_loss=True)
    mesh = create_mesh((8,), axis_names=("data",))
    fn = shard_map(
        lambda p, t, i: clip_f.model.apply(p, t, i, return_loss=True,
                                           axis_name="data"),
        mesh=mesh, in_specs=(P(), P("data"), P("data")),
        out_specs=P(), check_vma=False)
    loss = jax.jit(fn)(params, text, image)
    np.testing.assert_allclose(float(loss_global), float(loss), rtol=1e-5)


@pytest.mark.parametrize("extra", [False, True])
def test_filip_blocked_matches_dense(extra):
    """Column-blocked FILIP reductions (peak memory O(b·block·t·i)) must
    reproduce the dense einsum path exactly, local and sharded."""
    over = dict(use_all_token_embeds=True, extra_latent_projection=extra)
    kw = dict(dim_text=32, dim_image=32, dim_latent=32, num_text_tokens=50,
              text_enc_depth=1, text_seq_len=8, text_heads=2, text_dim_head=16,
              visual_enc_depth=1, visual_heads=2, visual_dim_head=16,
              visual_image_size=16, visual_patch_size=8,
              visual_patch_dropout=0.0, **over)
    clip_d = CLIP(**kw)
    clip_b = CLIP(filip_block=4, **kw)
    params = clip_d.params

    rng = np.random.RandomState(0)
    text = jnp.asarray(rng.randint(1, 50, (8, 8)))
    text = text.at[2, 5:].set(0).at[5, 3:].set(0)
    image = jnp.asarray(rng.randn(8, 3, 16, 16).astype(np.float32))

    ld = clip_d.model.apply(params, text, image, return_loss=True)
    lb = clip_b.model.apply(params, text, image, return_loss=True)
    np.testing.assert_allclose(float(ld), float(lb), rtol=1e-5)

    gd = jax.grad(lambda p: clip_d.model.apply(p, text, image,
                                               return_loss=True))(params)
    gb = jax.grad(lambda p: clip_b.model.apply(p, text, image,
                                               return_loss=True))(params)
    for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-6)

    if len(jax.devices()) >= 8:
        mesh = create_mesh((8,), axis_names=("data",))
        fn = shard_map(
            lambda p, t, i: clip_b.model.apply(p, t, i, return_loss=True,
                                               axis_name="data"),
            mesh=mesh, in_specs=(P(), P("data"), P("data")),
            out_specs=P(), check_vma=False)
        ls = jax.jit(fn)(params, text, image)
        np.testing.assert_allclose(float(ld), float(ls), rtol=1e-5)
