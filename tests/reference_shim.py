"""Import the PyTorch reference from /root/reference for parity testing.

The image lacks torchvision/beartype/ftfy, so we install minimal stubs
(identity transforms — parity tests always pass explicit deterministic
augment fns). Also provides torch→JAX weight-transfer helpers so both
implementations run with IDENTICAL parameters.
"""

from __future__ import annotations

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np


def install_reference():
    if "x_clip" in sys.modules:
        import x_clip
        return x_clip

    import torch.nn as _nn

    class _IdentityTransform(_nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

        def forward(self, x):
            return x

    tv = types.ModuleType("torchvision")
    tvt = types.ModuleType("torchvision.transforms")
    for name in ["ColorJitter", "RandomGrayscale", "RandomHorizontalFlip",
                 "GaussianBlur", "RandomResizedCrop", "Normalize"]:
        setattr(tvt, name, _IdentityTransform)
    tv.transforms = tvt
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tvt

    bt = types.ModuleType("beartype")
    bt.beartype = lambda f: f
    btt = types.ModuleType("beartype.typing")
    from typing import List, Optional, Union
    btt.Optional, btt.Union, btt.List = Optional, Union, List
    sys.modules["beartype"] = bt
    sys.modules["beartype.typing"] = btt

    ft = types.ModuleType("ftfy")
    ft.fix_text = lambda t: t
    sys.modules["ftfy"] = ft

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import x_clip
    return x_clip


def t2j(t):
    return jnp.asarray(t.detach().cpu().numpy())


def transfer_transformer(ref):
    """torch Transformer (x_clip.py:247-291) → stacked-scan param tree."""
    layers = []
    for attn_pre, ff_pre in ref.layers:
        attn, ff = attn_pre.fn, ff_pre.fn
        layers.append({
            "attn": {
                "norm": {"g": t2j(attn_pre.norm.g)},
                "to_qkv": {"w": t2j(attn.to_qkv.weight).T},
                "to_out": {"w": t2j(attn.to_out[0].weight).T},
                "out_norm": {"g": t2j(attn.to_out[1].g)},
            },
            "ff": {
                "norm": {"g": t2j(ff_pre.norm.g)},
                "w_in": {"w": t2j(ff.net[0].weight).T},
                "inner_norm": {"g": t2j(ff.net[2].g)},
                "w_out": {"w": t2j(ff.net[4].weight).T},
            },
        })
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return {
        "layers": stacked,
        "norm_in": {"g": t2j(ref.norm_in.g)},
        "norm_out": {"g": t2j(ref.norm_out.g)},
    }


def transfer_text_transformer(ref):
    params = {
        "token_emb": {"emb": t2j(ref.token_emb.weight)},
        "transformer": transfer_transformer(ref.transformer),
    }
    if ref.abs_pos_emb is not None:
        params["abs_pos_emb"] = {"emb": t2j(ref.abs_pos_emb.weight)}
    if ref.cls_token is not None:
        params["cls_token"] = t2j(ref.cls_token)
    return params


def transfer_vision_transformer(ref):
    return {
        "patch_proj": {"w": t2j(ref.to_tokens[1].weight).T,
                       "b": t2j(ref.to_tokens[1].bias)},
        "pos_emb": {"emb": t2j(ref.pos_emb.weight)},
        "transformer": transfer_transformer(ref.transformer),
        "to_cls": {"w": t2j(ref.to_cls_tokens[1].weight).T},
    }


def _transfer_visual_latent(head):
    import torch.nn as nn
    if isinstance(head, nn.Linear):
        return {"w": t2j(head.weight).T}
    # downsample path: Sequential(RearrangeImage, dw Conv2d, pw Conv2d, Rearrange)
    return {
        "dw": {"w": t2j(head[1].weight)},
        "pw": {"w": t2j(head[2].weight), "b": t2j(head[2].bias)},
    }


def transfer_simsiam_mlp(seq):
    """torch SimSiamMLP Sequential (visual_ssl.py:123-135) → param tree."""
    def bn(m, affine=True):
        p = {"mean": t2j(m.running_mean), "var": t2j(m.running_var)}
        if affine:
            p["scale"] = t2j(m.weight)
            p["bias"] = t2j(m.bias)
        return p

    return {
        "l1": {"w": t2j(seq[0].weight).T}, "bn1": bn(seq[1]),
        "l2": {"w": t2j(seq[3].weight).T}, "bn2": bn(seq[4]),
        "l3": {"w": t2j(seq[6].weight).T}, "bn3": bn(seq[7], affine=False),
    }


def transfer_mlp(seq):
    """torch MLP Sequential (visual_ssl.py:113-121) → param tree."""
    return {
        "l1": {"w": t2j(seq[0].weight).T, "b": t2j(seq[0].bias)},
        "bn1": {"mean": t2j(seq[1].running_mean), "var": t2j(seq[1].running_var),
                "scale": t2j(seq[1].weight), "bias": t2j(seq[1].bias)},
        "l2": {"w": t2j(seq[3].weight).T, "b": t2j(seq[3].bias)},
    }


def transfer_clip(ref):
    """torch CLIP (x_clip.py:412-595) → CLIPModel param tree."""
    params = {
        "text": transfer_text_transformer(ref.text_transformer),
        "visual": transfer_vision_transformer(ref.visual_transformer),
        "to_text_latent": {"w": t2j(ref.to_text_latent.weight).T},
        "to_visual_latent": _transfer_visual_latent(ref.to_visual_latent),
        "to_text_latent_extra": {"w": t2j(ref.to_text_latent_extra.weight).T},
        "to_visual_latent_extra": _transfer_visual_latent(ref.to_visual_latent_extra),
        "temperature": t2j(ref.temperature),
    }
    if ref.use_mlm:
        params["mlm"] = {"to_logits": {"w": t2j(ref.mlm.to_logits.weight).T,
                                       "b": t2j(ref.mlm.to_logits.bias)}}
    if ref.use_visual_ssl:
        ssl = ref.visual_ssl
        if type(ssl).__name__ == "SimSiam":
            params["visual_ssl"] = {
                "projector": transfer_simsiam_mlp(ssl.online_encoder.projector),
                "predictor": transfer_mlp(ssl.online_predictor),
            }
        else:  # SimCLR
            params["visual_ssl"] = {
                "projector": transfer_simsiam_mlp(ssl.net.projector),
            }
    return params


def make_mock_pair(seed=0, **overrides):
    """Build reference + xclip_tpu CLIP with IDENTICAL weights on the mock
    config (README.md:21-57 scaled down), returning (ref_model, model, params)."""
    import torch
    x_clip = install_reference()
    from xclip_tpu import CLIP as JClip

    cfg = dict(
        dim_text=64, dim_image=64, dim_latent=64, num_text_tokens=100,
        text_enc_depth=2, text_seq_len=16, text_heads=2, text_dim_head=16,
        visual_enc_depth=2, visual_heads=2, visual_dim_head=16,
        visual_image_size=32, visual_patch_size=16, visual_patch_dropout=0.0,
    )
    cfg.update(overrides)

    torch.manual_seed(seed)
    ref = x_clip.CLIP(**cfg)
    ref.train()

    jclip = JClip(**cfg)
    params = transfer_clip(ref)
    # keep subtree structure identical for optional heads
    for k in jclip.params:
        if k not in params:
            params[k] = jclip.params[k]
    return ref, jclip, params


def rand_batch(batch=4, seq=16, image=32, vocab=100, seed=0, channels=3):
    import torch
    rng = np.random.RandomState(seed)
    text = rng.randint(1, vocab, (batch, seq))
    img = rng.randn(batch, channels, image, image).astype(np.float32)
    return ((torch.tensor(text), torch.tensor(img)),
            (jnp.asarray(text), jnp.asarray(img)))
