"""Visual self-supervision: SimSiam and SimCLR over a shared vision tower.

Behavioral parity with reference `x_clip/visual_ssl.py`:
  * MLP / SimSiamMLP projector+predictor with BatchNorm1d (visual_ssl.py:113-135)
  * NetWrapper hidden-layer tap (visual_ssl.py:141-203): hidden_layer=-1 uses
    the tower's final output with the projection applied PER TOKEN (the
    rearrange '... d -> (...) d' flattens batch×seq); hidden_layer=-2 taps the
    transformer-stack output pre-CLS and flattens per-image to (b, n·d). Other
    non-negative ints tap the residual stream after that transformer block
    (explicit multi-output encoders replace the reference's forward hooks).
  * SimSiam (visual_ssl.py:207-259): two augmented views → online
    encoder+projector → predictor; targets are the SAME encoder under
    stop-gradient (no EMA); loss = (2-2cos)(p1, sg(t2)) + (2-2cos)(p2, sg(t1)),
    then mean.
  * SimCLR (visual_ssl.py:263-299): NT-Xent over 2N rows at `temperature`,
    computed here with a cyclic diag-removal gather (CE is column-order
    invariant, so this matches the reference's masked reshape exactly).

The reference's lazy projector init (mock forward at __init__) becomes static
shape inference from the encoder config. BatchNorm running statistics are
kept in the param tree for checkpoint-shape stability but are not updated
(the SSL heads are train-only branches; training mode always normalizes with
current-batch stats, matching the reference's train-mode loss).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ..nn.core import batch_norm_apply, batch_norm_init, linear_init
from ..utils import l2norm
from .augment import default_augment


# --------------------------------------------------------------------------
# projector / predictor MLPs (visual_ssl.py:113-135)
# --------------------------------------------------------------------------

def mlp_init(key, dim, projection_size, hidden_size=None, dtype=jnp.float32):
    hidden_size = hidden_size or dim
    k1, k2 = jax.random.split(key)
    return {
        "l1": linear_init(k1, dim, hidden_size, use_bias=True, dtype=dtype),
        "bn1": batch_norm_init(hidden_size, dtype=dtype),
        "l2": linear_init(k2, hidden_size, projection_size, use_bias=True, dtype=dtype),
    }


def _bn(params_bn, x, training, updates, key):
    """BatchNorm + torch-exact running-stat tracking. `updates` (or None)
    maps flat keys to the latest (mean, var) running values; repeated calls
    through the same BN layer fold sequentially with momentum 0.1 and
    UNBIASED batch variance, exactly like torch.nn.BatchNorm1d train-mode
    forwards (including the reference's no_grad target passes, which still
    update stats)."""
    out, (mean, var) = batch_norm_apply(params_bn, x, training)
    if updates is not None and training:
        prev_mean, prev_var = updates.get(
            key, (params_bn["mean"], params_bn["var"]))
        n = x.shape[0]
        unbiased = var * (n / max(n - 1, 1))
        updates[key] = (0.9 * prev_mean + 0.1 * mean,
                        0.9 * prev_var + 0.1 * unbiased)
    return out


def mlp_apply(params, x, training=True, updates=None, prefix=""):
    x = x @ params["l1"]["w"] + params["l1"]["b"]
    x = _bn(params["bn1"], x, training, updates, prefix + "bn1")
    x = jax.nn.relu(x)
    return x @ params["l2"]["w"] + params["l2"]["b"]


def simsiam_mlp_init(key, dim, projection_size, hidden_size=4096, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "l1": linear_init(k1, dim, hidden_size, dtype=dtype),
        "bn1": batch_norm_init(hidden_size, dtype=dtype),
        "l2": linear_init(k2, hidden_size, hidden_size, dtype=dtype),
        "bn2": batch_norm_init(hidden_size, dtype=dtype),
        "l3": linear_init(k3, hidden_size, projection_size, dtype=dtype),
        "bn3": batch_norm_init(projection_size, affine=False, dtype=dtype),
    }


def simsiam_mlp_apply(params, x, training=True, updates=None, prefix=""):
    x = x @ params["l1"]["w"]
    x = _bn(params["bn1"], x, training, updates, prefix + "bn1")
    x = jax.nn.relu(x)
    x = x @ params["l2"]["w"]
    x = _bn(params["bn2"], x, training, updates, prefix + "bn2")
    x = jax.nn.relu(x)
    x = x @ params["l3"]["w"]
    x = _bn(params["bn3"], x, training, updates, prefix + "bn3")
    return x


def _updates_to_tree(updates):
    """Flat {'projector/bn1': (mean, var)} → params-shaped nested subtree."""
    tree = {}
    for key, (mean, var) in updates.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = {"mean": mean, "var": var}
    return tree


# --------------------------------------------------------------------------
# hidden-layer tap (replaces NetWrapper's forward hooks)
# --------------------------------------------------------------------------

def resolve_hidden_layer(hidden_layer) -> int:
    """Accepts the reference's layer-by-NAME form (visual_ssl.py:152-171,
    `_find_layer` with a string looked up in `named_modules()`) alongside
    the int index. Names map onto this tower's named scopes:

      * "transformer" / "norm_out" — the transformer stack's output
        (post final norm, pre derived-CLS), i.e. index -2
      * "transformer/<i>"          — residual stream after block <i>
    """
    if isinstance(hidden_layer, int):
        return hidden_layer
    name = str(hidden_layer)
    if name in ("transformer", "norm_out"):
        return -2
    if name.startswith("transformer/"):
        return int(name.split("/", 1)[1])
    raise ValueError(
        f"unknown hidden layer name {name!r}; use an int block index, "
        f"'transformer', 'norm_out', or 'transformer/<block>'")


def representation_dim(encoder, hidden_layer) -> int:
    """Static shape inference replacing the reference's mock forward
    (visual_ssl.py:235,288). hidden_layer==-1 → per-token dim; otherwise the
    per-image flattened (n_kept · dim)."""
    hidden_layer = resolve_hidden_layer(hidden_layer)
    if hidden_layer == -1:
        return encoder.dim
    num_patches = encoder.num_patches
    if getattr(encoder, "patch_dropout", 0.0) > 0.0:
        num_patches = max(1, int(num_patches * (1 - encoder.patch_dropout)))
    return num_patches * encoder.dim


def get_representation(encoder, enc_params, x, hidden_layer, *,
                       rng=None, training=True, attn_impl="xla"):
    """Returns the flattened 2D representation fed to the projector.
    `hidden_layer` may be an int block index or a layer name (see
    `resolve_hidden_layer`)."""
    hidden_layer = resolve_hidden_layer(hidden_layer)
    if hidden_layer == -1:
        full = encoder.apply(enc_params, x, rng=rng, training=training,
                             attn_impl=attn_impl)
        return full.reshape(-1, full.shape[-1])            # (b·(n+1), d)
    if hidden_layer == -2:
        full = encoder.apply(enc_params, x, rng=rng, training=training,
                             attn_impl=attn_impl)
        pre_cls = full[:, 1:]                               # transformer output
        return pre_cls.reshape(pre_cls.shape[0], -1)        # (b, n·d)
    _, hidden = encoder.apply(enc_params, x, rng=rng, training=training,
                              attn_impl=attn_impl, return_hidden=hidden_layer)
    return hidden.reshape(hidden.shape[0], -1)


# --------------------------------------------------------------------------
# SimSiam
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SimSiam:
    image_size: int
    channels: int = 3
    hidden_layer: Any = -2   # int block index or layer name (resolve_hidden_layer)
    projection_size: int = 256
    projection_hidden_size: int = 4096
    augment_fn: Optional[Callable] = None
    augment_fn2: Optional[Callable] = None

    def _augments(self):
        aug1 = self.augment_fn or (
            lambda rng, x: default_augment(rng, x, self.image_size, self.channels))
        aug2 = self.augment_fn2 or aug1
        return aug1, aug2

    def init(self, key, encoder, dtype=jnp.float32):
        rep_dim = representation_dim(encoder, self.hidden_layer)
        k1, k2 = jax.random.split(key)
        return {
            "projector": simsiam_mlp_init(k1, rep_dim, self.projection_size,
                                          self.projection_hidden_size, dtype),
            "predictor": mlp_init(k2, self.projection_size, self.projection_size,
                                  self.projection_hidden_size, dtype),
        }

    def apply(self, params, encoder, enc_params, x, *, rng, training=True,
              attn_impl="xla", return_bn_updates=False):
        ka1, ka2, ke1, ke2, ke3, ke4 = jax.random.split(rng, 6)
        aug1, aug2 = self._augments()
        image_one, image_two = aug1(ka1, x), aug2(ka2, x)

        # BN running-stat updates fold sequentially in the reference's
        # forward order (visual_ssl.py:242-253): online proj ×2, predictor
        # ×2, then the no_grad target proj ×2 (torch no_grad does NOT
        # suppress BN stat updates)
        updates = {} if return_bn_updates else None

        def proj(img, k):
            rep = get_representation(encoder, enc_params, img, self.hidden_layer,
                                     rng=k, training=training, attn_impl=attn_impl)
            return simsiam_mlp_apply(params["projector"], rep, training,
                                     updates, "projector/")

        online_one = proj(image_one, ke1)
        online_two = proj(image_two, ke2)
        pred_one = mlp_apply(params["predictor"], online_one, training,
                             updates, "predictor/")
        pred_two = mlp_apply(params["predictor"], online_two, training,
                             updates, "predictor/")

        # stop-gradient targets, fresh encoder passes (fresh patch-dropout
        # draws) like the reference's no_grad re-forward (visual_ssl.py:248-253)
        target_one = jax.lax.stop_gradient(proj(image_one, ke3))
        target_two = jax.lax.stop_gradient(proj(image_two, ke4))

        def neg_cos(a, b):  # 2 - 2·cos (visual_ssl.py:106-109)
            return 2.0 - 2.0 * (l2norm(a) * l2norm(b)).sum(axis=-1)

        loss = neg_cos(pred_one, target_two) + neg_cos(pred_two, target_one)
        loss = loss.mean()
        if return_bn_updates:
            return loss, jax.lax.stop_gradient(_updates_to_tree(updates))
        return loss


# --------------------------------------------------------------------------
# SimCLR
# --------------------------------------------------------------------------

def nt_xent_loss(queries, keys, temperature=0.1):
    """NT-Xent over 2N rows (visual_ssl.py:88-102). The diagonal is removed
    with a cyclic column gather; every row's positive lands at column N-1."""
    b = queries.shape[0]
    n = 2 * b
    projs = jnp.concatenate([queries, keys], axis=0)
    logits = projs @ projs.T

    rows = jnp.arange(n)[:, None]
    cols = (rows + 1 + jnp.arange(n - 1)[None, :]) % n
    logits = jnp.take_along_axis(logits, cols, axis=1) / temperature

    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -logp[:, b - 1].mean().astype(queries.dtype)


@dataclasses.dataclass(frozen=True)
class SimCLR:
    image_size: int
    channels: int = 3
    hidden_layer: Any = -2   # int block index or layer name (resolve_hidden_layer)
    project_hidden: bool = True
    project_dim: int = 128
    augment_both: bool = True
    temperature: float = 0.1
    augment_fn: Optional[Callable] = None
    # accepted-but-ignored in the reference too (visual_ssl.py:272 — SimCLR
    # always uses NT-Xent regardless); kept for constructor-surface parity
    use_nt_xent_loss: bool = False

    def init(self, key, encoder, dtype=jnp.float32):
        rep_dim = representation_dim(encoder, self.hidden_layer)
        return {"projector": simsiam_mlp_init(key, rep_dim, self.project_dim,
                                              4096, dtype)}

    def apply(self, params, encoder, enc_params, x, *, rng, training=True,
              attn_impl="xla", return_bn_updates=False):
        ka1, ka2, ke1, ke2 = jax.random.split(rng, 4)
        aug = self.augment_fn or (
            lambda k, im: default_augment(k, im, self.image_size, self.channels))

        one = aug(ka1, x) if self.augment_both else x       # noop fix (§2.7.3)
        two = aug(ka2, x)

        updates = {} if return_bn_updates else None

        def proj(img, k):
            rep = get_representation(encoder, enc_params, img, self.hidden_layer,
                                     rng=k, training=training, attn_impl=attn_impl)
            return simsiam_mlp_apply(params["projector"], rep, training,
                                     updates, "projector/")

        queries = proj(one, ke1)
        keys = proj(two, ke2)
        loss = nt_xent_loss(queries, keys, self.temperature)
        if return_bn_updates:
            return loss, jax.lax.stop_gradient(_updates_to_tree(updates))
        return loss
