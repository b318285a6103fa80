"""Parameter sharding rules: data parallelism + Megatron-style tensor
parallelism for the transformer stacks.

The stacked-scan parameter layout (leading `depth` axis, nn/layers.py) makes
the rules uniform per tensor name:

  * attention `to_qkv.w`  (depth, dim, 3·inner)   → column-parallel: shard the
    fused qkv output dim over 'model' (heads split across devices)
  * attention `to_out.w`  (depth, inner, dim)     → row-parallel: shard the
    input (head) dim; XLA inserts the psum on the output
  * FF `w_in.w`           (depth, dim, 2·inner)   → column-parallel
  * FF `inner_norm.g`     (depth, inner)          → follows the inner shards
  * FF `w_out.w`          (depth, inner, dim)     → row-parallel
  * token/pos embeddings and all LayerNorm gains  → replicated
  * latent heads, MLM/SSL heads, temperature      → replicated (tiny)

Everything else (batch arrays) shards its leading dim over 'data'. With the
'model' axis of size 1 this degrades to exactly the reference's DP setup.

NOTE (GEGLU + TP): `w_in` fuses [x, gate] halves along the output dim. With
the dim sharded, the `jnp.split` mid-point crosses shard boundaries and GSPMD
resolves it with a reshard. Correct always; at model-axis sizes > 1 consider
interleaving the halves for zero-comm splits (future optimization).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def param_spec(path: str, x) -> P:
    """PartitionSpec for one parameter, by tree-path name."""
    if x.ndim == 3:  # stacked per-layer matrices (depth, in, out)
        if "to_qkv" in path or "w_in" in path:
            return P(None, None, "model")     # column parallel
        if "to_out" in path or "w_out" in path:
            return P(None, "model", None)     # row parallel
    if x.ndim == 2 and "inner_norm" in path:
        return P(None, "model")
    return P()


def shard_params(params, mesh: Mesh):
    """Return params placed according to the TP/DP rules above."""
    def place(path, x):
        return jax.device_put(x, NamedSharding(mesh, param_spec(_path_str(path), x)))
    return jax.tree_util.tree_map_with_path(place, params)


def param_shardings(params, mesh: Mesh):
    """The NamedSharding tree (for jit in_shardings/out_shardings)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: NamedSharding(mesh, param_spec(_path_str(path), x)), params)


def opt_state_shardings(opt_state, params, mesh: Mesh):
    """Sharding tree for an optax state: any sub-tree structured like the
    param tree (Adam mu/nu, weight-decay masks, …) inherits the params'
    TP shardings leaf-for-leaf; everything else (step counts, empty states)
    is replicated.

    This is what makes the 32k-batch memory budget work on a TP mesh: Adam
    moments are 2× the param bytes, and without this they'd replicate onto
    every chip while the params themselves are sharded (see docs/SCALING.md).
    """
    pstruct = jax.tree.structure(params)
    pshard = param_shardings(params, mesh)
    repl = NamedSharding(mesh, P())

    def params_like(node):
        return jax.tree.structure(node) == pstruct

    def place(node):
        if params_like(node):
            return pshard
        return jax.tree.map(lambda _: repl, node)

    return jax.tree.map(place, opt_state, is_leaf=params_like)
