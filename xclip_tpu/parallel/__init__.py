"""Distributed layer: mesh construction, sharding rules, and the
cross-device negatives path (all_gather inside the loss, replacing
`x_clip/distributed.py`)."""

from .mesh import create_mesh, data_sharding, replicated
from .sharding import (opt_state_shardings, param_shardings, param_spec,
                       shard_params)

__all__ = ["create_mesh", "data_sharding", "replicated", "opt_state_shardings",
           "param_shardings", "param_spec", "shard_params"]
