"""Device-mesh construction helpers.

The reference's only parallelism is data parallelism with cross-rank negative
sharing over torch.distributed (`x_clip/distributed.py`). Here the same (and
more) is expressed with `jax.sharding`: a named mesh, sharded global arrays,
and XLA-inserted collectives over ICI. Mesh shape is fixed at jit time
(SURVEY §5 — no elastic world size; the reference latches world size at
construction too, x_clip.py:591).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(axis_sizes: Optional[Sequence[int]] = None,
                axis_names: Tuple[str, ...] = ("data", "model"),
                devices=None) -> Mesh:
    """Build a mesh over the available devices.

    Default layout: all devices on the 'data' axis, 'model' axis of size 1 —
    pure DP, the reference-equivalent configuration. Pass e.g.
    `axis_sizes=(4, 2)` for 4-way DP × 2-way tensor parallelism.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = (n,) + (1,) * (len(axis_names) - 1)
    assert int(np.prod(axis_sizes)) == n, \
        f"mesh {axis_sizes} does not cover {n} devices"
    dev_array = np.asarray(devices).reshape(axis_sizes)
    return Mesh(dev_array, axis_names)


def data_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    """Shard array dimension `axis` (the batch dim) over the 'data' mesh axis."""
    spec = [None] * ndim
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
