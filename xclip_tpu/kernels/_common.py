"""Shared helpers for the Pallas TPU kernels.

Single home for the numerics that must stay bit-identical to the XLA
reference path (`nn.core.layer_norm_apply`'s dtype-eps policy, the
gain-only LayerNorm forward/backward) and for the tiling utilities — the
parity tests compare every kernel against the XLA path, so a divergence
introduced by editing one copy of these would be a silent correctness bug.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = float(-jnp.inf)


def scoped_vmem_limit_bytes() -> int:
    """The Mosaic scoped-VMEM limit in force: 16MB default, overridable via
    LIBTPU_INIT_ARGS --xla_tpu_scoped_vmem_limit_kib (bench.py sets 24576 —
    the v5e has 128MB of VMEM and the default leaves most of it idle).
    Kernel `supported()` gates read this so their budgets track reality."""
    import os
    import re
    m = re.search(r"scoped_vmem_limit_kib=(\d+)",
                  os.environ.get("LIBTPU_INIT_ARGS", ""))
    return int(m.group(1)) * 1024 if m else 16 * 1024 * 1024


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def eps_for(dtype) -> float:
    """Dtype-dependent LayerNorm eps — reference x_clip.py:117-121 via
    nn/core.layer_norm_apply."""
    return 1e-5 if dtype == jnp.float32 else 1e-3


def ln_fp32(x32, g32, eps):
    """Gain-only LayerNorm in fp32: returns (normed·g, xhat, inv)."""
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    c = x32 - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = c * inv
    return xhat * g32, xhat, inv


def ln_bwd(dy, xhat, inv, g32):
    """Gain-only LayerNorm vjp → (dx, dg_rowsum)."""
    dg = jnp.sum(dy * xhat, axis=0, keepdims=True)
    dxhat = dy * g32
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    return inv * (dxhat - m1 - xhat * m2), dg
