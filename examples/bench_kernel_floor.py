"""Isolation microbench for the two hot backward kernels (VERDICT r4 #1).

Question: is the gap between the backward kernels' MXU rate (attn bwd
71 TF, FF bwd pass 1 109 TF, r4 device trace) and the forward's 152 TF a
*schedule floor* or removable VPU work? Method: time the REAL kernels,
then the SAME pallas_calls (same grid, same BlockSpecs, same dots, same
HBM traffic) with the VPU epilogue stubbed out — softmax backward /
GEGLU·LN backward replaced by casts. The difference IS the serialized
VPU cost; if the stub runs no faster, the kernel is at its dot/DMA floor.

Shapes are the flagship text tower (b 256 × seq 272 after sublane
alignment, dim 512, 8×64 heads, FF inner 2048). Timing chains the
kernel through a donated carry and fetches once (bench.py methodology —
per-step host syncs would measure the ~30 ms tunnel RTT).

Run on the real chip:  python examples/bench_kernel_floor.py
Prints one JSON line per measurement.
"""

import functools
import json
import os
import time

_args = os.environ.get("LIBTPU_INIT_ARGS", "")
if "scoped_vmem" not in _args:
    os.environ["LIBTPU_INIT_ARGS"] = (
        _args + " --xla_tpu_scoped_vmem_limit_kib=24576").strip()

import jax
import jax.numpy as jnp
import numpy as np

import xclip_tpu  # noqa: F401  (sets the scoped-VMEM limit if unset)
import xclip_tpu.kernels.fused_ff_block as ffb
import xclip_tpu.kernels.attention_megablock as amb
from xclip_tpu.kernels.attention_megablock import _dot

if os.environ.get("XCLIP_FLOOR_TINY"):   # CPU smoke mode (interpret Pallas)
    B, N, D, HEADS, DIM_HEAD, INNER = 2, 16, 64, 2, 32, 128
    DTYPE = jnp.float32
else:
    B, N, D, HEADS, DIM_HEAD, INNER = 256, 272, 512, 8, 64, 2048
    DTYPE = jnp.bfloat16


def chain_time(f, x0, steps=30, warmup=3):
    f = jax.jit(f)
    x = x0
    for _ in range(warmup):
        x = f(x)
    float(jnp.sum(x.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(steps):
        x = f(x)
    float(jnp.sum(x.astype(jnp.float32)))
    return (time.perf_counter() - t0) / steps


def report(name, ms, note=""):
    print(json.dumps({"bench": name, "ms_per_iter": round(ms * 1e3, 3),
                      "note": note}))


# ---------------------------------------------------------------- FF block

def ff_inputs():
    npr = np.random.RandomState(0)
    rows = B * N
    x = jnp.asarray(npr.randn(rows, D) * 0.5, DTYPE)
    gp = jnp.asarray(1 + 0.1 * npr.randn(D), DTYPE)
    wi = jnp.asarray(npr.randn(D, 2 * INNER) * 0.03, DTYPE)
    gi = jnp.asarray(1 + 0.1 * npr.randn(INNER), DTYPE)
    wo = jnp.asarray(npr.randn(INNER, D) * 0.02, DTYPE)
    do = jnp.asarray(npr.randn(rows, D) * 0.1, DTYPE)
    return x, gp, wi, gi, wo, do


def bench_ff(store_h, label, note=""):
    x, gp, wi, gi, wo, do = ff_inputs()

    def step(do_):
        _, vjp = jax.vjp(
            lambda a, b, c, d_, e: ffb.ff_block(a, b, c, d_, e,
                                                256, 512, None, store_h),
            x, gp, wi, gi, wo)
        dx, dgp, dwi, dgi, dwo = vjp(do_)
        # fold EVERY gradient into the carry: using only dx lets XLA DCE
        # the whole dW pass (pallas outputs with no consumers)
        other = (jnp.sum(dgp) + jnp.sum(dwi) + jnp.sum(dgi)
                 + jnp.sum(dwo)).astype(jnp.float32)
        return (dx * 0.125 + other * 1e-20).astype(DTYPE)

    ms = chain_time(step, do)
    report(label, ms, note)
    return ms


def bench_ff_fwd(store_h, label):
    x, gp, wi, gi, wo, _ = ff_inputs()

    def step(x_):
        out = ffb.ff_block(x_, gp, wi, gi, wo, 256, 512, None, store_h)
        return (out * 0.25).astype(DTYPE)

    report(label, chain_time(step, x))


# stubs: identical dots + traffic, VPU epilogue replaced by casts
def _stub_p1_geglu(x, do, gpre, gin, win, wout, prod_raw, gb_raw, agdb_raw,
                   mp, ip, mi, ii):
    do32 = do.astype(jnp.float32)
    dy = jax.lax.dot_general(do, wout, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dprod = dy
    dh = jnp.concatenate([dprod, dprod], axis=-1).astype(x.dtype)
    dxn = jax.lax.dot_general(dh, win, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dx = dxn + do32
    d = win.shape[0]
    inner = wout.shape[0]
    return (dx.astype(x.dtype), dprod.astype(x.dtype),
            jnp.zeros((1, d), jnp.float32), jnp.zeros((1, inner), jnp.float32))


def _stub_p1_stored(x, do, gpre, gin, win, wout, h_raw, mp, ip, mi, ii):
    return _stub_p1_geglu(x, do, gpre, gin, win, wout, None, None, None,
                          mp, ip, mi, ii)


def _stub_p2_geglu(x, do, gpre, gin_slice, prod_s, gb_s, agdb_s, dprod_raw,
                   mean_in, inv_in, mean_pre, inv_pre):
    xn, da, db, y = x, gb_s, agdb_s, prod_s
    dwina = jax.lax.dot_general(xn, da, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dwinb = jax.lax.dot_general(xn, db, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dwout = jax.lax.dot_general(y, do, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    return dwina, dwinb, dwout


def _stub_p2_stored(x, do, gpre, gin_slice, ha, hb, dprod_raw,
                    mean_in, inv_in, mean_pre, inv_pre):
    return _stub_p2_geglu(x, do, gpre, gin_slice, ha, hb, dprod_raw, None,
                          mean_in, inv_in, mean_pre, inv_pre)


# ----------------------------------------------------------- attention

def attn_inputs():
    npr = np.random.RandomState(1)
    hd = HEADS * DIM_HEAD
    x = jnp.asarray(npr.randn(B, N, D) * 0.5, DTYPE)
    gp = jnp.asarray(1 + 0.1 * npr.randn(D), DTYPE)
    wqkv = jnp.asarray(npr.randn(D, 3 * hd) * 0.03, DTYPE)
    wout = jnp.asarray(npr.randn(hd, D) * 0.03, DTYPE)
    go = jnp.asarray(1 + 0.1 * npr.randn(D), DTYPE)
    mask = jnp.ones((B, N), dtype=bool)
    do = jnp.asarray(npr.randn(B, N, D) * 0.1, DTYPE)
    return x, gp, wqkv, wout, go, mask, do


def bench_attn(label, note=""):
    x, gp, wqkv, wout, go, mask, do = attn_inputs()
    scale = DIM_HEAD ** -0.5

    def step(do_):
        _, vjp = jax.vjp(
            lambda a, b, c, d_, e: amb.attention_block(
                a, b, c, d_, e, mask, HEADS, DIM_HEAD, scale,
                False, None, False, True),
            x, gp, wqkv, wout, go)
        dx, dgp, dwqkv, dwout, dgo = vjp(do_)
        other = (jnp.sum(dgp) + jnp.sum(dwqkv) + jnp.sum(dwout)
                 + jnp.sum(dgo)).astype(jnp.float32)
        return (dx * 0.125 + other * 1e-20).astype(DTYPE)

    report(label, chain_time(step, do), note)


def _stub_bwd_kernel_stored(x_ref, gpre_ref, wqkv_ref, wout_ref, gout_ref,
                            mask_ref, do_ref, qkv_ref, attnout_ref, proj_ref,
                            stats_ref,
                            dx_ref, dqkv_ref, dwout_ref, dgpre_ref, dgout_ref,
                            *, scale, causal, heads, dim_head, n_rows, eps,
                            n_real, maybe_dead):
    """Same reads/writes/dots as _bwd_kernel_stored; softmax backward and
    both LN backwards replaced by casts/copies (the VPU epilogue)."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        dwout_ref[...] = jnp.zeros_like(dwout_ref)
        dgpre_ref[...] = jnp.zeros_like(dgpre_ref)
        dgout_ref[...] = jnp.zeros_like(dgout_ref)

    x = x_ref[0]
    hd = heads * dim_head
    qkv = qkv_ref[0][:n_rows]
    attnout = attnout_ref[0][:n_rows]
    do = do_ref[0][:n_rows].astype(jnp.float32)
    proj = proj_ref[0][:n_rows].astype(jnp.float32)
    stats = stats_ref[0][:n_rows]          # read (same traffic), unused math
    dproj = do + 1e-6 * proj + 1e-6 * stats[:, :1]

    dattn = _dot(dproj.astype(x.dtype), wout_ref[...], tb=True)
    dwout_ref[...] += _dot(attnout, dproj.astype(x.dtype), ta=True)

    dq_parts, dk_parts, dv_parts = [], [], []
    for h in range(heads):
        q = qkv[:, h * dim_head:(h + 1) * dim_head]
        k = qkv[:, hd + h * dim_head:hd + (h + 1) * dim_head]
        v = qkv[:, 2 * hd + h * dim_head:2 * hd + (h + 1) * dim_head]
        s = _dot(q, k, tb=True) * scale              # score dot (kept)
        p = (s * 1e-4).astype(x.dtype)               # stub: no exp/max/sum
        do_h = dattn[:, h * dim_head:(h + 1) * dim_head].astype(jnp.float32)
        dp = _dot(do_h.astype(v.dtype), v, tb=True)  # dp dot (kept)
        ds = (dp * scale).astype(x.dtype)            # stub: no p*(dp-delta)
        dq_parts.append(_dot(ds, k))
        dk_parts.append(_dot(ds, q, ta=True))
        dv_parts.append(_dot(p, do_h.astype(x.dtype), ta=True))
    dqkv = jnp.concatenate(dq_parts + dk_parts + dv_parts,
                           axis=-1).astype(x.dtype)
    dqkv_ref[0, :n_rows] = dqkv

    dxn = _dot(dqkv, wqkv_ref[...], tb=True)
    dx_ref[0, :n_rows] = (dxn + do).astype(dx_ref.dtype)


def main():
    print(f"# backend={jax.default_backend()} devices={jax.devices()}")

    bench_ff_fwd(False, "ff_fwd_lean")
    bench_ff_fwd("geglu", "ff_fwd_store_geglu")
    bench_ff_fwd(True, "ff_fwd_store_h")

    bench_ff("geglu", "ff_train_geglu", "fwd+p1+p2, geglu residual")
    bench_ff(True, "ff_train_h", "fwd+p1+p2, h residual (r4 default)")
    bench_ff(False, "ff_train_recompute", "fwd+p1+p2, stats-only residual")

    # isolation: stub pass 1, then pass 2 (geglu variant)
    orig_p1g, orig_p2g = ffb._p1_geglu_core, ffb._p2_geglu_core
    orig_p1s, orig_p2s = ffb._p1_stored_core, ffb._p2_stored_core
    try:
        ffb._p1_geglu_core = _stub_p1_geglu
        bench_ff("geglu", "ff_train_geglu_stub_p1",
                 "pass-1 VPU epilogue stubbed (same dots+traffic)")
        ffb._p2_geglu_core = _stub_p2_geglu
        bench_ff("geglu", "ff_train_geglu_stub_p1p2",
                 "both passes' VPU epilogues stubbed")
        ffb._p1_stored_core = _stub_p1_stored
        ffb._p2_stored_core = _stub_p2_stored
        bench_ff(True, "ff_train_h_stub_p1p2",
                 "h-residual variant, both epilogues stubbed")
    finally:
        ffb._p1_geglu_core, ffb._p2_geglu_core = orig_p1g, orig_p2g
        ffb._p1_stored_core, ffb._p2_stored_core = orig_p1s, orig_p2s

    bench_attn("attn_train_stored", "fwd+bwd, stored residuals")
    orig_bwd = amb._bwd_kernel_stored
    try:
        amb._bwd_kernel_stored = _stub_bwd_kernel_stored
        bench_attn("attn_train_stored_stub",
                   "softmax/LN backward stubbed (same dots+traffic)")
    finally:
        amb._bwd_kernel_stored = orig_bwd


if __name__ == "__main__":
    main()
