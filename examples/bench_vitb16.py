"""ViT-B/16-class scaling point: train-step throughput at dim 768 with the
kernel-gate coverage under the production 24 MB scoped-VMEM limit.

The flagship bench (bench.py) runs the README ViT-B/32-class config; this
script demonstrates the kernel stack's generality one model class up
(docs/SCALING.md "ViT-B/16-class" section): dim 768, 12+12 layers,
12 heads, patch 16 — ~210 M params.

Usage: python examples/bench_vitb16.py [batch] [steps]
Prints one JSON line with the measured pairs/s and every kernel gate's
verdict at this shape.

XCLIP_VMEM_KIB overrides the scoped-VMEM limit (default 40960 = 40 MB
here). Two thresholds stack at this shape: the TEXT megablock runs at
n_pad 384 — 257 tokens rounded to the kernel's 128-grain — whose
recompute backward estimates ~28.4 MB, over the flagship's 24 MB limit
(gating it off forces the whole-head attention fallback AND disables the
sequence alignment that makes the FF flatten a free bitcast, ~26 ms/step
of relayout copies in the r5 device trace: 329 → 349.8 pairs/s at
32 MB); and the FED FF pass-1 kernel needs ~38 MB at its 128-row tile
(the transposed-stats layout forbids halving it — fused_ff_block.
_p2_fed_choice), worth another +20% (→ 420.9 pairs/s at 40 MB). The r5
qkv-only stored attention (`attn_impl='fused_qkv'`: backward reads the
forward-stored qkv instead of re-projecting it, everything else stays
recompute) adds +3% on top (→ 433.4) for +2.6 GB HBM — the residual the
FULL stored variant cannot afford at this batch.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_args = os.environ.get("LIBTPU_INIT_ARGS", "")
if "scoped_vmem" not in _args:
    kib = int(os.environ.get("XCLIP_VMEM_KIB", "40960"))
    os.environ["LIBTPU_INIT_ARGS"] = (
        _args + f" --xla_tpu_scoped_vmem_limit_kib={kib}").strip()

import jax
import jax.numpy as jnp
import numpy as np


def gate_report():
    """Every Pallas kernel's supported() verdict at the ViT-B/16 shapes
    (dim 768, 12 heads x 64, inner 3072) under the ACTIVE scoped-VMEM
    limit. n_pads are the megablock's REAL 128-grain round-ups of the
    tower sequences (text 257 → 384, vision 129 kept → 256), not the
    16-grain aligned lengths the r4 report mistakenly probed (272/144)."""
    from xclip_tpu.kernels import (attention_block, attention_megablock,
                                   fused_ff_block)
    from xclip_tpu.kernels._common import scoped_vmem_limit_bytes
    gates = {"scoped_vmem_limit_mib": scoped_vmem_limit_bytes() / 2**20}
    for n_pad, tower in ((384, "text"), (256, "vision")):
        for store in (False, "qkv", True):
            name = {False: "recompute", "qkv": "qkv", True: "stored"}[store]
            key = f"megablock_{tower}_{name}"
            gates[key] = attention_megablock.supported(
                12, 64, 768, n_pad, jnp.bfloat16, store_qkv=store)
    gates["whole_head_attention"] = attention_block.supported(12, 64)
    gates["ff_block"] = fused_ff_block.supported(768, 3072)
    return gates


def run(batch, steps, warmup, attn_impl, ff_impl):
    from xclip_tpu import CLIP
    from xclip_tpu.train import (create_train_state, default_optimizer,
                                 make_train_step)
    clip = CLIP(
        dim_text=768, dim_image=768, dim_latent=768, num_text_tokens=10000,
        text_enc_depth=12, text_seq_len=256, text_heads=12,
        visual_enc_depth=12, visual_heads=12, visual_image_size=256,
        visual_patch_size=16, visual_patch_dropout=0.5,
        scan_layers=False, attn_impl=attn_impl, ff_impl=ff_impl,
        param_dtype=jnp.bfloat16, compute_dtype="bfloat16")
    optimizer = default_optimizer(learning_rate=1e-4)
    state = create_train_state(clip.model, jax.random.PRNGKey(0), optimizer,
                               dtype=jnp.bfloat16)
    step = make_train_step(clip.model, optimizer)
    npr = np.random.RandomState(0)
    text = jnp.asarray(npr.randint(1, 10000, (batch, 256)))
    image = jnp.asarray(npr.randn(batch, 3, 256, 256).astype(np.float32))
    rngs = [jax.random.PRNGKey(i) for i in range(steps + warmup)]
    for i in range(warmup):
        state, metrics = step(state, text, image, rngs[i])
    float(metrics["loss"])  # drain compile + warmup (bench.py methodology)
    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = step(state, text, image, rngs[warmup + i])
    loss = float(metrics["loss"])
    elapsed = time.perf_counter() - t0
    return batch * steps / elapsed, loss


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    gates = gate_report()
    # production config at this shape: FULL stored attention + lean FF
    # with the fed dW pass. The r4 "stored residuals OOM at b128" was the
    # FF triple (6 x 1.28 GB); the attention residuals alone fit (8.74 GB
    # measured) and win — 445.7 vs 433.4 (qkv-only, 6.85 GB) vs 420.9
    # (recompute, 4.21 GB). XCLIP_BENCH_ATTN / XCLIP_BENCH_FF override
    # for A/B runs ('fused_qkv' is the b256-class choice — see SCALING.md).
    attn_impl = os.environ.get("XCLIP_BENCH_ATTN", "fused")
    ff_impl = os.environ.get("XCLIP_BENCH_FF", "block")
    pairs, loss = run(batch, steps, warmup=2,
                      attn_impl=attn_impl, ff_impl=ff_impl)
    print(json.dumps({
        "metric": "pairs/s/chip (ViT-B/16-class, dim 768, 12+12, 256px/p16)",
        "value": round(pairs, 1), "batch_size": batch,
        "config": {"attn_impl": attn_impl, "ff_impl": ff_impl,
                   "param_dtype": "bfloat16",
                   "ff_p2_fed": os.environ.get("XCLIP_FF_P2_FED", "auto")},
        "final_loss": round(loss, 4), "gates": gates,
    }))


if __name__ == "__main__":
    main()
