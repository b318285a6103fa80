"""The 32k-global-batch per-chip shard, measured: local batch 2048 with the
memory-lean kernel config (`attn_impl='fused_recompute'`, `ff_impl='block'`,
`loss_impl='fused'`) — the configuration docs/SCALING.md budgets for a
v5e-16 data-parallel slice (BASELINE.json configs[4]).

Prints one JSON line: pairs/s/chip, peak HBM from XLA's memory analysis,
and the final loss. r5 re-measure target (VERDICT r4 #2): ≥1,650 pairs/s
at ≤11.6 GB after the forward-stored row statistics were ported to the
recompute backward variants — measured 1,676 @ 11.55 GB; the CHUNKED-FED
FF dW pass (fused_ff_block._p2_fed_choice) then lifted it to
**1,978 @ 11.64 GB** (+18%, hand-off chunks serialized so only one
~217 MB transient is alive at a time).

Usage: python examples/bench_32k_shard.py [local_batch] [steps]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_args = os.environ.get("LIBTPU_INIT_ARGS", "")
if "scoped_vmem" not in _args:
    os.environ["LIBTPU_INIT_ARGS"] = (
        _args + " --xla_tpu_scoped_vmem_limit_kib=24576").strip()

import jax
import jax.numpy as jnp
import numpy as np


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from xclip_tpu import CLIP
    from xclip_tpu.train import (create_train_state, default_optimizer,
                                 make_train_step)
    # XCLIP_BENCH_ATTN / XCLIP_BENCH_VATTN / XCLIP_BENCH_FF override for
    # A/B runs. The text tower must stay recompute at this shard (its qkv
    # residual alone is 6 x 1.6 GB); the VISION tower's qkv is only
    # ~0.2 GB/layer, inside the measured 4.1 GB headroom.
    attn_impl = os.environ.get("XCLIP_BENCH_ATTN", "fused_recompute")
    visual_attn_impl = os.environ.get("XCLIP_BENCH_VATTN") or None
    ff_impl = os.environ.get("XCLIP_BENCH_FF", "block")
    clip = CLIP(
        dim_text=512, dim_image=512, dim_latent=512, num_text_tokens=10000,
        text_enc_depth=6, text_seq_len=256, text_heads=8,
        visual_enc_depth=6, visual_heads=8, visual_image_size=256,
        visual_patch_size=32, visual_patch_dropout=0.5,
        scan_layers=False, attn_impl=attn_impl,
        visual_attn_impl=visual_attn_impl, ff_impl=ff_impl,
        loss_impl="fused", param_dtype=jnp.bfloat16, compute_dtype="bfloat16")
    optimizer = default_optimizer(learning_rate=1e-4)
    state = create_train_state(clip.model, jax.random.PRNGKey(0), optimizer,
                               dtype=jnp.bfloat16)
    step = make_train_step(clip.model, optimizer)

    npr = np.random.RandomState(0)
    text = jnp.asarray(npr.randint(1, 10000, (batch, 256)))
    image = jnp.asarray(npr.randn(batch, 3, 256, 256).astype(np.float32),
                        dtype=jnp.bfloat16)
    rngs = [jax.random.PRNGKey(i) for i in range(steps + 2)]

    # make_train_step already returns the jitted fn (donated state)
    compiled = step.lower(state, text, image, rngs[0]).compile()
    mem = compiled.memory_analysis()
    peak_gb = None
    if mem is not None:
        for attrs in (("peak_memory_in_bytes",),
                      ("temp_size_in_bytes", "argument_size_in_bytes",
                       "output_size_in_bytes", "-alias_size_in_bytes")):
            try:
                total = 0
                for a in attrs:
                    sign = -1 if a.startswith("-") else 1
                    total += sign * getattr(mem, a.lstrip("-"))
                peak_gb = round(total / 2**30, 2)
                break
            except AttributeError:
                continue

    for i in range(2):
        state, metrics = step(state, text, image, rngs[i])
    float(metrics["loss"])  # drain warmup (bench.py chained methodology)
    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = step(state, text, image, rngs[2 + i])
    loss = float(metrics["loss"])
    elapsed = time.perf_counter() - t0

    print(json.dumps({
        "metric": "pairs/s/chip (32k-shard config: local batch, memory-lean kernels)",
        "value": round(batch * steps / elapsed, 1),
        "batch_size": batch,
        "peak_hbm_gb": peak_gb,
        "config": {"attn_impl": attn_impl,
                   "visual_attn_impl": visual_attn_impl, "ff_impl": ff_impl,
                   "loss_impl": "fused", "param_dtype": "bfloat16"},
        "final_loss": round(loss, 4),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
