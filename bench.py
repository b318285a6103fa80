"""Throughput benchmark: image-text pairs/sec/chip on the flagship config
(x-clip README default: dim 512, 6+6 layers, 256px/patch32, seq 256, FLIP
patch dropout 0.5) — full training step (forward + backward + AdamW).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "pairs/s", "vs_baseline": N/3000}
vs_baseline is the ratio to BASELINE.json's 3k pairs/sec/chip north star
(the reference publishes no numbers of its own — BASELINE.md).
"""

import json
import os
import time

# must precede backend init (libtpu reads it at dlopen): the Mosaic scoped
# VMEM default of 16MB leaves half the v5e's 128MB VMEM unused and blocks
# the larger whole-block kernel tiles — 24MB measured best (README)
_args = os.environ.get("LIBTPU_INIT_ARGS", "")
if "scoped_vmem" not in _args:
    os.environ["LIBTPU_INIT_ARGS"] = (
        _args + " --xla_tpu_scoped_vmem_limit_kib=24576").strip()

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_PAIRS_PER_SEC = 3000.0


def run(batch_size=256, steps=40, warmup=3, param_dtype=jnp.float32,
        attn_impl="xla", compute_dtype="bfloat16", remat=False,
        remat_policy="dots", loss_impl="xla", scan_layers=False,
        ff_impl="xla", visual_attn_impl=None):
    from xclip_tpu import CLIP
    from xclip_tpu.train import (create_train_state, default_optimizer,
                                 make_train_step)

    clip = CLIP(
        dim_text=512, dim_image=512, dim_latent=512, num_text_tokens=10000,
        text_enc_depth=6, text_seq_len=256, text_heads=8,
        visual_enc_depth=6, visual_heads=8, visual_image_size=256,
        visual_patch_size=32, visual_patch_dropout=0.5,
        checkpoint_during_training=remat, remat_policy=remat_policy,
        scan_layers=scan_layers,
        attn_impl=attn_impl, visual_attn_impl=visual_attn_impl,
        loss_impl=loss_impl, ff_impl=ff_impl,
        param_dtype=param_dtype, compute_dtype=compute_dtype)

    optimizer = default_optimizer(learning_rate=1e-4)
    state = create_train_state(clip.model, jax.random.PRNGKey(0), optimizer,
                               dtype=param_dtype)
    step = make_train_step(clip.model, optimizer)

    npr = np.random.RandomState(0)
    text = jnp.asarray(npr.randint(1, 10000, (batch_size, 256)))
    # stage images in the compute dtype (the loader's image_dtype path,
    # data/pipeline.py): feeding fp32 makes every step re-read 2x the bytes
    # and burn an HBM-bound cast before patchify
    image = jnp.asarray(npr.randn(batch_size, 3, 256, 256).astype(np.float32),
                        dtype=jnp.dtype(compute_dtype))

    rngs = [jax.random.PRNGKey(i) for i in range(steps + warmup)]
    for i in range(warmup):
        state, metrics = step(state, text, image, rngs[i])
    float(metrics["loss"])  # hard sync: drain compile + warmup queue
    # NOTE on timing methodology: the remote-TPU tunnel has ~30ms round-trip
    # latency and `block_until_ready` does not block on queued remote work,
    # so per-step host syncs measure latency, not throughput. The donated
    # train state chains the steps into a sequential device-side dependency
    # chain; ONE value fetch at the end forces the whole chain, so
    # elapsed/steps is the true per-step cost (amortizing a single RTT).
    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = step(state, text, image, rngs[warmup + i])
    last_loss = float(metrics["loss"])
    elapsed = time.perf_counter() - t0

    pairs_per_sec = batch_size * steps / elapsed
    return pairs_per_sec, last_loss


def _is_oom(e: Exception) -> bool:
    """Device/compiler capacity failure → legitimate ladder fallback.

    Match the structured XLA error first (XlaRuntimeError carries the
    RESOURCE_EXHAUSTED status code in its message prefix); only for the
    opaque remote-compile HTTP errors fall back to explicit OOM phrases.
    Anything else is a real bug and must re-raise (VERDICT r2 weak #6 —
    'while allocating' used to swallow genuine Pallas errors)."""
    try:
        from jax.errors import JaxRuntimeError
    except ImportError:  # older jax spelling
        from jax._src.lib import xla_client
        JaxRuntimeError = xla_client.XlaRuntimeError
    s = str(e)
    if isinstance(e, JaxRuntimeError):
        return "RESOURCE_EXHAUSTED" in s
    sl = s.lower()
    return any(k in sl for k in ("resource_exhausted", "out of memory",
                                 "ran out of memory"))


def run_ladder(batch, run_fn=run):
    """Walk the config ladder (fastest first), halving the batch when every
    rung fails, and return the result record for the JSON line. Split from
    main() so the fallback logic is unit-testable (tests/test_bench.py) —
    this file produces the round's headline artifact and must degrade
    predictably on a sick device, not crash."""
    import sys
    # fastest-first config ladder (r2-r4 measurements, BASELINE.md):
    #   1. text tower on stored-backward Pallas kernels (fused whole-head
    #      attention + FF block with stored h/dprod), vision tower on XLA
    #      attention, bf16 weights, unrolled, no remat — the r4 winner
    #      (~2070 pairs/s @ b256)
    #   2. both towers on Pallas, recompute-backward FF block (r2 style)
    #   3. same kernels with fp32 weights (~1415)
    #   4. plain XLA unrolled no-remat (r1 winner, ~1390 @ b128)
    #   5. scanned + remat (compiles everywhere), then halve the batch
    skipped = []
    while batch >= 16:
        for cfg in (dict(remat=False, scan_layers=False,
                         attn_impl="fused", visual_attn_impl="xla",
                         ff_impl="block_stored",
                         param_dtype=jnp.bfloat16),
                    dict(remat=False, scan_layers=False,
                         attn_impl="fused", ff_impl="block",
                         param_dtype=jnp.bfloat16),
                    dict(remat=False, scan_layers=False,
                         attn_impl="fused", ff_impl="block"),
                    dict(remat=False, scan_layers=False),
                    dict(remat=True, scan_layers=True)):
            ok = False
            # the remote compile service 500s transiently — one retry per
            # rung before falling down the ladder
            for attempt in range(2):
                try:
                    pairs_per_sec, loss = run_fn(batch_size=batch, **cfg)
                    ok = True
                    break
                except Exception as e:
                    # fall back only on capacity failures (device OOM or the
                    # remote compiler rejecting the graph); real bugs re-raise
                    if not (_is_oom(e) or "remote_compile" in str(e)):
                        raise
                    print(f"# batch {batch} {cfg} attempt {attempt} failed "
                          f"({type(e).__name__}: {str(e)[:80]})",
                          file=sys.stderr)
                    if _is_oom(e):
                        skipped.append({
                            "batch_size": batch,
                            "config": {k: str(v) for k, v in cfg.items()},
                            "reason": "oom",
                            "error": f"{type(e).__name__}: {str(e)[:160]}"})
                        break          # deterministic — don't retry
                    if attempt == 1:   # remote_compile failed twice
                        skipped.append({
                            "batch_size": batch,
                            "config": {k: str(v) for k, v in cfg.items()},
                            "reason": "remote_compile",
                            "error": f"{type(e).__name__}: {str(e)[:160]}"})
            if ok:
                break
        else:
            batch //= 2
            continue
        break
    else:
        raise RuntimeError("could not find a working configuration; skipped: "
                           + json.dumps(skipped))

    result = {
        "metric": "image-text pairs/sec/chip (ViT-B/32-class CLIP, 256px, seq 256, train step)",
        "value": round(pairs_per_sec, 1),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 3),
        "batch_size": batch,
        "final_loss": round(loss, 4),
        "backend": jax.default_backend(),
    }
    if skipped:
        # masked fallbacks stay visible: every rung the ladder skipped, why
        result["skipped_configs"] = skipped
    return result


def main():
    import sys
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    print(json.dumps(run_ladder(batch)))


if __name__ == "__main__":
    main()
