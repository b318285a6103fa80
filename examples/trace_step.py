"""Capture a device trace of one train step and print a per-component
duration table (the README "step anatomy" / docs/SCALING.md floor tables).

Runs N steps under `jax.profiler` trace, parses the trace-viewer JSON the
profiler writes (plugins/profile/*/\*.trace.json.gz — no TF dependency),
keeps only TensorCore op events, and groups durations by component using
the op-name patterns of this model (Pallas kernel names + jax named
scopes baked into fusion names).

Usage:
  python examples/trace_step.py                      # flagship b256
  python examples/trace_step.py --dim768 [batch]     # ViT-B/16-class
Prints a JSON summary plus a readable table on stderr.
"""

import glob
import gzip
import json
import os
import re
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_args = os.environ.get("LIBTPU_INIT_ARGS", "")
if "scoped_vmem" not in _args:
    os.environ["LIBTPU_INIT_ARGS"] = (
        _args + " --xla_tpu_scoped_vmem_limit_kib=24576").strip()

import jax
import jax.numpy as jnp
import numpy as np

BUCKETS = [
    # (bucket, regex over the trace event name) — first match wins
    ("ff_fwd_kernel", r"fwd_kernel_store_geglu|fwd_kernel_store\b|ff.*fwd_kernel|_fwd_kernel\b"),
    ("ff_bwd_p1", r"bwd_dx_kernel"),
    ("ff_bwd_p2", r"bwd_dw_kernel"),
    ("attn_fwd_kernel", r"attention.*fwd|fwd_kernel_stats|fwd_kernel_stored"),
    ("attn_bwd_kernel", r"_bwd_kernel"),
    ("dwqkv_dot", r"dwqkv|dot.*dqkv"),
    ("xla_attention", r"attention"),
    ("xla_feed_forward", r"feed_forward"),
    ("embedding", r"embed|scatter|gather.*table|take"),
    ("patchify", r"patch|conv"),
    ("optimizer", r"adam|optimizer|clip_by|global_norm"),
    ("loss", r"contrastive|logsumexp|loss|softmax_cross"),
    ("copies_layout", r"^copy|fusion.*transpose|bitcast|convert"),
]


def classify(name):
    for bucket, pat in BUCKETS:
        if re.search(pat, name, re.IGNORECASE):
            return bucket
    return "other"


def summarize(logdir, steps):
    files = glob.glob(os.path.join(logdir, "plugins", "profile", "*",
                                   "*.trace.json.gz"))
    assert files, f"no trace files under {logdir}"
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # find TensorCore-ish pids: process names containing 'TPU' and track
    # names that are op streams (XLA Ops / TensorCore); fall back to
    # summing complete events with 'dur' on device pids
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    device_pids = {pid for pid, n in pid_names.items()
                   if re.search(r"TPU|/device", n or "")}
    by_bucket = defaultdict(float)
    by_name = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        args_name = e.get("args", {}).get("long_name", "") or \
            e.get("args", {}).get("name", "")
        full = f"{name} {args_name}"
        dur_ms = e["dur"] / 1e3
        by_bucket[classify(full)] += dur_ms
        by_name[name] += dur_ms
        total += dur_ms
    per_step = {k: round(v / steps, 3)
                for k, v in sorted(by_bucket.items(), key=lambda kv: -kv[1])}
    top = sorted(by_name.items(), key=lambda kv: -kv[1])[:25]
    return per_step, round(total / steps, 2), [
        (n[:110], round(v / steps, 3)) for n, v in top]


def main():
    dim768 = "--dim768" in sys.argv
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = int(argv[0]) if argv else (128 if dim768 else 256)
    steps = 5

    from xclip_tpu import CLIP
    from xclip_tpu.train import (create_train_state, default_optimizer,
                                 make_train_step)
    if dim768:
        cfg = dict(dim_text=768, dim_image=768, dim_latent=768,
                   text_enc_depth=12, text_heads=12, visual_enc_depth=12,
                   visual_heads=12, visual_patch_size=16,
                   attn_impl="fused_recompute", ff_impl="block")
    else:
        cfg = dict(dim_text=512, dim_image=512, dim_latent=512,
                   text_enc_depth=6, text_heads=8, visual_enc_depth=6,
                   visual_heads=8, visual_patch_size=32,
                   attn_impl="fused", visual_attn_impl="xla",
                   ff_impl="block_stored")
    clip = CLIP(num_text_tokens=10000, text_seq_len=256,
                visual_image_size=256, visual_patch_dropout=0.5,
                scan_layers=False, param_dtype=jnp.bfloat16,
                compute_dtype="bfloat16", **cfg)
    optimizer = default_optimizer(learning_rate=1e-4)
    state = create_train_state(clip.model, jax.random.PRNGKey(0), optimizer,
                               dtype=jnp.bfloat16)
    step = make_train_step(clip.model, optimizer)

    npr = np.random.RandomState(0)
    text = jnp.asarray(npr.randint(1, 10000, (batch, 256)))
    image = jnp.asarray(npr.randn(batch, 3, 256, 256).astype(np.float32),
                        dtype=jnp.bfloat16)
    rngs = [jax.random.PRNGKey(i) for i in range(steps + 2)]
    for i in range(2):
        state, metrics = step(state, text, image, rngs[i])
    float(metrics["loss"])

    logdir = tempfile.mkdtemp(prefix="xclip-trace-")
    jax.profiler.start_trace(logdir)
    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = step(state, text, image, rngs[2 + i])
    loss = float(metrics["loss"])
    wall = (time.perf_counter() - t0) / steps
    jax.profiler.stop_trace()

    per_step, device_total, top = summarize(logdir, steps)
    print(json.dumps({
        "config": "dim768" if dim768 else "flagship",
        "batch_size": batch,
        "wall_ms_per_step": round(wall * 1e3, 2),
        "pairs_per_sec": round(batch / wall, 1),
        "device_ms_per_step_by_bucket": per_step,
        "device_ms_total": device_total,
        "final_loss": round(loss, 4),
        "logdir": logdir,
    }))
    print("\ntop ops (ms/step):", file=sys.stderr)
    for n, v in top:
        print(f"  {v:9.3f}  {n}", file=sys.stderr)


if __name__ == "__main__":
    main()
