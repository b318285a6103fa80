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
    # dim768 needs 32MB scoped VMEM for the text megablock at n_pad 384
    # and 40MB for the fed FF pass 1 (see bench_vitb16.py); the flagship
    # uses the production 24MB
    kib = int(os.environ.get(
        "XCLIP_VMEM_KIB", "40960" if "--dim768" in sys.argv else "24576"))
    os.environ["LIBTPU_INIT_ARGS"] = (
        _args + f" --xla_tpu_scoped_vmem_limit_kib={kib}").strip()

import jax
import jax.numpy as jnp
import numpy as np

def classify(name, long_name):
    """Bucket one XLA-Ops event. Pallas kernels appear as custom-calls
    named by their innermost jax named_scope ('feed_forward.N' /
    'attention.N'), so the PASS is identified from the custom-call's
    OUTPUT signature in long_name, and the tower from the row count of the
    first operand:
      FF  p1  → emits the packed (2, rows) m1/m2 f32 tensor; the FED
                variant instead emits ≥4 bf16 tensors (dx/dh/y/xn) plus
                the (1, d) f32 dg rows and NO row-stats pack
      FF  p2  → emits the three f32 dW matrices (and nothing else)
      FF fwd  → emits the (4, rows) f32 LN-stats pack (+ optional stored
                activations)
      attn fwd/bwd → stats pack out vs multi-bf16-gradient out
    """
    scope = re.sub(r"\.\d+$", "", name)
    ln = long_name or ""
    outs = ln.split(" custom-call(")[0] if " custom-call(" in ln else ""
    rows = ""
    m = re.search(r"custom-call\((?:\()?[a-z0-9]+\[(\d+),", ln)
    if m:
        rows = f"[r{m.group(1)}]"
    if "custom-call" in ln:
        if scope == "feed_forward":
            if re.search(r"f32\[2,\d+\]", outs):
                return f"ff_bwd_p1{rows}"
            if re.search(r"f32\[4,\d+\]", outs):
                return f"ff_fwd{rows}"
            if len(re.findall(r"bf16\[", outs)) >= 4 \
                    and re.search(r"f32\[1,\d+\]", outs):
                return f"ff_bwd_p1{rows}"
            if "bf16" in outs:
                return f"ff_fwd{rows}"
            return f"ff_bwd_p2{rows}"
        if scope == "attention":
            # backward emits several bf16 gradient tensors and no f32
            # stats pack; forward emits out (+ residuals) + the stats pack
            n_bf16 = len(re.findall(r"bf16\[", outs))
            has_stats = re.search(r"f32\[\d+,\d+\]", outs)
            if has_stats and n_bf16 <= 4:
                return f"attn_fwd{rows}"
            return f"attn_bwd{rows}"
        return f"pallas_{scope}{rows}"
    if scope in ("feed_forward", "attention"):
        return f"xla_{scope}"
    full = f"{name} {ln}"
    for bucket, pat in [
        ("dW_dots", r"dot.*dqkv|transpose.*dot"),
        ("embedding", r"embed|scatter|dynamic-update|take"),
        ("patchify", r"patch|conv"),
        ("optimizer", r"adam|optimizer|clip_by|global_norm"),
        ("loss", r"contrastive|logsumexp|loss|softmax_cross"),
        ("copies_layout", r"^copy|^pad|^reshape|^slice|transpose|bitcast|"
                          r"convert|^broadcast"),
    ]:
        if re.search(pat, full, re.IGNORECASE):
            return bucket
    if "fusion" in name:
        return "xla_fusions"
    return "other"


def summarize(logdir, steps):
    files = glob.glob(os.path.join(logdir, "plugins", "profile", "*",
                                   "*.trace.json.gz"))
    assert files, f"no trace files under {logdir}"
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # the profile holds THREE device tracks covering the same wall time
    # (Steps / XLA Modules / XLA Ops) — sum ONLY the op-level track or
    # everything triple-counts
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    tid_names = {(e.get("pid"), e.get("tid")):
                 e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "thread_name"}
    by_bucket = defaultdict(float)
    by_name = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if not re.search(r"TPU|/device",
                         pid_names.get(e.get("pid"), "") or ""):
            continue
        if tid_names.get((e.get("pid"), e.get("tid"))) != "XLA Ops":
            continue
        name = e.get("name", "")
        ln = e.get("args", {}).get("long_name", "") or ""
        dur_ms = e["dur"] / 1e3
        by_bucket[classify(name, ln)] += dur_ms
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
