"""Host + device composition: the real input pipeline feeding the flagship
train step on the TPU (VERDICT r4 #7 — loader and device throughput had
only ever been measured separately).

Writes N synthetic 256px JPEGs + captions, then runs the flagship
ViT-B/32-class train step (bench.py's winning kernel config) fed by
`TextImageLoader` with device prefetch, and reports:

  * sustained end-to-end pairs/s (loader → H2D → train step),
  * the device-only rate on the same process (same batch re-fed, chained),
  * the loader-only rate for this worker count, measured both host-only
    (device_put=False) and with device placement (tunnel-confounded on
    this VM — see the inline comment),

so the reader can see which side binds and that prefetch hides the host
work up to the host's capacity. On the 1-core build VM the pipeline is
HOST-bound (~200 pairs/s/core of JPEG decode); the `cores_needed` field
states the host shape required to saturate the measured device rate —
composition at device rate is then worker arithmetic, demonstrated here
at the rate this host can reach.

Usage: python examples/bench_e2e.py [n_images] [batch] [steps] [workers]
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_args = os.environ.get("LIBTPU_INIT_ARGS", "")
if "scoped_vmem" not in _args:
    os.environ["LIBTPU_INIT_ARGS"] = (
        _args + " --xla_tpu_scoped_vmem_limit_kib=24576").strip()

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 256
STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 24
WORKERS = int(sys.argv[4]) if len(sys.argv) > 4 else (os.cpu_count() or 1)


def main():
    from PIL import Image

    from xclip_tpu import CLIP
    from xclip_tpu.data import ImageFolderDataset, TextImageLoader
    from xclip_tpu.train import (create_train_state, default_optimizer,
                                 make_train_step)

    root = tempfile.mkdtemp(prefix="xclip-e2e-bench-")
    rng = np.random.RandomState(0)
    for i in range(N):
        arr = (rng.rand(288, 288, 3) * 255).astype("uint8")
        Image.fromarray(arr).save(os.path.join(root, f"{i:06d}.jpg"),
                                  quality=85)
        with open(os.path.join(root, f"{i:06d}.txt"), "w") as f:
            f.write(f"a synthetic benchmark photo number {i}")

    clip = CLIP(
        dim_text=512, dim_image=512, dim_latent=512, num_text_tokens=49408,
        text_enc_depth=6, text_seq_len=256, text_heads=8,
        visual_enc_depth=6, visual_heads=8, visual_image_size=256,
        visual_patch_size=32, visual_patch_dropout=0.5,
        scan_layers=False, attn_impl="fused", visual_attn_impl="xla",
        ff_impl="block_stored", param_dtype=jnp.bfloat16,
        compute_dtype="bfloat16")
    optimizer = default_optimizer(learning_rate=1e-4)
    state = create_train_state(clip.model, jax.random.PRNGKey(0), optimizer,
                               dtype=jnp.bfloat16)
    step = make_train_step(clip.model, optimizer)

    ds = ImageFolderDataset(root, image_size=256)
    loader = TextImageLoader(ds, batch_size=BATCH, context_length=256,
                             num_workers=WORKERS, worker_backend="thread",
                             shuffle_seed=0, num_epochs=None,
                             image_dtype="bfloat16", prefetch=3)
    it = iter(loader)

    # warmup: compile + first batches
    b = next(it)
    for i in range(2):
        state, metrics = step(state, b["text"], b["image"],
                              jax.random.PRNGKey(i))
    float(metrics["loss"])

    # end-to-end: fresh loader batch every step
    t0 = time.perf_counter()
    for i in range(STEPS):
        b = next(it)
        state, metrics = step(state, b["text"], b["image"],
                              jax.random.PRNGKey(10 + i))
    loss = float(metrics["loss"])
    e2e_dt = time.perf_counter() - t0
    e2e_rate = BATCH * STEPS / e2e_dt

    # device-only on the same process/model: re-feed the last batch, chained
    t0 = time.perf_counter()
    for i in range(STEPS):
        state, metrics = step(state, b["text"], b["image"],
                              jax.random.PRNGKey(100 + i))
    float(metrics["loss"])
    dev_rate = BATCH * STEPS / (time.perf_counter() - t0)

    # loader-only rates at this worker count. Two measurements:
    #   * in-process, with device placement — what the e2e loop actually
    #     saw. On this build VM it is NOISY and tunnel-confounded: H2D is
    #     an SSH pipe (not PCIe) and the axon client's threads contend
    #     with decode on the single core.
    #   * host-only (device_put=False) in a CLEAN CPU SUBPROCESS — the
    #     decode→resize→tokenize→collate→cast rate a real v5e host core
    #     sustains (PCIe moves a 100 MB bf16 batch in ~10 ms, invisible).
    loader2 = TextImageLoader(ds, batch_size=BATCH, context_length=256,
                              num_workers=WORKERS, worker_backend="thread",
                              shuffle_seed=1, num_epochs=1,
                              image_dtype="bfloat16", prefetch=3)
    t0 = time.perf_counter()
    n = sum(bb["text"].shape[0] for bb in loader2)
    placed_rate = n / (time.perf_counter() - t0)

    import subprocess
    child = (
        "import time,sys,json\n"
        "from xclip_tpu.data import ImageFolderDataset, TextImageLoader\n"
        f"ds = ImageFolderDataset({root!r}, image_size=256)\n"
        f"ld = TextImageLoader(ds, batch_size={BATCH}, context_length=256,\n"
        f"    num_workers={WORKERS}, worker_backend='thread',\n"
        "    shuffle_seed=1, num_epochs=1, image_dtype='bfloat16',\n"
        "    prefetch=3, device_put=False)\n"
        "t0 = time.perf_counter()\n"
        "n = sum(b['text'].shape[0] for b in ld)\n"
        "print(json.dumps(n / (time.perf_counter() - t0)))\n")
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, "-c", child], env=env,
                         capture_output=True, text=True,
                         cwd=os.path.join(os.path.dirname(__file__), ".."))
    loader_rate = float(out.stdout.strip().splitlines()[-1])

    print(json.dumps({
        "metric": "end-to-end pairs/s (loader -> H2D -> flagship train step)",
        "value": round(e2e_rate, 1),
        "device_only_pairs_per_sec": round(dev_rate, 1),
        "loader_host_pairs_per_sec": round(loader_rate, 1),
        "loader_placed_in_tpu_process_pairs_per_sec": round(placed_rate, 1),
        "host_cores": os.cpu_count(), "num_workers": WORKERS,
        "batch_size": BATCH, "steps": STEPS,
        "bound_by": ("host" if loader_rate < 0.9 * dev_rate else "device"),
        # loader_rate / cores ≈ per-core decode rate (threads saturate the
        # cores once workers ≥ cores); device rate / per-core = host shape
        # needed for the device to bind instead
        "cores_needed_for_device_rate":
            round(dev_rate * max(os.cpu_count() or 1, 1)
                  / max(loader_rate, 1e-9), 1),
        "final_loss": round(loss, 4),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
