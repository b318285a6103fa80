"""End-to-end training example: tokenizer → input pipeline → sharded train
loop with checkpointing, metrics, and a zero-shot eval that demonstrates
actual learning (docs/RUN.md records a run of this on a TPU v5e chip).

The synthetic dataset is LEARNABLE: each of 16 classes is a distinct
(color × orientation) sinusoidal texture, captioned "a photo of a <color>
<orientation> pattern". A working CLIP rapidly aligns the two towers:
the contrastive loss falls and zero-shot classification over the 16 class
prompts goes from chance (~6%) to near-perfect.

Runs on anything JAX supports; on a multi-chip TPU slice the same code
shards the batch over the mesh's 'data' axis and the params per the TP
rules. Swap `SyntheticPatterns` for your own dataset (e.g.
`xclip_tpu.data.ImageFolderDataset`) for real training.

Usage:  python examples/train.py [steps] [metrics.jsonl] [--aux|--filip]

`--aux` adds the DeCLIP-style auxiliary objectives (MLM text SSL + SimCLR
visual SSL) to the training loss — docs/RUN.md records a run showing the
aux losses decreasing alongside the contrastive loss. `--filip` trains
with fine-grained token-level contrast (`use_all_token_embeds=True`);
its per-token latents have no pooled zero-shot path, so that run is
judged by its loss curve.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from xclip_tpu import CLIP
from xclip_tpu.data import TextImageLoader
from xclip_tpu.data.tokenizer import SimpleTokenizer
from xclip_tpu.eval import build_zero_shot_classifier, zero_shot_accuracy
from xclip_tpu.parallel import create_mesh
from xclip_tpu.train import (MetricsLogger, create_train_state,
                             default_optimizer, make_train_step,
                             save_checkpoint, shard_state)

FLAGS = [a for a in sys.argv[1:] if a.startswith("--")]
ARGS = [a for a in sys.argv[1:] if not a.startswith("--")]
USE_AUX = "--aux" in FLAGS
USE_FILIP = "--filip" in FLAGS
STEPS = int(ARGS[0]) if ARGS else 200
METRICS_PATH = ARGS[1] if len(ARGS) > 1 else "/tmp/xclip-example-metrics.jsonl"
BATCH = 64
IMAGE_SIZE = 64
SEQ = 32

COLORS = {"red": (1.0, -1.0, -1.0), "green": (-1.0, 1.0, -1.0),
          "blue": (-1.0, -1.0, 1.0), "yellow": (1.0, 1.0, -1.0)}
ORIENTS = {"horizontal": 0, "vertical": 1, "diagonal": 2, "checkered": 3}
CLASSES = [(c, o) for c in COLORS for o in ORIENTS]          # 16 classes


def class_image(cls_idx: int, rng: np.random.RandomState) -> np.ndarray:
    color, orient = CLASSES[cls_idx]
    y, x = np.mgrid[0:IMAGE_SIZE, 0:IMAGE_SIZE] / IMAGE_SIZE
    freq = 2 * np.pi * 4
    phase = rng.uniform(0, 2 * np.pi)                        # nuisance
    kind = ORIENTS[orient]
    base = [np.sin(freq * y + phase), np.sin(freq * x + phase),
            np.sin(freq * (x + y) + phase),
            np.sign(np.sin(freq * x + phase) * np.sin(freq * y + phase))][kind]
    img = np.stack([base * ch for ch in COLORS[color]]).astype(np.float32)
    return img + 0.3 * rng.randn(3, IMAGE_SIZE, IMAGE_SIZE).astype(np.float32)


def caption(cls_idx: int) -> str:
    color, orient = CLASSES[cls_idx]
    return f"a photo of a {color} {orient} pattern"


class SyntheticPatterns:
    """Indexable (caption, image) dataset — exercises the loader's worker
    pool and per-epoch shuffling like a real file-backed dataset would."""

    def __init__(self, n=4096, seed=0):
        self.n, self.seed = n, seed

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.RandomState(self.seed + int(i))
        cls = int(i) % len(CLASSES)
        return caption(cls), class_image(cls, rng)


def eval_zero_shot(clip, params, tok, seed=123, n_eval=256):
    class_tokens = jnp.asarray(tok.tokenize(
        [caption(c) for c in range(len(CLASSES))], context_length=SEQ,
        pad_to_context_length=True))
    classifier = build_zero_shot_classifier(clip.model, params, class_tokens)
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, len(CLASSES), n_eval)
    images = jnp.asarray(np.stack([class_image(c, rng) for c in labels]))
    return zero_shot_accuracy(clip.model, params, images, labels, classifier)


def main():
    extra = {}
    if USE_AUX:
        # DeCLIP-style auxiliary self-supervision over the SHARED towers
        # (x_clip.py:518-552): MLM on the text side, SimCLR on the vision
        # side, folded into the total loss at their default weights
        extra = dict(use_mlm=True, use_visual_ssl=True,
                     visual_ssl_type="simclr", visual_ssl_hidden_layer=-1)
    if USE_FILIP:
        # update, don't rebind: --aux --filip composes (MLM + SimCLR + FILIP)
        extra.update(use_all_token_embeds=True, visual_patch_dropout=0.0)
    kwargs = dict(
        dim_text=128, dim_image=128, dim_latent=128,
        num_text_tokens=49408,              # real BPE vocab
        text_enc_depth=2, text_seq_len=SEQ, text_heads=4,
        visual_enc_depth=2, visual_heads=4, visual_image_size=IMAGE_SIZE,
        visual_patch_size=16, visual_patch_dropout=0.5,
        compute_dtype="bfloat16" if jax.default_backend() == "tpu" else None,
        scan_layers=False)
    kwargs.update(extra)
    clip = CLIP(**kwargs)
    tok = SimpleTokenizer()

    n_dev = len(jax.devices())
    mesh = create_mesh((n_dev, 1)) if n_dev > 1 else None

    if USE_FILIP:
        acc0 = None
        print("FILIP run: per-token latents have no pooled zero-shot path; "
              "judged by the contrastive loss curve")
    else:
        acc0 = eval_zero_shot(clip, clip.params, tok)
        print(f"zero-shot top-1 at init: {acc0['top1']:.3f} (chance = "
              f"{1 / len(CLASSES):.3f})")

    optimizer = default_optimizer(learning_rate=3e-4, warmup_steps=20,
                                  total_steps=STEPS)
    state = create_train_state(clip.model, jax.random.PRNGKey(0), optimizer)
    if mesh is not None:
        state = shard_state(state, mesh)
    step = make_train_step(clip.model, optimizer, donate=False)

    loader = TextImageLoader(
        SyntheticPatterns(), BATCH, context_length=SEQ,
        mesh=mesh, num_workers=2, shuffle_seed=0, num_epochs=None,
        # bf16 training consumes bf16 pixels: collate them device-ready
        # (halves host->device transfer, no in-graph ingest cast)
        image_dtype=("bfloat16" if jax.default_backend() == "tpu"
                     else "float32"))
    rng = jax.random.PRNGKey(1)
    first_metrics = None
    with MetricsLogger(METRICS_PATH, flush_every=5) as logger:
        for i, batch in enumerate(loader):
            if i >= STEPS:
                break
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, batch["text"], batch["image"], sub)
            logger.log(i, metrics, batch_size=BATCH)
            if first_metrics is None:
                first_metrics = {k: float(v) for k, v in metrics.items()}

    last = {k: float(v) for k, v in metrics.items()}
    if USE_AUX:
        for k in ("cl_loss", "text_ssl_loss", "image_ssl_loss"):
            print(f"{k}: {first_metrics[k]:.4f} -> {last[k]:.4f}")
    if USE_FILIP:
        print(f"cl_loss: {first_metrics['cl_loss']:.4f} -> "
              f"{last['cl_loss']:.4f}")
        assert last["cl_loss"] < first_metrics["cl_loss"], \
            "FILIP training did not reduce the contrastive loss"
    else:
        acc1 = eval_zero_shot(clip, state.params, tok)
        print(f"zero-shot top-1 after {STEPS} steps: {acc1['top1']:.3f}")
        assert acc1["top1"] > acc0["top1"], "training did not improve zero-shot"
    save_checkpoint("/tmp/xclip-example-ckpt", state)
    print("checkpoint saved to /tmp/xclip-example-ckpt")


if __name__ == "__main__":
    main()
