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

Usage:  python examples/train.py [steps] [metrics.jsonl]
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

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 200
METRICS_PATH = sys.argv[2] if len(sys.argv) > 2 else "/tmp/xclip-example-metrics.jsonl"
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
    clip = CLIP(
        dim_text=128, dim_image=128, dim_latent=128,
        num_text_tokens=49408,              # real BPE vocab
        text_enc_depth=2, text_seq_len=SEQ, text_heads=4,
        visual_enc_depth=2, visual_heads=4, visual_image_size=IMAGE_SIZE,
        visual_patch_size=16, visual_patch_dropout=0.5,
        compute_dtype="bfloat16" if jax.default_backend() == "tpu" else None,
        scan_layers=False)
    tok = SimpleTokenizer()

    n_dev = len(jax.devices())
    mesh = create_mesh((n_dev, 1)) if n_dev > 1 else None

    acc0 = eval_zero_shot(clip, clip.params, tok)
    print(f"zero-shot top-1 at init: {acc0['top1']:.3f} (chance = "
          f"{1 / len(CLASSES):.3f})")

    optimizer = default_optimizer(learning_rate=3e-4, warmup_steps=20,
                                  total_steps=STEPS)
    state = create_train_state(clip.model, jax.random.PRNGKey(0), optimizer)
    if mesh is not None:
        state = shard_state(state, mesh)
    step = make_train_step(clip.model, optimizer, donate=False)

    loader = TextImageLoader(SyntheticPatterns(), BATCH, context_length=SEQ,
                             mesh=mesh, num_workers=2, shuffle_seed=0,
                             num_epochs=None)
    rng = jax.random.PRNGKey(1)
    with MetricsLogger(METRICS_PATH, flush_every=5) as logger:
        for i, batch in enumerate(loader):
            if i >= STEPS:
                break
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, batch["text"], batch["image"], sub)
            logger.log(i, metrics, batch_size=BATCH)

    acc1 = eval_zero_shot(clip, state.params, tok)
    print(f"zero-shot top-1 after {STEPS} steps: {acc1['top1']:.3f}")
    save_checkpoint("/tmp/xclip-example-ckpt", state)
    print("checkpoint saved to /tmp/xclip-example-ckpt")
    assert acc1["top1"] > acc0["top1"], "training did not improve zero-shot"


if __name__ == "__main__":
    main()
