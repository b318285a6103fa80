"""End-to-end training example: tokenizer → input pipeline → sharded train
loop with checkpointing and metrics.

Runs on anything JAX supports; on a multi-chip TPU slice the same code
shards the batch over the mesh's 'data' axis and the params per the TP
rules. Synthetic data stands in for a real (caption, image) dataset —
swap `synthetic_examples` for your own iterable of (str, CHW-float) pairs.

Usage:  python examples/train.py [steps]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from xclip_tpu import CLIP
from xclip_tpu.data import TextImageLoader
from xclip_tpu.parallel import create_mesh
from xclip_tpu.train import (MetricsLogger, create_train_state,
                             default_optimizer, make_train_step,
                             save_checkpoint, shard_state)

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 20
BATCH = 32
IMAGE_SIZE = 64


def synthetic_examples():
    rng = np.random.RandomState(0)
    captions = ["a photo of a %s" % w for w in
                ("dog", "cat", "car", "tree", "house", "boat", "bird", "fish")]
    while True:
        yield (captions[rng.randint(len(captions))],
               rng.randn(3, IMAGE_SIZE, IMAGE_SIZE).astype(np.float32))


def main():
    clip = CLIP(
        dim_text=128, dim_image=128, dim_latent=128,
        num_text_tokens=49408,              # real BPE vocab
        text_enc_depth=2, text_seq_len=64, text_heads=4,
        visual_enc_depth=2, visual_heads=4, visual_image_size=IMAGE_SIZE,
        visual_patch_size=16, visual_patch_dropout=0.5,
        compute_dtype="bfloat16" if jax.default_backend() == "tpu" else None,
        scan_layers=False)

    n_dev = len(jax.devices())
    mesh = create_mesh((n_dev, 1)) if n_dev > 1 else None

    optimizer = default_optimizer(learning_rate=3e-4, warmup_steps=5,
                                  total_steps=STEPS)
    state = create_train_state(clip.model, jax.random.PRNGKey(0), optimizer)
    if mesh is not None:
        state = shard_state(state, mesh)
    step = make_train_step(clip.model, optimizer)

    loader = TextImageLoader(synthetic_examples, BATCH,
                             context_length=64, mesh=mesh)
    rng = jax.random.PRNGKey(1)
    with MetricsLogger("/tmp/xclip-example-metrics.jsonl",
                       flush_every=5) as logger:
        for i, batch in enumerate(loader):
            if i >= STEPS:
                break
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, batch["text"], batch["image"], sub)
            logger.log(i, metrics, batch_size=BATCH)

    save_checkpoint("/tmp/xclip-example-ckpt", state)
    print("checkpoint saved to /tmp/xclip-example-ckpt")


if __name__ == "__main__":
    main()
