"""Zero-shot classification example: build a prompt-ensemble classifier from
class names, score a batch of images (synthetic here) — the standard CLIP
inference recipe, using the single-tower encoders.

Usage:  python examples/zero_shot.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from xclip_tpu import CLIP
from xclip_tpu.data import tokenizer
from xclip_tpu.eval import build_zero_shot_classifier, zero_shot_accuracy

CLASSES = ["dog", "cat", "car"]
TEMPLATES = ["a photo of a {}.", "a blurry photo of a {}."]


def main():
    clip = CLIP(dim_text=128, dim_image=128, dim_latent=128,
                num_text_tokens=49408,
                text_enc_depth=2, text_seq_len=32, text_heads=4,
                visual_enc_depth=2, visual_heads=4, visual_image_size=64,
                visual_patch_size=16, visual_patch_dropout=0.0)

    prompts = [t.format(c) for c in CLASSES for t in TEMPLATES]
    tokens = tokenizer.tokenize(prompts, context_length=32,
                                pad_to_context_length=True)
    classifier = build_zero_shot_classifier(
        clip.model, clip.params, tokens, templates_per_class=len(TEMPLATES))

    images = np.random.RandomState(0).randn(8, 3, 64, 64).astype(np.float32)
    labels = np.random.RandomState(1).randint(len(CLASSES), size=8)
    acc = zero_shot_accuracy(clip.model, clip.params, images, labels,
                             classifier, topk=(1,))
    print("classifier:", classifier.shape, " top-1 (random init):", acc)


if __name__ == "__main__":
    main()
