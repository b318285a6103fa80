"""Pure-JAX, rng-keyed image augmentations for the visual-SSL branches.

Re-expresses the reference's on-device torchvision pipeline
(`x_clip/visual_ssl.py:24-45`) as jit-compatible functions:

    RandomApply(ColorJitter(0.8, 0.8, 0.8, 0.2), p=0.3)   [rgb or greyscale]
    RandomGrayscale(p=0.2)                                 [rgb only]
    RandomHorizontalFlip()
    RandomApply(GaussianBlur((3,3), sigma∈(1,2)), p=0.2)
    RandomResizedCrop(image_size)   (scale 0.08-1.0, ratio 3/4-4/3)
    Normalize(ImageNet mean/std)                           [rgb only]

Parity notes: torchvision applied to a BATCH tensor samples ONE set of
augmentation parameters per batch (and `RandomApply` flips one Python coin
per batch) — we reproduce that per-batch-sample behavior with traced
decisions via `jnp.where`, which keeps shapes static under jit. The bar is
statistical equivalence (the reference's randomness is torch-global and
irreproducible anyway), enforced op-exactly + distributionally by
`tests/test_augment_stats.py` against a NumPy oracle of torchvision's
documented formulas: `_blend` clamps to [0, 1] for float images, grayscale
luma is (0.2989, 0.587, 0.114), ColorJitter applies its four ops in a
random permutation, and GaussianBlur reflect-pads.

Known deliberate divergence (static shapes under jit): torchvision's
RandomResizedCrop retries up to 10 integer-box proposals and center-crops
on failure; this implementation samples ONE fractional box from the same
(scale, log-ratio) distributions and clips it into the image. Boxes that
torchvision would reject (aspect extremes at near-full scale) are clipped
instead of resampled — a boundary-case reshaping of the crop distribution,
bounded by the full-pipeline moment bands in the stats tests.

Images are NCHW floats, matching the tower input layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _rgb_to_grayscale(x):
    # itu-r 601-2 luma, torchvision's exact weights
    # (torchvision _functional_tensor.rgb_to_grayscale: 0.2989/0.587/0.114)
    w = jnp.array([0.2989, 0.587, 0.114], dtype=x.dtype)
    return jnp.einsum("bchw,c->bhw", x, w)[:, None, :, :]


def _blend(a, b, factor):
    # torchvision _functional_tensor._blend: clamps to the dtype bound,
    # which is 1.0 for float images — part of the op's semantics, not a
    # safety net (verified by tests/test_augment_stats.py)
    return jnp.clip(a * factor + b * (1.0 - factor), 0.0, 1.0)


def adjust_brightness(x, factor):
    return _blend(x, jnp.zeros_like(x), factor)


def adjust_contrast(x, factor):
    mean = _rgb_to_grayscale(x).mean(axis=(1, 2, 3), keepdims=True) if x.shape[1] == 3 \
        else x.mean(axis=(1, 2, 3), keepdims=True)
    return _blend(x, mean, factor)


def adjust_saturation(x, factor):
    if x.shape[1] != 3:
        return x
    return _blend(x, _rgb_to_grayscale(x), factor)


def adjust_hue(x, delta):
    """Shift hue by `delta` (fraction of a full turn) via RGB→HSV→RGB."""
    if x.shape[1] != 3:
        return x
    r, g, b = x[:, 0], x[:, 1], x[:, 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    rng_ = maxc - minc
    s = jnp.where(maxc > 0, rng_ / jnp.maximum(maxc, 1e-8), 0.0)
    safe_rng = jnp.maximum(rng_, 1e-8)
    rc = (maxc - r) / safe_rng
    gc = (maxc - g) / safe_rng
    bc = (maxc - b) / safe_rng
    h = jnp.where(maxc == r, bc - gc,
                  jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = jnp.where(rng_ == 0, 0.0, h)

    h = (h + delta) % 1.0

    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r_ = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g_ = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b_ = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r_, g_, b_], axis=1)


def color_jitter(rng, x, brightness=0.8, contrast=0.8, saturation=0.8, hue=0.2):
    """torchvision ColorJitter semantics: each factor ~ U around 1 (hue ~
    U(-h, h)), and the four ops are applied in a RANDOM PERMUTATION
    (ColorJitter.forward: fn_idx = randperm(4)) — a fixed order biases the
    output distribution (e.g. hue-after-contrast ≠ contrast-after-hue)."""
    kb, kc, ks, kh, kp = jax.random.split(rng, 5)
    fb = jax.random.uniform(kb, (), minval=max(0.0, 1 - brightness), maxval=1 + brightness)
    fc = jax.random.uniform(kc, (), minval=max(0.0, 1 - contrast), maxval=1 + contrast)
    fs = jax.random.uniform(ks, (), minval=max(0.0, 1 - saturation), maxval=1 + saturation)
    fh = jax.random.uniform(kh, (), minval=-hue, maxval=hue)
    perm = jax.random.permutation(kp, 4)
    ops = [lambda im: adjust_brightness(im, fb),
           lambda im: adjust_contrast(im, fc),
           lambda im: adjust_saturation(im, fs),
           lambda im: adjust_hue(im, fh)]
    for j in range(4):
        x = jax.lax.switch(perm[j], ops, x)
    return x


def gaussian_blur3(rng, x):
    """3×3 gaussian blur with sigma ~ U(1, 2), depthwise. torchvision
    gaussian_blur pads REFLECT (not zero) before the valid conv — zero
    padding darkens the 1-pixel border, a visible statistical bias."""
    sigma = jax.random.uniform(rng, (), minval=1.0, maxval=2.0)
    r = jnp.array([-1.0, 0.0, 1.0])
    k1 = jnp.exp(-(r ** 2) / (2 * sigma ** 2))
    k1 = k1 / k1.sum()
    k2 = jnp.outer(k1, k1).astype(x.dtype)
    c = x.shape[1]
    kernel = jnp.broadcast_to(k2, (c, 1, 3, 3))
    x_pad = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="reflect")
    return jax.lax.conv_general_dilated(
        x_pad, kernel, window_strides=(1, 1), padding="VALID",
        feature_group_count=c,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def random_resized_crop(rng, x, out_size: int, scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)):
    """One crop box per batch (traced), resampled bilinearly to out_size via
    scale_and_translate (static output shape under jit)."""
    b, c, h, w = x.shape
    k_area, k_ratio, k_y, k_x = jax.random.split(rng, 4)
    area = jax.random.uniform(k_area, (), minval=scale[0], maxval=scale[1]) * h * w
    log_ratio = jax.random.uniform(k_ratio, (), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1]))
    aspect = jnp.exp(log_ratio)
    crop_w = jnp.clip(jnp.sqrt(area * aspect), 1.0, w)
    crop_h = jnp.clip(jnp.sqrt(area / aspect), 1.0, h)
    y0 = jax.random.uniform(k_y, ()) * (h - crop_h)
    x0 = jax.random.uniform(k_x, ()) * (w - crop_w)

    scale_y = out_size / crop_h
    scale_x = out_size / crop_w
    translate_y = -y0 * scale_y
    translate_x = -x0 * scale_x

    return jax.image.scale_and_translate(
        x, (b, c, out_size, out_size), (2, 3),
        jnp.stack([scale_y, scale_x]),
        jnp.stack([translate_y, translate_x]),
        method="linear", antialias=False)


def default_augment(rng, x, image_size: int, channels: int = 3):
    """The full default SSL augmentation pipeline (visual_ssl.py:24-45)."""
    is_rgb = channels == 3
    rgb_or_grey = channels in (1, 3)
    keys = jax.random.split(rng, 8)

    if rgb_or_grey:
        jittered = color_jitter(keys[0], x)
        apply_jit = jax.random.uniform(keys[1], ()) < 0.3
        x = jnp.where(apply_jit, jittered, x)

    if is_rgb:
        grey = jnp.broadcast_to(_rgb_to_grayscale(x), x.shape)
        apply_grey = jax.random.uniform(keys[2], ()) < 0.2
        x = jnp.where(apply_grey, grey, x)

    flip = jax.random.uniform(keys[3], ()) < 0.5
    x = jnp.where(flip, x[..., ::-1], x)

    blurred = gaussian_blur3(keys[4], x)
    apply_blur = jax.random.uniform(keys[5], ()) < 0.2
    x = jnp.where(apply_blur, blurred, x)

    x = random_resized_crop(keys[6], x, image_size)

    if is_rgb:
        mean = jnp.array(IMAGENET_MEAN, dtype=x.dtype)[None, :, None, None]
        std = jnp.array(IMAGENET_STD, dtype=x.dtype)[None, :, None, None]
        x = (x - mean) / std
    return x
