"""Statistical parity of the SSL augmentation pipeline (VERDICT r2 #3).

`xclip_tpu.objectives.augment` re-expresses the reference's torchvision
pipeline (`x_clip/visual_ssl.py:24-45`). torchvision itself is not in this
image (tests/reference_shim.py stubs it), so the oracle here is a NumPy
reimplementation of torchvision's DOCUMENTED tensor formulas
(torchvision/transforms/_functional_tensor.py):

  * _blend(a, b, f) = clip(f·a + (1-f)·b, 0, 1)  (bound 1.0 for floats)
  * grayscale luma (0.2989, 0.587, 0.114)
  * adjust_hue via RGB→HSV→RGB with h' = (h + delta) mod 1
  * ColorJitter applies its 4 ops in a random permutation
  * GaussianBlur(3) reflect-pads, sigma shared across axes
  * RandomResizedCrop: scale ~ U(0.08, 1), aspect ~ exp(U(log 3/4, log 4/3)),
    10 integer-box attempts then center-crop fallback; bilinear, no antialias
  * Normalize(ImageNet)

Three layers of checking:
  1. deterministic per-op equality against the oracle at fixed factors;
  2. distribution of the sampled parameters / branch decisions;
  3. full-pipeline and SSL-loss moments over many keys vs the oracle
     pipeline (which uses torchvision's true retrying crop sampler — the
     one documented divergence, see augment.py docstring).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xclip_tpu.objectives.augment import (IMAGENET_MEAN, IMAGENET_STD,
                                          adjust_brightness, adjust_contrast,
                                          adjust_hue, adjust_saturation,
                                          color_jitter, default_augment,
                                          gaussian_blur3)

# ---------------------------------------------------------------- oracle


def _o_gray(x):
    w = np.array([0.2989, 0.587, 0.114], dtype=x.dtype)
    return np.einsum("bchw,c->bhw", x, w)[:, None]


def _o_blend(a, b, f):
    return np.clip(f * a + (1.0 - f) * b, 0.0, 1.0)


def o_brightness(x, f):
    return _o_blend(x, np.zeros_like(x), f)


def o_contrast(x, f):
    mean = _o_gray(x).mean(axis=(1, 2, 3), keepdims=True)
    return _o_blend(x, mean, f)


def o_saturation(x, f):
    return _o_blend(x, np.broadcast_to(_o_gray(x), x.shape), f)


def o_hue(x, delta):
    r, g, b = x[:, 0], x[:, 1], x[:, 2]
    maxc = np.maximum(np.maximum(r, g), b)
    minc = np.minimum(np.minimum(r, g), b)
    v = maxc
    rng_ = maxc - minc
    s = np.where(maxc > 0, rng_ / np.maximum(maxc, 1e-8), 0.0)
    safe = np.maximum(rng_, 1e-8)
    rc, gc, bc = (maxc - r) / safe, (maxc - g) / safe, (maxc - b) / safe
    h = np.where(maxc == r, bc - gc,
                 np.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = np.where(rng_ == 0, 0.0, h)
    h = (h + delta) % 1.0
    i = np.floor(h * 6.0)
    f = h * 6.0 - i
    p, q, t = v * (1 - s), v * (1 - s * f), v * (1 - s * (1 - f))
    i = i.astype(np.int64) % 6
    r_ = np.choose(i, [v, q, p, p, t, v])
    g_ = np.choose(i, [t, v, v, q, p, p])
    b_ = np.choose(i, [p, p, t, v, v, q])
    return np.stack([r_, g_, b_], axis=1)


def o_blur(x, sigma):
    r = np.array([-1.0, 0.0, 1.0])
    k1 = np.exp(-(r ** 2) / (2 * sigma ** 2))
    k1 /= k1.sum()
    k2 = np.outer(k1, k1)
    xp = np.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="reflect")
    out = np.zeros_like(x)
    for dy in range(3):
        for dx in range(3):
            out += k2[dy, dx] * xp[:, :, dy:dy + x.shape[2], dx:dx + x.shape[3]]
    return out


def o_rrc_params(rng, h, w, scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)):
    """torchvision RandomResizedCrop.get_params: 10 integer attempts then
    center-crop fallback."""
    area = h * w
    for _ in range(10):
        t_area = area * rng.uniform(*scale)
        ar = np.exp(rng.uniform(np.log(ratio[0]), np.log(ratio[1])))
        tw = int(round(np.sqrt(t_area * ar)))
        th = int(round(np.sqrt(t_area / ar)))
        if 0 < tw <= w and 0 < th <= h:
            return (rng.randint(0, h - th + 1), rng.randint(0, w - tw + 1),
                    th, tw)
    in_r = w / h
    if in_r < ratio[0]:
        tw, th = w, int(round(w / ratio[0]))
    elif in_r > ratio[1]:
        th, tw = h, int(round(h * ratio[1]))
    else:
        tw, th = w, h
    return (h - th) // 2, (w - tw) // 2, th, tw


def o_bilinear_resize(img, out):
    """Half-pixel-center bilinear, no antialias (torchvision tensor mode /
    jax.image 'linear')."""
    c, h, w = img.shape
    ys = (np.arange(out) + 0.5) * h / out - 0.5
    xs = (np.arange(out) + 0.5) * w / out - 0.5
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    wy = ys - y0
    wx = xs - x0
    y0c, y1c = np.clip(y0, 0, h - 1), np.clip(y0 + 1, 0, h - 1)
    x0c, x1c = np.clip(x0, 0, w - 1), np.clip(x0 + 1, 0, w - 1)
    a = img[:, y0c][:, :, x0c]
    b = img[:, y0c][:, :, x1c]
    cc = img[:, y1c][:, :, x0c]
    d = img[:, y1c][:, :, x1c]
    wy_ = wy[None, :, None]
    wx_ = wx[None, None, :]
    return (a * (1 - wy_) * (1 - wx_) + b * (1 - wy_) * wx_
            + cc * wy_ * (1 - wx_) + d * wy_ * wx_)


def o_pipeline(rng, x, out_size):
    """Full oracle pipeline on the batch tensor, per-batch parameters like
    the reference's on-device torchvision usage."""
    b, c, h, w = x.shape
    if rng.rand() < 0.3:
        fb = rng.uniform(0.2, 1.8)
        fc = rng.uniform(0.2, 1.8)
        fs = rng.uniform(0.2, 1.8)
        fh = rng.uniform(-0.2, 0.2)
        ops = [lambda im: o_brightness(im, fb), lambda im: o_contrast(im, fc),
               lambda im: o_saturation(im, fs), lambda im: o_hue(im, fh)]
        for idx in rng.permutation(4):
            x = ops[idx](x)
    if rng.rand() < 0.2:
        x = np.broadcast_to(_o_gray(x), x.shape)
    if rng.rand() < 0.5:
        x = x[..., ::-1]
    if rng.rand() < 0.2:
        x = o_blur(x, rng.uniform(1.0, 2.0))
    i, j, th, tw = o_rrc_params(rng, h, w)
    x = np.stack([o_bilinear_resize(x[bi, :, i:i + th, j:j + tw], out_size)
                  for bi in range(b)])
    mean = np.array(IMAGENET_MEAN)[None, :, None, None]
    std = np.array(IMAGENET_STD)[None, :, None, None]
    return (x - mean) / std


def _images(b=6, s=24, seed=0):
    """Structured [0, 1] images (not pure noise — hue/saturation need
    chroma structure to matter)."""
    rng = np.random.RandomState(seed)
    y, xg = np.mgrid[0:s, 0:s] / s
    imgs = []
    for i in range(b):
        ph = rng.uniform(0, 2 * np.pi)
        img = np.stack([0.5 + 0.5 * np.sin(7 * y + ph),
                        0.5 + 0.5 * np.sin(5 * xg + 2 * ph),
                        0.5 + 0.4 * np.cos(6 * (xg + y) + ph)])
        imgs.append(img + 0.05 * rng.randn(3, s, s))
    return np.clip(np.stack(imgs), 0.0, 1.0).astype(np.float32)


# ------------------------------------------------------- per-op, exact


@pytest.mark.parametrize("factor", [0.3, 0.95, 1.7])
def test_brightness_contrast_saturation_match_torchvision_formulas(factor):
    x = _images()
    xj = jnp.asarray(x)
    np.testing.assert_allclose(np.asarray(adjust_brightness(xj, factor)),
                               o_brightness(x, factor), atol=2e-6)
    np.testing.assert_allclose(np.asarray(adjust_contrast(xj, factor)),
                               o_contrast(x, factor), atol=2e-6)
    np.testing.assert_allclose(np.asarray(adjust_saturation(xj, factor)),
                               o_saturation(x, factor), atol=2e-6)


@pytest.mark.parametrize("delta", [-0.2, 0.07, 0.2])
def test_hue_matches_oracle(delta):
    x = _images()
    ours = np.asarray(adjust_hue(jnp.asarray(x), delta))
    ref = o_hue(x, delta)
    # hue roundtrip has a few boundary pixels (max-channel ties) that
    # resolve differently in float32 — bound the typical error tightly and
    # the worst case loosely
    assert np.abs(ours - ref).mean() < 1e-4
    assert np.quantile(np.abs(ours - ref), 0.999) < 5e-3


def test_gaussian_blur_matches_oracle():
    x = _images()
    key = jax.random.PRNGKey(7)
    sigma = float(jax.random.uniform(key, (), minval=1.0, maxval=2.0))
    ours = np.asarray(gaussian_blur3(key, jnp.asarray(x)))
    np.testing.assert_allclose(ours, o_blur(x, sigma), atol=1e-5)


def test_color_jitter_applies_a_random_permutation():
    """The op order must vary with the key (torchvision randperm(4)) and
    every factor distribution must center on identity."""
    x = _images(b=2)
    xj = jnp.asarray(x)
    outs = set()
    for i in range(12):
        out = np.asarray(color_jitter(jax.random.PRNGKey(i), xj))
        outs.add(out.tobytes())
        assert np.isfinite(out).all()
    assert len(outs) == 12  # distinct factors/orders per key

    # order matters: brightness-then-hue != hue-then-brightness for the
    # same factors, so two keys with equal factors but different perms
    # must differ — approximate by checking perms are actually sampled
    perms = set()
    for i in range(64):
        kp = jax.random.split(jax.random.PRNGKey(i), 5)[4]
        perms.add(tuple(np.asarray(jax.random.permutation(kp, 4))))
    assert len(perms) > 12  # a fixed order would give exactly 1


# --------------------------------------------------- pipeline, statistical


def test_pipeline_moments_match_oracle():
    """Per-channel mean/std of the augmented output over many keys must
    land inside bands around the oracle pipeline's (which uses
    torchvision's true retrying crop sampler)."""
    x = _images(b=4, s=24)
    out_size = 16
    n = 192

    aug = jax.jit(lambda k: default_augment(k, jnp.asarray(x), out_size))
    ours = np.stack([np.asarray(aug(jax.random.PRNGKey(i)))
                     for i in range(n)])
    rng = np.random.RandomState(0)
    ref = np.stack([o_pipeline(rng, x, out_size) for _ in range(n)])

    ours_mean = ours.mean(axis=(0, 1, 3, 4))
    ref_mean = ref.mean(axis=(0, 1, 3, 4))
    ours_std = ours.std(axis=(0, 1, 3, 4))
    ref_std = ref.std(axis=(0, 1, 3, 4))
    # normalized space: std ~1, sem over 192 trials ~0.07 — bands at ~2.5x
    np.testing.assert_allclose(ours_mean, ref_mean, atol=0.18)
    np.testing.assert_allclose(ours_std, ref_std, rtol=0.20)


def test_ssl_loss_distribution_matches_oracle_augs():
    """SimCLR NT-Xent loss through the REAL projector, with views from our
    pipeline vs views from the oracle pipeline: the loss distributions
    must agree in mean within sampling error."""
    from xclip_tpu.nn.vision import VisionTransformer
    from xclip_tpu.objectives.ssl import SimCLR

    enc = VisionTransformer(dim=32, depth=1, heads=2, dim_head=16,
                            image_size=16, patch_size=8, patch_dropout=0.0)
    enc_params = enc.init(jax.random.PRNGKey(0))
    x = _images(b=8, s=24)

    def loss_with(aug_fn, key):
        ssl = SimCLR(image_size=16, hidden_layer=-1, augment_fn=aug_fn)
        params = ssl.init(jax.random.PRNGKey(1), enc)
        return float(ssl.apply(params, enc, enc_params, jnp.asarray(x),
                               rng=key, training=True))

    n = 24
    ours = [loss_with(None, jax.random.PRNGKey(i)) for i in range(n)]
    rng = np.random.RandomState(0)

    def oracle_aug(_key, img):
        return jnp.asarray(o_pipeline(rng, np.asarray(img), 16),
                           dtype=jnp.float32)

    ref = [loss_with(oracle_aug, jax.random.PRNGKey(i)) for i in range(n)]
    ours, ref = np.array(ours), np.array(ref)
    assert np.isfinite(ours).all() and np.isfinite(ref).all()
    sem = np.sqrt(ours.var() / n + ref.var() / n)
    assert abs(ours.mean() - ref.mean()) < max(3.5 * sem, 0.15), (
        ours.mean(), ref.mean(), sem)
