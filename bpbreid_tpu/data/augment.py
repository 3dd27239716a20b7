"""Device-side batched augmentation pipeline.

The reference augments per-sample on CPU workers with albumentations
(reference: torchreid/data/transforms.py:24-163). Here the host only
decodes + resizes; every augmentation below runs **batched on the TPU
inside the jitted train step** — flip/crop/jitter/erase are a handful of
fused elementwise/gather ops on [N, H, W, C] arrays, and the mask
grouping chain (grouping matmul -> background -> /4 downscale) fuses
with them. Semantics mirror the reference pipeline:

  resize -> [flip p=.5] -> [pad10+random crop] -> [color jitter p=.5]
  -> normalize -> [coarse dropout p=.5] -> mask chain

Joint image/mask treatment matches albumentations' dual transforms: the
spatial ops (flip/crop/erase) are applied to the masks with the same
random draws.
"""
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from bpbreid_tpu.ops.masks import add_background_mask, group_masks, group_masks_special
from bpbreid_tpu.ops.resize import resize_nearest

__all__ = ['train_augment', 'eval_preprocess', 'mask_chain']

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _masks_to_image_grid(masks, h, w):
    """Device-side bilinear upsample of native-resolution confidence
    fields to the image grid. Half-pixel convention — the same sampling
    cv2.INTER_LINEAR used when the host did this resize; moving it on
    device cuts the [B, H, W, 36] float host->device transfer (~450 MB
    per batch-64 step at 384x128) to the fields' native footprint."""
    if masks.shape[1:3] == (h, w):
        return masks
    return jax.image.resize(
        masks, (masks.shape[0], h, w, masks.shape[3]), 'linear')


def _hflip(imgs, masks, rng):
    flip = jax.random.bernoulli(rng, 0.5, (imgs.shape[0], 1, 1, 1))
    flipped = imgs[:, :, ::-1]
    imgs = jnp.where(flip, flipped, imgs)
    if masks is not None:
        masks = jnp.where(flip, masks[:, :, ::-1], masks)
    return imgs, masks


def _pad_crop(imgs, masks, rng, pad=10):
    # Per-sample crops as two separable take_along_axis gathers: a
    # vmap'd dynamic_slice lowers to a sequential per-sample while loop
    # on TPU (measured ~5 ms/step at batch 64), while batched gathers
    # vectorize.
    n, h, w, _ = imgs.shape
    off = jax.random.randint(rng, (n, 2), 0, 2 * pad + 1)
    yidx = off[:, 0:1] + jnp.arange(h)[None, :]          # [n, h]
    xidx = off[:, 1:2] + jnp.arange(w)[None, :]          # [n, w]

    def crop(x):
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        rows = jnp.take_along_axis(xp, yidx[:, :, None, None], axis=1)
        return jnp.take_along_axis(rows, xidx[:, None, :, None], axis=2)

    imgs = crop(imgs)
    if masks is not None:
        masks = crop(masks)
    return imgs, masks


def _rgb_to_gray(imgs):
    """ITU-R 601-2 luma, the grayscale torchvision/albumentations use."""
    return (imgs[..., 0] * 0.299 + imgs[..., 1] * 0.587
            + imgs[..., 2] * 0.114)


def adjust_saturation(imgs, factor):
    """Blend towards the grayscale image (torchvision adjust_saturation
    semantics: factor 0 = grayscale, 1 = identity, >1 oversaturated)."""
    gray = _rgb_to_gray(imgs)[..., None]
    return jnp.clip(factor * imgs + (1.0 - factor) * gray, 0.0, 1.0)


def adjust_hue(imgs, shift):
    """Shift hue by ``shift`` ∈ [-0.5, 0.5] turns (torchvision
    adjust_hue semantics: RGB→HSV, H = (H + shift) mod 1, →RGB)."""
    r, g, b = imgs[..., 0], imgs[..., 1], imgs[..., 2]
    maxc = jnp.max(imgs, axis=-1)
    minc = jnp.min(imgs, axis=-1)
    chroma = maxc - minc
    safe = jnp.where(chroma == 0, 1.0, chroma)
    # hue in turns, by dominant channel
    hr = ((g - b) / safe) % 6.0
    hg = (b - r) / safe + 2.0
    hb = (r - g) / safe + 4.0
    h = jnp.where(maxc == r, hr, jnp.where(maxc == g, hg, hb)) / 6.0
    h = jnp.where(chroma == 0, 0.0, h)

    h = (h + shift) % 1.0

    # HSV → RGB with v = maxc, s·v = chroma
    k = h[..., None] * 6.0
    i = jnp.floor(k)
    f = k - i
    p = minc[..., None]
    v = maxc[..., None]
    q = v - chroma[..., None] * f
    t = p + chroma[..., None] * f
    i = i.astype(jnp.int32) % 6
    r_out = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [v, q, p, p, t], v)
    g_out = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [t, v, v, q, p], p)
    b_out = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [p, p, t, v, v], q)
    return jnp.concatenate([r_out, g_out, b_out], axis=-1)


def _color_jitter(imgs, rng, brightness=0.2, contrast=0.15, saturation=0.0,
                  hue=0.0, p=0.5):
    """Brightness/contrast/saturation/hue jitter on [0,1] images.

    Factor ranges follow torchvision ColorJitter (the backend of the
    reference's albumentations transform, transforms.py:100-106):
    brightness/contrast/saturation ~ U[1-x, 1+x], hue ~ U[-hue, hue].
    Applied in fixed b→c→s→h order (torchvision randomizes the order;
    for an augmentation the ordering only perturbs the noise
    distribution, and a fixed order keeps the step jit-static).
    """
    n = imgs.shape[0]
    r_apply, r_b, r_c, r_s, r_h = jax.random.split(rng, 5)
    apply = jax.random.bernoulli(r_apply, p, (n, 1, 1, 1))
    out = imgs
    if brightness:
        b = jax.random.uniform(r_b, (n, 1, 1, 1),
                               minval=max(0.0, 1 - brightness),
                               maxval=1 + brightness)
        out = jnp.clip(out * b, 0.0, 1.0)
    if contrast:
        c = jax.random.uniform(r_c, (n, 1, 1, 1),
                               minval=max(0.0, 1 - contrast),
                               maxval=1 + contrast)
        mean = _rgb_to_gray(out).mean(axis=(1, 2))[:, None, None, None]
        out = jnp.clip(out * c + (1 - c) * mean, 0.0, 1.0)
    if saturation:
        s = jax.random.uniform(r_s, (n, 1, 1, 1),
                               minval=max(0.0, 1 - saturation),
                               maxval=1 + saturation)
        out = adjust_saturation(out, s)
    if hue:
        if not 0.0 <= hue <= 0.5:
            raise ValueError('hue must be in [0, 0.5], got %r' % (hue,))
        hshift = jax.random.uniform(r_h, (n, 1, 1), minval=-hue, maxval=hue)
        out = adjust_hue(out, hshift)
    return jnp.where(apply, out, imgs)


def _normalize(imgs, mean=IMAGENET_MEAN, std=IMAGENET_STD):
    mean = jnp.asarray(mean, imgs.dtype)
    std = jnp.asarray(std, imgs.dtype)
    return (imgs - mean) / std


def _coarse_dropout(imgs, masks, rng, mean=IMAGENET_MEAN, p=0.5):
    """One random rectangle per sample: image filled with the (raw) mean
    values, masks zeroed (reference CoarseDropout params:
    transforms.py:114-117)."""
    n, h, w, _ = imgs.shape
    r_apply, r_hh, r_ww, r_y, r_x = jax.random.split(rng, 5)
    apply = jax.random.bernoulli(r_apply, p, (n,))
    hole_h = jax.random.randint(r_hh, (n,), int(h * 0.15), int(h * 0.65) + 1)
    hole_w = jax.random.randint(r_ww, (n,), int(w * 0.15), int(w * 0.65) + 1)
    y0 = jax.random.randint(r_y, (n,), 0, h)
    x0 = jax.random.randint(r_x, (n,), 0, w)
    y0 = jnp.minimum(y0, h - hole_h)
    x0 = jnp.minimum(x0, w - hole_w)
    yy = jnp.arange(h)[None, :, None]
    xx = jnp.arange(w)[None, None, :]
    inside = ((yy >= y0[:, None, None]) & (yy < (y0 + hole_h)[:, None, None])
              & (xx >= x0[:, None, None]) & (xx < (x0 + hole_w)[:, None, None]))
    inside = inside & apply[:, None, None]
    fill = jnp.asarray(mean, imgs.dtype)
    imgs = jnp.where(inside[..., None], fill, imgs)
    if masks is not None:
        masks = jnp.where(inside[..., None], 0.0, masks)
    return imgs, masks


def _group_only(masks, grouping_matrix=None, combine='max', special=None,
                **_unused):
    """Channel-grouping half of the mask chain (36 -> K channels)."""
    if special is not None:
        return group_masks_special(masks, special)
    if grouping_matrix is not None:
        return group_masks(masks, grouping_matrix, combine)
    return masks


def _background_downscale(masks, background_strategy='threshold',
                          softmax_weight=15.0, mask_filtering_threshold=0.5,
                          mask_scale=4, **_unused):
    """Background + /mask_scale downscale half of the mask chain."""
    masks = add_background_mask(masks, background_strategy, softmax_weight,
                                mask_filtering_threshold)
    h, w = masks.shape[-3], masks.shape[-2]
    return resize_nearest(masks, h // mask_scale, w // mask_scale)


def mask_chain(masks, **mask_kwargs):
    """Grouping -> background -> nearest /mask_scale downscale
    (reference mask chain: transforms.py:133-158)."""
    return _background_downscale(_group_only(masks, **mask_kwargs),
                                 **mask_kwargs)


def train_augment(imgs_u8, masks, rng, transforms=('rc', 're'),
                  norm_mean=IMAGENET_MEAN, norm_std=IMAGENET_STD,
                  cj_brightness=0.2, cj_contrast=0.15, cj_saturation=0.0,
                  cj_hue=0.0, cj_p=0.5, mask_kwargs=None):
    """Full batched train-time pipeline.

    Args:
        imgs_u8: ``[N, H, W, 3]`` uint8.
        masks: ``[N, H, W, C]`` float raw confidence fields or None.
        rng: jax PRNG key.
        transforms: subset of {'rf'/'random_flip', 'rc'/'random_crop',
            'cj'/'color_jitter', 're'/'random_erase'}.
    Returns:
        (images float32 normalized, grouped masks [N, H/4, W/4, K+1] or None)
    """
    transforms = [t.lower() for t in (transforms or [])]
    imgs = imgs_u8.astype(jnp.float32) / 255.0
    r = jax.random.split(rng, 4)
    # The channel-grouping matmul (36 -> K) is purely channelwise, so it
    # commutes EXACTLY with every spatial op below (flip/crop gathers,
    # zero padding, erase zero-fill: max/sum of zeros is zero). Running
    # it first shrinks all full-resolution mask passes from 36 to K+eps
    # channels (~6x less HBM traffic in the augmentation graph); the
    # background step stays after the spatial ops, as in the reference
    # pipeline (transforms.py:133-158 runs it after the dual transforms).
    if masks is not None:
        masks = _masks_to_image_grid(masks, imgs.shape[1], imgs.shape[2])
        masks = _group_only(masks, **(mask_kwargs or {}))
    if 'random_flip' in transforms or 'rf' in transforms:
        imgs, masks = _hflip(imgs, masks, r[0])
    if 'random_crop' in transforms or 'rc' in transforms:
        imgs, masks = _pad_crop(imgs, masks, r[1])
    if 'color_jitter' in transforms or 'cj' in transforms:
        imgs = _color_jitter(imgs, r[2], cj_brightness, cj_contrast,
                             cj_saturation, cj_hue, cj_p)
    imgs = _normalize(imgs, norm_mean, norm_std)
    if 'random_erase' in transforms or 're' in transforms:
        imgs, masks = _coarse_dropout(imgs, masks, r[3], mean=norm_mean)
    if masks is not None:
        masks = _background_downscale(masks, **(mask_kwargs or {}))
    return imgs, masks


def eval_preprocess(imgs_u8, masks=None, norm_mean=IMAGENET_MEAN,
                    norm_std=IMAGENET_STD, mask_kwargs=None):
    """Test-time pipeline: normalize + mask chain only."""
    imgs = _normalize(imgs_u8.astype(jnp.float32) / 255.0, norm_mean, norm_std)
    if masks is not None:
        masks = _masks_to_image_grid(masks, imgs.shape[1], imgs.shape[2])
        masks = mask_chain(masks, **(mask_kwargs or {}))
    return imgs, masks
