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
from bpbreid_tpu.ops.resize import _nearest_indices, resize_nearest

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


def _pad_crop(imgs, masks, rng, pad=10, off=None):
    # Per-sample crops as two separable take_along_axis gathers: a
    # vmap'd dynamic_slice lowers to a sequential per-sample while loop
    # on TPU (measured ~5 ms/step at batch 64), while batched gathers
    # vectorize.
    n, h, w, _ = imgs.shape
    if off is None:
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


def _coarse_dropout_params(rng, n, h, w, p=0.5):
    """Random-erase rectangle draws, shared between the image apply (at
    full resolution) and the composed mask resample (at feature
    resolution). Returns (apply[n], y0[n], x0[n], hole_h[n], hole_w[n])
    in post-crop full-resolution coordinates."""
    r_apply, r_hh, r_ww, r_y, r_x = jax.random.split(rng, 5)
    apply = jax.random.bernoulli(r_apply, p, (n,))
    hole_h = jax.random.randint(r_hh, (n,), int(h * 0.15), int(h * 0.65) + 1)
    hole_w = jax.random.randint(r_ww, (n,), int(w * 0.15), int(w * 0.65) + 1)
    y0 = jax.random.randint(r_y, (n,), 0, h)
    x0 = jax.random.randint(r_x, (n,), 0, w)
    y0 = jnp.minimum(y0, h - hole_h)
    x0 = jnp.minimum(x0, w - hole_w)
    return apply, y0, x0, hole_h, hole_w


def _coarse_dropout(imgs, masks, rng, mean=IMAGENET_MEAN, p=0.5,
                    params=None):
    """One random rectangle per sample: image filled with the (raw) mean
    values, masks zeroed (reference CoarseDropout params:
    transforms.py:114-117)."""
    n, h, w, _ = imgs.shape
    apply, y0, x0, hole_h, hole_w = (
        params if params is not None
        else _coarse_dropout_params(rng, n, h, w, p))
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


def _mask_composed_chain(masks, full_h, full_w, off, flip, erase,
                         mask_kwargs, pad=10):
    """The whole train-time mask pipeline as ONE bilinear resample at the
    feature grid, algebraically equal to the full-resolution chain
    (bilinear upsample native->full, flip, pad+crop, erase-zero,
    grouping, background, nearest /mask_scale downscale).

    The old pipeline materialized [N, H, W, 36] float at full image
    resolution and ran every spatial op there (~5.5 ms/step of pure HBM
    traffic at batch 64 / 384x128 — profiled round 4). But the final
    nearest /mask_scale downscale only ever LOOKS at out_h*out_w pixels
    per sample, and every spatial op in between is a gather/zero-fill,
    so the composition collapses: for each feature-grid pixel, walk its
    coordinate backward (nearest-pick -> crop offset -> flip -> the
    half-pixel bilinear source position in the native field) and
    bilinear-sample the native-resolution field there directly. Channel
    grouping commutes with all the gathers (purely channelwise), and the
    background step is pointwise so it commutes with the downscale;
    both therefore run at feature resolution. Exactness is pinned by
    tests/test_data.py::test_group_first_mask_order_is_exact.

    Args:
        masks: ``[N, h0, w0, C]`` native-resolution fields (any h0/w0,
            including already-at-full-resolution).
        full_h/full_w: the image grid the reference chain operates on.
        off: ``[N, 2]`` crop offsets into the ``pad``-padded grid, or
            None when random crop is off.
        flip: ``[N, 1, 1, 1]`` horizontal-flip booleans or None.
        erase: draws from ``_coarse_dropout_params`` or None.
    Returns:
        ``[N, full_h/mask_scale, full_w/mask_scale, K+1]`` float masks.
    """
    kw = dict(mask_kwargs or {})
    mask_scale = kw.get('mask_scale', 4)
    out_h, out_w = full_h // mask_scale, full_w // mask_scale
    n, h0, w0, _ = masks.shape

    # nearest-downscale pick positions in the post-crop full-res frame
    yF = jnp.asarray(_nearest_indices(full_h, out_h))          # [out_h]
    xF = jnp.asarray(_nearest_indices(full_w, out_w))          # [out_w]

    # crop: position in the unpadded (post-flip) image + validity
    if off is not None:
        yP = yF[None, :] + off[:, 0:1] - pad                   # [n, out_h]
        xP = xF[None, :] + off[:, 1:2] - pad                   # [n, out_w]
        row_valid = (yP >= 0) & (yP < full_h)
        col_valid = (xP >= 0) & (xP < full_w)
        yP = jnp.clip(yP, 0, full_h - 1)
        xP = jnp.clip(xP, 0, full_w - 1)
    else:
        yP = jnp.broadcast_to(yF[None, :], (n, out_h))
        xP = jnp.broadcast_to(xF[None, :], (n, out_w))
        row_valid = col_valid = None

    # horizontal flip (applied to the image BEFORE cropping, so it acts
    # on the unpadded coordinate)
    if flip is not None:
        xP = jnp.where(flip.reshape(n, 1), full_w - 1 - xP, xP)

    if (h0, w0) == (full_h, full_w):
        # native == image grid: the upsample is the identity, pure gather
        rows = jnp.take_along_axis(masks, yP[:, :, None, None], axis=1)
        m = jnp.take_along_axis(rows, xP[:, None, :, None], axis=2)
    else:
        # half-pixel bilinear source positions (jax.image.resize 'linear'
        # convention, edge-clamped) in the native field
        sy = jnp.clip((yP.astype(jnp.float32) + 0.5) * (h0 / full_h) - 0.5,
                      0.0, h0 - 1.0)
        sx = jnp.clip((xP.astype(jnp.float32) + 0.5) * (w0 / full_w) - 0.5,
                      0.0, w0 - 1.0)
        y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, max(h0 - 2, 0))
        x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, max(w0 - 2, 0))
        wy = (sy - y0)[:, :, None, None]                       # [n,out_h,1,1]
        r0 = jnp.take_along_axis(masks, y0[:, :, None, None], axis=1)
        r1 = jnp.take_along_axis(
            masks, jnp.minimum(y0 + 1, h0 - 1)[:, :, None, None], axis=1)
        rows = r0 * (1.0 - wy) + r1 * wy                       # [n,out_h,w0,C]
        wx = (sx - x0)[:, None, :, None]                       # [n,1,out_w,1]
        c0 = jnp.take_along_axis(rows, x0[:, None, :, None], axis=2)
        c1 = jnp.take_along_axis(
            rows, jnp.minimum(x0 + 1, w0 - 1)[:, None, :, None], axis=2)
        m = c0 * (1.0 - wx) + c1 * wx                          # [n,out_h,out_w,C]

    m = _group_only(m, **kw)

    # zero-fills: outside the crop, and inside the erase rectangle —
    # both before the background step, as in the reference order
    if row_valid is not None:
        m = jnp.where((row_valid[:, :, None] & col_valid[:, None, :])[..., None],
                      m, 0.0)
    if erase is not None:
        apply, ey, ex, eh, ew = erase
        row_in = (yF[None, :] >= ey[:, None]) & (yF[None, :] < (ey + eh)[:, None])
        col_in = (xF[None, :] >= ex[:, None]) & (xF[None, :] < (ex + ew)[:, None])
        inside = row_in[:, :, None] & col_in[:, None, :] & apply[:, None, None]
        m = jnp.where(inside[..., None], 0.0, m)

    return add_background_mask(m, kw.get('background_strategy', 'threshold'),
                               kw.get('softmax_weight', 15.0),
                               kw.get('mask_filtering_threshold', 0.5))


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
    n, h, w, _ = imgs.shape
    r = jax.random.split(rng, 4)
    do_flip = 'random_flip' in transforms or 'rf' in transforms
    do_crop = 'random_crop' in transforms or 'rc' in transforms
    do_cj = 'color_jitter' in transforms or 'cj' in transforms
    do_erase = 'random_erase' in transforms or 're' in transforms

    # every spatial draw happens up-front so the image path (full
    # resolution) and the composed mask resample (feature resolution,
    # see _mask_composed_chain) share the same randomness; the split
    # structure matches the historical per-transform helpers exactly
    flip = (jax.random.bernoulli(r[0], 0.5, (n, 1, 1, 1))
            if do_flip else None)
    off = jax.random.randint(r[1], (n, 2), 0, 21) if do_crop else None
    erase = _coarse_dropout_params(r[3], n, h, w) if do_erase else None

    if flip is not None:
        imgs = jnp.where(flip, imgs[:, :, ::-1], imgs)
    if off is not None:
        imgs, _ = _pad_crop(imgs, None, None, off=off)
    if do_cj:
        imgs = _color_jitter(imgs, r[2], cj_brightness, cj_contrast,
                             cj_saturation, cj_hue, cj_p)
    imgs = _normalize(imgs, norm_mean, norm_std)
    if erase is not None:
        imgs, _ = _coarse_dropout(imgs, None, None, mean=norm_mean,
                                  params=erase)
    if masks is not None:
        masks = _mask_composed_chain(masks, h, w, off, flip, erase,
                                     mask_kwargs)
    return imgs, masks


def eval_preprocess(imgs_u8, masks=None, norm_mean=IMAGENET_MEAN,
                    norm_std=IMAGENET_STD, mask_kwargs=None):
    """Test-time pipeline: normalize + mask chain only."""
    imgs = _normalize(imgs_u8.astype(jnp.float32) / 255.0, norm_mean, norm_std)
    if masks is not None:
        masks = _masks_to_image_grid(masks, imgs.shape[1], imgs.shape[2])
        masks = mask_chain(masks, **(mask_kwargs or {}))
    return imgs, masks
