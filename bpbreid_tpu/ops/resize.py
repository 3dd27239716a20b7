"""Resize ops with exact torch corner conventions.

The reference resizes masks with ``F.interpolate(mode='nearest')`` in the
data pipeline (masks_transforms/mask_transform.py:46-52) and with
``mode='bilinear', align_corners=True`` inside the model
(models/bpbreid.py:153) and the engine. ``jax.image.resize`` uses
half-pixel-centre sampling, which does NOT match either convention, so
both are implemented here from first principles:

- nearest: source index = floor(dst * in/out) (torch legacy nearest);
- bilinear align_corners=True: src = dst * (in-1)/(out-1), expressed as
  two static 1-D interpolation matrices applied by matmul — exact,
  differentiable and MXU-friendly.
"""
import functools

import jax.numpy as jnp
import numpy as np

__all__ = ['resize_nearest', 'resize_bilinear_align_corners']


@functools.lru_cache(maxsize=128)
def _nearest_indices(in_size, out_size):
    idx = np.floor(np.arange(out_size) * (in_size / out_size)).astype(np.int32)
    return np.minimum(idx, in_size - 1)


def resize_nearest(x, out_h, out_w, spatial_axes=(-3, -2)):
    """Nearest-neighbor resize matching torch ``F.interpolate(mode='nearest')``.

    Works on any layout; by default assumes channel-last ``[..., H, W, C]``.
    """
    ax_h, ax_w = spatial_axes
    ih = x.shape[ax_h]
    iw = x.shape[ax_w]
    x = jnp.take(x, jnp.asarray(_nearest_indices(ih, out_h)), axis=ax_h)
    x = jnp.take(x, jnp.asarray(_nearest_indices(iw, out_w)), axis=ax_w)
    return x


@functools.lru_cache(maxsize=128)
def _linear_matrix_align_corners(in_size, out_size):
    """[out, in] interpolation weights for align_corners=True bilinear."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == 1 or in_size == 1:
        m[:, 0] = 1.0
        return m
    src = np.arange(out_size) * ((in_size - 1) / (out_size - 1))
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 2)
    frac = (src - lo).astype(np.float32)
    m[np.arange(out_size), lo] = 1.0 - frac
    m[np.arange(out_size), lo + 1] += frac
    return m


def resize_bilinear_align_corners(x, out_h, out_w):
    """Bilinear resize with torch's ``align_corners=True`` semantics.

    Args:
        x: ``[..., H, W, C]`` (channel-last).
    Returns:
        ``[..., out_h, out_w, C]``.
    """
    import jax
    ih, iw = x.shape[-3], x.shape[-2]
    if (ih, iw) == (out_h, out_w):
        # align_corners with in == out is the identity matrix; the
        # einsums below would compute it exactly (1.0 * x) but promote
        # bf16 inputs to f32 and burn two matmuls over the full tensor
        return x
    mh = jnp.asarray(_linear_matrix_align_corners(ih, out_h))
    mw = jnp.asarray(_linear_matrix_align_corners(iw, out_w))
    # HIGHEST precision: each output is a 2-term convex combination and must
    # match torch bit-for-bit-ish; default (bf16 passes on TPU) loses ~5e-3
    x = jnp.einsum('oh,...hwc->...owc', mh, x,
                   precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum('pw,...owc->...opc', mw, x,
                   precision=jax.lax.Precision.HIGHEST)
    return x
