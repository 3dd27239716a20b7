"""Grad-safe masked array helpers.

Functional equivalents of the reference's tensor utilities
(reference: torchreid/utils/tensortools.py:3-22), expressed as pure jnp
ops so they trace cleanly under jit and keep gradients flowing through
the unmasked entries (no boolean indexing, no data-dependent shapes).
"""
import jax.numpy as jnp


def replace_values(x, mask, value):
    """Return ``x`` with entries where ``mask`` is True replaced by ``value``.

    Unlike boolean assignment this is jit-safe and differentiable w.r.t.
    the surviving entries of ``x``.
    """
    return jnp.where(mask, jnp.asarray(value, dtype=x.dtype), x)


def masked_mean(x, mask, axis=0):
    """Weighted mean of ``x`` over ``axis`` using ``mask`` as weights.

    Entries of the reduced output for which the mask sums to zero (no
    valid contribution at all) are marked with ``-1`` — the framework's
    sentinel for "this pair could not be compared" used by the triplet
    mining and the part-based distance combination.

    ``mask`` may be boolean (validity) or continuous in [0, 1]
    (visibility-score weighting); both follow the reference semantics.
    """
    mask = mask.astype(x.dtype)
    weights = mask.sum(axis=axis)
    safe_weights = weights + (weights == 0)
    mean = (x * mask).sum(axis=axis) / safe_weights
    return jnp.where(weights == 0, jnp.asarray(-1.0, dtype=x.dtype), mean)
