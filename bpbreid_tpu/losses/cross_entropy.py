"""Label-smoothing cross entropy with optional per-sample weighting
(reference: torchreid/losses/cross_entropy_loss.py:6-56)."""
import jax
import jax.numpy as jnp

__all__ = ['cross_entropy_loss', 'CrossEntropyLoss']


def cross_entropy_loss(inputs, targets, eps=0.1, weights=None,
                       valid_mask=None):
    """CE with label smoothing.

    Args:
        inputs: ``[N, C]`` logits.
        targets: ``[N]`` int labels.
        eps: smoothing weight.
        weights: optional ``[N]`` continuous sample weights, L1-normalized
            over the batch then summed (reference semantics :50-53).
        valid_mask: optional ``[N]`` bool; invalid samples are dropped from
            the mean — the jit-safe equivalent of the reference's boolean
            row indexing (GiLt_loss.py:112-114).
    Returns:
        scalar loss.
    """
    num_classes = inputs.shape[1]
    log_probs = jax.nn.log_softmax(inputs, axis=1)
    smooth = (1.0 - eps) * jax.nn.one_hot(targets, num_classes,
                                          dtype=log_probs.dtype) \
        + eps / num_classes
    per_sample = -(smooth * log_probs).sum(axis=1)          # [N]
    if weights is not None:
        w = weights / jnp.maximum(jnp.abs(weights).sum(), 1e-12)
        return (per_sample * w).sum()
    if valid_mask is not None:
        m = valid_mask.astype(per_sample.dtype)
        return (per_sample * m).sum() / jnp.maximum(m.sum(), 1)
    return per_sample.mean()


class CrossEntropyLoss:
    """API mirror of the reference class."""

    def __init__(self, eps=0.1, label_smooth=True):
        self.eps = eps if label_smooth else 0.0

    def __call__(self, inputs, targets, weights=None, valid_mask=None):
        return cross_entropy_loss(inputs, targets, self.eps, weights,
                                  valid_mask)
