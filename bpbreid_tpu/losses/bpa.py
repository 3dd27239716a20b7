"""Body Part Attention loss: pixel-wise part classification
(reference: torchreid/losses/body_part_attention_loss.py:11-52).

'cl' is label-smoothing CE (the shipped default); 'fl' (focal) and 'dl'
(dice) re-implement the monai variants in plain jnp (softmax multi-class
form).
"""
import jax
import jax.numpy as jnp

from bpbreid_tpu.constants import PIXELS
from bpbreid_tpu.losses.cross_entropy import cross_entropy_loss

__all__ = ['BodyPartAttentionLoss']


def _focal_loss(logits, targets, gamma=1.0):
    """Multi-class focal loss: -(1-p_t)^gamma log(p_t), mean over pixels."""
    log_p = jax.nn.log_softmax(logits, axis=-1)
    n_cls = logits.shape[-1]
    onehot = jax.nn.one_hot(targets, n_cls, dtype=log_p.dtype)
    log_pt = (onehot * log_p).sum(axis=-1)
    pt = jnp.exp(log_pt)
    return (-((1.0 - pt) ** gamma) * log_pt).mean()


def _dice_loss(logits, targets, eps=1e-5):
    """Soft multi-class dice over the pixel axis, mean over (batch,class)."""
    probs = jax.nn.softmax(logits, axis=-1)          # [N, P, C]
    n_cls = logits.shape[-1]
    onehot = jax.nn.one_hot(targets, n_cls, dtype=probs.dtype)
    inter = (probs * onehot).sum(axis=1)             # [N, C]
    denom = probs.sum(axis=1) + onehot.sum(axis=1)
    dice = (2.0 * inter + eps) / (denom + eps)
    return 1.0 - dice.mean()


class BodyPartAttentionLoss:
    def __init__(self, loss_type='cl', label_smoothing=0.1, use_gpu=False,
                 best_pred_ratio=1.0):
        del use_gpu, best_pred_ratio
        if loss_type not in ('cl', 'fl', 'dl'):
            raise ValueError('Loss {} for part prediction is not supported'
                             .format(loss_type))
        self.loss_type = loss_type
        self.label_smoothing = label_smoothing

    def __call__(self, pixels_cls_scores, targets):
        """
        Args:
            pixels_cls_scores: ``[N, Hf, Wf, K+1]`` logits (channel-last).
            targets: ``[N, Hf, Wf]`` int part labels.
        Returns:
            ``(loss, summary)`` with pixel accuracy under ``summary[PIXELS]``.
        """
        n = pixels_cls_scores.shape[0]
        c = pixels_cls_scores.shape[-1]
        logits = pixels_cls_scores.reshape(n, -1, c)
        t = targets.reshape(n, -1)
        if self.loss_type == 'cl':
            loss = cross_entropy_loss(logits.reshape(-1, c), t.reshape(-1),
                                      eps=self.label_smoothing)
        elif self.loss_type == 'fl':
            loss = _focal_loss(logits, t)
        else:
            loss = _dice_loss(logits, t)
        acc = (jnp.argmax(logits, axis=-1) == t).mean()
        summary = {PIXELS: {'c': loss, 'a': acc}}
        return loss, summary
