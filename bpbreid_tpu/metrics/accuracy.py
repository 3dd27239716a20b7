"""Top-k classification accuracy (reference: torchreid/metrics/accuracy.py:4-38)."""
import jax.numpy as jnp

__all__ = ['accuracy']


def accuracy(output, target, topk=(1,)):
    """Accuracy over the k top predictions.

    Args:
        output: ``[N, num_classes]`` prediction scores.
        target: ``[N]`` integer labels.
        topk: tuple of k values.

    Returns:
        list of accuracies (floats in [0, 100]), one per k.
    """
    output = jnp.asarray(output)
    target = jnp.asarray(target)
    maxk = max(topk)
    batch_size = target.shape[0]
    # indices of the top-maxk classes per sample
    pred = jnp.argsort(-output, axis=1)[:, :maxk]           # [N, maxk]
    correct = pred == target[:, None]
    res = []
    for k in topk:
        acc = correct[:, :k].any(axis=1).sum() / batch_size * 100.0
        res.append(float(acc))
    return res
