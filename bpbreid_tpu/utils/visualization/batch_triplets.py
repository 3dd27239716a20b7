"""Debug grids of mined triplets
(reference: torchreid/utils/visualization/display_batch_triplets.py).

For a training batch, shows anchor / hardest-positive / hardest-negative
image triples with their distances.
"""
import os
import os.path as osp

import numpy as np

__all__ = ['display_batch_triplets']


def display_batch_triplets(images, embeddings, pids, save_dir,
                           max_triplets=8, name='triplets'):
    """Mine batch-hard triplets on host and save a grid figure.

    Args:
        images: ``[N, H, W, 3]`` uint8 batch.
        embeddings: ``[N, D]`` (or ``[N, K, D]``, averaged over K).
        pids: ``[N]`` ids.
    """
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    emb = np.asarray(embeddings, np.float32)
    if emb.ndim == 3:
        emb = emb.mean(axis=1)
    pids = np.asarray(pids)
    d2 = ((emb[:, None] - emb[None, :]) ** 2).sum(-1)
    dist = np.sqrt(np.maximum(d2, 0))
    same = pids[:, None] == pids[None, :]
    np.fill_diagonal(same, False)
    n = len(pids)
    rows = []
    for a in range(min(n, max_triplets)):
        if not same[a].any() or same[a].all():
            continue
        pos = np.where(same[a], dist[a], -np.inf).argmax()
        neg = np.where(~same[a] & (np.arange(n) != a), dist[a],
                       np.inf).argmin()
        rows.append((a, pos, neg))
    if not rows:
        return None
    fig, axes = plt.subplots(len(rows), 3, figsize=(4, 1.6 * len(rows)),
                             squeeze=False)
    for r, (a, p, ng) in enumerate(rows):
        for c, (idx, title) in enumerate(
                ((a, 'anchor {}'.format(pids[a])),
                 (p, 'pos d={:.2f}'.format(dist[a, p])),
                 (ng, 'neg d={:.2f}'.format(dist[a, ng])))):
            axes[r][c].imshow(np.asarray(images[idx]).astype(np.uint8))
            axes[r][c].set_title(title, fontsize=6)
            axes[r][c].axis('off')
    os.makedirs(save_dir, exist_ok=True)
    out = osp.join(save_dir, '{}.png'.format(name))
    fig.savefig(out, dpi=110, bbox_inches='tight')
    plt.close(fig)
    return out
