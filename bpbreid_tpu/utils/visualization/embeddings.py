"""Embedding-space projection of query/gallery features
(reference: torchreid/utils/visualization/embeddings_projection.py:9-119).

Uses PCA (always available) with an optional t-SNE refinement when
scikit-learn is installed.
"""
import os
import os.path as osp

import numpy as np

__all__ = ['visualize_embeddings_projection']


def _project(x, dim=2, method='auto'):
    if method in ('tsne', 'auto'):
        try:
            from sklearn.manifold import TSNE
            return TSNE(n_components=dim, init='pca',
                        perplexity=min(30, max(2, x.shape[0] // 4))
                        ).fit_transform(x)
        except ImportError:
            if method == 'tsne':
                raise
    # PCA fallback
    x = x - x.mean(axis=0, keepdims=True)
    _u, _s, vt = np.linalg.svd(x, full_matrices=False)
    return x @ vt[:dim].T


def visualize_embeddings_projection(qf, gf, q_pids, g_pids, save_dir,
                                    dataset_name='', max_points=500,
                                    method='auto', seed=0):
    """Scatter queries (crosses) and galleries (dots) colored by identity."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    qf = np.asarray(qf).reshape(len(q_pids), -1)
    gf = np.asarray(gf).reshape(len(g_pids), -1)
    rng = np.random.default_rng(seed)
    if len(g_pids) > max_points:
        sel = rng.choice(len(g_pids), max_points, replace=False)
        gf, g_pids = gf[sel], np.asarray(g_pids)[sel]
    if len(q_pids) > max_points:
        sel = rng.choice(len(q_pids), max_points, replace=False)
        qf, q_pids = qf[sel], np.asarray(q_pids)[sel]

    proj = _project(np.concatenate([qf, gf]), method=method)
    pq, pg = proj[:len(q_pids)], proj[len(q_pids):]
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.scatter(pg[:, 0], pg[:, 1], c=np.asarray(g_pids) % 20, cmap='tab20',
               s=8, marker='o', alpha=0.6, label='gallery')
    ax.scatter(pq[:, 0], pq[:, 1], c=np.asarray(q_pids) % 20, cmap='tab20',
               s=24, marker='x', label='query')
    ax.legend()
    ax.set_title('{} embedding projection'.format(dataset_name))
    os.makedirs(save_dir, exist_ok=True)
    out = osp.join(save_dir, 'embeddings_{}.png'.format(dataset_name))
    fig.savefig(out, dpi=120, bbox_inches='tight')
    plt.close(fig)
    return out
