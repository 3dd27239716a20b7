"""Spatial feature-map visualization
(reference: torchreid/utils/visualization/feature_map_visualization.py:128-226):
PCA-colored spatial maps + part-mask overlays, used as a train-loop debug
hook when ``cfg.test.vis_feature_maps`` / batch_debug is on.
"""
import os
import os.path as osp

import numpy as np

__all__ = ['featuremap_to_heatmap', 'display_feature_maps']


def featuremap_to_heatmap(feature_map):
    """[H, W, D] -> [H, W, 3] PCA projection to RGB in [0, 1]."""
    h, w, d = feature_map.shape
    x = np.asarray(feature_map, np.float32).reshape(-1, d)
    x = x - x.mean(axis=0, keepdims=True)
    _u, _s, vt = np.linalg.svd(x, full_matrices=False)
    proj = x @ vt[:3].T
    lo, hi = proj.min(axis=0), proj.max(axis=0)
    proj = (proj - lo) / np.maximum(hi - lo, 1e-6)
    return proj.reshape(h, w, 3)


def display_feature_maps(embeddings_dict, spatial_features, parts_masks,
                         img_paths, pids, save_dir=None, max_samples=4):
    """Save PCA feature-map heatmaps + part-mask argmaps for a batch."""
    if save_dir is None:
        return []
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    spatial_features = np.asarray(spatial_features)
    parts_masks = np.asarray(parts_masks)
    n = min(max_samples, spatial_features.shape[0])
    os.makedirs(save_dir, exist_ok=True)
    outs = []
    for i in range(n):
        fig, axes = plt.subplots(1, 2, figsize=(4, 3))
        axes[0].imshow(featuremap_to_heatmap(spatial_features[i]))
        axes[0].set_title('features (pid {})'.format(
            int(np.asarray(pids)[i])), fontsize=7)
        axes[1].imshow(np.argmax(parts_masks[i], axis=-1), cmap='tab10')
        axes[1].set_title('parts argmax', fontsize=7)
        for ax in axes:
            ax.axis('off')
        out = osp.join(save_dir, 'featuremap_{}.png'.format(i))
        fig.savefig(out, dpi=100, bbox_inches='tight')
        plt.close(fig)
        outs.append(out)
    return outs
