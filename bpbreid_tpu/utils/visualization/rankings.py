"""Query-gallery ranking visualization.

Rebuild of the reference ranking grids
(reference: torchreid/utils/visualization/visualize_query_gallery_rankings.py:34-360):
for each selected query, a row of the top-K gallery matches with
green/red match borders and optional per-part mask overlays +
visibility annotations. Output is a matplotlib figure saved through the
Logger's disk backend.
"""
import os
import os.path as osp

import numpy as np

__all__ = ['visualize_ranking_grid']

GRID_SPACING = 2


def _load_thumb(sample, height=128, width=64):
    import cv2
    from bpbreid_tpu.data.datasets.dataset import read_image
    if 'img' in sample:
        img = sample['img']
    else:
        img = read_image(sample['img_path'])
    return cv2.resize(img, (width, height))


def _overlay_masks(img, parts_masks, alpha=0.4):
    """Color-code part masks over the thumbnail."""
    import cv2
    import matplotlib
    if parts_masks is None:
        return img
    k = parts_masks.shape[-1]
    cmap = matplotlib.colormaps.get_cmap('tab10')
    labels = np.argmax(parts_masks, axis=-1)        # [h, w]
    strength = np.max(parts_masks, axis=-1)
    colors = (np.asarray([cmap(i % 10)[:3] for i in range(k)]) * 255)
    overlay = colors[labels].astype(np.uint8)
    overlay = cv2.resize(overlay, (img.shape[1], img.shape[0]),
                         interpolation=cv2.INTER_NEAREST)
    strength = cv2.resize(strength.astype(np.float32),
                          (img.shape[1], img.shape[0]))[..., None]
    out = img.astype(np.float32) * (1 - alpha * strength) \
        + overlay.astype(np.float32) * (alpha * strength)
    return out.astype(np.uint8)


def visualize_ranking_grid(distmat, query_samples, gallery_samples,
                           save_dir, topk=10, q_idx_list=None, count=10,
                           q_parts_masks=None, g_parts_masks=None,
                           mAP=None, rank1=None, dataset_name='',
                           seed=0):
    """Save one ranking-grid png per selected query.

    Args:
        distmat: [Q, G] numpy distances.
        query_samples / gallery_samples: lists of sample dicts.
        q_idx_list: explicit query indices; filled with random picks up
            to ``count`` (reference: default_config.py:200).
    """
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    rng = np.random.default_rng(seed)
    num_q = distmat.shape[0]
    q_idx_list = list(q_idx_list or [])
    q_idx_list = [q for q in q_idx_list if q < num_q]
    while len(q_idx_list) < min(count, num_q):
        cand = int(rng.integers(0, num_q))
        if cand not in q_idx_list:
            q_idx_list.append(cand)

    os.makedirs(save_dir, exist_ok=True)
    indices = np.argsort(distmat, axis=1)
    paths = []
    for q_idx in q_idx_list:
        q = query_samples[q_idx]
        fig, axes = plt.subplots(1, topk + 1,
                                 figsize=(1.2 * (topk + 1), 2.4))
        thumb = _load_thumb(q)
        if q_parts_masks is not None:
            thumb = _overlay_masks(thumb, q_parts_masks[q_idx])
        axes[0].imshow(thumb)
        axes[0].set_title('query\npid {}'.format(q['pid']), fontsize=7)
        axes[0].axis('off')
        shown = 0
        for g_idx in indices[q_idx]:
            g = gallery_samples[g_idx]
            if g['pid'] == q['pid'] and g['camid'] == q['camid']:
                continue  # junk
            thumb = _load_thumb(g)
            if g_parts_masks is not None:
                thumb = _overlay_masks(thumb, g_parts_masks[g_idx])
            ax = axes[shown + 1]
            ax.imshow(thumb)
            match = g['pid'] == q['pid']
            for spine in ax.spines.values():
                spine.set_edgecolor('green' if match else 'red')
                spine.set_linewidth(3)
            ax.set_xticks([])
            ax.set_yticks([])
            ax.set_title('{:.2f}'.format(distmat[q_idx, g_idx]), fontsize=6)
            shown += 1
            if shown >= topk:
                break
        title = 'q{}'.format(q_idx)
        if mAP is not None:
            title += ' (mAP {:.1%}, r1 {:.1%})'.format(mAP, rank1 or 0)
        fig.suptitle(title, fontsize=8)
        out = osp.join(save_dir, 'ranking_{}_q{}.png'.format(
            dataset_name, q_idx))
        fig.savefig(out, dpi=120, bbox_inches='tight')
        plt.close(fig)
        paths.append(out)
    return paths
