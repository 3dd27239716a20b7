"""Query-gallery ranking visualization.

Rebuild of the reference ranking grids
(reference: torchreid/utils/visualization/visualize_query_gallery_rankings.py:34-360):
for each selected query, a (topk+1) x (P+1) grid — rows are
[query | ranked gallery matches], columns are [image | one column per
test-embedding stream]. Per the reference semantics:

- column 0 carries the green/red match border and the combined
  "visibility% | distance" annotation per gallery row;
- each part column overlays that stream's spatial attention map on the
  thumbnail, draws a visibility-coded border (red->green HSV ramp of
  the stream's visibility score, visualize_query_gallery_rankings.py:
  display_sample_on_row) and annotates "visibility% | part distance"
  (bold when that part is the row's min/max distance);
- a summary line per part column reports how many of the topk+1
  samples have the part visible and the min/mean/max of its distances
  (reference :140-155).

Output is one png per query saved under ``save_dir``. When the
per-part inputs (``bp_distmat``/``q_vis``/``g_vis``) are not given the
legacy single-overlay layout is drawn instead.
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


def _overlay_heatmap(img, mask, alpha=0.55):
    """Overlay ONE spatial attention map as a jet heatmap (reference
    mask_overlay with cv2.INTER_CUBIC)."""
    import cv2
    m = np.asarray(mask, np.float32)
    m = m / max(float(m.max()), 1e-6)
    m = cv2.resize(m, (img.shape[1], img.shape[0]),
                   interpolation=cv2.INTER_CUBIC)
    m = np.clip(m, 0.0, 1.0)
    heat = cv2.applyColorMap((m * 255).astype(np.uint8), cv2.COLORMAP_JET)
    heat = cv2.cvtColor(heat, cv2.COLOR_BGR2RGB)
    out = img.astype(np.float32) * (1 - alpha * m[..., None]) \
        + heat.astype(np.float32) * (alpha * m[..., None])
    return out.astype(np.uint8)


def _vis_border_color(v):
    """Red->green HSV ramp of a visibility score in [0, 1] (reference:
    cmap(parts_visibility/3) with the hsv colormap)."""
    import matplotlib
    return matplotlib.colormaps.get_cmap('hsv')(float(np.clip(v, 0, 1)) / 3.0)


def _select_queries(q_idx_list, count, num_q, seed):
    rng = np.random.default_rng(seed)
    q_idx_list = [q for q in list(q_idx_list or []) if q < num_q]
    while len(q_idx_list) < min(count, num_q):
        cand = int(rng.integers(0, num_q))
        if cand not in q_idx_list:
            q_idx_list.append(cand)
    return q_idx_list


def _topk_valid(indices_row, q, gallery_samples, distrow, topk):
    """Ranked gallery indices with the junk filter (same pid+camid) and
    invalid (negative-distance) entries removed."""
    out = []
    for g_idx in indices_row:
        g = gallery_samples[g_idx]
        if g['pid'] == q['pid'] and g['camid'] == q['camid']:
            continue
        if distrow[g_idx] < 0:
            continue
        out.append(int(g_idx))
        if len(out) >= topk:
            break
    return out


def visualize_ranking_grid(distmat, query_samples, gallery_samples,
                           save_dir, topk=10, q_idx_list=None, count=10,
                           q_parts_masks=None, g_parts_masks=None,
                           mAP=None, rank1=None, dataset_name='',
                           seed=0, bp_distmat=None, q_vis=None, g_vis=None,
                           masks_fn=None):
    """Save one ranking-grid png per selected query.

    Args:
        distmat: [Q, G] numpy distances.
        query_samples / gallery_samples: lists of sample dicts.
        q_idx_list: explicit query indices; filled with random picks up
            to ``count`` (reference: default_config.py:200).
        bp_distmat: optional [P, Q, G] per-stream distances — enables
            the per-part column layout.
        q_vis / g_vis: optional [Q, P] / [G, P] stream visibility
            scores.
        masks_fn: optional callable ``(sample_indices, kind)`` with kind
            in {'query', 'gallery'} returning [M, Hf, Wf, P] spatial
            attention maps for the selected samples (the engine
            recomputes them on demand so eval never has to hold
            full-gallery mask tensors).
    """
    import matplotlib
    matplotlib.use('Agg')

    num_q = distmat.shape[0]
    q_idx_list = _select_queries(q_idx_list, count, num_q, seed)
    os.makedirs(save_dir, exist_ok=True)
    indices = np.argsort(distmat, axis=1)

    if bp_distmat is None:
        return _legacy_grid(distmat, indices, query_samples, gallery_samples,
                            save_dir, topk, q_idx_list, q_parts_masks,
                            g_parts_masks, mAP, rank1, dataset_name)

    bp_distmat = np.asarray(bp_distmat)
    P = bp_distmat.shape[0]
    if q_vis is None:
        q_vis = np.ones((num_q, P), np.float32)
    if g_vis is None:
        g_vis = np.ones((len(gallery_samples), P), np.float32)

    paths = []
    for q_idx in q_idx_list:
        q = query_samples[q_idx]
        g_idxs = _topk_valid(indices[q_idx], q, gallery_samples,
                             distmat[q_idx], topk)
        if not g_idxs:
            print('Skip ranking plot of query id {}: '
                  'no valid gallery available'.format(q_idx))
            continue
        qmasks = None
        gmasks = None
        if masks_fn is not None:
            qmasks = np.asarray(masks_fn([q_idx], 'query'))[0]
            gmasks = np.asarray(masks_fn(g_idxs, 'gallery'))
        paths.append(_part_grid(
            q_idx, q, g_idxs, gallery_samples, distmat, bp_distmat,
            q_vis, g_vis, qmasks, gmasks, save_dir, mAP, rank1,
            dataset_name))
    return paths


def _part_grid(q_idx, q, g_idxs, gallery_samples, distmat, bp_distmat,
               q_vis, g_vis, qmasks, gmasks, save_dir, mAP, rank1,
               dataset_name):
    import matplotlib.pyplot as plt

    P = bp_distmat.shape[0]
    rows = len(g_idxs) + 1
    cols = P + 1
    fig, axes = plt.subplots(rows, cols,
                             figsize=(1.15 * cols, 2.1 * rows),
                             squeeze=False)

    def _cell(ax, img, border=None, lw=3, title=None, bold=False):
        ax.imshow(img)
        ax.set_xticks([])
        ax.set_yticks([])
        for spine in ax.spines.values():
            if border is not None:
                spine.set_edgecolor(border)
                spine.set_linewidth(lw)
            else:
                spine.set_visible(False)
        if title:
            ax.set_title(title, fontsize=5.5,
                         fontweight='bold' if bold else 'normal')

    # row 0: the query
    qthumb = _load_thumb(q)
    _cell(axes[0][0], qthumb, border='blue',
          title='query pid {}\nvisible {}/{}'.format(
              q['pid'], int((q_vis[q_idx] > 0).sum()), P))
    for p in range(P):
        overlay = qthumb if qmasks is None else \
            _overlay_heatmap(qthumb, qmasks[..., p])
        _cell(axes[0][p + 1], overlay,
              border=_vis_border_color(q_vis[q_idx, p]),
              title='bp {}\n{:.0%}'.format(p, q_vis[q_idx, p]))

    # gallery rows
    for r, g_idx in enumerate(g_idxs, start=1):
        g = gallery_samples[g_idx]
        gthumb = _load_thumb(g)
        match = g['pid'] == q['pid']
        bp_d = bp_distmat[:, q_idx, g_idx]
        vis_score = float(np.sqrt(np.clip(
            q_vis[q_idx] * g_vis[g_idx], 0, None)).sum() / P)
        _cell(axes[r][0], gthumb, border='green' if match else 'red',
              title='#{} pid {}\n{:.0%} | {:.2f}'.format(
                  r, g['pid'], vis_score, distmat[q_idx, g_idx]))
        lo, hi = int(bp_d.argmin()), int(bp_d.argmax())
        for p in range(P):
            overlay = gthumb if gmasks is None else \
                _overlay_heatmap(gthumb, gmasks[r - 1][..., p])
            _cell(axes[r][p + 1], overlay,
                  border=_vis_border_color(g_vis[g_idx, p]),
                  title='{:.0%} | {:.2f}'.format(g_vis[g_idx, p], bp_d[p]),
                  bold=p in (lo, hi))

    # per-part summary line (reference :140-155): visible count +
    # min/mean/max of the column's distances
    summary = []
    for p in range(P):
        d = bp_distmat[p, q_idx, g_idxs]
        n_vis = int((q_vis[q_idx, p] > 0)
                    + (np.asarray(g_vis)[g_idxs, p] > 0).sum())
        summary.append('bp{}: {}/{} vis, d=[{:.2f};{:.2f};{:.2f}]'.format(
            p, n_vis, rows, d.min(), d.mean(), d.max()))
    title = 'q{} pid {}'.format(q_idx, q['pid'])
    if mAP is not None:
        title += '  (mAP {:.1%}, r1 {:.1%})'.format(mAP, rank1 or 0)
    fig.suptitle(title + '\n' + ' | '.join(summary), fontsize=6)
    out = osp.join(save_dir, 'ranking_{}_q{}.png'.format(
        dataset_name, q_idx))
    fig.savefig(out, dpi=110, bbox_inches='tight')
    plt.close(fig)
    return out


def _legacy_grid(distmat, indices, query_samples, gallery_samples, save_dir,
                 topk, q_idx_list, q_parts_masks, g_parts_masks, mAP, rank1,
                 dataset_name):
    import matplotlib.pyplot as plt

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
