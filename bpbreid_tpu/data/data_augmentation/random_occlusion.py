"""Random occlusion augmentation: paste segmented objects onto crops.

Rebuild of the reference augmentation
(reference: torchreid/data/data_augmentation/random_occlusion.py, 267
LoC): ``n`` segmented occluder objects are pasted per image with an
overlap ratio drawn from [min_overlap, max_overlap], simulating
occlusions without changing identity labels (masks are left untouched,
like the reference's image-only albumentations transform).

Occluders come from a Pascal-VOC directory (JPEGImages +
SegmentationObject) when available, else from a synthetic shape bank so
the augmentation works without external data. Runs host-side per sample
(variable occluder shapes are incompatible with static-shape jit).
"""
import glob
import os.path as osp

import numpy as np

__all__ = ['RandomOcclusion', 'OccluderBank']


class OccluderBank:
    """Bank of RGBA occluder patches."""

    def __init__(self, path='', max_occluders=200, seed=0):
        self.patches = []
        if path and osp.isdir(path):
            self._load_voc(path, max_occluders)
        if not self.patches:
            self._make_synthetic(seed)

    def _load_voc(self, path, max_occluders):
        import cv2
        seg_dir = osp.join(path, 'SegmentationObject')
        img_dir = osp.join(path, 'JPEGImages')
        seg_paths = sorted(glob.glob(osp.join(seg_dir, '*.png')))
        for seg_path in seg_paths[:max_occluders]:
            name = osp.splitext(osp.basename(seg_path))[0]
            img_path = osp.join(img_dir, name + '.jpg')
            if not osp.exists(img_path):
                continue
            seg = cv2.imread(seg_path)
            img = cv2.cvtColor(cv2.imread(img_path), cv2.COLOR_BGR2RGB)
            if seg is None or img is None:
                continue
            mask = (seg.sum(axis=-1) > 0) & (seg.sum(axis=-1) < 255 * 3)
            ys, xs = np.where(mask)
            if len(ys) < 100:
                continue
            y0, y1, x0, x1 = ys.min(), ys.max(), xs.min(), xs.max()
            patch = np.dstack([img[y0:y1 + 1, x0:x1 + 1],
                               mask[y0:y1 + 1, x0:x1 + 1][..., None]
                               .astype(np.uint8) * 255])
            self.patches.append(patch)

    def _make_synthetic(self, seed):
        rng = np.random.default_rng(seed)
        for _ in range(32):
            h, w = rng.integers(24, 64, 2)
            color = rng.integers(0, 255, 3)
            patch = np.zeros((h, w, 4), np.uint8)
            yy, xx = np.mgrid[0:h, 0:w]
            cy, cx = h / 2, w / 2
            ellipse = (((yy - cy) / (h / 2)) ** 2
                       + ((xx - cx) / (w / 2)) ** 2) <= 1.0
            noise = rng.integers(-30, 30, (h, w, 3))
            patch[..., :3] = np.clip(color + noise, 0, 255)
            patch[..., 3] = ellipse.astype(np.uint8) * 255
            self.patches.append(patch)

    def sample(self, rng):
        return self.patches[rng.integers(0, len(self.patches))]


class RandomOcclusion:
    """Callable sample transform: image -> occluded image."""

    def __init__(self, path='', im_shape=None, p=0.5, n=1, min_overlap=0.5,
                 max_overlap=0.8, seed=0):
        self.bank = OccluderBank(path, seed=seed)
        self.p = p
        self.n = n
        self.min_overlap = min_overlap
        self.max_overlap = max_overlap
        self.rng = np.random.default_rng(seed)

    def __call__(self, image):
        import cv2
        if self.rng.random() > self.p:
            return image
        img = image.copy()
        h, w = img.shape[:2]
        for _ in range(self.n):
            patch = self.bank.sample(self.rng)
            overlap = self.rng.uniform(self.min_overlap, self.max_overlap)
            # scale occluder to cover `overlap` of the crop area
            target_area = overlap * h * w
            ph, pw = patch.shape[:2]
            scale = np.sqrt(target_area / (ph * pw))
            nh = max(2, min(h, int(ph * scale)))
            nw = max(2, min(w, int(pw * scale)))
            patch_r = cv2.resize(patch, (nw, nh))
            y0 = int(self.rng.integers(0, max(1, h - nh + 1)))
            x0 = int(self.rng.integers(0, max(1, w - nw + 1)))
            alpha = (patch_r[..., 3:4] > 127).astype(img.dtype)
            region = img[y0:y0 + nh, x0:x0 + nw]
            img[y0:y0 + nh, x0:x0 + nw] = (
                region * (1 - alpha) + patch_r[..., :3] * alpha)
        return img
