"""Dataset base classes.

API mirror of the reference dataset layer
(reference: torchreid/data/datasets/dataset.py:14-342): train/query/
gallery are lists of sample dicts ``{img_path, pid, camid, masks_path}``
with ``combine_all``, dataset addition (pid re-labeling), the
cross-camera ``gallery_filter`` and per-dataset mask metadata.

Unlike the reference (torch Dataset + albumentations in worker
processes), samples here are decoded to fixed-size numpy arrays on the
host (decode + resize only) and all augmentation happens on device in
the jitted train step (see bpbreid_tpu/data/augment.py) — the TPU-first
split of the input pipeline.
"""
import copy
import os
import os.path as osp

import numpy as np


class Dataset:
    _junk_pids = []
    masks_base_dir = None
    eval_metric = 'default'
    dataset_dir = ''
    masks_dirs = {}

    @classmethod
    def get_masks_config(cls, masks_dir):
        return cls.masks_dirs.get(masks_dir, None)

    def gallery_filter(self, q_pid, q_camid, q_ann, g_pids, g_camids, g_anns):
        """Remove gallery samples sharing (pid, camid) with the query
        (reference: dataset.py:35-40)."""
        return (g_camids == q_camid) & (g_pids == q_pid)

    def infer_masks_path(self, img_path):
        return os.path.join(
            self.dataset_dir, self.masks_base_dir, self.masks_dir,
            os.path.basename(os.path.dirname(img_path)),
            os.path.splitext(os.path.basename(img_path))[0] + self.masks_suffix)

    def __init__(self, train, query, gallery, config=None, mode='train',
                 combineall=False, verbose=True, use_masks=False,
                 masks_dir=None, masks_base_dir=None, load_masks=False,
                 **kwargs):
        self.train = train
        self.query = query
        self.gallery = gallery
        self.cfg = config
        self.mode = mode
        self.combineall = combineall
        self.verbose = verbose
        self.use_masks = use_masks
        self.masks_dir = masks_dir
        self.load_masks = load_masks
        if masks_base_dir is not None:
            self.masks_base_dir = masks_base_dir

        self.num_train_pids = self.get_num_pids(self.train)
        self.num_train_cams = self.get_num_cams(self.train)
        if self.combineall:
            self.combine_all()
        if self.verbose:
            self.show_summary()

    def data(self, mode):
        if mode == 'train':
            return self.train
        if mode == 'query':
            return self.query
        if mode == 'gallery':
            return self.gallery
        raise ValueError("Invalid mode. Got {}, but expected 'train', "
                         "'query' or 'gallery'".format(mode))

    def len(self, mode):
        return len(self.data(mode))

    def __len__(self):
        return self.len(self.mode)

    def __add__(self, other):
        train = copy.deepcopy(self.train)
        for sample in other.train:
            sample = dict(sample)
            sample['pid'] += self.num_train_pids
            train.append(sample)
        assert self.use_masks == other.use_masks
        return ImageDataset(train, self.query, self.gallery, mode=self.mode,
                            combineall=False, verbose=False,
                            use_masks=self.use_masks,
                            masks_base_dir=self.masks_base_dir)

    def __radd__(self, other):
        return self if other == 0 else self.__add__(other)

    @staticmethod
    def parse_data(data):
        pids = {s['pid'] for s in data}
        cams = {s['camid'] for s in data}
        return len(pids), len(cams)

    def get_num_pids(self, data):
        return self.parse_data(data)[0]

    def get_num_cams(self, data):
        return self.parse_data(data)[1]

    def show_summary(self):
        pass

    def combine_all(self):
        """Merge query+gallery identities into train
        (reference: dataset.py:205-230)."""
        combined = copy.deepcopy(self.train)
        g_pids = {s['pid'] for s in self.gallery
                  if s['pid'] not in self._junk_pids}
        pid2label = {pid: i for i, pid in enumerate(sorted(g_pids))}

        def _combine(data):
            for s in data:
                if s['pid'] in self._junk_pids:
                    continue
                s = dict(s)
                s['pid'] = pid2label[s['pid']] + self.num_train_pids
                combined.append(s)

        _combine(self.query)
        _combine(self.gallery)
        self.train = combined
        self.num_train_pids = self.get_num_pids(self.train)

    def check_before_run(self, required_files):
        if isinstance(required_files, str):
            required_files = [required_files]
        for fpath in required_files:
            if not osp.exists(fpath):
                raise RuntimeError('"{}" is not found'.format(fpath))

    def __repr__(self):
        tp, tc = self.parse_data(self.train)
        qp, qc = self.parse_data(self.query)
        gp, gc = self.parse_data(self.gallery)
        return ('  ----------------------------------------\n'
                '  subset   | # ids | # items | # cameras\n'
                '  ----------------------------------------\n'
                '  train    | {:5d} | {:7d} | {:9d}\n'
                '  query    | {:5d} | {:7d} | {:9d}\n'
                '  gallery  | {:5d} | {:7d} | {:9d}\n'
                '  ----------------------------------------\n').format(
                    tp, len(self.train), tc, qp, len(self.query), qc,
                    gp, len(self.gallery), gc)


def read_image(path):
    """BGR-file -> RGB uint8 numpy array with IOError retry
    (reference: torchreid/utils/tools.py:99-121)."""
    import cv2
    for _ in range(3):
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is not None:
            return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    raise IOError('Failed to read image: {}'.format(path))


def read_masks(path):
    """Load a ``.npy`` confidence-field tensor as float32 [H, W, C]
    (reference: torchreid/utils/tools.py:124-148)."""
    masks = np.load(path)
    if masks.ndim != 3:
        raise ValueError('masks at {} must be 3-D, got {}'.format(
            path, masks.shape))
    # stored channel-first, always transposed to channel-last
    # (reference unconditionally transposes (1, 2, 0), tools.py:139)
    return np.transpose(masks, (1, 2, 0)).astype(np.float32)


class ImageDataset(Dataset):
    """Image dataset: ``get(mode, index, height, width)`` returns the
    sample dict with a decoded, resized uint8 image and (optionally)
    the raw mask tensor resized to the same grid
    (host-side part of torchreid/data/datasets/dataset.py:308-342)."""

    def get(self, mode, index, height=None, width=None, mask_grid=None):
        """``mask_grid`` (mh, mw): host-side grid for the confidence
        fields. The fields are stored near their estimator's native
        (low) resolution, so shipping them to the device at a fraction
        of the image grid and bilinear-upsampling there (augment.py)
        loses nothing while cutting host->device transfer by the square
        of the scale — the [B, H, W, 36] float mask batch is otherwise
        ~50x the image bytes. None keeps the legacy full-grid behavior.
        """
        import cv2
        sample = dict(self.data(mode)[index])
        if 'img' in sample:
            img = sample['img']
        else:
            img = read_image(sample['img_path'])
        if height is not None and (img.shape[0] != height
                                   or img.shape[1] != width):
            img = cv2.resize(img, (width, height),
                             interpolation=cv2.INTER_LINEAR)
        sample['image'] = img
        if self.use_masks:
            if 'masks' in sample:
                masks = sample['masks']
            elif sample.get('masks_path'):
                masks = read_masks(sample['masks_path'])
            else:
                raise ValueError('use_masks=True but sample has no masks')
            mh, mw = (mask_grid if mask_grid is not None
                      else (height, width))
            if mh is not None and (masks.shape[0] != mh
                                   or masks.shape[1] != mw):
                masks = cv2.resize(masks, (mw, mh),
                                   interpolation=cv2.INTER_LINEAR)
            sample['mask'] = masks.astype(np.float32)
        return sample

    def show_summary(self):
        if self.verbose:
            print('=> Loaded {}'.format(self.__class__.__name__))
            print(repr(self))
