"""Video (tracklet) re-id data support.

Mirror of the reference video layer
(reference: torchreid/data/datasets/dataset.py:371-476 VideoDataset,
datamanager.py:374-572 VideoDataManager): tracklet samples are dicts
``{img_paths: [...], pid, camid}``; ``seq_len`` frames are sampled
'evenly' / 'random' / 'all' and stacked to ``[S, H, W, 3]``. Train
batches therefore carry ``[B, S, H, W, 3]`` and the video engines
flatten to ``[B*S, ...]`` for the forward pass.
"""
import numpy as np

from bpbreid_tpu.data.datamanager import DataManager
from bpbreid_tpu.data.datasets.dataset import Dataset, read_image
from bpbreid_tpu.data.loader import BatchLoader
from bpbreid_tpu.data.sampler import build_train_sampler

__all__ = ['VideoDataset', 'VideoDataManager', 'SyntheticVideoDataset']


class VideoDataset(Dataset):
    def __init__(self, train, query, gallery, seq_len=15,
                 sample_method='evenly', **kwargs):
        super().__init__(train, query, gallery, **kwargs)
        self.seq_len = seq_len
        self.sample_method = sample_method

    def _sample_indices(self, num_imgs, rng=None):
        """(reference: dataset.py:398-436)"""
        if self.sample_method == 'random':
            rng = rng or np.random.default_rng()
            replace = num_imgs < self.seq_len
            return np.sort(rng.choice(np.arange(num_imgs), size=self.seq_len,
                                      replace=replace))
        if self.sample_method == 'evenly':
            if num_imgs >= self.seq_len:
                num = num_imgs - num_imgs % self.seq_len
                return np.arange(0, num, num / self.seq_len).astype(np.int64)
            idx = np.arange(num_imgs)
            pads = np.full(self.seq_len - num_imgs, num_imgs - 1)
            return np.concatenate([idx, pads]).astype(np.int64)
        if self.sample_method == 'all':
            return np.arange(num_imgs)
        raise ValueError('Unknown sample method: {}'.format(self.sample_method))

    def get(self, mode, index, height=None, width=None):
        import cv2
        sample = dict(self.data(mode)[index])
        indices = self._sample_indices(len(sample['img_paths']))
        frames = []
        for i in indices:
            if 'imgs' in sample:
                img = sample['imgs'][int(i)]
            else:
                img = read_image(sample['img_paths'][int(i)])
            if height is not None and img.shape[:2] != (height, width):
                img = cv2.resize(img, (width, height),
                                 interpolation=cv2.INTER_LINEAR)
            frames.append(img)
        sample['image'] = np.stack(frames)       # [S, H, W, 3]
        return sample


class SyntheticVideoDataset(VideoDataset):
    """In-memory tracklet dataset for tests."""

    def __init__(self, root='', num_pids=4, num_cams=2, tracklet_len=6,
                 height=32, width=16, seed=0, **kwargs):
        def split(seed_, n_tracklets=1):
            r = np.random.default_rng(seed_)
            data = []
            for pid in range(num_pids):
                for camid in range(num_cams):
                    for _ in range(n_tracklets):
                        imgs = [r.integers(0, 255, (height, width, 3),
                                           dtype=np.uint8)
                                for _ in range(tracklet_len)]
                        data.append({'imgs': imgs,
                                     'img_paths': ['v://{}'.format(j)
                                                   for j in range(tracklet_len)],
                                     'pid': pid, 'camid': camid})
            return data

        super().__init__(split(seed), split(seed + 1), split(seed + 2),
                         **kwargs)


__video_datasets = {
    'synthetic_video': SyntheticVideoDataset,
}


def register_video_dataset(name, cls):
    __video_datasets[name] = cls


def init_video_dataset(name, mode='train', **kwargs):
    if name not in __video_datasets:
        raise ValueError('Invalid video dataset name. Received "{}", '
                         'available: {}'.format(name,
                                                sorted(__video_datasets)))
    ds = __video_datasets[name](mode=mode, **kwargs)
    ds.mode = mode
    return ds


class VideoDataManager(DataManager):
    """(reference: datamanager.py:374-572)"""

    data_type = 'video'

    def __init__(self, root='', sources=None, targets=None, height=256,
                 width=128, transforms='random_flip', norm_mean=None,
                 norm_std=None, use_gpu=False, split_id=0, combineall=False,
                 batch_size_train=3, batch_size_test=3, workers=4,
                 num_instances=4, train_sampler='RandomSampler', seq_len=15,
                 sample_method='evenly', config=None, **kwargs):
        super().__init__(sources=sources, targets=targets, height=height,
                         width=width, transforms=transforms,
                         norm_mean=norm_mean, norm_std=norm_std)
        self.cfg = config
        self.use_masks = False

        common = dict(root=root, split_id=split_id, seq_len=seq_len,
                      sample_method=sample_method)
        trainset = sum((init_video_dataset(name, mode='train',
                                           combineall=combineall, **common)
                        for name in self.sources), 0) \
            if len(self.sources) > 1 else init_video_dataset(
                self.sources[0], mode='train', combineall=combineall, **common)
        self._num_train_pids = trainset.num_train_pids
        self._num_train_cams = trainset.num_train_cams
        self.train_set = trainset

        sampler = build_train_sampler(trainset.train, train_sampler,
                                      batch_size=batch_size_train,
                                      num_instances=num_instances)
        self.train_loader = BatchLoader(trainset, 'train', batch_size_train,
                                        height, width, sampler=sampler,
                                        num_workers=workers, drop_last=True)
        self.test_loader = {}
        self.test_dataset = {}
        for name in self.targets:
            queryset = init_video_dataset(name, mode='query',
                                          combineall=combineall, **common)
            galleryset = init_video_dataset(name, mode='gallery',
                                            combineall=combineall, **common)
            self.test_loader[name] = {
                'query': BatchLoader(queryset, 'query', batch_size_test,
                                     height, width, num_workers=workers),
                'gallery': BatchLoader(galleryset, 'gallery', batch_size_test,
                                       height, width, num_workers=workers),
            }
            self.test_dataset[name] = {'query': queryset,
                                       'gallery': galleryset}

    def mask_chain_kwargs(self):
        return None
