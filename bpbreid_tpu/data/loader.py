"""Host-side batching loader.

Replaces torch DataLoader worker processes
(reference: torchreid/data/datamanager.py:226-239) with a thread-pool
prefetch pipeline: threads decode + resize samples to fixed-size numpy
arrays; batches are assembled contiguously and handed to the device
pipeline (bpbreid_tpu/data/augment.py) which does all augmentation on
TPU. Evaluation batches are padded to a static batch size with a
``valid`` mask so jitted eval functions never see a new shape.
"""
import itertools
from concurrent.futures import ThreadPoolExecutor

import numpy as np

__all__ = ['BatchLoader']


class BatchLoader:
    """Iterable over numpy batches of a dataset split.

    Yields dicts with keys: ``image`` [B,H,W,3] u8, ``pid``/``camid`` [B]
    i32, ``valid`` [B] bool, and ``mask`` [B,H,W,C] f32 when the dataset
    carries masks.
    """

    def __init__(self, dataset, mode, batch_size, height, width,
                 sampler=None, num_workers=4, drop_last=False,
                 pad_last=True, host_transform=None, mask_grid_scale=8):
        self.host_transform = host_transform
        self.dataset = dataset
        self.mode = mode
        self.batch_size = batch_size
        self.height = height
        self.width = width
        # ship confidence fields at a fraction of the image grid (they
        # are stored near this resolution anyway); the device pipeline
        # bilinear-upsamples them — see ImageDataset.get
        self.mask_grid = None
        if mask_grid_scale and mask_grid_scale > 1:
            self.mask_grid = (max(1, height // mask_grid_scale),
                              max(1, width // mask_grid_scale))
        import inspect
        try:
            params = inspect.signature(dataset.get).parameters
            self._get_takes_mask_grid = 'mask_grid' in params
        except (TypeError, ValueError):
            self._get_takes_mask_grid = False
        self.sampler = sampler
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.pad_last = pad_last

    def __len__(self):
        n = len(self.sampler) if self.sampler is not None \
            else self.dataset.len(self.mode)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    @property
    def num_samples(self):
        return self.dataset.len(self.mode)

    def _indices(self):
        if self.sampler is not None:
            return list(iter(self.sampler))
        return list(range(self.dataset.len(self.mode)))

    def _fetch(self, idx):
        if self._get_takes_mask_grid:
            sample = self.dataset.get(self.mode, idx, self.height,
                                      self.width, mask_grid=self.mask_grid)
        else:                    # datasets with a legacy get() signature
            sample = self.dataset.get(self.mode, idx, self.height,
                                      self.width)
        if self.host_transform is not None:
            sample['image'] = self.host_transform(sample['image'])
        return sample

    def _assemble(self, samples, n_valid):
        b = len(samples)
        batch = {
            'image': np.stack([s['image'] for s in samples]),
            'pid': np.asarray([s['pid'] for s in samples], np.int32),
            'camid': np.asarray([s['camid'] for s in samples], np.int32),
            'valid': np.arange(b) < n_valid,
            'index': np.asarray([s.get('_index', -1) for s in samples],
                                np.int32),
        }
        if 'mask' in samples[0]:
            batch['mask'] = np.stack([s['mask'] for s in samples])
        return batch

    def __iter__(self):
        indices = self._indices()
        batches = []
        for i in range(0, len(indices), self.batch_size):
            chunk = indices[i:i + self.batch_size]
            if len(chunk) < self.batch_size:
                if self.drop_last:
                    continue
                if self.pad_last:
                    n_valid = len(chunk)
                    chunk = chunk + [chunk[-1]] * (self.batch_size - len(chunk))
                    batches.append((chunk, n_valid))
                    continue
            batches.append((chunk, len(chunk)))

        def load_batch(args):
            chunk, n_valid = args
            samples = []
            for idx in chunk:
                s = self._fetch(idx)
                s['_index'] = idx
                samples.append(s)
            return self._assemble(samples, n_valid)

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            # bounded prefetch of 2*workers batches
            it = iter(batches)
            futures = [pool.submit(load_batch, b)
                       for b in itertools.islice(it, 2 * self.num_workers)]
            while futures:
                fut = futures.pop(0)
                nxt = next(it, None)
                if nxt is not None:
                    futures.append(pool.submit(load_batch, nxt))
                yield fut.result()
