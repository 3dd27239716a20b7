"""Data managers.

API mirror of the reference managers
(reference: torchreid/data/datamanager.py:10-370): resolve source/target
datasets, build the train loader (with PK sampling) and per-target
query/gallery loaders, expose ``num_train_pids`` and the transform
configuration the engine needs.

TPU-first pipeline split: loaders yield fixed-shape uint8/float numpy
batches; all augmentation + mask preprocessing happens on device
(bpbreid_tpu/data/augment.py) inside the jitted steps.
"""
import numpy as np

from bpbreid_tpu.data.datasets import init_image_dataset, get_image_dataset
from bpbreid_tpu.data.loader import BatchLoader
from bpbreid_tpu.data.sampler import build_train_sampler
from bpbreid_tpu.ops.masks import masks_preprocess_all, GroupingSpec

__all__ = ['DataManager', 'ImageDataManager']


class DataManager:
    def __init__(self, sources=None, targets=None, height=256, width=128,
                 transforms='random_flip', norm_mean=None, norm_std=None,
                 use_gpu=False):
        self.sources = [sources] if isinstance(sources, str) else sources
        if self.sources is None:
            raise ValueError('sources must not be None')
        self.targets = [targets] if isinstance(targets, str) else targets
        if self.targets is None:
            self.targets = self.sources
        self.height = height
        self.width = width
        self.transforms = [transforms] if isinstance(transforms, str) \
            else (transforms or [])
        self.norm_mean = norm_mean or [0.485, 0.456, 0.406]
        self.norm_std = norm_std or [0.229, 0.224, 0.225]

    @property
    def num_train_pids(self):
        return self._num_train_pids

    @property
    def num_train_cams(self):
        return self._num_train_cams

    def fetch_test_loaders(self, name):
        q = self.test_dataset[name]['query']
        g = self.test_dataset[name]['gallery']
        return q, g


class ImageDataManager(DataManager):
    """(reference: datamanager.py:102-370)"""

    data_type = 'image'

    def __init__(self, config=None, root='', sources=None, targets=None,
                 height=256, width=128, transforms='random_flip',
                 norm_mean=None, norm_std=None, use_gpu=False, split_id=0,
                 combineall=False, load_train_targets=False,
                 batch_size_train=32, batch_size_test=32, workers=4,
                 num_instances=4, train_sampler='RandomIdentitySampler',
                 train_sampler_t='RandomIdentitySampler',
                 cuhk03_labeled=False, cuhk03_classic_split=False,
                 market1501_500k=False, use_masks=False, masks_dir=None,
                 seed=0, **kwargs):
        super().__init__(sources=sources, targets=targets, height=height,
                         width=width, transforms=transforms,
                         norm_mean=norm_mean, norm_std=norm_std)
        self.cfg = config
        self.use_masks = use_masks
        self.masks_dir = masks_dir
        self.batch_size_train = batch_size_train
        self.batch_size_test = batch_size_test
        self.workers = workers
        self.num_instances = num_instances

        common = dict(config=config, root=root, split_id=split_id,
                      cuhk03_labeled=cuhk03_labeled,
                      cuhk03_classic_split=cuhk03_classic_split,
                      market1501_500k=market1501_500k, use_masks=use_masks,
                      masks_dir=masks_dir)

        print('=> Loading train (source) dataset')
        trainset = sum(
            (init_image_dataset(name, mode='train', combineall=combineall,
                                **common) for name in self.sources), 0)
        self._num_train_pids = trainset.num_train_pids
        self._num_train_cams = trainset.num_train_cams
        self.train_set = trainset

        sampler = build_train_sampler(
            trainset.train, train_sampler, batch_size=batch_size_train,
            num_instances=num_instances, seed=seed)
        # Random-occlusion runs host-side (variable occluder shapes are
        # incompatible with static-shape jit); everything else on device
        host_transform = None
        lowered = [t.lower() for t in self.transforms]
        if ('ro' in lowered or 'random_occlusion' in lowered) \
                and config is not None:
            from bpbreid_tpu.data.data_augmentation import RandomOcclusion
            ro = config.data.ro
            host_transform = RandomOcclusion(
                path=ro.path, p=ro.p, n=ro.n, min_overlap=ro.min_overlap,
                max_overlap=ro.max_overlap, seed=seed)
        self.train_loader = BatchLoader(
            trainset, 'train', batch_size_train, height, width,
            sampler=sampler, num_workers=workers, drop_last=True,
            host_transform=host_transform)

        self.train_loader_t = None
        if load_train_targets:
            assert len(set(self.sources) & set(self.targets)) == 0, \
                'sources={} and targets={} must not overlap'.format(
                    self.sources, self.targets)
            print('=> Loading train (target) dataset')
            trainset_t = sum(
                (init_image_dataset(name, mode='train', combineall=False,
                                    **common) for name in self.targets), 0)
            sampler_t = build_train_sampler(
                trainset_t.train, train_sampler_t,
                batch_size=batch_size_train, num_instances=num_instances,
                seed=seed)
            self.train_loader_t = BatchLoader(
                trainset_t, 'train', batch_size_train, height, width,
                sampler=sampler_t, num_workers=workers, drop_last=True)

        print('=> Loading test (target) datasets')
        self.test_loader = {name: {'query': None, 'gallery': None}
                            for name in self.targets}
        self.test_dataset = {name: {'query': None, 'gallery': None}
                             for name in self.targets}
        for name in self.targets:
            queryset = init_image_dataset(name, mode='query',
                                          combineall=combineall, **common)
            galleryset = init_image_dataset(name, mode='gallery',
                                            combineall=combineall, **common)
            self.test_loader[name]['query'] = BatchLoader(
                queryset, 'query', batch_size_test, height, width,
                num_workers=workers)
            self.test_loader[name]['gallery'] = BatchLoader(
                galleryset, 'gallery', batch_size_test, height, width,
                num_workers=workers)
            self.test_dataset[name]['query'] = queryset
            self.test_dataset[name]['gallery'] = galleryset

        print('\n  **************** Summary ****************')
        print('  source            : {}'.format(self.sources))
        print('  # source datasets : {}'.format(len(self.sources)))
        print('  # source ids      : {}'.format(self._num_train_pids))
        print('  # source images   : {}'.format(len(trainset.train)))
        print('  # source cameras  : {}'.format(self._num_train_cams))
        print('  target            : {}'.format(self.targets))
        print('  *****************************************\n')

    def mask_chain_kwargs(self):
        """Resolve the device-side mask-preprocessing parameters from the
        config (reference mask chain wiring: transforms.py:133-158)."""
        if not self.use_masks or self.cfg is None:
            return None
        mc = self.cfg.model.bpbreid.masks
        kw = dict(background_strategy=mc.background_computation_strategy,
                  softmax_weight=mc.softmax_weight,
                  mask_filtering_threshold=mc.mask_filtering_threshold)
        dataset_cls = get_image_dataset(self.sources[0])
        ds_cfg = dataset_cls.get_masks_config(self.masks_dir)
        if ds_cfg is not None and ds_cfg[1]:
            # ISP-style masks already carry a background channel
            kw.update(grouping_matrix=None, special=None,
                      background_strategy='sum')
            return kw
        name = mc.preprocess
        if name == 'none':
            kw.update(grouping_matrix=None, special=None)
        elif name == 'bs_fu_bb':
            kw.update(grouping_matrix=None, special='bs_fu_bb')
        else:
            spec = masks_preprocess_all[name]
            if isinstance(spec, GroupingSpec):
                kw.update(grouping_matrix=spec.matrix, combine=spec.combine,
                          special=None)
            else:
                raise ValueError('mask preprocess {} is not a grouping '
                                 'strategy'.format(name))
        return kw
