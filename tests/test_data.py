"""Data layer: PK sampler guarantees, synthetic dataset, loader batching,
device-side augmentation pipeline."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bpbreid_tpu.data.datasets import init_image_dataset, clear_dataset_cache
from bpbreid_tpu.data.loader import BatchLoader
from bpbreid_tpu.data.sampler import RandomIdentitySampler, build_train_sampler


@pytest.fixture
def synth():
    clear_dataset_cache()
    return init_image_dataset('synthetic', mode='train', use_masks=True,
                              masks_dir='pifpaf_maskrcnn_filtering',
                              num_pids=8, num_cams=2, imgs_per_pid_cam=3)


def test_pk_sampler_structure(synth):
    sampler = RandomIdentitySampler(synth.train, batch_size=8,
                                    num_instances=4, seed=0)
    idxs = list(iter(sampler))
    assert len(idxs) % 8 == 0
    pids = [synth.train[i]['pid'] for i in idxs]
    for b in range(len(idxs) // 8):
        batch = pids[b * 8:(b + 1) * 8]
        # 2 pids x 4 instances each
        vals, counts = np.unique(batch, return_counts=True)
        assert len(vals) == 2
        assert all(c == 4 for c in counts)


def test_loader_batches(synth):
    sampler = build_train_sampler(synth.train, 'RandomIdentitySampler',
                                  batch_size=8, num_instances=4)
    loader = BatchLoader(synth, 'train', 8, 64, 32, sampler=sampler,
                         num_workers=2, drop_last=True)
    batches = list(loader)
    assert len(batches) == len(loader)
    b = batches[0]
    assert b['image'].shape == (8, 64, 32, 3)
    assert b['image'].dtype == np.uint8
    assert b['mask'].shape == (8, 64, 32, 36)
    assert b['pid'].shape == (8,)
    assert b['valid'].all()


def test_loader_pads_final_batch(synth):
    loader = BatchLoader(synth, 'query', 7, 64, 32, num_workers=2)
    batches = list(loader)
    total_valid = sum(int(b['valid'].sum()) for b in batches)
    assert total_valid == synth.len('query')
    assert all(b['image'].shape[0] == 7 for b in batches)


def test_dataset_addition_and_combineall(synth):
    clear_dataset_cache()
    d2 = init_image_dataset('synthetic', mode='train', use_masks=True,
                            masks_dir='pifpaf_maskrcnn_filtering',
                            num_pids=4, seed=10)
    combined = synth + d2
    assert combined.num_train_pids == synth.num_train_pids + 4


def test_augment_pipeline_shapes(synth):
    from bpbreid_tpu.data.augment import train_augment, eval_preprocess
    from bpbreid_tpu.ops.masks import get_grouping
    loader = BatchLoader(synth, 'train', 4, 64, 32, num_workers=1)
    batch = next(iter(loader))
    spec = get_grouping('five_v')
    mask_kwargs = dict(grouping_matrix=spec.matrix, combine=spec.combine,
                       background_strategy='threshold', softmax_weight=15.0,
                       mask_filtering_threshold=0.5)
    imgs, masks = train_augment(
        jnp.asarray(batch['image']), jnp.asarray(batch['mask']),
        jax.random.PRNGKey(0), transforms=('rf', 'rc', 'cj', 're'),
        mask_kwargs=mask_kwargs)
    assert imgs.shape == (4, 64, 32, 3)
    assert imgs.dtype == jnp.float32
    assert masks.shape == (4, 16, 8, 6)          # K+1=6, /4 scale
    np.testing.assert_allclose(np.asarray(masks.sum(-1)), 1.0, atol=1e-3)

    imgs2, masks2 = eval_preprocess(jnp.asarray(batch['image']),
                                    jnp.asarray(batch['mask']),
                                    mask_kwargs=mask_kwargs)
    assert imgs2.shape == (4, 64, 32, 3)
    assert masks2.shape == (4, 16, 8, 6)


def test_augment_deterministic_under_same_key(synth):
    from bpbreid_tpu.data.augment import train_augment
    loader = BatchLoader(synth, 'train', 4, 64, 32, num_workers=1)
    batch = next(iter(loader))
    imgs1, _ = train_augment(jnp.asarray(batch['image']), None,
                             jax.random.PRNGKey(7), transforms=('rf', 're'))
    imgs2, _ = train_augment(jnp.asarray(batch['image']), None,
                             jax.random.PRNGKey(7), transforms=('rf', 're'))
    np.testing.assert_allclose(np.asarray(imgs1), np.asarray(imgs2))


def test_datamanager_end_to_end():
    from bpbreid_tpu.config import get_default_config
    from bpbreid_tpu.data import ImageDataManager
    clear_dataset_cache()
    cfg = get_default_config()
    cfg.model.bpbreid.masks.preprocess = 'five_v'
    dm = ImageDataManager(
        config=cfg, root='', sources=['synthetic'], targets=['synthetic'],
        height=64, width=32, transforms=['rf'], batch_size_train=8,
        batch_size_test=8, workers=1, num_instances=4, use_masks=True,
        masks_dir='pifpaf_maskrcnn_filtering')
    assert dm.num_train_pids == 8
    b = next(iter(dm.train_loader))
    assert b['image'].shape == (8, 64, 32, 3)
    q = next(iter(dm.test_loader['synthetic']['query']))
    assert q['image'].shape[0] == 8
    kw = dm.mask_chain_kwargs()
    assert kw['grouping_matrix'].shape == (36, 5)


def test_random_occlusion():
    from bpbreid_tpu.data.data_augmentation import RandomOcclusion
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 32, 3), dtype=np.uint8)
    ro = RandomOcclusion(p=1.0, n=1, seed=0)
    out = ro(img)
    assert out.shape == img.shape
    assert (out != img).any()          # something was pasted
    ro_off = RandomOcclusion(p=0.0, seed=0)
    np.testing.assert_array_equal(ro_off(img), img)


def test_datamanager_with_ro(synth):
    from bpbreid_tpu.config import get_default_config
    from bpbreid_tpu.data import ImageDataManager
    from bpbreid_tpu.data.datasets import clear_dataset_cache
    clear_dataset_cache()
    cfg = get_default_config()
    cfg.model.bpbreid.masks.preprocess = 'five_v'
    dm = ImageDataManager(
        config=cfg, root='', sources=['synthetic'], targets=['synthetic'],
        height=64, width=32, transforms=['ro', 'rf'], batch_size_train=8,
        batch_size_test=8, workers=1, num_instances=4, use_masks=True,
        masks_dir='pifpaf_maskrcnn_filtering')
    b = next(iter(dm.train_loader))
    assert b['image'].shape == (8, 64, 32, 3)
