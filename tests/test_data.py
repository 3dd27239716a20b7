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
    # confidence fields ship at 1/8 of the image grid (device upsamples)
    assert b['mask'].shape == (8, 8, 4, 36)
    assert b['pid'].shape == (8,)
    assert b['valid'].all()

    full = BatchLoader(synth, 'train', 8, 64, 32, sampler=sampler,
                       num_workers=2, drop_last=True, mask_grid_scale=None)
    assert next(iter(full))['mask'].shape == (8, 64, 32, 36)


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


def test_group_first_mask_order_is_exact(synth):
    """The pipeline groups mask channels (36 -> K) BEFORE the spatial
    ops for HBM-traffic reasons; grouping is purely channelwise, so the
    result must be bit-comparable to the reference order (spatial ops on
    the raw 36-channel masks, then the full chain)."""
    import jax
    from bpbreid_tpu.data.augment import (_coarse_dropout, _hflip,
                                          _masks_to_image_grid, _normalize,
                                          _pad_crop, mask_chain,
                                          train_augment)
    from bpbreid_tpu.ops.masks import get_grouping
    loader = BatchLoader(synth, 'train', 4, 64, 32, num_workers=1)
    batch = next(iter(loader))
    spec = get_grouping('five_v')
    mask_kwargs = dict(grouping_matrix=spec.matrix, combine=spec.combine,
                       background_strategy='threshold', softmax_weight=15.0,
                       mask_filtering_threshold=0.5)
    imgs_u8 = jnp.asarray(batch['image'])
    raw = jnp.asarray(batch['mask'])
    key = jax.random.PRNGKey(3)

    got_imgs, got_masks = train_augment(
        imgs_u8, raw, key, transforms=('rf', 'rc', 're'),
        mask_kwargs=mask_kwargs)

    # reference order with the same per-transform key splits
    r = jax.random.split(key, 4)
    imgs = imgs_u8.astype(jnp.float32) / 255.0
    full = _masks_to_image_grid(raw, imgs.shape[1], imgs.shape[2])
    imgs, masks = _hflip(imgs, full, r[0])
    imgs, masks = _pad_crop(imgs, masks, r[1])
    imgs = _normalize(imgs)
    imgs, masks = _coarse_dropout(imgs, masks, r[3])
    masks = mask_chain(masks, **mask_kwargs)
    np.testing.assert_allclose(np.asarray(got_imgs), np.asarray(imgs))
    np.testing.assert_allclose(np.asarray(got_masks), np.asarray(masks),
                               atol=1e-6)


def test_augment_deterministic_under_same_key(synth):
    from bpbreid_tpu.data.augment import train_augment
    loader = BatchLoader(synth, 'train', 4, 64, 32, num_workers=1)
    batch = next(iter(loader))
    imgs1, _ = train_augment(jnp.asarray(batch['image']), None,
                             jax.random.PRNGKey(7), transforms=('rf', 're'))
    imgs2, _ = train_augment(jnp.asarray(batch['image']), None,
                             jax.random.PRNGKey(7), transforms=('rf', 're'))
    np.testing.assert_allclose(np.asarray(imgs1), np.asarray(imgs2))


def test_adjust_hue_saturation_vs_colorsys():
    """Per-pixel oracle: stdlib colorsys implements the same HSV model
    torchvision's adjust_hue uses (reference cj backend:
    torchreid/data/transforms.py:100-106)."""
    import colorsys
    from bpbreid_tpu.data.augment import adjust_hue, adjust_saturation
    rng = np.random.default_rng(0)
    pix = rng.random((1, 4, 5, 3)).astype(np.float32)
    for shift in (0.1, -0.25, 0.5):
        got = np.asarray(adjust_hue(jnp.asarray(pix), shift))
        want = np.empty_like(pix)
        for i in range(4):
            for j in range(5):
                h, s, v = colorsys.rgb_to_hsv(*pix[0, i, j])
                want[0, i, j] = colorsys.hsv_to_rgb((h + shift) % 1.0, s, v)
        np.testing.assert_allclose(got, want, atol=1e-5)

    # saturation: factor 0 == grayscale (601-2 luma), 1 == identity
    gray = np.asarray(adjust_saturation(jnp.asarray(pix), 0.0))
    luma = pix[..., 0] * 0.299 + pix[..., 1] * 0.587 + pix[..., 2] * 0.114
    np.testing.assert_allclose(gray, np.repeat(luma[..., None], 3, -1),
                               atol=1e-6)
    same = np.asarray(adjust_saturation(jnp.asarray(pix), 1.0))
    np.testing.assert_allclose(same, pix, atol=1e-6)


def test_adjust_hue_primaries_and_roundtrip():
    from bpbreid_tpu.data.augment import adjust_hue
    red = jnp.zeros((1, 1, 1, 3)).at[..., 0].set(1.0)
    green = np.asarray(adjust_hue(red, 1.0 / 3.0))
    np.testing.assert_allclose(green, [[[[0.0, 1.0, 0.0]]]], atol=1e-5)
    blue = np.asarray(adjust_hue(red, -1.0 / 3.0))
    np.testing.assert_allclose(blue, [[[[0.0, 0.0, 1.0]]]], atol=1e-5)
    rng = np.random.default_rng(1)
    pix = jnp.asarray(rng.random((2, 3, 3, 3)).astype(np.float32))
    back = np.asarray(adjust_hue(adjust_hue(pix, 0.2), -0.2))
    np.testing.assert_allclose(back, np.asarray(pix), atol=1e-5)


def test_color_jitter_saturation_hue_config_honored():
    """A saturation/hue-only jitter (p=1) must actually change colors
    (round-1 gap: data.cj.saturation/hue were silently ignored) while
    leaving the luma structure roughly intact for pure saturation."""
    from bpbreid_tpu.data.augment import train_augment
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.integers(0, 255, (4, 16, 8, 3), np.uint8))
    base, _ = train_augment(imgs, None, jax.random.PRNGKey(0),
                            transforms=('cj',), cj_brightness=0.0,
                            cj_contrast=0.0, cj_saturation=0.0, cj_hue=0.0,
                            cj_p=1.0)
    jit_sat, _ = train_augment(imgs, None, jax.random.PRNGKey(0),
                               transforms=('cj',), cj_brightness=0.0,
                               cj_contrast=0.0, cj_saturation=0.9,
                               cj_hue=0.0, cj_p=1.0)
    jit_hue, _ = train_augment(imgs, None, jax.random.PRNGKey(0),
                               transforms=('cj',), cj_brightness=0.0,
                               cj_contrast=0.0, cj_saturation=0.0,
                               cj_hue=0.4, cj_p=1.0)
    assert np.abs(np.asarray(jit_sat) - np.asarray(base)).max() > 1e-3
    assert np.abs(np.asarray(jit_hue) - np.asarray(base)).max() > 1e-3


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
