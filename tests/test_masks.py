"""Mask pipeline: grouping matrices vs a naive numpy oracle of the
reference loop, background strategies, stripes, and torch resize parity."""
import numpy as np
import pytest

from bpbreid_tpu.ops.masks import (
    GROUPING_STRATEGIES,
    PIFPAF_PARTS,
    add_background_mask,
    get_grouping,
    group_masks,
    group_masks_special,
    identity_masks,
    masks_preprocess_all,
    pcb_stripe_masks,
)


def _oracle_group(masks_hwc, spec):
    """Naive per-part loop equivalent of the reference MaskGroupingTransform."""
    chan_index = {c: i for i, c in enumerate(
        PIFPAF_PARTS if spec.source == 'pifpaf' else spec.groups and PIFPAF_PARTS[:17])}
    out = []
    for part in spec.parts_names:
        idx = [chan_index[c] for c in spec.groups[part]]
        sel = masks_hwc[..., idx]
        if spec.combine == 'sum':
            out.append(np.clip(sel.sum(-1), 0, 1))
        else:
            out.append(np.clip(sel.max(-1), 0, 1))
    return np.stack(out, axis=-1)


@pytest.mark.parametrize('name', ['five_v', 'eight', 'four', 'two_v', 'six',
                                  'fourteen', 'bs_fu', 'one', 'six_no'])
def test_grouping_matches_oracle(name):
    rng = np.random.default_rng(0)
    masks = rng.random((16, 8, 36)).astype(np.float32)
    spec = get_grouping(name)
    got = np.asarray(group_masks(masks, spec.matrix, spec.combine))
    want = _oracle_group(masks, spec)
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert got.shape == (16, 8, spec.parts_num)


def test_parts_num_table():
    expected = {'one': 1, 'two_v': 2, 'three_v': 3, 'four': 4, 'four_no': 4,
                'four_v': 4, 'four_v_pif': 4, 'five_v': 5, 'five': 5,
                'six': 6, 'six_v': 6, 'six_no': 6, 'six_new': 6,
                'seven_v': 7, 'seven_new': 7, 'eight': 8, 'eight_v': 8,
                'ten_ms': 10, 'eleven': 11, 'fourteen': 14, 'full': 1,
                'bs_fu': 37, 'cc6': 6}
    for name, num in expected.items():
        assert masks_preprocess_all[name].parts_num == num, name
    assert masks_preprocess_all['bs_fu_bb'].parts_num == 38
    assert masks_preprocess_all['strp_6'].parts_num == 6
    assert masks_preprocess_all['id'].parts_num == 1


def test_five_v_parts_names():
    spec = get_grouping('five_v')
    assert spec.parts_names == ['head_mask', 'upper_arms_torso_mask',
                                'lower_arms_torso_mask', 'legs_mask',
                                'feet_mask']


def test_grouping_batched():
    rng = np.random.default_rng(1)
    masks = rng.random((2, 16, 8, 36)).astype(np.float32)
    spec = get_grouping('five_v')
    got = np.asarray(group_masks(masks, spec.matrix, spec.combine))
    assert got.shape == (2, 16, 8, 5)
    np.testing.assert_allclose(got[0], _oracle_group(masks[0], spec), atol=1e-6)


def test_bs_fu_bb_special():
    rng = np.random.default_rng(2)
    masks = rng.random((4, 4, 36)).astype(np.float32)
    out = np.asarray(group_masks_special(masks, 'bs_fu_bb'))
    assert out.shape == (4, 4, 38)
    np.testing.assert_allclose(out[..., 36], masks.max(-1), atol=1e-6)
    np.testing.assert_allclose(out[..., 37], 1.0)


def test_background_sum():
    masks = np.array([[[0.2, 0.3]]], dtype=np.float32)   # [1,1,2]
    out = np.asarray(add_background_mask(masks, 'sum', softmax_weight=0))
    # background = 1 - 0.5 = 0.5; then sum-normalized (already sums to 1)
    np.testing.assert_allclose(out, [[[0.5, 0.2, 0.3]]], atol=1e-6)


def test_background_threshold_and_softmax():
    masks = np.array([[[0.2, 0.3]], [[0.9, 0.1]]], dtype=np.float32)  # [2,1,2]
    out = np.asarray(add_background_mask(masks, 'threshold', softmax_weight=15,
                                         mask_filtering_threshold=0.5))
    assert out.shape == (2, 1, 3)
    # pixel 0: max=0.3 < 0.5 -> background=1 dominates after softmax
    assert out[0, 0, 0] > 0.9
    # pixel 1: max=0.9 >= 0.5 -> background=0, part 0 dominates
    assert out[1, 0, 1] > 0.9
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-5)


def test_background_diff_from_max():
    masks = np.array([[[0.2, 0.6]]], dtype=np.float32)
    out = np.asarray(add_background_mask(masks, 'diff_from_max', softmax_weight=0))
    np.testing.assert_allclose(out[0, 0, 0], 0.4 / (0.4 + 0.2 + 0.6), atol=1e-5)


def test_pcb_stripes():
    m = np.asarray(pcb_stripe_masks(4, 8, 3))
    assert m.shape == (8, 3, 4)
    # each row belongs to exactly one stripe
    np.testing.assert_allclose(m.sum(-1), 1.0)
    # stripe 0 covers rows 0-1
    np.testing.assert_allclose(m[:2, :, 0], 1.0)
    np.testing.assert_allclose(m[2:, :, 0], 0.0)
    assert identity_masks(4, 4).shape == (4, 4, 1)


def test_resize_nearest_matches_torch():
    import torch
    from bpbreid_tpu.ops.resize import resize_nearest
    rng = np.random.default_rng(3)
    x = rng.random((5, 37, 13)).astype(np.float32)   # [C,H,W] for torch
    t = torch.nn.functional.interpolate(
        torch.from_numpy(x)[None], (9, 4), mode='nearest')[0].numpy()
    # ours is channel-last
    got = np.asarray(resize_nearest(np.moveaxis(x, 0, -1), 9, 4))
    np.testing.assert_allclose(np.moveaxis(got, -1, 0), t, atol=1e-6)


def test_resize_bilinear_align_corners_matches_torch():
    import torch
    from bpbreid_tpu.ops.resize import resize_bilinear_align_corners
    rng = np.random.default_rng(4)
    x = rng.random((6, 24, 8)).astype(np.float32)
    t = torch.nn.functional.interpolate(
        torch.from_numpy(x)[None], (96, 32), mode='bilinear',
        align_corners=True)[0].numpy()
    got = np.asarray(resize_bilinear_align_corners(np.moveaxis(x, 0, -1), 96, 32))
    np.testing.assert_allclose(np.moveaxis(got, -1, 0), t, atol=1e-5)
