"""Turnkey reference-checkpoint reproduction flow (round-3 verdict item
8): fabricate a mini Market-1501 directory tree + a reference-format
torch checkpoint, run the one-command convert->eval->compare tool, and
check the CMC table + delta report come out.

The dataset parsers and the weight converter are parity-tested
elsewhere; this pins the ORCHESTRATION — on a machine with the real
dataset + published checkpoint the same command validates true accuracy
parity (docs/REPRODUCE.md).
"""
import os
import os.path as osp

import numpy as np
import pytest

torch = pytest.importorskip('torch')


def _make_market_tree(root, num_pids=4, num_cams=2, imgs=2, h=64, w=32):
    import cv2
    base = osp.join(root, 'Market-1501-v15.09.15')
    rng = np.random.default_rng(0)
    pid_colors = {pid: rng.integers(0, 200, 3) for pid in range(1, num_pids + 1)}

    def fill(sub, per_cam):
        d = osp.join(base, sub)
        os.makedirs(d, exist_ok=True)
        md = osp.join(base, 'masks', 'pifpaf_maskrcnn_filtering', sub)
        os.makedirs(md, exist_ok=True)
        frame = 0
        for pid in range(1, num_pids + 1):
            for cam in range(1, num_cams + 1):
                for i in range(per_cam):
                    frame += 1
                    name = '{:04d}_c{}s1_{:06d}_00'.format(pid, cam, frame)
                    img = (pid_colors[pid][None, None, :]
                           + rng.integers(0, 56, (h, w, 3))).astype(np.uint8)
                    cv2.imwrite(osp.join(d, name + '.jpg'), img)
                    # stored channel-first like the reference pipeline
                    # (read_masks transposes (1, 2, 0) unconditionally)
                    masks = rng.random((36, h // 8, w // 8)).astype(np.float32)
                    np.save(osp.join(md, name + '.npy'), masks)

    fill('bounding_box_train', imgs)
    fill('query', 1)
    fill('bounding_box_test', imgs)
    return base


def _make_reference_checkpoint(path, num_classes):
    """Reference-format .pth: state_dict + metrics + embedded config
    (reference torchtools.save_checkpoint:24-63)."""
    from test_e2e_reference_parity import (_AttrDict, _install_eval_stubs,
                                           _load_module)
    _install_eval_stubs()
    ref_bpbreid = _load_module('ref_bpbreid_for_reproduce',
                               '/root/reference/torchreid/models/bpbreid.py')
    model_cfg = _AttrDict(
        masks=_AttrDict(parts_num=5),
        shared_parts_id_classifier=False,
        test_use_target_segmentation='none',
        training_binary_visibility_score=True,
        testing_binary_visibility_score=True,
        backbone='resnet18', last_stride=1,
        dim_reduce='after_pooling', dim_reduce_output=32,
        hrnet_pretrained_path='', normalization='identity', pooling='gwap',
        learnable_attention_enabled=True)
    torch.manual_seed(0)
    ref = ref_bpbreid.BPBreID(num_classes=num_classes, pretrained=False,
                              loss='part_based', model_cfg=model_cfg)
    with torch.no_grad():
        ref.train()
        for m in ref.modules():
            if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
                m.momentum = 1.0
        ref(torch.randn(8, 3, 64, 32, generator=torch.Generator().manual_seed(1)))
    ref.eval()
    embedded_cfg = {'model': {'bpbreid': {
        'backbone': 'resnet18', 'last_stride': 1,
        'dim_reduce': 'after_pooling', 'dim_reduce_output': 32,
        'pooling': 'gwap', 'learnable_attention_enabled': True,
        'mask_filtering_testing': True,
        'masks': {'preprocess': 'five_v', 'parts_num': 5},
    }}}
    torch.save({'state_dict': ref.state_dict(), 'epoch': 120,
                'rank1': 0.9, 'mAP': 0.8, 'config': embedded_cfg}, path)


def test_reproduce_flow(tmp_path):
    cv2 = pytest.importorskip('cv2')  # noqa: F841
    from bpbreid_tpu.data.datasets import clear_dataset_cache
    from bpbreid_tpu.tools.reproduce import reproduce

    clear_dataset_cache()
    root = str(tmp_path)
    _make_market_tree(root)
    ckpt = osp.join(root, 'job-1_120_model.pth.tar')
    _make_reference_checkpoint(ckpt, num_classes=4)

    result = reproduce(
        ckpt, root, dataset='market1501',
        save_dir=osp.join(root, 'log'),
        masks_dir='pifpaf_maskrcnn_filtering',
        opts=['data.height', '64', 'data.width', '32',
              'test.batch_size', '8', 'train.batch_size', '8',
              'data.workers', '1'])
    assert np.isfinite(result['mAP']) and 0.0 <= result['mAP'] <= 1.0
    assert np.isfinite(result['rank1'])
    # the stored metrics came through and the deltas were computed
    assert result['stored']['rank1'] == pytest.approx(0.9)
    assert result['stored']['mAP'] == pytest.approx(0.8)
    assert np.isfinite(result['delta_mAP'])
    assert result['ok']

    # the gate trips when the tolerance is impossible to meet
    clear_dataset_cache()
    strict = reproduce(
        ckpt, root, dataset='market1501',
        save_dir=osp.join(root, 'log2'),
        masks_dir='pifpaf_maskrcnn_filtering', max_delta=1e-9,
        opts=['data.height', '64', 'data.width', '32',
              'test.batch_size', '8', 'train.batch_size', '8',
              'data.workers', '1'])
    assert not strict['ok']


def _make_occ_duke_tree(root, num_pids=4, num_cams=2, imgs=2, h=64, w=32):
    """Occluded_Duke-shaped fixture: DukeMTMC directory layout with the
    pifpaf confidence-field mask convention
    (masks/<dir>/<sub>/<name>.jpg.confidence_fields.npy — reference
    image/occluded_dukemtmc.py:16-80 masks_dirs)."""
    import cv2
    base = osp.join(root, 'Occluded_Duke')
    rng = np.random.default_rng(1)
    pid_colors = {pid: rng.integers(0, 200, 3) for pid in range(1, num_pids + 1)}

    def fill(sub, per_cam):
        d = osp.join(base, sub)
        os.makedirs(d, exist_ok=True)
        md = osp.join(base, 'masks', 'pifpaf_maskrcnn_filtering', sub)
        os.makedirs(md, exist_ok=True)
        frame = 0
        for pid in range(1, num_pids + 1):
            for cam in range(1, num_cams + 1):
                for i in range(per_cam):
                    frame += 1
                    name = '{:04d}_c{}_f{:07d}'.format(pid, cam, frame)
                    img = (pid_colors[pid][None, None, :]
                           + rng.integers(0, 56, (h, w, 3))).astype(np.uint8)
                    cv2.imwrite(osp.join(d, name + '.jpg'), img)
                    masks = rng.random((36, h // 8, w // 8)).astype(np.float32)
                    np.save(osp.join(md, name + '.jpg.confidence_fields.npy'),
                            masks)

    fill('bounding_box_train', imgs)
    fill('query', 1)
    fill('bounding_box_test', imgs)
    return base


def test_reproduce_flow_occluded_duke(tmp_path):
    """Second BASELINE target's turnkey path (round-4 verdict item 8):
    the occluded_duke dataset layout + the repo's
    configs/bpbreid/bpbreid_occ_duke_test.yaml (mirror of the reference
    configs/bpbreid/bpbreid_occ_duke_test.yaml) drive the same
    convert->eval->compare flow — with the checkpoint-embedded model
    config overriding the yaml's flagship backbone (load_config
    semantics, reference scripts/main.py + tools/feature_extractor)."""
    cv2 = pytest.importorskip('cv2')  # noqa: F841
    from bpbreid_tpu.data.datasets import clear_dataset_cache
    from bpbreid_tpu.tools.reproduce import reproduce

    clear_dataset_cache()
    root = str(tmp_path)
    _make_occ_duke_tree(root)
    ckpt = osp.join(root, 'job-2_120_model.pth.tar')
    _make_reference_checkpoint(ckpt, num_classes=4)

    cfg_file = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                        'configs', 'bpbreid', 'bpbreid_occ_duke_test.yaml')
    result = reproduce(
        ckpt, root, dataset='occluded_duke', config_file=cfg_file,
        save_dir=osp.join(root, 'log'),
        masks_dir='pifpaf_maskrcnn_filtering',
        opts=['data.height', '64', 'data.width', '32',
              'test.batch_size', '8', 'train.batch_size', '8',
              'data.workers', '1', 'test.visrank', 'False'])
    assert np.isfinite(result['mAP']) and 0.0 <= result['mAP'] <= 1.0
    assert np.isfinite(result['rank1'])
    assert result['stored']['rank1'] == pytest.approx(0.9)
    assert np.isfinite(result['delta_mAP'])
    assert result['ok']
