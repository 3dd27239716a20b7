"""Split-based dataset parsers on synthesized directory trees."""
import os
import os.path as osp

import numpy as np
import pytest


def _touch_img(path):
    import cv2
    os.makedirs(osp.dirname(path), exist_ok=True)
    cv2.imwrite(path, np.zeros((8, 4, 3), np.uint8))


def test_viper(tmp_path):
    from bpbreid_tpu.data.datasets import init_image_dataset, clear_dataset_cache
    clear_dataset_cache()
    root = tmp_path
    for i in range(8):
        _touch_img(str(root / 'viper/VIPeR/cam_a/{:03d}_0.bmp'.format(i)))
        _touch_img(str(root / 'viper/VIPeR/cam_b/{:03d}_90.bmp'.format(i)))
    np.random.seed(0)
    ds = init_image_dataset('viper', root=str(root), mode='train')
    assert ds.num_train_pids == 4
    assert ds.len('query') == 4 and ds.len('gallery') == 4
    # 20 sub-splits persisted
    import json
    assert len(json.load(open(root / 'viper/splits.json'))) == 20


def test_prid(tmp_path):
    from bpbreid_tpu.data.datasets import init_image_dataset, clear_dataset_cache
    clear_dataset_cache()
    root = tmp_path
    for pid in range(1, 750):
        name = 'person_' + str(pid).zfill(4) + '.png'
        if pid <= 385:
            _touch_img(str(root / 'prid2011/prid_2011/single_shot/cam_a' / name))
        _touch_img(str(root / 'prid2011/prid_2011/single_shot/cam_b' / name))
    import random
    random.seed(0)
    ds = init_image_dataset('prid', root=str(root), mode='train')
    assert ds.num_train_pids == 100
    assert ds.len('query') == 100
    assert ds.len('gallery') == 100 + 549


def test_partial_reid(tmp_path):
    from bpbreid_tpu.data.datasets import init_image_dataset, clear_dataset_cache
    clear_dataset_cache()
    root = tmp_path
    for pid in range(1, 5):
        for j in range(2):
            _touch_img(str(root / 'Partial_REID/partial_body_images/{:03d}_{}.jpg'.format(pid, j)))
            _touch_img(str(root / 'Partial_REID/whole_body_images/{:03d}_{}.jpg'.format(pid, j)))
    ds = init_image_dataset('partial_reid', root=str(root), mode='query')
    assert ds.len('query') == 8
    assert ds.len('gallery') == 8
    assert len(ds.train) == 0


def test_sensereid(tmp_path):
    from bpbreid_tpu.data.datasets import init_image_dataset, clear_dataset_cache
    clear_dataset_cache()
    root = tmp_path
    for pid in range(3):
        for cam in range(2):
            _touch_img(str(root / 'sensereid/SenseReID/test_probe/{}_{}.jpg'.format(pid, cam)))
            _touch_img(str(root / 'sensereid/SenseReID/test_gallery/{}_{}.jpg'.format(pid, cam)))
    ds = init_image_dataset('sensereid', root=str(root), mode='query')
    assert ds.len('query') == 6
    assert ds.len('gallery') == 6


def test_cuhk01(tmp_path):
    from bpbreid_tpu.data.datasets import init_image_dataset, clear_dataset_cache
    clear_dataset_cache()
    root = tmp_path
    # 6 identities x 4 images (2 per cam view)
    for pid in range(1, 7):
        for img_i in range(1, 5):
            _touch_img(str(root / 'cuhk01/campus/{:04d}{:03d}.png'.format(pid, img_i)))
    np.random.seed(0)
    ds = init_image_dataset('cuhk01', root=str(root), mode='train')
    assert ds.num_train_pids == 3
