"""CUHK03 raw .mat extraction on a synthetic MATLAB-v7.3-style file."""
import os.path as osp

import numpy as np
import pytest


def _make_fake_cuhk03_mat(path, ncamp=2, npids=3, nimgs=4):
    """Build the h5py reference structure the extractor expects
    (MATLAB stores arrays transposed)."""
    import h5py
    with h5py.File(path, 'w') as f:
        img_counter = [0]

        def make_img_ref(empty=False):
            name = 'img{}'.format(img_counter[0])
            img_counter[0] += 1
            if empty:
                ds = f.create_dataset(name, data=np.zeros((1, 1), np.uint8))
            else:
                img = np.random.randint(0, 255, (3, 8, 16), np.uint8)  # CWH
                ds = f.create_dataset(name, data=img)
            return ds.ref

        for image_type in ('detected', 'labeled'):
            camp_refs = []
            for c in range(ncamp):
                # camp stored (10, npids) refs -> deref .T = [npids, 10]
                refs = np.empty((10, npids), dtype=h5py.ref_dtype)
                for p in range(npids):
                    for i in range(10):
                        refs[i, p] = make_img_ref(empty=i >= nimgs)
                camp = f.create_dataset('{}_camp{}'.format(image_type, c),
                                        data=refs)
                camp_refs.append(camp.ref)
            arr = np.empty((1, ncamp), dtype=h5py.ref_dtype)
            arr[0, :] = camp_refs
            f.create_dataset(image_type, data=arr)
        # one classic test split: camp 1 pid 1 in test
        split = f.create_dataset('testset0',
                                 data=np.array([[1.0], [1.0]]))  # (2, n)
        arr = np.empty((1, 1), dtype=h5py.ref_dtype)
        arr[0, 0] = split.ref
        f.create_dataset('testsets', data=arr)


def test_cuhk03_extraction_and_classic_split(tmp_path):
    from bpbreid_tpu.data.datasets import clear_dataset_cache, init_image_dataset
    clear_dataset_cache()
    d = tmp_path / 'cuhk03'
    d.mkdir()
    _make_fake_cuhk03_mat(str(d / 'cuhk-03.mat'))
    ds = init_image_dataset('cuhk03', root=str(tmp_path), mode='train',
                            cuhk03_classic_split=True)
    # 2 camps x 3 pids = 6 identities, 1 in test -> 5 train pids
    assert ds.num_train_pids == 5
    assert ds.len('query') == 4          # 4 non-empty images of the test pid
    assert osp.exists(d / 'images_detected')
    assert osp.exists(d / 'splits_classic_detected.json')
    assert ds.eval_metric == 'cuhk03'
    # images load through the standard reader
    s = ds.get('train', 0, 32, 16)
    assert s['image'].shape == (32, 16, 3)
