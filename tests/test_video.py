"""Video pipeline: tracklet sampling, video datamanager + engines."""
import numpy as np
import pytest


def test_tracklet_sampling_methods():
    from bpbreid_tpu.data.video import SyntheticVideoDataset
    ds = SyntheticVideoDataset(seq_len=4, sample_method='evenly')
    s = ds.get('train', 0, 32, 16)
    assert s['image'].shape == (4, 32, 16, 3)
    ds_all = SyntheticVideoDataset(seq_len=4, sample_method='all',
                                   tracklet_len=6)
    assert ds_all.get('query', 0, 32, 16)['image'].shape == (6, 32, 16, 3)
    # short tracklet gets padded by replication
    ds_short = SyntheticVideoDataset(seq_len=8, sample_method='evenly',
                                     tracklet_len=3)
    assert ds_short.get('train', 0, 32, 16)['image'].shape == (8, 32, 16, 3)


def test_video_engine_mesh_distributed():
    """Video engines under the data mesh: the [B, S, H, W, 3] batch
    flattens to [B*S, ...] before the sharded step — the frame axis must
    stay divisible across devices."""
    import jax
    from bpbreid_tpu.config import get_default_config
    from bpbreid_tpu.data.video import VideoDataManager
    from bpbreid_tpu.engine.video import VideoSoftmaxEngine
    from bpbreid_tpu import models
    from bpbreid_tpu.optim import build_optimizer
    from bpbreid_tpu.parallel import distribute_engine

    cfg = get_default_config()
    cfg.data.height, cfg.data.width = 32, 16
    cfg.data.transforms = ['rf']
    dm = VideoDataManager(sources=['synthetic_video'],
                          targets=['synthetic_video'], height=32, width=16,
                          transforms=['rf'], batch_size_train=8,
                          batch_size_test=8, workers=1, num_instances=2,
                          train_sampler='RandomIdentitySampler', seq_len=2,
                          config=cfg)
    model = models.build_model('osnet_x0_25', num_classes=dm.num_train_pids,
                               loss='softmax', pretrained=False)
    engine = VideoSoftmaxEngine(dm, model, build_optimizer(optim='adam',
                                                           lr=1e-3),
                                config=cfg, pooling_method='avg')
    engine.init_state(height=32, width=16)
    mesh = distribute_engine(engine)
    assert mesh.devices.size == 8
    batch = next(iter(dm.train_loader))
    loss, _ = engine.forward_backward(batch)       # [8*2=16 frames] / 8 dev
    assert np.isfinite(loss)


@pytest.mark.slow
def test_video_engine_train_and_eval(tmp_path):
    import jax
    from bpbreid_tpu.config import get_default_config
    from bpbreid_tpu.data.video import VideoDataManager
    from bpbreid_tpu.engine.video import VideoSoftmaxEngine
    from bpbreid_tpu import models
    from bpbreid_tpu.optim import build_optimizer

    cfg = get_default_config()
    cfg.data.height, cfg.data.width = 32, 16
    cfg.data.transforms = ['rf']
    dm = VideoDataManager(sources=['synthetic_video'],
                          targets=['synthetic_video'], height=32, width=16,
                          transforms=['rf'], batch_size_train=4,
                          batch_size_test=4, workers=1, num_instances=2,
                          train_sampler='RandomIdentitySampler', seq_len=3,
                          config=cfg)
    model = models.build_model('osnet_x0_25', num_classes=dm.num_train_pids,
                               loss='softmax', pretrained=False)
    engine = VideoSoftmaxEngine(dm, model, build_optimizer(optim='adam',
                                                           lr=1e-3),
                                config=cfg, pooling_method='avg')
    engine.init_state(height=32, width=16)
    batch = next(iter(dm.train_loader))
    assert batch['image'].shape == (4, 3, 32, 16, 3)
    loss, summary = engine.forward_backward(batch)
    assert np.isfinite(loss)
    # multi-step dispatch with the video tracklet flattening:
    # [k, B, S, H, W, 3] stacks -> [k, B*S, ...] inside the scan
    stacked = {k: np.stack([batch[k]] * 2)
               for k in ('image', 'pid') if k in batch}
    loss_vec, _ = engine.forward_backward_multi(stacked)
    assert loss_vec.shape == (2,)
    assert np.isfinite(np.asarray(loss_vec)).all()
    cmc, mAP, ssmd, _ = engine._evaluate(
        0, dataset_name='synthetic_video',
        query_loader=dm.test_loader['synthetic_video']['query'],
        gallery_loader=dm.test_loader['synthetic_video']['gallery'],
        normalize_feature=True, ranks=(1, 5))
    assert 0.0 <= mAP <= 1.0


def _touch(path):
    import os
    os.makedirs(os.path.dirname(path), exist_ok=True)
    open(path, 'wb').close()


def test_mars_parser(tmp_path):
    from scipy.io import savemat
    from bpbreid_tpu.data.datasets.video_datasets import Mars
    root = tmp_path
    d = root / 'mars'
    names_tr = ['0001C1T0001F001.jpg', '0001C1T0001F002.jpg',
                '0002C2T0001F001.jpg']
    names_te = ['0003C1T0001F001.jpg', '0003C2T0001F001.jpg',
                '0004C3T0001F001.jpg']
    (d / 'info').mkdir(parents=True)
    (d / 'info' / 'train_name.txt').write_text('\n'.join(names_tr) + '\n')
    (d / 'info' / 'test_name.txt').write_text('\n'.join(names_te) + '\n')
    for n in names_tr:
        _touch(str(d / 'bbox_train' / n[:4] / n))
    for n in names_te:
        _touch(str(d / 'bbox_test' / n[:4] / n))
    savemat(str(d / 'info' / 'tracks_train_info.mat'),
            {'track_train_info': np.array([[1, 2, 1, 1], [3, 3, 2, 2]])})
    savemat(str(d / 'info' / 'tracks_test_info.mat'),
            {'track_test_info': np.array([[1, 1, 3, 1], [2, 2, 3, 2],
                                          [3, 3, -1, 3]])})
    savemat(str(d / 'info' / 'query_IDX.mat'),
            {'query_IDX': np.array([[1]])})
    ds = Mars(root=str(root))
    assert len(ds.train) == 2 and len(ds.train[0]['img_paths']) == 2
    assert ds.train[0]['pid'] == 0 and ds.train[0]['camid'] == 0
    assert len(ds.query) == 1 and ds.query[0]['pid'] == 3
    assert len(ds.gallery) == 1      # junk pid -1 dropped


def test_prid2011_and_ilidsvid_parsers(tmp_path):
    import json
    from scipy.io import savemat
    from bpbreid_tpu.data.datasets.video_datasets import (ILIDSVID,
                                                          PRID2011Video)
    root = tmp_path
    # PRID2011
    d = root / 'prid2011'
    people = ['person_0001', 'person_0002', 'person_0003', 'person_0004']
    for cam in ('cam_a', 'cam_b'):
        for p in people:
            _touch(str(d / 'prid_2011' / 'multi_shot' / cam / p / '0001.png'))
    (d / 'splits_prid2011.json').write_text(json.dumps(
        [{'train': people[:2], 'test': people[2:]}]))
    ds = PRID2011Video(root=str(root))
    assert len(ds.train) == 4 and len(ds.query) == 1 * 2 // 2 * 2 // 2 * 2
    assert {t['camid'] for t in ds.train} == {0, 1}
    assert all(t['camid'] == 0 for t in ds.query)
    assert all(t['camid'] == 1 for t in ds.gallery)
    # iLIDS-VID: 4 persons, split mat with 1-indexed person indices
    d2 = root / 'ilids-vid'
    persons = ['person001', 'person002', 'person003', 'person004']
    for cam in ('cam1', 'cam2'):
        for p in persons:
            _touch(str(d2 / 'i-LIDS-VID' / 'sequences' / cam / p /
                       '0001.png'))
    (d2 / 'train-test people splits').mkdir(parents=True)
    savemat(str(d2 / 'train-test people splits' /
                'train_test_splits_ilidsvid.mat'),
            {'ls_set': np.array([[1, 2, 3, 4]])})
    ds2 = ILIDSVID(root=str(root))
    # second half trains (persons 3,4), first half tests (1,2)
    assert len(ds2.train) == 4 and len(ds2.query) == 2
    assert sorted(t['pid'] for t in ds2.query) == [0, 1]


def test_dukemtmc_vidreid_parser(tmp_path):
    from bpbreid_tpu.data.datasets.video_datasets import DukeMTMCVidReID
    root = tmp_path
    base = root / 'dukemtmc-vidreid' / 'DukeMTMC-VideoReID'
    for subset, pid in (('train', 7), ('query', 11), ('gallery', 11)):
        for f in (1, 2):
            _touch(str(base / subset / '{:04d}'.format(pid) / '0001' /
                       '{:04d}_C3_F{:04d}_X1.jpg'.format(pid, f)))
    ds = DukeMTMCVidReID(root=str(root))
    assert len(ds.train) == 1 and ds.train[0]['pid'] == 0   # relabeled
    assert ds.train[0]['camid'] == 2
    assert len(ds.train[0]['img_paths']) == 2
    assert ds.query[0]['pid'] == 11                          # not relabeled
    # split json cache round-trips
    ds2 = DukeMTMCVidReID(root=str(root))
    assert ds2.train[0]['img_paths'] == ds.train[0]['img_paths']
