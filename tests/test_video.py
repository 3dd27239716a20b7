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
    cmc, mAP, ssmd, _ = engine._evaluate(
        0, dataset_name='synthetic_video',
        query_loader=dm.test_loader['synthetic_video']['query'],
        gallery_loader=dm.test_loader['synthetic_video']['gallery'],
        normalize_feature=True, ranks=(1, 5))
    assert 0.0 <= mAP <= 1.0
