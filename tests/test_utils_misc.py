"""Auxiliary utilities: visualization, complexity, HPO, get_labels,
mean/std, heatmaps, rerank."""
import numpy as np
import pytest


def test_model_complexity():
    from bpbreid_tpu import models
    from bpbreid_tpu.utils.model_complexity import compute_model_complexity
    m = models.build_model('osnet_x0_25', num_classes=10, loss='softmax',
                           pretrained=False)
    n_params, flops = compute_model_complexity(m, height=64, width=32)
    assert n_params > 100_000
    assert flops > 0


def test_ranking_grid(tmp_path):
    from bpbreid_tpu.utils.visualization import visualize_ranking_grid
    rng = np.random.default_rng(0)
    q = [{'img': rng.integers(0, 255, (32, 16, 3), dtype=np.uint8),
          'pid': i, 'camid': 0} for i in range(3)]
    g = [{'img': rng.integers(0, 255, (32, 16, 3), dtype=np.uint8),
          'pid': i % 3, 'camid': 1} for i in range(9)]
    distmat = rng.random((3, 9))
    paths = visualize_ranking_grid(distmat, q, g, str(tmp_path), topk=4,
                                   q_idx_list=[0], count=2, mAP=0.5,
                                   rank1=0.6)
    assert len(paths) == 2
    import os
    assert all(os.path.exists(p) for p in paths)


def test_embedding_projection(tmp_path):
    from bpbreid_tpu.utils.visualization import visualize_embeddings_projection
    rng = np.random.default_rng(1)
    out = visualize_embeddings_projection(
        rng.normal(size=(10, 16)), rng.normal(size=(30, 16)),
        rng.integers(0, 5, 10), rng.integers(0, 5, 30), str(tmp_path),
        dataset_name='t', method='pca')
    import os
    assert os.path.exists(out)


def test_feature_map_visualization(tmp_path):
    from bpbreid_tpu.utils.visualization import display_feature_maps
    rng = np.random.default_rng(2)
    outs = display_feature_maps(
        {}, rng.normal(size=(2, 8, 4, 16)), rng.random((2, 8, 4, 5)),
        ['a', 'b'], [0, 1], save_dir=str(tmp_path))
    assert len(outs) == 2


def test_get_labels_synthetic(tmp_path):
    import cv2
    from bpbreid_tpu.scripts.get_labels import SyntheticPoseBackend, generate_labels
    d = tmp_path / 'ds' / 'imgs'
    d.mkdir(parents=True)
    rng = np.random.default_rng(3)
    for i in range(3):
        cv2.imwrite(str(d / 'im_{}.jpg'.format(i)),
                    rng.integers(0, 255, (64, 32, 3), dtype=np.uint8))
    outs = generate_labels(str(tmp_path / 'ds'),
                           backend=SyntheticPoseBackend())
    assert len(outs) == 3
    m = np.load(outs[0])
    assert m.shape[0] == 36          # channel-first storage
    # loadable by the dataset reader (transposes to HWC)
    from bpbreid_tpu.data.datasets.dataset import read_masks
    hwc = read_masks(outs[0])
    assert hwc.shape[-1] == 36


def test_compute_mean_std():
    from bpbreid_tpu.data.datasets import init_image_dataset, clear_dataset_cache
    from bpbreid_tpu.tools.compute_mean_std import compute_mean_std
    clear_dataset_cache()
    ds = init_image_dataset('synthetic', mode='train', num_pids=2)
    mean, std = compute_mean_std(ds, max_samples=5)
    assert mean.shape == (3,)
    assert (std >= 0).all()


def test_gaussian_heatmaps():
    from bpbreid_tpu.utils.imagetools import gaussian_heatmaps
    kp = np.array([[2.0, 3.0, 1.0], [0.0, 0.0, 0.0]])
    maps = gaussian_heatmaps(kp, 8, 6, sigma=1.0)
    assert maps.shape == (8, 6, 2)
    assert maps[3, 2, 0] == pytest.approx(1.0)
    assert maps[..., 1].max() == 0.0


def test_hpo_grid(tmp_path):
    from bpbreid_tpu.config import get_default_config
    from bpbreid_tpu.hyperparameter import GridSearch, HyperParameterOptimizer

    calls = []

    def fake_train(cfg):
        calls.append(cfg.train.lr)
        return {'rank1': cfg.train.lr, 'mAP': 0.0, 'ssmd': 0.0}

    cfg = get_default_config()
    hpo = HyperParameterOptimizer(
        cfg, GridSearch({'train.lr': [0.1, 0.3, 0.2]}),
        save_dir=str(tmp_path), train_fn=fake_train)
    best = hpo.optimize()
    assert best['metrics']['rank1'] == 0.3
    assert len(calls) == 3
    import os
    assert os.path.exists(tmp_path / 'hpo_results.json')


def test_rerank_shapes():
    from bpbreid_tpu.utils.rerank import re_ranking
    rng = np.random.default_rng(4)
    qg = rng.random((5, 12)).astype(np.float32)
    qq = rng.random((5, 5)).astype(np.float32)
    gg = rng.random((12, 12)).astype(np.float32)
    qq = (qq + qq.T) / 2
    gg = (gg + gg.T) / 2
    np.fill_diagonal(qq, 0)
    np.fill_diagonal(gg, 0)
    out = re_ranking(qg, qq, gg)
    assert out.shape == (5, 12)
    assert np.isfinite(out).all()


def test_batch_triplets_display(tmp_path):
    from bpbreid_tpu.utils.visualization.batch_triplets import display_batch_triplets
    rng = np.random.default_rng(5)
    images = rng.integers(0, 255, (8, 32, 16, 3), dtype=np.uint8)
    emb = rng.normal(size=(8, 16)).astype(np.float32)
    pids = np.array([0, 0, 1, 1, 2, 2, 3, 3])
    out = display_batch_triplets(images, emb, pids, str(tmp_path))
    import os
    assert out is not None and os.path.exists(out)


def test_receptive_field():
    from bpbreid_tpu.utils.receptive_field import compute_receptive_field
    out = compute_receptive_field([(7, 2, 3), (3, 2, 1)])
    assert out[0]['rf'] == 7
    assert out[1]['rf'] == 11          # 7 + 2*2
    assert out[1]['jump'] == 4


def test_compact_bilinear_pooling():
    import jax.numpy as jnp
    from bpbreid_tpu.ops.compact_bilinear_pooling import (
        CompactBilinearPooling, count_sketch, make_sketch_params)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 32)).astype(np.float32)
    h, s = make_sketch_params(32, 16, seed=0)
    got = np.asarray(count_sketch(jnp.asarray(x), h, s, 16))
    want = np.zeros((4, 16), np.float32)
    for i in range(32):
        want[:, int(h[i])] += float(s[i]) * x[:, i]
    np.testing.assert_allclose(got, want, atol=1e-5)

    cbp = CompactBilinearPooling(32, 32, 64)
    z = np.asarray(cbp(jnp.asarray(x)))
    assert z.shape == (4, 64)
    # CBP approximates the polynomial kernel: <cbp(x), cbp(y)> ~ <x,y>^2;
    # use a large sketch so the estimator variance is small
    xb = rng.normal(size=(64, 64)).astype(np.float32)
    yb = rng.normal(size=(64, 64)).astype(np.float32)
    cbp2 = CompactBilinearPooling(64, 64, 8192)
    zx = np.asarray(cbp2(jnp.asarray(xb)))
    zy = np.asarray(cbp2(jnp.asarray(yb)))
    k_true = (xb * yb).sum(-1) ** 2
    k_est = (zx * zy).sum(-1)
    corr = np.corrcoef(k_true, k_est)[0, 1]
    assert corr > 0.8, corr


def test_tools_and_ranklogger():
    from bpbreid_tpu.utils.tools import (check_isfile, collect_env_info,
                                         mkdir_if_missing, read_json,
                                         set_random_seed, write_json)
    from bpbreid_tpu.utils.logging import RankLogger
    import tempfile, os.path as osp
    with tempfile.TemporaryDirectory() as d:
        mkdir_if_missing(osp.join(d, 'a/b'))
        assert osp.isdir(osp.join(d, 'a/b'))
        write_json({'x': 1}, osp.join(d, 'a/x.json'))
        assert read_json(osp.join(d, 'a/x.json')) == {'x': 1}
        assert check_isfile(osp.join(d, 'a/x.json'))
    set_random_seed(0)
    info = collect_env_info()
    assert 'jax' in info and 'numpy' in info
    r = RankLogger('market1501', ['market1501'])
    r.write('market1501', 10, 0.8)
    r.write('market1501', 20, 0.9)
    r.show_summary()
