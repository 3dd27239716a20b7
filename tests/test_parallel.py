"""Multi-device sharding on the 8-device CPU mesh: DP train step and
gallery-sharded retrieval parity with the single-device path."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp


def test_mesh_has_8_devices():
    from bpbreid_tpu.parallel import make_mesh
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_bp_distance_matches_local():
    from bpbreid_tpu.metrics.distance import compute_distance_matrix_using_bp_features
    from bpbreid_tpu.parallel import make_mesh, sharded_bp_distance
    rng = np.random.default_rng(0)
    qf = rng.random((6, 3, 16)).astype(np.float32)
    gf = rng.random((21, 3, 16)).astype(np.float32)   # not divisible by 8
    q_vis = rng.random((6, 3)) > 0.2
    g_vis = rng.random((21, 3)) > 0.2
    mesh = make_mesh()
    d_sh, pd_sh, ng = sharded_bp_distance(mesh, qf, gf, q_vis, g_vis)
    d_ref, pd_ref = compute_distance_matrix_using_bp_features(
        qf, gf, q_vis, g_vis)
    assert ng == 21
    # padded gallery rows have all-False visibility -> sentinel max+1 values
    # may differ; compare real columns by ranking and part distances directly
    np.testing.assert_allclose(np.asarray(pd_sh)[:, :, :21],
                               np.asarray(pd_ref), atol=1e-4)
    np.testing.assert_allclose(
        np.argsort(np.asarray(d_sh)[:, :21], axis=1),
        np.argsort(np.asarray(d_ref), axis=1))


def test_sharded_cmc_matches_numpy():
    from bpbreid_tpu.metrics.rank import eval_market1501
    from bpbreid_tpu.parallel import make_mesh, sharded_cmc_map, pad_to_multiple
    rng = np.random.default_rng(1)
    nq, ng = 10, 50
    distmat = rng.random((nq, ng)).astype(np.float32)
    q_pids = rng.integers(0, 10, nq)
    g_pids = rng.integers(0, 10, ng)
    q_cam = rng.integers(0, 3, nq)
    g_cam = rng.integers(0, 3, ng)
    mesh = make_mesh()
    dist_p, _ = pad_to_multiple(distmat, 8, axis=1, value=1e9)
    cmc, mAP, n_valid = sharded_cmc_map(mesh, dist_p, q_pids, g_pids,
                                        q_cam, g_cam, n_gallery=ng,
                                        max_rank=20)
    ref = eval_market1501(distmat, q_pids, g_pids, q_cam, g_cam, 20)
    np.testing.assert_allclose(cmc, ref['cmc'], atol=1e-5)
    assert mAP == pytest.approx(ref['mAP'], abs=1e-5)


@pytest.mark.slow
def test_distractor_scale_sharded_retrieval():
    """SURVEY §7 stage 9 / round-1 verdict item 6: drive the sharded
    retrieval at the market1501_500k distractor scale (reference:
    data/datasets/image/market1501.py:63-76). A synthetic 500k-row
    [Ng, 6, 512] bf16 gallery (~3GB) is sharded over the 8-device mesh
    for the full distance + CMC/mAP pass; numerical parity vs the local
    chunked path is checked on a float32 subsample. The CI default runs
    a 64k gallery (the suite shares one CPU core with 8 virtual
    devices); set BPBREID_DISTRACTOR_NG=500000 for the full-scale run —
    wall-clock numbers at 500k are recorded in IMPLEMENTATION_STATUS.md
    from the real-chip run."""
    import os
    import time

    import ml_dtypes
    from bpbreid_tpu.metrics.distance import (
        compute_distance_matrix_using_bp_features)
    from bpbreid_tpu.parallel import (
        make_mesh, sharded_bp_distance, sharded_cmc_map)

    ng = int(os.environ.get('BPBREID_DISTRACTOR_NG', 64_000))
    nq, k, d = 32, 6, 512
    n_real, n_pids = 4096, 256        # rows beyond n_real are distractors
    rng = np.random.default_rng(0)

    def normed(shape):
        x = rng.standard_normal(shape, dtype=np.float32)
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    qf = normed((nq, k, d))
    gf = normed((ng, k, d))
    q_pids = rng.integers(0, n_pids, nq)
    g_pids = np.concatenate([rng.integers(0, n_pids, n_real),
                             np.arange(ng - n_real) + 10_000])
    q_cam, g_cam = rng.integers(0, 3, nq), rng.integers(0, 6, ng)
    # plant one near-duplicate gallery row per query so every query has
    # a findable cross-camera match among the real rows
    plant = rng.integers(0, n_real, nq)
    gf[plant] = normed((nq, k, d)) * 0.05 + qf
    gf[plant] /= np.linalg.norm(gf[plant], axis=-1, keepdims=True)
    g_pids[plant] = q_pids
    g_cam[plant] = (q_cam + 1) % 3
    q_vis = rng.random((nq, k)) > 0.1
    g_vis = rng.random((ng, k)) > 0.1

    mesh = make_mesh()
    gf_bf16 = gf.astype(ml_dtypes.bfloat16)
    t0 = time.time()
    dist, _part_dist, ng_out = sharded_bp_distance(
        mesh, qf.astype(ml_dtypes.bfloat16), gf_bf16, q_vis, g_vis)
    dist.block_until_ready()
    t1 = time.time()
    assert ng_out == ng
    cmc, mAP, n_valid = sharded_cmc_map(
        mesh, jnp.asarray(dist, jnp.float32), q_pids, g_pids, q_cam, g_cam,
        n_gallery=ng, max_rank=10)
    t2 = time.time()
    print('distractor retrieval Ng=%d: distance %.2fs, ranking %.2fs '
          '-> %.1f queries/sec' % (ng, t1 - t0, t2 - t1, nq / (t2 - t0)))
    assert n_valid == nq
    assert np.isfinite(mAP) and np.all(np.isfinite(cmc))
    assert cmc[-1] >= cmc[0] >= 0.9          # planted matches rank first

    # float32 parity vs the local chunked path on a subsample
    sub = 4096
    d_sh, pd_sh, _ = sharded_bp_distance(mesh, qf, gf[:sub], q_vis,
                                         g_vis[:sub])
    d_ref, pd_ref = compute_distance_matrix_using_bp_features(
        qf, gf[:sub], q_vis, g_vis[:sub],
        batch_size_pairwise_dist_matrix=500)
    np.testing.assert_allclose(np.asarray(pd_sh)[..., :sub],
                               np.asarray(pd_ref), atol=1e-4)
    # combined distances agree up to float noise (argsort equality would
    # be flaky on near-ties at this column count)
    np.testing.assert_allclose(np.asarray(d_sh)[:, :sub],
                               np.asarray(d_ref), atol=1e-3, rtol=1e-4)


def test_data_parallel_train_step():
    """Full DP train step over the 8-device mesh: batch sharded, params
    replicated; must produce finite loss and updated params."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from bpbreid_tpu.parallel import make_mesh, DATA_AXIS
    from bpbreid_tpu.models.bpbreid import BPBreID
    from bpbreid_tpu.losses.gilt import GiLtLoss
    import optax

    mesh = make_mesh()
    model = BPBreID(num_classes=8, parts_num=2, backbone='resnet18',
                    last_stride=2, dim_reduce='after_pooling',
                    dim_reduce_output=32)
    imgs = jnp.zeros((16, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs[:2], train=False)
    tx = optax.adam(1e-3)
    opt_state = tx.init(variables['params'])
    gilt = GiLtLoss()

    def step(params, batch_stats, opt_state, imgs, pids):
        def loss_fn(p):
            out, new_state = model.apply(
                {'params': p, 'batch_stats': batch_stats}, imgs, train=True,
                mutable=['batch_stats'])
            emb, vis, cls, pix, feat, masks = out
            loss, _ = gilt(emb, vis, cls, pids)
            return loss, new_state['batch_stats']

        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, bs, opt_state, loss

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    step_jit = jax.jit(step, in_shardings=(repl, repl, repl, data, data),
                       out_shardings=(repl, repl, repl, repl))
    pids = jnp.asarray(np.repeat(np.arange(8), 2))
    imgs_sharded = jax.device_put(imgs, data)
    params, bs, opt_state, loss = step_jit(
        variables['params'], variables['batch_stats'], opt_state,
        imgs_sharded, jax.device_put(pids, data))
    assert np.isfinite(float(loss))
    # a second step with the updated state still works
    params, bs, opt_state, loss2 = step_jit(params, bs, opt_state,
                                            imgs_sharded,
                                            jax.device_put(pids, data))
    assert np.isfinite(float(loss2))


def test_distribute_engine_end_to_end():
    """distribute_engine swaps the engine's compiled step for a
    mesh-sharded one; training still converges on the 8-device mesh."""
    from bpbreid_tpu.config import get_default_config
    from bpbreid_tpu.data import ImageDataManager
    from bpbreid_tpu.data.datasets import clear_dataset_cache
    from bpbreid_tpu.engine import ImagePartBasedEngine
    from bpbreid_tpu.models.bpbreid import BPBreID
    from bpbreid_tpu.optim import build_optimizer
    from bpbreid_tpu.parallel import distribute_engine
    from bpbreid_tpu.ops.masks import compute_parts_num_and_names

    clear_dataset_cache()
    cfg = get_default_config()
    cfg.data.height, cfg.data.width = 64, 32
    cfg.data.sources = cfg.data.targets = ['synthetic']
    cfg.data.transforms = ['rf']
    cfg.train.batch_size = 16
    cfg.model.bpbreid.backbone = 'resnet18'
    cfg.model.bpbreid.masks.preprocess = 'five_v'
    cfg.model.bpbreid.dim_reduce_output = 32
    compute_parts_num_and_names(cfg)
    dm = ImageDataManager(
        config=cfg, root='', sources=['synthetic'], targets=['synthetic'],
        height=64, width=32, transforms=['rf'], batch_size_train=16,
        batch_size_test=8, workers=1, num_instances=4, use_masks=True,
        masks_dir='pifpaf_maskrcnn_filtering')
    model = BPBreID(num_classes=dm.num_train_pids, parts_num=5,
                    backbone='resnet18', last_stride=1,
                    dim_reduce='after_pooling', dim_reduce_output=32)
    engine = ImagePartBasedEngine(cfg, dm, model,
                                  build_optimizer(optim='adam', lr=3e-4))
    engine.init_state()
    mesh = distribute_engine(engine)
    assert mesh.devices.size == 8
    batch = next(iter(dm.train_loader))
    loss1, _ = engine.forward_backward(batch)
    loss2, _ = engine.forward_backward(batch)
    assert np.isfinite(loss1) and np.isfinite(loss2)

    # multi-step dispatch under the mesh: [k, B, ...] groups shard the
    # batch axis (axis 1); the scan still runs per-device over k steps
    stacked = {k: np.stack([batch[k]] * 3)
               for k in ('image', 'mask', 'pid') if k in batch}
    loss_vec, summaries = engine.forward_backward_multi(stacked)
    assert loss_vec.shape == (3,)
    assert np.isfinite(np.asarray(loss_vec)).all()
