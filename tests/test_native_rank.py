"""Native C++ ranking kernel vs the numpy implementation."""
import numpy as np
import pytest

from bpbreid_tpu.metrics.rank import eval_market1501, evaluate_rank
from bpbreid_tpu.native import rank as native_rank


@pytest.mark.skipif(not native_rank.is_available(),
                    reason='g++ unavailable')
@pytest.mark.parametrize('seed', [0, 1, 2])
def test_native_matches_numpy(seed):
    rng = np.random.default_rng(seed)
    num_q, num_g = 40, 300
    distmat = rng.random((num_q, num_g)).astype(np.float32)
    q_pids = rng.integers(0, 25, num_q)
    g_pids = rng.integers(0, 25, num_g)
    q_cam = rng.integers(0, 5, num_q)
    g_cam = rng.integers(0, 5, num_g)
    ref = eval_market1501(distmat, q_pids, g_pids, q_cam, g_cam, 30)
    got = native_rank.eval_market1501(distmat, q_pids, g_pids, q_cam, g_cam, 30)
    np.testing.assert_allclose(got['cmc'], ref['cmc'], atol=1e-6)
    assert got['mAP'] == pytest.approx(ref['mAP'], abs=1e-9)


@pytest.mark.skipif(not native_rank.is_available(),
                    reason='g++ unavailable')
def test_dispatcher_uses_native():
    rng = np.random.default_rng(5)
    distmat = rng.random((10, 60)).astype(np.float32)
    q_pids = rng.integers(0, 6, 10)
    g_pids = rng.integers(0, 6, 60)
    q_cam = rng.integers(0, 3, 10)
    g_cam = rng.integers(0, 3, 60)
    out_native = evaluate_rank(distmat, q_pids, g_pids, q_cam, g_cam,
                               max_rank=10, use_native=True)
    out_py = evaluate_rank(distmat, q_pids, g_pids, q_cam, g_cam,
                           max_rank=10, use_native=False)
    np.testing.assert_allclose(out_native['cmc'], out_py['cmc'], atol=1e-6)
    assert out_native['mAP'] == pytest.approx(out_py['mAP'], abs=1e-9)


@pytest.mark.skipif(not native_rank.is_available(),
                    reason='g++ unavailable')
@pytest.mark.parametrize('seed', [0, 3])
def test_native_cuhk03_matches_numpy(seed):
    """mAP is sampling-free and must be exact; CMC is a Monte-Carlo
    average over single-shot resamples (independent streams), so it
    converges to the numpy implementation as num_repeats grows."""
    from bpbreid_tpu.metrics.rank import eval_cuhk03
    rng = np.random.default_rng(seed)
    num_q, num_g = 30, 200
    distmat = rng.random((num_q, num_g)).astype(np.float32)
    q_pids = rng.integers(0, 12, num_q)
    g_pids = rng.integers(0, 12, num_g)
    q_cam = rng.integers(0, 4, num_q)
    g_cam = rng.integers(0, 4, num_g)
    ref = eval_cuhk03(distmat, q_pids, g_pids, q_cam, g_cam, 15,
                      num_repeats=800, rng=np.random.default_rng(0))
    got = native_rank.eval_cuhk03(distmat, q_pids, g_pids, q_cam, g_cam, 15,
                                  num_repeats=800, seed=1)
    assert got['mAP'] == pytest.approx(ref['mAP'], abs=1e-6)
    np.testing.assert_allclose(got['cmc'], ref['cmc'], atol=0.03)

    # deterministic: same seed, any thread count
    a = native_rank.eval_cuhk03(distmat, q_pids, g_pids, q_cam, g_cam, 15,
                                num_repeats=10, seed=7, num_threads=1)
    b = native_rank.eval_cuhk03(distmat, q_pids, g_pids, q_cam, g_cam, 15,
                                num_repeats=10, seed=7, num_threads=8)
    np.testing.assert_array_equal(a['cmc'], b['cmc'])
    assert a['mAP'] == b['mAP']


@pytest.mark.skipif(not native_rank.is_available(),
                    reason='g++ unavailable')
def test_dispatcher_cuhk03_stays_on_numpy():
    """The cuhk03 dispatcher deliberately keeps the vectorized numpy
    path (host-independent sampling stream); the native kernel agrees
    on mAP exactly."""
    from bpbreid_tpu.metrics.rank import eval_cuhk03
    rng = np.random.default_rng(11)
    distmat = rng.random((12, 80)).astype(np.float32)
    q_pids = rng.integers(0, 6, 12)
    g_pids = rng.integers(0, 6, 80)
    q_cam = rng.integers(0, 3, 12)
    g_cam = rng.integers(0, 3, 80)
    out = evaluate_rank(distmat, q_pids, g_pids, q_cam, g_cam,
                        max_rank=10, eval_metric='cuhk03', use_native=True)
    ref = eval_cuhk03(distmat, q_pids, g_pids, q_cam, g_cam, 10)
    np.testing.assert_array_equal(out['cmc'], ref['cmc'])
    nat = native_rank.eval_cuhk03(distmat, q_pids, g_pids, q_cam, g_cam, 10)
    assert nat['mAP'] == pytest.approx(ref['mAP'], abs=1e-6)


@pytest.mark.skipif(not native_rank.is_available(),
                    reason='g++ unavailable')
def test_native_speedup_on_large_gallery():
    import time
    rng = np.random.default_rng(9)
    num_q, num_g = 100, 5000
    distmat = rng.random((num_q, num_g)).astype(np.float32)
    q_pids = rng.integers(0, 50, num_q)
    g_pids = rng.integers(0, 50, num_g)
    q_cam = rng.integers(0, 5, num_q)
    g_cam = rng.integers(0, 5, num_g)
    t0 = time.perf_counter()
    native_rank.eval_market1501(distmat, q_pids, g_pids, q_cam, g_cam, 50)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    eval_market1501(distmat, q_pids, g_pids, q_cam, g_cam, 50)
    t_numpy = time.perf_counter() - t0
    print('native {:.4f}s vs numpy {:.4f}s'.format(t_native, t_numpy))
    # both should be fast; native must not be pathologically slow
    assert t_native < max(t_numpy * 5, 2.0)
