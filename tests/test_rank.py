"""CMC/mAP: vectorized numpy vs literal-loop oracle vs jitted XLA kernel.

Mirrors the reference's own oracle pattern (random distmats compared
across implementations, rank_cylib/test_cython.py)."""
import numpy as np
import pytest

from bpbreid_tpu.metrics.rank import (
    eval_cuhk03,
    eval_market1501,
    evaluate_rank,
)
from rank_oracles import eval_cuhk03_loop, eval_market1501_loop


def _random_case(rng, num_q=30, num_g=200, num_pid=20, num_cam=5):
    distmat = rng.random((num_q, num_g))
    q_pids = rng.integers(0, num_pid, num_q)
    g_pids = rng.integers(0, num_pid, num_g)
    q_camids = rng.integers(0, num_cam, num_q)
    g_camids = rng.integers(0, num_cam, num_g)
    return distmat, q_pids, g_pids, q_camids, g_camids


@pytest.mark.parametrize('seed', [0, 1, 2, 3])
def test_vectorized_matches_loop_oracle(seed):
    rng = np.random.default_rng(seed)
    case = _random_case(rng)
    fast = eval_market1501(*case, max_rank=20)
    slow = eval_market1501_loop(*case, max_rank=20)
    np.testing.assert_allclose(fast['cmc'], slow['cmc'], atol=1e-6)
    assert fast['mAP'] == pytest.approx(slow['mAP'], abs=1e-9)


def test_jit_kernel_matches_numpy():
    from bpbreid_tpu.ops.ranking import cmc_map
    rng = np.random.default_rng(7)
    case = _random_case(rng)
    ref = eval_market1501(*case, max_rank=20)
    cmc, mAP, n_valid = cmc_map(*[np.asarray(c) for c in case], max_rank=20)
    np.testing.assert_allclose(np.asarray(cmc), ref['cmc'], atol=1e-5)
    assert float(mAP) == pytest.approx(ref['mAP'], abs=1e-6)
    assert int(n_valid) > 0


@pytest.mark.parametrize('seed', [0, 1, 2, 3])
def test_counting_kernel_matches_numpy(seed):
    """Sort-free counting ranker == the full-sort protocol whenever
    max_matches bounds the per-query true-match count."""
    from bpbreid_tpu.ops.ranking import cmc_map_counting
    rng = np.random.default_rng(seed)
    case = _random_case(rng, num_q=40, num_g=500, num_pid=25, num_cam=5)
    ref = eval_market1501(*case, max_rank=20)
    cmc, mAP, n_valid, n_over = cmc_map_counting(
        *[np.asarray(c) for c in case], max_rank=20, max_matches=64,
        block=128)
    assert int(n_over) == 0
    np.testing.assert_allclose(np.asarray(cmc), ref['cmc'], atol=1e-5)
    assert float(mAP) == pytest.approx(ref['mAP'], abs=1e-6)
    assert int(n_valid) > 0


@pytest.mark.parametrize('seed', [0, 5])
def test_counting_kernel_ties_match_stable_sort(seed):
    """With heavily tied distances (bf16-quantized distmats at scale),
    the counting kernel's index tie-break must reproduce the stable-sort
    on-device kernel exactly."""
    from bpbreid_tpu.ops.ranking import cmc_map, cmc_map_counting
    rng = np.random.default_rng(seed)
    case = list(_random_case(rng, num_q=30, num_g=300, num_pid=15))
    case[0] = np.round(case[0] * 8) / 8.0        # ~many exact ties
    ref_cmc, ref_map, ref_valid = cmc_map(*[np.asarray(c) for c in case],
                                          max_rank=15)
    cmc, mAP, n_valid, n_over = cmc_map_counting(
        *[np.asarray(c) for c in case], max_rank=15, max_matches=64,
        block=64)
    assert int(n_over) == 0
    np.testing.assert_allclose(np.asarray(cmc), np.asarray(ref_cmc),
                               atol=1e-6)
    assert float(mAP) == pytest.approx(float(ref_map), abs=1e-6)
    assert int(n_valid) == int(ref_valid)


def test_counting_kernel_overflow_reported():
    from bpbreid_tpu.ops.ranking import cmc_map_counting
    rng = np.random.default_rng(9)
    # 2 pids over 60 gallery entries -> ~30 matches/query > max_matches=8
    case = _random_case(rng, num_q=6, num_g=60, num_pid=2, num_cam=4)
    _, _, _, n_over = cmc_map_counting(
        *[np.asarray(c) for c in case], max_rank=10, max_matches=8,
        block=32)
    assert int(n_over) > 0


def test_perfect_ranking():
    # two queries, gallery contains exact matches first
    distmat = np.array([[0.0, 0.5, 0.9], [0.5, 0.0, 0.9]])
    q_pids = np.array([0, 1])
    g_pids = np.array([0, 1, 2])
    q_camids = np.array([0, 0])
    g_camids = np.array([1, 1, 1])
    out = eval_market1501(distmat, q_pids, g_pids, q_camids, g_camids, 3)
    assert out['cmc'][0] == 1.0
    assert out['mAP'] == pytest.approx(1.0)


def test_same_cam_junk_removed():
    # the only gallery match shares (pid, camid) with the query -> invalid query
    distmat = np.array([[0.1, 0.2], [0.3, 0.1]])
    q_pids = np.array([0, 1])
    g_pids = np.array([0, 1])
    q_camids = np.array([0, 0])
    g_camids = np.array([0, 1])  # query0's match is junk, query1's is valid
    out = eval_market1501(distmat, q_pids, g_pids, q_camids, g_camids, 2)
    # only query 1 is valid and ranks its match first
    assert out['cmc'][0] == 1.0
    assert out['mAP'] == pytest.approx(1.0)


def test_evaluate_rank_dispatcher():
    rng = np.random.default_rng(3)
    case = _random_case(rng)
    out = evaluate_rank(*case, max_rank=10, eval_metric='default')
    assert out['cmc'].shape == (10,)
    assert 0.0 <= out['mAP'] <= 1.0
    out2 = eval_cuhk03(*case, max_rank=10, rng=np.random.default_rng(0))
    assert out2['cmc'].shape == (10,)


@pytest.mark.parametrize('seed', [0, 5])
def test_cuhk03_matches_loop_oracle(seed):
    """AP ignores the resampling → must match the oracle exactly; the
    single-gallery-shot CMC is stochastic → compare expectations with
    many repeats (different-but-equivalent sampling schemes)."""
    rng = np.random.default_rng(seed)
    case = _random_case(rng, num_q=20, num_g=120, num_pid=12)
    fast = eval_cuhk03(*case, max_rank=10, num_repeats=600,
                       rng=np.random.default_rng(1))
    slow = eval_cuhk03_loop(*case, max_rank=10, num_repeats=600,
                            rng=np.random.default_rng(2))
    assert fast['mAP'] == pytest.approx(slow['mAP'], abs=1e-9)
    np.testing.assert_allclose(fast['cmc'], slow['cmc'], atol=0.02)


def test_cuhk03_deterministic_by_default():
    rng = np.random.default_rng(9)
    case = _random_case(rng)
    a = eval_cuhk03(*case, max_rank=10)
    b = eval_cuhk03(*case, max_rank=10)
    np.testing.assert_array_equal(a['cmc'], b['cmc'])
    assert a['mAP'] == b['mAP']
    c = evaluate_rank(*case, max_rank=10, eval_metric='cuhk03')
    np.testing.assert_array_equal(a['cmc'], c['cmc'])


def test_cuhk03_short_group_tail():
    """Queries whose kept gallery has fewer pid groups than max_rank:
    the oracle leaves CMC ranks past the group count at 0."""
    rng = np.random.default_rng(3)
    case = _random_case(rng, num_q=8, num_g=20, num_pid=4)
    fast = eval_cuhk03(*case, max_rank=15, num_repeats=400,
                       rng=np.random.default_rng(1))
    slow = eval_cuhk03_loop(*case, max_rank=15, num_repeats=400,
                            rng=np.random.default_rng(2))
    np.testing.assert_allclose(fast['cmc'], slow['cmc'], atol=0.03)


def test_cmc_monotonic():
    rng = np.random.default_rng(11)
    case = _random_case(rng)
    out = eval_market1501(*case, max_rank=50)
    assert np.all(np.diff(out['cmc']) >= -1e-7)
