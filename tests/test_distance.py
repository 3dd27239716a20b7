"""Distance matrices: hand-computed goldens + numpy cross-checks +
visibility semantics (sentinel -1 -> max+1)."""
import numpy as np
import pytest

from bpbreid_tpu.metrics.distance import (
    compute_distance_matrix,
    compute_distance_matrix_using_bp_features,
    cosine_distance,
    euclidean_squared_distance,
)
from bpbreid_tpu.ops.tensortools import masked_mean, replace_values


def test_euclidean_squared_golden():
    a = np.array([[0.0, 0.0], [1.0, 1.0]])
    b = np.array([[0.0, 1.0], [3.0, 4.0]])
    d = np.asarray(euclidean_squared_distance(a, b))
    np.testing.assert_allclose(d, [[1.0, 25.0], [1.0, 13.0]], atol=1e-6)


def test_cosine_golden():
    a = np.array([[1.0, 0.0]])
    b = np.array([[0.0, 2.0], [1.0, 0.0], [-3.0, 0.0]])
    d = np.asarray(cosine_distance(a, b))
    np.testing.assert_allclose(d, [[1.0, 0.0, 2.0]], atol=1e-6)


def test_compute_distance_matrix_validates():
    with pytest.raises(ValueError):
        compute_distance_matrix(np.zeros((3, 4)), np.zeros((3, 5)))
    with pytest.raises(ValueError):
        compute_distance_matrix(np.zeros((3, 4)), np.zeros((5, 4)), metric='nope')


def test_replace_values_and_masked_mean():
    import jax.numpy as jnp
    x = jnp.array([[1.0, 2.0], [3.0, 4.0]])
    m = jnp.array([[True, False], [False, True]])
    out = np.asarray(replace_values(x, m, -1))
    np.testing.assert_allclose(out, [[-1.0, 2.0], [3.0, -1.0]])

    # masked mean over axis 0 with an all-invalid column -> -1 sentinel
    vals = jnp.array([[1.0, 5.0], [3.0, 7.0]])
    mask = jnp.array([[True, False], [True, False]])
    mm = np.asarray(masked_mean(vals, mask, axis=0))
    np.testing.assert_allclose(mm, [2.0, -1.0])


def _np_part_dist(qf, gf):
    # naive [K, Nq, Ng] euclidean part distances
    nq, k, d = qf.shape
    ng = gf.shape[0]
    out = np.zeros((k, nq, ng))
    for p in range(k):
        for i in range(nq):
            for j in range(ng):
                out[p, i, j] = np.linalg.norm(qf[i, p] - gf[j, p])
    return out


def test_bp_distance_no_visibility_matches_naive():
    rng = np.random.default_rng(0)
    qf = rng.random((4, 3, 8)).astype(np.float32)
    gf = rng.random((6, 3, 8)).astype(np.float32)
    ref = _np_part_dist(qf, gf)
    dist, part_dist = compute_distance_matrix_using_bp_features(qf, gf)
    np.testing.assert_allclose(np.asarray(part_dist), ref, atol=2e-2)
    np.testing.assert_allclose(np.asarray(dist), ref.mean(axis=0), atol=2e-2)


def test_bp_distance_boolean_visibility():
    rng = np.random.default_rng(1)
    qf = rng.random((3, 2, 4)).astype(np.float32)
    gf = rng.random((5, 2, 4)).astype(np.float32)
    q_vis = np.array([[True, True], [True, False], [False, False]])
    g_vis = np.array([[True, True]] * 5)
    dist, part_dist = compute_distance_matrix_using_bp_features(
        qf, gf, q_vis, g_vis)
    dist = np.asarray(dist)
    ref = _np_part_dist(qf, gf)
    # query 0: both parts visible -> mean of both part dists
    np.testing.assert_allclose(dist[0], ref[:, 0].mean(axis=0), atol=2e-2)
    # query 1: only part 0 -> distance equals part-0 distance
    np.testing.assert_allclose(dist[1], ref[0, 1], atol=2e-2)
    # query 2: nothing visible -> pushed past every valid distance
    assert (dist[2] > dist[:2].max()).all()


def test_bp_distance_continuous_visibility():
    rng = np.random.default_rng(2)
    qf = rng.random((3, 2, 4)).astype(np.float32)
    gf = rng.random((4, 2, 4)).astype(np.float32)
    q_vis = rng.random((3, 2)).astype(np.float32)
    g_vis = rng.random((4, 2)).astype(np.float32)
    dist, _ = compute_distance_matrix_using_bp_features(qf, gf, q_vis, g_vis)
    ref = _np_part_dist(qf, gf)
    w = np.sqrt(q_vis.T[:, :, None] * g_vis.T[:, None, :])
    expected = (ref * w).sum(0) / w.sum(0)
    np.testing.assert_allclose(np.asarray(dist), expected, atol=2e-2)


def test_bp_distance_cosine_metric_oracle():
    """metric='cosine' through the part-based path: the reference's
    cosine branch is ``1 - qf @ gf.T`` on the RAW features — callers
    are expected to pass L2-normalized embeddings (engine
    normalize_feature), there is no in-kernel normalization
    (reference distance.py:237-239)."""
    rng = np.random.default_rng(9)
    qf = rng.random((3, 2, 5)).astype(np.float32)
    gf = rng.random((4, 2, 5)).astype(np.float32)
    qf /= np.linalg.norm(qf, axis=-1, keepdims=True)
    gf /= np.linalg.norm(gf, axis=-1, keepdims=True)
    q_vis = np.ones((3, 2), bool)
    g_vis = np.ones((4, 2), bool)
    dist, part_dist = compute_distance_matrix_using_bp_features(
        qf, gf, q_vis, g_vis, metric='cosine')
    ref = np.zeros((2, 3, 4))
    for p in range(2):
        ref[p] = 1.0 - qf[:, p] @ gf[:, p].T
    np.testing.assert_allclose(np.asarray(part_dist), ref, atol=2e-2)
    np.testing.assert_allclose(np.asarray(dist), ref.mean(axis=0),
                               atol=2e-2)


def test_bp_distance_max_combine_oracle():
    """dist_combine_strat='max' vs a literal transcription of the
    reference's max path (distance.py:151-154,173-177): invalid pairs
    -> -1, max over the parts axis, then the global -1 -> max+1
    replacement."""
    rng = np.random.default_rng(7)
    qf = rng.random((4, 3, 6)).astype(np.float32)
    gf = rng.random((5, 3, 6)).astype(np.float32)
    q_vis = rng.random((4, 3)) > 0.3
    g_vis = rng.random((5, 3)) > 0.3
    q_vis[2] = False                       # an all-invisible query row
    dist, part_dist = compute_distance_matrix_using_bp_features(
        qf, gf, q_vis, g_vis, dist_combine_strat='max')
    ref = _np_part_dist(qf, gf)            # [K, Nq, Ng]
    valid = q_vis.T[:, :, None] & g_vis.T[:, None, :]
    ref_masked = np.where(valid, ref, -1.0)
    combined = ref_masked.max(axis=0)
    max_value = ref_masked.max() + 1
    expected = np.where(combined == -1.0, max_value, combined)
    expected_parts = np.where(ref_masked == -1.0, max_value, ref_masked)
    np.testing.assert_allclose(np.asarray(dist), expected, atol=2e-2)
    np.testing.assert_allclose(np.asarray(part_dist), expected_parts,
                               atol=2e-2)


def test_bp_distance_chunked_equals_fused():
    rng = np.random.default_rng(3)
    qf = rng.random((4, 3, 8)).astype(np.float32)
    gf = rng.random((11, 3, 8)).astype(np.float32)
    q_vis = rng.random((4, 3)) > 0.3
    g_vis = rng.random((11, 3)) > 0.3
    d_full, pd_full = compute_distance_matrix_using_bp_features(
        qf, gf, q_vis, g_vis)
    d_chunk, pd_chunk = compute_distance_matrix_using_bp_features(
        qf, gf, q_vis, g_vis, batch_size_pairwise_dist_matrix=4)
    # the max+1 sentinel differs between block/full paths only through the
    # global max; compare finite structure via rankings instead
    np.testing.assert_allclose(
        np.argsort(np.asarray(d_full), axis=1),
        np.argsort(np.asarray(d_chunk), axis=1))
    np.testing.assert_allclose(
        np.asarray(pd_full), np.asarray(pd_chunk), atol=1e-4)
