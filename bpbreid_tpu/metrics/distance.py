"""Global and part-based distance matrices.

TPU-native re-design of the reference distance layer
(reference: torchreid/metrics/distance.py:9-247). Everything is expressed
as batched matmuls (MXU-friendly einsums) over static shapes:

- global distances are a single rank-2 matmul;
- part-based distances are one batched matmul producing the full
  ``[K, Nq, Ng]`` tensor in one XLA op (the reference loops over gallery
  chunks to bound GPU memory; here chunking is optional and expressed
  with ``jax.lax.map`` so the loop is compiled, and the multi-chip path
  shards the gallery axis instead — see ``bpbreid_tpu.parallel``).

Visibility handling follows the reference semantics exactly: pairs with
no mutually-visible part get the ``-1`` sentinel, later replaced by
``max + 1`` so they rank last.
"""
import jax
import jax.numpy as jnp

from bpbreid_tpu.ops.tensortools import masked_mean, replace_values

__all__ = [
    'compute_distance_matrix',
    'euclidean_squared_distance',
    'cosine_distance',
    'compute_distance_matrix_using_bp_features',
]


def euclidean_squared_distance(input1, input2):
    """Pairwise squared euclidean distance between rows. [m,d],[n,d] -> [m,n]."""
    input1 = jnp.asarray(input1)
    input2 = jnp.asarray(input2)
    dot = input1 @ input2.T
    sq1 = jnp.sum(input1 * input1, axis=1, keepdims=True)
    sq2 = jnp.sum(input2 * input2, axis=1, keepdims=True)
    return sq1 - 2.0 * dot + sq2.T


def cosine_distance(input1, input2):
    """1 - cosine similarity between L2-normalized rows."""
    input1 = jnp.asarray(input1)
    input2 = jnp.asarray(input2)
    a = input1 / jnp.maximum(jnp.linalg.norm(input1, axis=1, keepdims=True), 1e-12)
    b = input2 / jnp.maximum(jnp.linalg.norm(input2, axis=1, keepdims=True), 1e-12)
    return 1.0 - a @ b.T


def compute_distance_matrix(input1, input2, metric='euclidean'):
    """Distance matrix between two 2-D feature matrices.

    API mirror of the reference wrapper
    (torchreid/metrics/distance.py:9-49).
    """
    input1 = jnp.asarray(input1)
    input2 = jnp.asarray(input2)
    if input1.ndim != 2 or input2.ndim != 2:
        raise ValueError('Expected 2-D tensors, got {}-D and {}-D'.format(
            input1.ndim, input2.ndim))
    if input1.shape[1] != input2.shape[1]:
        raise ValueError('Feature dims mismatch: {} vs {}'.format(
            input1.shape[1], input2.shape[1]))
    if metric == 'euclidean':
        return euclidean_squared_distance(input1, input2)
    elif metric == 'cosine':
        return cosine_distance(input1, input2)
    raise ValueError('Unknown distance metric: {}'.format(metric))


def _part_dist_matrices(qf, gf, metric='euclidean'):
    """Per-part distance matrices. qf [Nq,K,D], gf [Ng,K,D] -> [K,Nq,Ng].

    One batched matmul over the part axis — MXU-shaped
    (reference kernel: torchreid/metrics/distance.py:222-247).
    """
    # [K, Nq, D] x [K, D, Ng] batched matmul
    dot = jnp.einsum('qkd,gkd->kqg', qf, gf, preferred_element_type=jnp.float32)
    if metric == 'cosine':
        return 1.0 - dot
    q_sq = jnp.sum(qf * qf, axis=-1).T[:, :, None]      # [K, Nq, 1]
    g_sq = jnp.sum(gf * gf, axis=-1).T[:, None, :]      # [K, 1, Ng]
    d2 = jax.nn.relu(q_sq - 2.0 * dot + g_sq)
    return jnp.sqrt(d2)


def _combine(part_dist, valid_mask, strat):
    """Combine [K,Nq,Ng] part distances into [Nq,Ng] with validity masking."""
    if valid_mask is None:
        if strat == 'max':
            return part_dist.max(axis=0), part_dist
        elif strat == 'mean':
            return part_dist.mean(axis=0), part_dist
        raise ValueError('Body parts distance combination strategy "{}" '
                         'not supported'.format(strat))
    if strat == 'max':
        valid_part_dist = replace_values(part_dist, ~valid_mask.astype(bool), -1.0)
        return valid_part_dist.max(axis=0), valid_part_dist
    elif strat == 'mean':
        combined = masked_mean(part_dist, valid_mask, axis=0)
        valid_part_dist = replace_values(part_dist, valid_mask == 0, -1.0)
        return combined, valid_part_dist
    raise ValueError('Body parts distance combination strategy "{}" '
                     'not supported'.format(strat))


def _bp_dist_block(qf, gf, qf_vis, gf_vis, strat, metric):
    """One gallery block of the part-based distance computation."""
    part_dist = _part_dist_matrices(qf, gf, metric)
    if qf_vis is None or gf_vis is None:
        return _combine(part_dist, None, strat)
    if qf_vis.dtype == jnp.bool_ and gf_vis.dtype == jnp.bool_:
        # boolean visibility: a pair is valid iff both sides see the part
        valid = qf_vis.T[:, :, None] & gf_vis.T[:, None, :]     # [K,Nq,Ng]
        return _combine(part_dist, valid, strat)
    # continuous visibility: geometric-mean weights
    # (reference: torchreid/metrics/distance.py:199)
    weights = jnp.sqrt(
        qf_vis.T[:, :, None].astype(part_dist.dtype)
        * gf_vis.T[:, None, :].astype(part_dist.dtype))
    combined = masked_mean(part_dist, weights, axis=0)
    return combined, part_dist


def compute_distance_matrix_using_bp_features(
        qf, gf, qf_parts_visibility=None, gf_parts_visibility=None,
        dist_combine_strat='mean', batch_size_pairwise_dist_matrix=0,
        use_gpu=False, metric='euclidean'):
    """Visibility-weighted part-based query-gallery distance matrix.

    Args:
        qf: query part features ``[Nq, K, D]``.
        gf: gallery part features ``[Ng, K, D]``.
        qf_parts_visibility / gf_parts_visibility: ``[Nq, K]`` / ``[Ng, K]``,
            boolean or continuous in [0, 1]; ``None`` disables filtering.
        dist_combine_strat: 'mean' or 'max'.
        batch_size_pairwise_dist_matrix: if > 0 and the gallery is larger,
            compute in compiled gallery chunks of this size
            (memory-bounded path; 0 = single fused computation).
        use_gpu: accepted for API compatibility, ignored (placement is
            managed by jax).

    Returns:
        ``(pairwise_dist [Nq, Ng], part_pairwise_dist [K, Nq, Ng])`` with
        incomparable pairs pushed to ``max + 1`` (mirrors
        torchreid/metrics/distance.py:87-219).
    """
    del use_gpu
    qf = jnp.asarray(qf)
    gf = jnp.asarray(gf)
    has_vis = qf_parts_visibility is not None and gf_parts_visibility is not None
    if has_vis:
        qf_vis = jnp.asarray(qf_parts_visibility)
        gf_vis = jnp.asarray(gf_parts_visibility)
    else:
        qf_vis = gf_vis = None

    ng = gf.shape[0]
    bs = int(batch_size_pairwise_dist_matrix)
    if bs > 0 and ng > bs:
        pads = (-ng) % bs
        gf_p = jnp.pad(gf, ((0, pads), (0, 0), (0, 0)))
        n_blocks = gf_p.shape[0] // bs
        gf_blocks = gf_p.reshape(n_blocks, bs, *gf.shape[1:])
        if has_vis:
            gv_p = jnp.pad(gf_vis, ((0, pads), (0, 0)))
            gv_blocks = gv_p.reshape(n_blocks, bs, gf_vis.shape[1])

            def block(args):
                g, gv = args
                return _bp_dist_block(qf, g, qf_vis, gv, dist_combine_strat, metric)

            pairwise, part_pairwise = jax.lax.map(block, (gf_blocks, gv_blocks))
        else:
            def block(g):
                return _bp_dist_block(qf, g, None, None, dist_combine_strat, metric)

            pairwise, part_pairwise = jax.lax.map(block, gf_blocks)
        # [n_blocks, Nq, bs] -> [Nq, Ng] ; [n_blocks, K, Nq, bs] -> [K, Nq, Ng]
        pairwise = jnp.concatenate(list(pairwise), axis=-1)[:, :ng]
        part_pairwise = jnp.concatenate(list(part_pairwise), axis=-1)[:, :, :ng]
    else:
        pairwise, part_pairwise = _bp_dist_block(
            qf, gf, qf_vis, gf_vis, dist_combine_strat, metric)

    if has_vis:
        # push incomparable pairs to the end of every ranking
        max_value = part_pairwise.max() + 1.0
        pairwise = replace_values(pairwise, pairwise == -1.0, max_value)
        if qf_vis.dtype == jnp.bool_ and gf_vis.dtype == jnp.bool_:
            part_pairwise = replace_values(
                part_pairwise, part_pairwise == -1.0, max_value)
    return pairwise, part_pairwise
