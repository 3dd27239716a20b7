"""Part-based batch-hard triplet losses (jit-safe, fully masked).

Rebuild of the reference triplet family
(reference: torchreid/losses/part_averaged_triplet_loss.py:10-224 and
the 6 combination-strategy subclasses). The reference mines hard
triplets with boolean indexing (``hardest_dist[valid_triplets_mask]``,
part_averaged_triplet_loss.py:159) which is shape-dynamic; here the
whole computation is reformulated with additive masks and masked means
so it traces once under jit with static shapes:

- incomparable pairs carry the ``-1`` sentinel ([K,N,N] dist entries);
- invalid positives are pushed to ``-1`` before the max, invalid
  negatives to ``+max`` before the min;
- anchors without a valid (positive, negative) pair are excluded from
  the final mean by a validity mask instead of fancy indexing.

All seven named strategies of the reference registry are provided.
"""
from functools import partial

import jax
import jax.numpy as jnp

from bpbreid_tpu.ops.tensortools import masked_mean, replace_values

__all__ = [
    'part_based_pairwise_distance_matrix', 'hard_mine_triplet_loss',
    'PartAveragedTripletLoss', 'PartMaxTripletLoss', 'PartMinTripletLoss',
    'PartMaxMinTripletLoss', 'PartRandomMaxMinTripletLoss',
    'PartIndividualTripletLoss', 'InterPartsTripletLoss', 'TripletLoss',
    'init_part_based_triplet_loss',
]

_MAX = 1e16   # stand-in for finfo.max that stays finite in bf16/f32 math


def part_based_pairwise_distance_matrix(embeddings, squared=False,
                                        epsilon=1e-16):
    """[K, N, D] -> [K, N, N] euclidean distances via the matmul identity
    (reference: part_averaged_triplet_loss.py:77-93)."""
    dot = jnp.einsum('knd,kmd->knm', embeddings, embeddings,
                     preferred_element_type=jnp.float32)
    sq = jnp.einsum('knd,knd->kn', embeddings, embeddings,
                    preferred_element_type=jnp.float32)
    d2 = jax.nn.relu(sq[:, :, None] - 2.0 * dot + sq[:, None, :])
    if squared:
        return d2
    zero = d2 == 0
    return jnp.sqrt(d2 + zero * epsilon) * (1 - zero)


def _anchor_positive_mask(labels):
    n = labels.shape[0]
    eq = labels[None, :] == labels[:, None]
    return eq & ~jnp.eye(n, dtype=bool)


def _anchor_negative_mask(labels):
    return labels[None, :] != labels[:, None]


def hard_mine_triplet_loss(batch_pairwise_dist, labels, margin=0.3,
                           hard_margin=True):
    """Masked batch-hard triplet loss over [K, N, N] distances.

    ``-1`` entries mark incomparable pairs. Returns
    ``(loss, trivial_triplets_ratio, valid_triplets_ratio)``
    (reference: part_averaged_triplet_loss.py:95-195).
    """
    dist = batch_pairwise_dist
    valid = dist != -1.0

    pos_mask = _anchor_positive_mask(labels)[None] & valid
    hardest_pos = jnp.max(dist * pos_mask - (~pos_mask).astype(dist.dtype),
                          axis=-1)                               # [K, N]
    neg_mask = _anchor_negative_mask(labels)[None] & valid
    hardest_neg = jnp.min(dist * neg_mask + (~neg_mask).astype(dist.dtype) * _MAX,
                          axis=-1)                               # [K, N]

    valid_triplets = (hardest_pos != -1.0) & (hardest_neg != _MAX)  # [K, N]
    n_valid = valid_triplets.sum()

    if hard_margin and margin > 0:
        per_anchor = jax.nn.relu(hardest_pos - hardest_neg + margin)
    else:
        # soft margin: log(1 + exp(pos - neg)) (softplus), reference :182-195
        per_anchor = jax.nn.softplus(hardest_pos - hardest_neg)

    per_anchor = per_anchor * valid_triplets
    loss = per_anchor.sum() / jnp.maximum(n_valid, 1)
    trivial = ((per_anchor == 0.0) & valid_triplets).sum() / jnp.maximum(n_valid, 1)
    valid_ratio = valid_triplets.mean()
    return loss, trivial, valid_ratio


def _visibility_pair_mask(parts_visibility):
    """[N, K] visibility -> [K, N, N] pair validity/weights
    (bool -> AND; continuous -> sqrt of product)."""
    v = parts_visibility.T                                  # [K, N]
    if v.dtype == jnp.bool_:
        return (v[:, :, None] & v[:, None, :])
    return jnp.sqrt(v[:, :, None] * v[:, None, :])


class PartAveragedTripletLoss:
    """Mean-combined part distances -> single batch-hard loss
    (the GiLt paper's default)."""

    def __init__(self, margin=0.3, epsilon=1e-16, writer=None):
        self.margin = margin
        self.epsilon = epsilon
        self.writer = writer

    def combine(self, part_dist, valid_mask, labels, rng=None):
        if valid_mask is not None:
            return masked_mean(part_dist, valid_mask, axis=0)[None]
        return part_dist.mean(axis=0)[None]

    def __call__(self, part_based_embeddings, labels, parts_visibility=None,
                 rng=None):
        """
        Args:
            part_based_embeddings: ``[N, K, D]``.
            labels: ``[N]`` int person ids.
            parts_visibility: ``[N, K]`` bool or float, optional.
        Returns:
            ``(loss, trivial_triplets_ratio, valid_triplets_ratio)``.
        """
        emb = jnp.transpose(part_based_embeddings, (1, 0, 2))   # [K, N, D]
        part_dist = part_based_pairwise_distance_matrix(
            emb, epsilon=self.epsilon)
        valid_mask = None
        if parts_visibility is not None:
            valid_mask = _visibility_pair_mask(parts_visibility)
        pairwise = self.combine(part_dist, valid_mask, labels, rng)
        if self.writer is not None:
            self.writer.update_invalid_pairwise_distances_count(pairwise)
        return hard_mine_triplet_loss(pairwise, labels, self.margin,
                                      hard_margin=self.margin > 0)


class PartMaxTripletLoss(PartAveragedTripletLoss):
    def combine(self, part_dist, valid_mask, labels, rng=None):
        if valid_mask is not None:
            part_dist = replace_values(part_dist, valid_mask == 0, -1.0)
        return part_dist.max(axis=0)[None]


class PartMinTripletLoss(PartAveragedTripletLoss):
    def combine(self, part_dist, valid_mask, labels, rng=None):
        if valid_mask is not None:
            d = replace_values(part_dist, valid_mask == 0, _MAX)
            out = d.min(axis=0)
            invalid = (valid_mask != 0).sum(axis=0) == 0
            return replace_values(out, invalid, -1.0)[None]
        return part_dist.min(axis=0)[None]


class PartMaxMinTripletLoss(PartAveragedTripletLoss):
    """max-combine for positive pairs / min-combine for negatives
    (reference: part_max_min_triplet_loss.py:15-46)."""

    def combine(self, part_dist, valid_mask, labels, rng=None):
        if valid_mask is not None:
            d_max = replace_values(part_dist, valid_mask == 0, -1.0)
            d_min = replace_values(part_dist, valid_mask == 0, _MAX)
        else:
            d_max = d_min = part_dist
        mx = d_max.max(axis=0)
        mn = d_min.min(axis=0)
        eq = labels[None, :] == labels[:, None]
        out = jnp.where(eq, mx, mn)
        if valid_mask is not None:
            invalid = (valid_mask != 0).sum(axis=0) == 0
            out = replace_values(out, invalid, -1.0)
        return out[None]


class PartRandomMaxMinTripletLoss(PartMaxMinTripletLoss):
    """Random 50% pair-entry dropout then max/min combine
    (reference: part_random_max_min_triplet_loss.py:15-46)."""

    def combine(self, part_dist, valid_mask, labels, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        keep = jax.random.uniform(rng, part_dist.shape) > 0.5
        if valid_mask is None:
            valid_mask = keep
        elif valid_mask.dtype == jnp.bool_:
            valid_mask = valid_mask & keep
        else:
            valid_mask = valid_mask * keep
        return PartMaxMinTripletLoss.combine(self, part_dist, valid_mask,
                                             labels)


class PartIndividualTripletLoss(PartAveragedTripletLoss):
    """K independent batch-hard losses ('intra_parts')
    (reference: part_individual_triplet_loss.py:24-33)."""

    def combine(self, part_dist, valid_mask, labels, rng=None):
        if valid_mask is not None:
            part_dist = replace_values(part_dist, valid_mask == 0, -1.0)
        return part_dist


class InterPartsTripletLoss:
    """Cross-part embedding space: every (sample, part) is its own
    embedding; positives share id AND part, negatives differ in id
    (reference: inter_parts_triplet_loss.py:12-60)."""

    def __init__(self, margin=0.3, epsilon=1e-16, writer=None):
        self.margin = margin
        self.epsilon = epsilon

    def __call__(self, part_based_embeddings, labels, parts_visibility=None,
                 rng=None):
        n, k, d = part_based_embeddings.shape
        # [K*N, D] with part-major layout (matches reference flatten of [K,N,D])
        flat = jnp.transpose(part_based_embeddings, (1, 0, 2)).reshape(k * n, d)
        dist = part_based_pairwise_distance_matrix(flat[None],
                                                   epsilon=self.epsilon)[0]
        ids = jnp.tile(labels, k)                       # [K*N]
        parts = jnp.repeat(jnp.arange(k), n)            # [K*N]
        same_id = ids[None, :] == ids[:, None]
        same_part = parts[None, :] == parts[:, None]
        pos_mask = same_id & same_part & ~jnp.eye(k * n, dtype=bool)
        neg_mask = ~same_id
        hardest_pos = jnp.max(dist * pos_mask - (~pos_mask) * 1.0, axis=-1)
        hardest_neg = jnp.min(dist * neg_mask + (~neg_mask) * _MAX, axis=-1)
        valid = (hardest_pos != -1.0) & (hardest_neg != _MAX)
        per = jax.nn.relu(hardest_pos - hardest_neg + self.margin) * valid
        n_valid = jnp.maximum(valid.sum(), 1)
        loss = per.sum() / n_valid
        trivial = ((per == 0.0) & valid).sum() / n_valid
        return loss, trivial, valid.mean()


class TripletLoss:
    """Classic global batch-hard triplet loss
    (reference: hard_mine_triplet_loss.py:5-57)."""

    def __init__(self, margin=0.3):
        self.margin = margin

    def __call__(self, inputs, targets):
        dot = inputs @ inputs.T
        sq = jnp.sum(inputs * inputs, axis=1)
        d2 = sq[:, None] - 2.0 * dot + sq[None, :]
        dist = jnp.sqrt(jnp.clip(d2, 1e-12, None))
        pos_mask = targets[None, :] == targets[:, None]
        neg_mask = ~pos_mask
        dist_ap = jnp.max(dist * pos_mask, axis=-1)
        dist_an = jnp.min(dist * neg_mask + pos_mask * _MAX, axis=-1)
        return jnp.mean(jax.nn.relu(dist_ap - dist_an + self.margin))


_body_parts_losses = {
    'part_averaged_triplet_loss': PartAveragedTripletLoss,
    'part_max_triplet_loss': PartMaxTripletLoss,
    'part_min_triplet_loss': PartMinTripletLoss,
    'part_max_min_triplet_loss': PartMaxMinTripletLoss,
    'part_random_max_min_triplet_loss': PartRandomMaxMinTripletLoss,
    'inter_parts_triplet_loss': InterPartsTripletLoss,
    'intra_parts_triplet_loss': PartIndividualTripletLoss,
}


def init_part_based_triplet_loss(name, **kwargs):
    """Registry lookup (reference: losses/__init__.py:24-36)."""
    if name not in _body_parts_losses:
        raise ValueError('Invalid loss name. Received "{}", but expected one '
                         'of {}'.format(name, sorted(_body_parts_losses)))
    return _body_parts_losses[name](**kwargs)
