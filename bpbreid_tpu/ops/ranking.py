"""On-device (jittable) CMC/mAP ranking kernel.

The same vectorized reformulation as ``bpbreid_tpu.metrics.rank`` but in
pure jnp with static shapes, so the whole evaluation (distance matrix →
argsort → masked cumulative statistics) can stay TPU-resident and be
sharded over the gallery axis (see ``bpbreid_tpu.parallel.retrieval``).

Replaces the reference's native Cython ranking kernels
(torchreid/metrics/rank_cylib/rank_cy.pyx:154-241) with an XLA program:
one sort + a handful of cumsums — bandwidth-bound, fused by XLA.
"""
import jax
import jax.numpy as jnp
from functools import partial

__all__ = ['cmc_map']


@partial(jax.jit, static_argnames=('max_rank',))
def cmc_map(distmat, q_pids, g_pids, q_camids, g_camids, max_rank=50):
    """Market-1501-protocol CMC curve and mAP, fully on device.

    Args:
        distmat: ``[Q, G]`` query-gallery distances.
        q_pids, q_camids: ``[Q]`` int ids.
        g_pids, g_camids: ``[G]`` int ids.
        max_rank: static CMC length.

    Returns:
        ``(cmc [max_rank], mAP scalar, num_valid_q scalar)``.
    """
    num_g = distmat.shape[1]
    order = jnp.argsort(distmat, axis=1)                    # [Q, G]
    pids_sorted = jnp.take(g_pids, order)
    cams_sorted = jnp.take(g_camids, order)
    matches = pids_sorted == q_pids[:, None]
    keep = ~(matches & (cams_sorted == q_camids[:, None]))

    mk = matches & keep
    pos = jnp.cumsum(keep, axis=1) - 1
    cum_matches = jnp.cumsum(mk, axis=1)
    num_rel = cum_matches[:, -1]
    valid_q = num_rel > 0

    prec = jnp.where(mk, cum_matches / (pos + 1.0), 0.0)
    ap = prec.sum(axis=1) / jnp.maximum(num_rel, 1)

    first_match = jnp.where(mk, pos, num_g).min(axis=1)
    ranks = jnp.arange(max_rank)[None, :]
    cmc_per_q = (first_match[:, None] <= ranks).astype(jnp.float32)

    n_valid = valid_q.sum()
    cmc = (cmc_per_q * valid_q[:, None]).sum(axis=0) / jnp.maximum(n_valid, 1)
    mAP = (ap * valid_q).sum() / jnp.maximum(n_valid, 1)
    return cmc, mAP, n_valid
