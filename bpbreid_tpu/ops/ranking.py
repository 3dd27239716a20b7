"""On-device (jittable) CMC/mAP ranking kernels.

``cmc_map``: the same vectorized reformulation as
``bpbreid_tpu.metrics.rank`` but in pure jnp with static shapes — one
full argsort + masked cumulative statistics.

``cmc_map_counting``: sort-free large-gallery variant. A full per-query
argsort of a 500k-distractor gallery dominates retrieval time (~3.3 s
per 256-query chunk on v5e); but CMC/mAP only need the ranks of the TRUE
matches, and the rank of a match is just a *count* — the number of kept
gallery entries strictly closer (with index tie-break, exactly the
stable-sort order). So: top_k the ≤``max_matches`` match distances,
then one blocked pass over the distance matrix counts, per match, how
many kept entries precede it. O(Q·G·max_matches) vectorized compares
instead of O(Q·G·log G) sorting — ~40x faster at G=500k, and trivially
shardable over the gallery axis (counts are sums).

Both replace the reference's native Cython ranking kernels
(torchreid/metrics/rank_cylib/rank_cy.pyx:154-241) with XLA programs.
"""
import jax
import jax.numpy as jnp
from functools import partial

__all__ = ['cmc_map', 'cmc_map_counting']


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


@partial(jax.jit, static_argnames=('max_rank', 'max_matches', 'block'))
def cmc_map_counting(distmat, q_pids, g_pids, q_camids, g_camids,
                     max_rank=50, max_matches=64, block=8192):
    """Sort-free Market-1501-protocol CMC/mAP (see module docstring).

    Identical results to ``cmc_map`` whenever every query has at most
    ``max_matches`` true (non-junk) gallery matches; queries beyond that
    have their AP truncated to the closest ``max_matches`` matches — the
    4th return value counts such queries so callers can fall back.

    Args:
        distmat: ``[Q, G]`` query-gallery distances.
        max_matches: static cap on true matches per query.
        block: gallery block size for the counting scan.

    Returns:
        ``(cmc [max_rank], mAP scalar, num_valid_q, num_overflow_q)``.
    """
    num_q, num_g = distmat.shape
    max_matches = min(max_matches, num_g)     # tiny galleries
    # bound the [Q, block, max_matches] compare tile to ~2^27 elements
    # so the scan body stays comfortably on-chip at any query count
    block = max(256, min(block, (1 << 27) // max(1, num_q * max_matches)))
    distmat = distmat.astype(jnp.float32)
    same = g_pids[None, :] == q_pids[:, None]                   # [Q, G]
    junk = same & (g_camids[None, :] == q_camids[:, None])
    keep = ~junk
    match = same & keep
    num_rel = match.sum(axis=1)                                 # [Q]
    valid_q = num_rel > 0
    n_overflow = (num_rel > max_matches).sum()

    # the ≤max_matches closest matches per query (distance + gallery idx)
    neg = jnp.where(match, -distmat, -jnp.inf)
    md_neg, midx = jax.lax.top_k(neg, max_matches)              # [Q, M]
    mdist = -md_neg
    mvalid = jnp.isfinite(mdist)

    # rank of each match among kept entries = #{k kept : d_k < d_m or
    # (d_k == d_m and k < idx_m)} — the stable-sort position. Counted in
    # gallery blocks so the [Q, B, M] compare tensor stays small.
    pad = (-num_g) % block
    d_p = jnp.pad(distmat, ((0, 0), (0, pad)),
                  constant_values=jnp.inf)                      # [Q, Gp]
    k_p = jnp.pad(keep, ((0, 0), (0, pad)))
    n_blocks = d_p.shape[1] // block
    d_blocks = d_p.reshape(num_q, n_blocks, block).transpose(1, 0, 2)
    k_blocks = k_p.reshape(num_q, n_blocks, block).transpose(1, 0, 2)
    idx_blocks = (jnp.arange(n_blocks)[:, None] * block
                  + jnp.arange(block)[None, :])                 # [nB, B]

    def body(counts, blk):
        d_b, k_b, i_b = blk                                     # [Q,B],[Q,B],[B]
        less = (d_b[:, :, None] < mdist[:, None, :]) \
            | ((d_b[:, :, None] == mdist[:, None, :])
               & (i_b[None, :, None] < midx[:, None, :]))
        counts = counts + jnp.sum(less & k_b[:, :, None], axis=1,
                                  dtype=jnp.int32)
        return counts, None

    counts0 = jnp.zeros((num_q, max_matches), jnp.int32)
    counts, _ = jax.lax.scan(body, counts0,
                             (d_blocks, k_blocks, idx_blocks))

    # per query: match ranks ascending; precision at the i-th closest
    # match is (i+1)/(rank_i+1)
    ranks_m = jnp.sort(jnp.where(mvalid, counts, jnp.iinfo(jnp.int32).max),
                       axis=1)                                  # [Q, M]
    i = jnp.arange(max_matches)[None, :]
    prec = jnp.where(mvalid, (i + 1.0) / (ranks_m + 1.0), 0.0)
    ap = prec.sum(axis=1) / jnp.maximum(num_rel, 1)

    first = jnp.where(valid_q, ranks_m[:, 0], num_g)
    cmc_per_q = (first[:, None] <= jnp.arange(max_rank)[None, :]
                 ).astype(jnp.float32)

    n_valid = valid_q.sum()
    cmc = (cmc_per_q * valid_q[:, None]).sum(axis=0) / jnp.maximum(n_valid, 1)
    mAP = (ap * valid_q).sum() / jnp.maximum(n_valid, 1)
    return cmc, mAP, n_valid, n_overflow
