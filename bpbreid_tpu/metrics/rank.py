"""CMC / mAP ranking evaluation.

Three implementations with identical semantics:

1. ``eval_market1501`` — fully vectorized numpy (no per-query Python
   loop): the junk-removal + cumulative statistics are reformulated as
   masked cumsums over the sorted gallery axis. This replaces both the
   reference's Python loop (torchreid/metrics/rank.py:97-159) and its
   Cython port (torchreid/metrics/rank_cylib/rank_cy.pyx:154-241).
2. a native C++ kernel (``bpbreid_tpu.native``), the analogue of the
   reference's only native component, used automatically when built.
3. a jittable on-device version in ``bpbreid_tpu.ops.ranking`` used for
   TPU-resident / gallery-sharded evaluation.

``eval_market1501_loop`` keeps a literal transcription of the reference
per-query algorithm as the correctness oracle for tests (the reference's
own test strategy: rank_cylib/test_cython.py).
"""
from collections import defaultdict

import numpy as np

__all__ = ['evaluate_rank', 'eval_market1501', 'eval_cuhk03']


def _sorted_stats(distmat, q_pids, g_pids, q_camids, g_camids):
    indices = np.argsort(distmat, axis=1)
    pids_sorted = g_pids[indices]
    matches = pids_sorted == q_pids[:, None]
    remove = matches & (g_camids[indices] == q_camids[:, None])
    keep = ~remove
    return matches, keep


def eval_market1501(distmat, q_pids, g_pids, q_camids, g_camids, max_rank):
    """Market-1501 protocol: same-(pid, camid) gallery entries are junk.

    Vectorized over all queries. Matches the reference implementation
    (torchreid/metrics/rank.py:97-159) bit-for-bit on its outputs.
    """
    num_q, num_g = distmat.shape
    max_rank = min(max_rank, num_g)
    matches, keep = _sorted_stats(
        distmat, np.asarray(q_pids), np.asarray(g_pids),
        np.asarray(q_camids), np.asarray(g_camids))

    mk = matches & keep                                     # kept true matches
    # position of each sorted entry among the kept entries of its query row
    pos = np.cumsum(keep, axis=1) - 1                       # [Q, G]
    cum_matches = np.cumsum(mk, axis=1)
    num_rel = cum_matches[:, -1]
    valid_q = num_rel > 0
    if not np.any(valid_q):
        raise RuntimeError(
            'Error: all query identities do not appear in gallery')

    # AP: precision at each kept-match position, averaged over matches
    prec = np.where(mk, cum_matches / (pos + 1.0), 0.0)
    with np.errstate(invalid='ignore', divide='ignore'):
        ap = prec.sum(axis=1) / np.maximum(num_rel, 1)

    # CMC: rank (among kept) of the first true match
    first_match = np.where(mk, pos, num_g).min(axis=1)      # [Q]
    ranks = np.arange(max_rank)[None, :]
    cmc_per_q = (first_match[:, None] <= ranks).astype(np.float32)

    cmc = cmc_per_q[valid_q].sum(axis=0) / valid_q.sum()
    mAP = float(ap[valid_q].mean())
    return {'cmc': cmc.astype(np.float32), 'mAP': mAP}


def eval_market1501_loop(distmat, q_pids, g_pids, q_camids, g_camids, max_rank):
    """Literal per-query oracle of the market1501 protocol (test reference)."""
    num_q, num_g = distmat.shape
    max_rank = min(max_rank, num_g)
    indices = np.argsort(distmat, axis=1)
    all_cmc, all_ap, num_valid_q = [], [], 0
    for q_idx in range(num_q):
        order = indices[q_idx]
        remove = (g_pids[order] == q_pids[q_idx]) & (g_camids[order] == q_camids[q_idx])
        raw_cmc = (g_pids[order] == q_pids[q_idx])[~remove].astype(np.int64)
        if not np.any(raw_cmc):
            continue
        cmc = raw_cmc.cumsum()
        cmc[cmc > 1] = 1
        all_cmc.append(cmc[:max_rank])
        num_valid_q += 1
        num_rel = raw_cmc.sum()
        tmp = raw_cmc.cumsum() / np.arange(1, raw_cmc.size + 1) * raw_cmc
        all_ap.append(tmp.sum() / num_rel)
    assert num_valid_q > 0
    cmc = np.asarray(all_cmc, dtype=np.float32).sum(0) / num_valid_q
    return {'cmc': cmc, 'mAP': float(np.mean(all_ap))}


def eval_cuhk03(distmat, q_pids, g_pids, q_camids, g_camids, max_rank,
                num_repeats=10, rng=None):
    """CUHK03 protocol: single-gallery-shot, resampled ``num_repeats`` times
    (reference: torchreid/metrics/rank.py:17-94)."""
    rng = np.random.default_rng() if rng is None else rng
    num_q, num_g = distmat.shape
    max_rank = min(max_rank, num_g)
    indices = np.argsort(distmat, axis=1)
    all_cmc, all_ap, num_valid_q = [], [], 0
    for q_idx in range(num_q):
        order = indices[q_idx]
        remove = (g_pids[order] == q_pids[q_idx]) & (g_camids[order] == q_camids[q_idx])
        keep = ~remove
        raw_cmc = (g_pids[order] == q_pids[q_idx])[keep].astype(np.int64)
        if not np.any(raw_cmc):
            continue
        kept_g_pids = g_pids[order][keep]
        g_pids_dict = defaultdict(list)
        for idx, pid in enumerate(kept_g_pids):
            g_pids_dict[pid].append(idx)
        cmc = np.zeros(max_rank, dtype=np.float64)
        for _ in range(num_repeats):
            mask = np.zeros(len(raw_cmc), dtype=bool)
            for _, idxs in g_pids_dict.items():
                mask[rng.choice(idxs)] = True
            masked = raw_cmc[mask].cumsum()
            masked[masked > 1] = 1
            sub = masked[:max_rank].astype(np.float64)
            cmc[:sub.size] += sub
        all_cmc.append(cmc / num_repeats)
        num_rel = raw_cmc.sum()
        tmp = raw_cmc.cumsum() / np.arange(1, raw_cmc.size + 1) * raw_cmc
        all_ap.append(tmp.sum() / num_rel)
        num_valid_q += 1
    assert num_valid_q > 0, 'Error: all query identities do not appear in gallery'
    cmc = np.asarray(all_cmc, dtype=np.float32).sum(0) / num_valid_q
    return {'cmc': cmc.astype(np.float32), 'mAP': float(np.mean(all_ap))}


def evaluate_rank(distmat, q_pids, g_pids, q_camids, g_camids, max_rank=50,
                  eval_metric='default', q_anns=None, g_anns=None,
                  use_cython=True, use_native=True):
    """Evaluates CMC rank + mAP.

    API mirror of the reference dispatcher
    (torchreid/metrics/rank.py:173-214). ``use_cython`` is accepted for
    compatibility; ``use_native`` selects the C++ kernel when available.
    """
    del q_anns, g_anns, use_cython
    distmat = np.asarray(distmat)
    q_pids = np.asarray(q_pids)
    g_pids = np.asarray(g_pids)
    q_camids = np.asarray(q_camids)
    g_camids = np.asarray(g_camids)
    if eval_metric == 'default':
        if use_native:
            try:
                from bpbreid_tpu.native import rank as native_rank
                if native_rank.is_available():
                    return native_rank.eval_market1501(
                        distmat, q_pids, g_pids, q_camids, g_camids, max_rank)
            except ImportError:
                pass
        return eval_market1501(distmat, q_pids, g_pids, q_camids, g_camids, max_rank)
    elif eval_metric == 'cuhk03':
        return eval_cuhk03(distmat, q_pids, g_pids, q_camids, g_camids, max_rank)
    raise ValueError("Incorrect eval_metric value '{}'".format(eval_metric))
