"""Literal per-query transcriptions of the reference ranking protocols
(torchreid/metrics/rank.py:17-159), kept ONLY as test oracles for the
vectorized/native implementations — following the reference's own
oracle strategy (rank_cylib/test_cython.py). Not part of the package.
"""
from collections import defaultdict

import numpy as np


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


def eval_cuhk03_loop(distmat, q_pids, g_pids, q_camids, g_camids, max_rank,
                     num_repeats=10, rng=None):
    """Literal per-query transcription of the reference cuhk03 protocol
    (torchreid/metrics/rank.py:17-94) — kept as the test oracle."""
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
