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

The literal per-query transcriptions of the reference algorithms live
in ``tests/rank_oracles.py`` (test-only correctness oracles, following
the reference's own strategy: rank_cylib/test_cython.py) — they are not
part of the shipped package.
"""
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
    with np.errstate(invalid='ignore', divide='ignore'):
        prec = np.where(mk, cum_matches / (pos + 1.0), 0.0)
        ap = prec.sum(axis=1) / np.maximum(num_rel, 1)

    # CMC: rank (among kept) of the first true match
    first_match = np.where(mk, pos, num_g).min(axis=1)      # [Q]
    ranks = np.arange(max_rank)[None, :]
    cmc_per_q = (first_match[:, None] <= ranks).astype(np.float32)

    cmc = cmc_per_q[valid_q].sum(axis=0) / valid_q.sum()
    mAP = float(ap[valid_q].mean())
    return {'cmc': cmc.astype(np.float32), 'mAP': mAP}


def eval_cuhk03(distmat, q_pids, g_pids, q_camids, g_camids, max_rank,
                num_repeats=10, rng=None):
    """CUHK03 protocol: single-gallery-shot, resampled ``num_repeats``
    times (reference: torchreid/metrics/rank.py:17-94). Vectorized —
    no per-query Python loop.

    Key reformulation: sampling one gallery instance per (query, pid)
    group and ranking the query's true pid within the sampled set only
    needs, per repeat, *which group member is picked* (uniform) and
    *how many other groups' picks precede the true group's pick*. The
    kept entries are laid out contiguously by (query, pid) group once
    — a single radix sort of composite integer keys — after which each
    repeat is one uniform draw per GROUP (an offset gather into the
    layout) and one ``bincount``, instead of num_q × num_pids
    Python-level ``np.random.choice`` calls.

    Deterministic: ``rng`` defaults to a fixed-seed generator so
    repeated evaluations of the same run agree (the reference relies on
    the globally seeded ``np.random`` via set_random_seed,
    torchreid/scripts/main.py:231).
    """
    rng = np.random.default_rng(0) if rng is None else rng
    distmat = np.asarray(distmat)
    q_pids, g_pids = np.asarray(q_pids), np.asarray(g_pids)
    q_camids, g_camids = np.asarray(q_camids), np.asarray(g_camids)
    num_q, num_g = distmat.shape
    max_rank = min(max_rank, num_g)

    # dense pid ids so (query, pid, position) packs into one int64 key
    uq_pids = np.unique(g_pids)
    num_p = len(uq_pids)
    g_pid_dense = np.searchsorted(uq_pids, g_pids)

    indices = np.argsort(distmat, axis=1)
    pd_sorted = g_pid_dense[indices]
    matches = uq_pids[pd_sorted] == q_pids[:, None]
    keep = ~(matches & (g_camids[indices] == q_camids[:, None]))

    mk = matches & keep
    valid_q = mk.any(axis=1)
    if not np.any(valid_q):
        raise RuntimeError(
            'Error: all query identities do not appear in gallery')

    # --- AP: full kept set, same cumsum machinery as market1501 ---
    pos = np.cumsum(keep, axis=1, dtype=np.int32) - 1
    cum_matches = np.cumsum(mk, axis=1, dtype=np.int32)
    num_rel = cum_matches[:, -1]
    with np.errstate(invalid='ignore', divide='ignore'):
        prec = np.where(mk, cum_matches / (pos + 1.0), 0.0)
    ap = prec.sum(axis=1) / np.maximum(num_rel, 1)

    # --- CMC: lay kept entries contiguously by (query, pid) group.
    # One radix sort of (q·P + pid)·G + j composite keys replaces a
    # 3-key lexsort; q/pid/position unpack back out arithmetically.
    qk, jk = np.nonzero(keep)
    key = (qk * num_p + pd_sorted[qk, jk]) * num_g + jk
    key = np.sort(key, kind='stable')           # radix for integer keys
    group_key = key // num_g                     # q·P + pid per entry
    jk = key % num_g
    del key
    new_group = np.empty(len(jk), bool)
    new_group[0] = True
    new_group[1:] = group_key[1:] != group_key[:-1]
    seg_starts = np.flatnonzero(new_group)
    seg_lens = np.diff(np.append(seg_starts, len(jk)))
    group_q = group_key[seg_starts] // num_p     # query id of each group
    group_true = uq_pids[group_key[seg_starts] % num_p] == q_pids[group_q]
    n_groups = np.bincount(group_q, minlength=num_q)
    # index of each query's true-pid group (valid queries have exactly one)
    true_group = np.full(num_q, -1, np.int64)
    true_group[group_q[group_true]] = np.flatnonzero(group_true)

    cmc = np.zeros((num_q, max_rank), np.float64)
    ranks_row = np.arange(max_rank)[None, :]
    vq = np.flatnonzero(valid_q)
    for _ in range(num_repeats):
        u = (rng.random(len(seg_starts)) * seg_lens).astype(np.int64)
        picked = jk[seg_starts + u]                 # uniform pick per group
        true_pos = picked[true_group[group_q]]      # per group: its query's
        precedes = picked < true_pos                # true pick position
        rank_of_true = np.bincount(
            group_q, weights=precedes, minlength=num_q)
        cmc += (rank_of_true[:, None] <= ranks_row) \
            & (ranks_row < n_groups[:, None])
    cmc /= num_repeats

    cmc_mean = cmc[vq].sum(axis=0) / len(vq)
    return {'cmc': cmc_mean.astype(np.float32), 'mAP': float(ap[vq].mean())}


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
        # the vectorized numpy path stays the default: its fixed-seed
        # sampling stream is identical on every host, while the native
        # kernel (native/rank.py eval_cuhk03 — same speed class) uses
        # its own counter-based stream
        return eval_cuhk03(distmat, q_pids, g_pids, q_camids, g_camids, max_rank)
    raise ValueError("Incorrect eval_metric value '{}'".format(eval_metric))
