"""Pair-distance distribution statistics + SSMD
(reference: torchreid/utils/distribution.py:10-55)."""
import numpy as np

__all__ = ['pairs_distance_distribution', 'compute_ssmd',
           'plot_pairs_distance_distribution']


def pairs_distance_distribution(distmat, q_pids, g_pids):
    """Mean/std of positive-pair and negative-pair distances."""
    distmat = np.asarray(distmat)
    same = np.asarray(q_pids)[:, None] == np.asarray(g_pids)[None, :]
    pos = distmat[same]
    neg = distmat[~same]
    return (float(pos.mean()) if pos.size else 0.0,
            float(pos.std()) if pos.size else 0.0,
            float(neg.mean()) if neg.size else 0.0,
            float(neg.std()) if neg.size else 0.0)


def compute_ssmd(pos_mean, pos_std, neg_mean, neg_std):
    """Strictly standardized mean difference between the positive and
    negative pair-distance distributions (reference: distribution.py:47-55).

    Unsigned, like the reference. The denominator uses the textbook
    sqrt(var_pos + var_neg) — the reference divides by the raw variance
    sum (distribution.py:52), a unit inconsistency we deliberately fix;
    values therefore differ from the reference by that sqrt."""
    denom = np.sqrt(pos_std ** 2 + neg_std ** 2)
    return float(abs(neg_mean - pos_mean) / denom) if denom > 0 else 0.0


def plot_pairs_distance_distribution(distmat, q_pids, g_pids, title=''):
    """Returns (pos_mean, pos_std, neg_mean, neg_std, ssmd); plotting goes
    through the Logger when enabled."""
    pm, ps, nm, ns = pairs_distance_distribution(distmat, q_pids, g_pids)
    return pm, ps, nm, ns, compute_ssmd(pm, ps, nm, ns)
