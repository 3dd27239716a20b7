"""Writer: domain-metrics hub listening to EngineState
(reference: torchreid/utils/writer.py:17-430).

Collects loss summaries, invalid-pair statistics, per-part usage and
phase timings; final timing-table report mirrors writer.py:373-391.
Backend fan-out goes through Logger (utils/logging.py).
"""
import numpy as np

from bpbreid_tpu.utils.avgmeter import AverageMeter, MetricsSummary, TimeMeter
from bpbreid_tpu.utils.engine_state import EngineState, EngineStateListener

__all__ = ['Writer']


class Writer(EngineStateListener):
    _current = None

    def __init__(self, config=None, logger=None):
        self.cfg = config
        self.logger = logger
        self.losses = MetricsSummary()
        self.invalid_pairs_meter = AverageMeter()
        self.used_parts = None
        self.parts_usage = {}
        self.qg_stats = {}
        # phase timers (reference: writer.py:43-52)
        self.total_run_timer = TimeMeter('total run')
        self.epoch_timer = TimeMeter('epoch')
        self.batch_timer = TimeMeter('batch')
        self.data_loading_timer = TimeMeter('data loading')
        self.test_batch_timer = TimeMeter('test batch')
        self.feature_extraction_timer = TimeMeter('feature extraction')
        self.loss_timer = TimeMeter('loss')
        self.optimizer_timer = TimeMeter('optimizer step')
        self.performance_evaluation_timer = TimeMeter('performance evaluation')
        self.eval_results = {}
        state = EngineState.current_engine_state()
        if state is not None:
            state.add_listener(self)
        Writer._current = self

    @classmethod
    def current_writer(cls):
        return cls._current

    # ------------------------------------------------------------------
    def update_invalid_pairwise_distances_count(self, pairwise_dist):
        try:
            arr = np.asarray(pairwise_dist)
            self.invalid_pairs_meter.update(float((arr == -1).mean()))
        except Exception:
            pass

    def update_invalid_part_based_pairwise_distances_count(self, mask):
        try:
            arr = np.asarray(mask)
            self.invalid_pairs_meter.update(float((arr == 0).mean()))
        except Exception:
            pass

    def used_parts_statistics(self, parts_count, part_id):
        """Per-part usage counts during training
        (reference: writer.py used_parts_statistics)."""
        try:
            self.parts_usage[int(part_id)] = \
                self.parts_usage.get(int(part_id), 0) + int(parts_count)
        except Exception:
            pass

    def qg_pairwise_dist_statistics(self, pairwise_dist, bp_dist, q_vis,
                                    g_vis, subsample=False):
        """Query-gallery distance / visibility statistics at eval
        (reference: writer.py:172-186 — invalid-pair count, uncomparable
        queries, per-part distance boxplot, per-part pair availability,
        per-part query/gallery visibility barplots). The plot data are
        kept as arrays in ``qg_stats`` and also rendered to Logger
        figures when a figure backend is attached. ``subsample=True``
        labels the print when the matrices are a big-gallery subsample."""
        try:
            d = np.asarray(pairwise_dist)
            valid_mask = d != -1
            valid = d[valid_mask]
            stats = {
                'qg_dist_mean': float(valid.mean()) if valid.size else 0.0,
                'qg_dist_std': float(valid.std()) if valid.size else 0.0,
                'qg_invalid_frac': float((~valid_mask).mean()),
                # queries with NO comparable gallery sample
                # (reference writer.py:176-177)
                'qg_uncomparable_queries_frac':
                    float((~valid_mask.any(axis=1)).mean()) if d.size else 0.0,
                'q_vis_mean': float(np.asarray(q_vis).mean())
                              if q_vis is not None else 1.0,
                'g_vis_mean': float(np.asarray(g_vis).mean())
                              if g_vis is not None else 1.0,
            }
            if bp_dist is not None:
                bp = np.asarray(bp_dist)          # [K, Nq, Ng]
                bp_valid = bp != -1
                # per-part pair availability (qg_body_part_pairs_
                # availability_barplot, reference writer.py:202-205)
                stats['part_pair_availability'] = \
                    bp_valid.mean(axis=(1, 2)).astype(np.float64)
                # per-part distance mean/std over valid pairs (the
                # summary statistics behind the reference boxplot,
                # writer.py:189-200)
                cnt = np.maximum(bp_valid.sum(axis=(1, 2)), 1)
                bpv = np.where(bp_valid, bp, 0.0)
                mu = bpv.sum(axis=(1, 2)) / cnt
                var = (np.where(bp_valid, (bp - mu[:, None, None]) ** 2, 0.0)
                       .sum(axis=(1, 2)) / cnt)
                stats['part_dist_mean'] = mu.astype(np.float64)
                stats['part_dist_std'] = np.sqrt(var).astype(np.float64)
            # per-part query/gallery visibility
            # (qg_body_part_availability_barplot, writer.py:235-241)
            if q_vis is not None:
                stats['q_part_visibility'] = \
                    np.asarray(q_vis).mean(axis=0).astype(np.float64)
            if g_vis is not None:
                stats['g_part_visibility'] = \
                    np.asarray(g_vis).mean(axis=0).astype(np.float64)
            self.qg_stats = stats
            if self.logger is not None:
                for k, v in stats.items():
                    if np.ndim(v) == 0:
                        self.logger.add_scalar('eval/{}'.format(k), v)
                    else:
                        for i, vi in enumerate(np.asarray(v).ravel()):
                            self.logger.add_scalar(
                                'eval/{}/part_{}'.format(k, i), float(vi))
                self._qg_figures(stats)
            print('Query-gallery distance stats{}: mean {qg_dist_mean:.4f} '
                  'std {qg_dist_std:.4f} invalid {qg_invalid_frac:.2%} '
                  'uncomparable queries {qg_uncomparable_queries_frac:.2%}'
                  .format(' (gallery subsample)' if subsample else '',
                          **stats))
            if 'part_pair_availability' in stats:
                avail = ' '.join('{:.0%}'.format(a)
                                 for a in stats['part_pair_availability'])
                print('Per-part pair availability: [{}]'.format(avail))
        except Exception:
            pass

    def _qg_figures(self, stats):
        """Render the reference's eval barplots (writer.py:202-265) when
        matplotlib is available; data-only otherwise."""
        try:
            import matplotlib
            matplotlib.use('Agg')
            import matplotlib.pyplot as plt
        except Exception:
            return
        try:
            if 'part_pair_availability' in stats:
                a = stats['part_pair_availability']
                fig, ax = plt.subplots(figsize=(max(6, len(a)), 3))
                ax.bar(np.arange(len(a)), a, 0.7)
                ax.set_xlabel('Body part index')
                ax.set_ylabel('Availability')
                ax.set_title('Query-gallery body part pairs availability')
                fig.tight_layout()
                self.logger.add_figure(
                    'Query-gallery body part pairs availability barplot', fig)
                plt.close(fig)
            if 'q_part_visibility' in stats and 'g_part_visibility' in stats:
                q, g = stats['q_part_visibility'], stats['g_part_visibility']
                x = np.arange(len(q))
                fig, ax = plt.subplots(figsize=(max(6, len(q)), 3))
                ax.bar(x - 0.175, q, 0.35, label='Query')
                ax.bar(x + 0.175, g, 0.35, label='Gallery')
                ax.set_xlabel('Body part index')
                ax.set_ylabel('Availability')
                ax.set_title('Query-gallery body parts availability')
                ax.legend()
                fig.tight_layout()
                self.logger.add_figure(
                    'Query-gallery body part availability barplot', fig)
                plt.close(fig)
        except Exception:
            pass

    # ------------------------------------------------------------------
    def report_eval(self, dataset_name, cmc, mAP, ssmd):
        self.eval_results[dataset_name] = {
            'r1': float(cmc[0]), 'mAP': float(mAP), 'ssmd': float(ssmd)}
        if self.logger is not None:
            self.logger.add_scalar('Test/{}/rank1'.format(dataset_name),
                                   float(cmc[0]))
            self.logger.add_scalar('Test/{}/mAP'.format(dataset_name),
                                   float(mAP))

    def report_performance(self, cmc, mAP, ssmd, pxl_acc):
        print('** Final performance: r1 {:.2%}, mAP {:.2%}, ssmd {:.3f} **'
              .format(float(cmc[0]), float(mAP), float(ssmd)))

    def report_global_step(self, loss_summary, lr):
        if self.logger is not None:
            for group, metrics in loss_summary.items():
                for k, v in metrics.items():
                    self.logger.add_scalar(
                        'Train/{}_{}'.format(group, k), float(v))
            self.logger.add_scalar('Train/lr', float(lr))

    # ------------------------------------------------------------------
    def run_completed(self):
        timers = [self.total_run_timer, self.epoch_timer, self.batch_timer,
                  self.data_loading_timer, self.test_batch_timer,
                  self.feature_extraction_timer, self.loss_timer,
                  self.optimizer_timer, self.performance_evaluation_timer]
        print('\nPhase timing summary:')
        print('{:<28} {:>10} {:>10} {:>8}'.format(
            'phase', 'total(s)', 'avg(s)', 'count'))
        for t in timers:
            if t.meter.count:
                print('{:<28} {:>10.2f} {:>10.4f} {:>8}'.format(
                    t.name, t.meter.sum, t.avg, t.meter.count))


class ProfilerTrace:
    """jax.profiler trace context for a training phase.

    The TPU-native replacement for the reference's CUDA-event timers
    (TorchTimeMeter, avgmeter.py:240-283) when op-level visibility is
    needed: writes a TensorBoard-compatible trace under
    ``<save_dir>/profile`` (view with xprof/tensorboard).
    """

    def __init__(self, save_dir, enabled=True):
        self.save_dir = save_dir
        self.enabled = enabled
        self._active = False

    def __enter__(self):
        if self.enabled:
            import os
            import jax
            os.makedirs(self.save_dir, exist_ok=True)
            jax.profiler.start_trace(self.save_dir)
            self._active = True
        return self

    def __exit__(self, *exc):
        if self._active:
            import jax
            jax.profiler.stop_trace()
            self._active = False
        return False
