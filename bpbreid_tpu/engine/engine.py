"""Engine base: the train/eval orchestration loop.

Mirror of the reference Engine (reference: torchreid/engine/engine.py:19-559):
``run()`` drives epochs -> train -> periodic/final test -> checkpoint,
with two-stepped transfer learning (freeze base layers for
``fixbase_epoch`` epochs) and resume support.

The compute path is jitted by subclasses; this class owns the
host-side control flow, the EngineState event bus and the Writer.
"""
import os
import os.path as osp
import time

import numpy as np

from bpbreid_tpu.utils.avgmeter import MetricsSummary, TimeMeter
from bpbreid_tpu.utils.engine_state import EngineState

__all__ = ['Engine', 'device_prefetch', 'group_train_batches']


def group_train_batches(loader, k, keys=('image', 'mask', 'pid')):
    """Stack ``k`` consecutive train batches into one ``[k, B, ...]``
    super-batch for multi-step dispatch (``forward_backward_multi``).

    Yields stacked dicts carrying ``_k`` = k for full groups; a trailing
    partial group degrades to the raw per-batch dicts (no ``_k``), which
    the train loop runs through the already-compiled single-step path —
    no extra scan graph is compiled for the remainder.
    """
    buf = []
    for batch in loader:
        buf.append(batch)
        if len(buf) == k:
            stacked = {key: np.stack([b[key] for b in buf])
                       for key in keys if key in buf[0]}
            stacked['_k'] = k
            yield stacked
            buf = []
    for batch in buf:
        yield batch


def device_prefetch(loader, depth=2, keys=('image', 'mask', 'pid')):
    """Issue host->device transfers ``depth`` batches ahead of use.

    Transfers run on a dedicated thread (``device_put`` can block until
    the copy lands, e.g. through a tunneled backend) so the NEXT batch
    moves host->device while the current step computes — hiding
    transfer and dispatch latency, which dominates the step on remote
    backends and is still several ms of PCIe time per batch on a local
    host. Host-side fields (camid/valid/index/paths) stay numpy.
    """
    import jax
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    def to_device(batch):
        out = dict(batch)
        for k in keys:
            if k in out and isinstance(out[k], np.ndarray):
                out[k] = jax.device_put(out[k])
        return out

    # single worker => transfers stay in batch order
    with ThreadPoolExecutor(max_workers=1) as pool:
        q = deque()
        for batch in loader:
            q.append(pool.submit(to_device, batch))
            if len(q) > depth:
                yield q.popleft().result()
        while q:
            yield q.popleft().result()


class Engine:
    @staticmethod
    def _eval_batch_groups(loader, k):
        """Yield lists of ``k`` consecutive eval batches
        (cfg.test.batches_per_dispatch). Eval batches all share one
        padded shape (the loader pads the final batch and marks rows
        with ``valid``), so a trailing short group is padded with
        all-invalid copies of its last batch — every group dispatches
        through the SAME compiled ``[k, B, ...]`` graph and the padding
        contributes nothing to the outputs."""
        buf = []
        for batch in loader:
            buf.append(batch)
            if len(buf) == k:
                yield buf
                buf = []
        if buf:
            filler = dict(buf[-1])
            filler['valid'] = np.zeros_like(np.asarray(buf[-1]['valid']))
            buf.extend([filler] * (k - len(buf)))
            yield buf

    def __init__(self, config, datamanager, writer=None, engine_state=None):
        self.config = config
        self.datamanager = datamanager
        self.writer = writer
        self.engine_state = engine_state or EngineState(
            config.train.start_epoch, config.train.max_epoch)
        self.epoch = config.train.start_epoch
        self.start_epoch = config.train.start_epoch
        self.max_epoch = config.train.max_epoch
        self.lr_schedule = None
        self.logs = []
        # graceful preemption (TPU pods get preempted; the reference has
        # no handling — SURVEY §5): SIGTERM/SIGINT set this flag, the
        # train loop stops at the next batch boundary, run() writes an
        # emergency checkpoint and returns cleanly
        self._preempted = False

    def _request_preemption(self, signum=None, frame=None):
        del frame
        print('=> Preemption signal{} received: will checkpoint and stop '
              'at the next batch boundary'.format(
                  ' {}'.format(signum) if signum is not None else ''))
        self._preempted = True

    def _install_preemption_handlers(self):
        """Returns a restore callback (no-op outside the main thread)."""
        import signal
        prev = {}
        try:
            for sig in (signal.SIGTERM, signal.SIGINT):
                prev[sig] = signal.signal(sig, self._request_preemption)
        except ValueError:          # not the main thread
            return lambda: None

        def restore():
            for sig, handler in prev.items():
                signal.signal(sig, handler)
        return restore

    # ------------------------------------------------------------------
    # subclass contract
    # ------------------------------------------------------------------
    def forward_backward(self, batch):
        raise NotImplementedError

    def _evaluate(self, epoch, dataset_name='', query_loader=None,
                  gallery_loader=None, **kwargs):
        raise NotImplementedError

    def set_freeze_base(self, freeze):
        """Two-stepped transfer learning hook (subclasses implement by
        masking base-layer gradients)."""

    def update_lr(self, epoch):
        if self.lr_schedule is not None:
            lr = self.lr_schedule(epoch)
            self.engine_state.update_lr(lr)
            self.apply_lr(lr)
            return lr
        return None

    def apply_lr(self, lr):
        pass

    def save_model(self, epoch, save_dir, cmc=None, mAP=None, ssmd=None,
                   is_best=False, force=False):
        pass

    # ------------------------------------------------------------------
    def run(self, save_dir='log', max_epoch=0, start_epoch=0, print_freq=10,
            fixbase_epoch=0, open_layers=None, start_eval=0, eval_freq=-1,
            test_only=False, dist_metric='euclidean', normalize_feature=False,
            visrank=False, visrank_topk=10, visrank_q_idx_list=None,
            visrank_count=10, use_metric_cuhk03=False, ranks=(1, 5, 10, 20),
            rerank=False, save_features=False, **kwargs):
        """(reference: engine.py:127-253)"""
        if max_epoch:
            self.max_epoch = max_epoch
            self.engine_state.max_epoch = max_epoch
        self.engine_state.run_started()
        if test_only:
            result = self.test(self.epoch, dist_metric=dist_metric,
                               normalize_feature=normalize_feature,
                               visrank=visrank, visrank_topk=visrank_topk,
                               visrank_q_idx_list=visrank_q_idx_list or [],
                               visrank_count=visrank_count, save_dir=save_dir,
                               use_metric_cuhk03=use_metric_cuhk03,
                               ranks=ranks, rerank=rerank,
                               save_features=save_features)
            self.engine_state.run_completed()
            return result

        print('=> Start training')
        if self.writer is not None:
            self.writer.total_run_timer.start()
        restore_signals = self._install_preemption_handlers()
        self.engine_state.training_started()
        time_start = time.time()
        best_rank1 = -1.0
        for epoch in range(self.start_epoch, self.max_epoch):
            self.epoch = epoch
            freeze = epoch < fixbase_epoch and open_layers
            self.set_freeze_base(bool(freeze))
            self.update_lr(epoch)
            self.train(epoch, print_freq=print_freq)
            if self._preempted:
                print('=> Preempted: writing emergency checkpoint '
                      '(epoch {})'.format(epoch))
                self.save_model(epoch, save_dir, force=True)
                restore_signals()
                self.engine_state.training_completed()
                self.engine_state.run_completed()
                return (np.zeros(max(ranks)), 0.0, 0.0, 0.0)
            if (eval_freq > 0 and (epoch + 1) % eval_freq == 0
                    and (epoch + 1) != self.max_epoch
                    and (epoch + 1) >= start_eval):
                cmc, mAP, ssmd, pxl_acc = self.test(
                    epoch, dist_metric=dist_metric,
                    normalize_feature=normalize_feature, save_dir=save_dir,
                    use_metric_cuhk03=use_metric_cuhk03, ranks=ranks)
                is_best = cmc[0] > best_rank1
                best_rank1 = max(best_rank1, cmc[0])
                self.save_model(epoch, save_dir, cmc=cmc, mAP=mAP, ssmd=ssmd,
                                is_best=is_best)
        restore_signals()
        self.engine_state.training_completed()

        cmc, mAP, ssmd, pxl_acc = (np.zeros(max(ranks)), 0.0, 0.0, 0.0)
        if self.max_epoch > 0:
            print('=> Final test')
            cmc, mAP, ssmd, pxl_acc = self.test(
                self.epoch, dist_metric=dist_metric,
                normalize_feature=normalize_feature, visrank=visrank,
                visrank_topk=visrank_topk,
                visrank_q_idx_list=visrank_q_idx_list or [],
                visrank_count=visrank_count, save_dir=save_dir,
                use_metric_cuhk03=use_metric_cuhk03, ranks=ranks,
                rerank=rerank, save_features=save_features)
            self.save_model(self.epoch, save_dir, cmc=cmc, mAP=mAP, ssmd=ssmd,
                            is_best=cmc[0] > best_rank1)

        if self.writer is not None:
            self.writer.total_run_timer.stop()
        elapsed = time.time() - time_start
        print('Elapsed {:.0f}s'.format(elapsed))
        if self.writer is not None:
            self.writer.report_performance(cmc, mAP, ssmd, pxl_acc)
        # the Writer listens on the engine-state bus and prints its
        # timing table from the run_completed event
        self.engine_state.run_completed()
        return cmc, mAP, ssmd, pxl_acc

    def train(self, epoch, print_freq=10):
        """One epoch over the train loader (reference: engine.py:255-277).
        Phase timings feed the Writer's final timing table
        (reference: writer.py:373-391)."""
        losses = MetricsSummary()
        w = self.writer
        batch_time = w.batch_timer if w is not None else TimeMeter()
        data_time = w.data_loading_timer if w is not None else TimeMeter()
        if w is not None:
            w.epoch_timer.start()
        log_freq = getattr(self.config.train, 'batch_log_freq', 0) \
            if self.config is not None else 0
        # multi-step dispatch: fuse steps_per_dispatch batches into one
        # compiled lax.scan call (forward_backward_multi) — dispatch
        # latency amortizes over the group; math/rng/metrics identical
        spd = 1
        if self.config is not None:
            spd = int(getattr(self.config.train, 'steps_per_dispatch', 1)
                      or 1)
            if getattr(self.config.train, 'batch_debug_freq', 0):
                spd = 1     # per-batch debug dumps need per-batch outputs
        multi = getattr(self, 'forward_backward_multi', None)
        use_groups = spd > 1 and multi is not None
        self.engine_state.epoch_started()
        num_batches = len(self.datamanager.train_loader)
        stream = device_prefetch(
            group_train_batches(self.datamanager.train_loader, spd)) \
            if use_groups else device_prefetch(self.datamanager.train_loader)
        done = logged = printed = 0
        end = time.perf_counter()
        for item in stream:
            if self._preempted:
                break
            data_start = time.perf_counter()
            k = int(item.pop('_k', 0))
            if k:                                 # stacked k-step group
                for _ in range(k):
                    self.engine_state.batch_started()
                loss_vec, loss_summary = multi(item)
                loss = loss_vec[-1]
                n = k
            else:
                self.engine_state.batch_started()
                loss, loss_summary = self.forward_backward(item)
                n = 1
            data_time.meter.update((data_start - end) / n, n)
            losses.update(loss_summary)     # [k]-leaf trees average fine
            batch_time.meter.update((time.perf_counter() - end) / n, n)
            end = time.perf_counter()
            done += n
            for _ in range(n):
                self.engine_state.batch_completed()
            if w is not None and log_freq > 0 and done // log_freq > logged:
                logged = done // log_freq
                latest = loss_summary
                if k:       # most recent step's scalars
                    import jax
                    latest = jax.tree_util.tree_map(lambda a: a[-1],
                                                    loss_summary)
                w.report_global_step(latest, self.engine_state.lr)
            if print_freq > 0 and done // print_freq > printed:
                printed = done // print_freq
                print('epoch: [{}/{}][{}/{}] time {:.3f} data {:.3f} '
                      'loss {:.4f} | {}'.format(
                          epoch + 1, self.max_epoch, done,
                          num_batches, batch_time.meter.avg,
                          data_time.meter.avg, float(loss),
                          losses.summary_str()))
        if w is not None:
            w.epoch_timer.stop()
        self.engine_state.epoch_completed()
        return losses

    def test(self, epoch, dist_metric='euclidean', normalize_feature=False,
             visrank=False, visrank_topk=10, visrank_q_idx_list=None,
             visrank_count=10, save_dir='', use_metric_cuhk03=False,
             ranks=(1, 5, 10, 20), rerank=False, save_features=False,
             **kwargs):
        """Evaluate on every target dataset (reference: engine.py:282-386)."""
        self.engine_state.test_started()
        targets = list(self.datamanager.test_loader.keys())
        last = (np.zeros(max(ranks)), 0.0, 0.0, 0.0)
        for name in targets:
            domain = 'source' if name in self.datamanager.sources else 'target'
            print('##### Evaluating {} ({}) #####'.format(name, domain))
            query_loader = self.datamanager.test_loader[name]['query']
            gallery_loader = self.datamanager.test_loader[name]['gallery']
            cmc, mAP, ssmd, pxl_acc = self._evaluate(
                epoch, dataset_name=name, query_loader=query_loader,
                gallery_loader=gallery_loader, dist_metric=dist_metric,
                normalize_feature=normalize_feature, visrank=visrank,
                visrank_topk=visrank_topk,
                visrank_q_idx_list=visrank_q_idx_list or [],
                visrank_count=visrank_count, save_dir=save_dir,
                use_metric_cuhk03=use_metric_cuhk03, ranks=ranks,
                rerank=rerank, save_features=save_features)
            last = (cmc, mAP, ssmd, pxl_acc)
        self.engine_state.test_completed()
        return last

    @staticmethod
    def normalize(features, axis=-1):
        n = np.linalg.norm(np.asarray(features), axis=axis, keepdims=True)
        return np.asarray(features) / np.maximum(n, 1e-12)
