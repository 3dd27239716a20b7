"""Global-embedding softmax engine
(reference: torchreid/engine/image/softmax.py).

Trains a plain backbone with label-smoothing CE on class logits; eval
extracts global features and ranks with the standard distance matrix.
"""
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from bpbreid_tpu import metrics
from bpbreid_tpu.data.augment import eval_preprocess, train_augment
from bpbreid_tpu.engine.engine import Engine
from bpbreid_tpu.engine.part_based import TrainState
from bpbreid_tpu.losses.cross_entropy import CrossEntropyLoss
from bpbreid_tpu.utils.checkpoint import save_checkpoint
from bpbreid_tpu.utils.distribution import plot_pairs_distance_distribution

__all__ = ['ImageSoftmaxEngine']


class ImageSoftmaxEngine(Engine):
    loss_mode = 'softmax'

    def __init__(self, datamanager, model, optimizer, scheduler=None,
                 use_gpu=False, label_smooth=True, config=None, writer=None,
                 engine_state=None, save_model_flag=False, **kwargs):
        super().__init__(config, datamanager, writer=writer,
                         engine_state=engine_state)
        self.model = model
        self.optimizer = optimizer
        self.lr_schedule = scheduler
        self.save_model_flag = save_model_flag
        self.criterion = CrossEntropyLoss(label_smooth=label_smooth)
        self._rng = jax.random.PRNGKey(
            config.train.seed if config is not None else 0)
        self.transforms = list(datamanager.transforms)
        self.norm_mean = tuple(datamanager.norm_mean)
        self.norm_std = tuple(datamanager.norm_std)
        self._freeze_base = False
        self.open_layers = list(config.train.open_layers) if config else []
        self.state = None
        self._train_step = jax.jit(self._train_step_impl,
                                   static_argnames=('freeze_base',),
                                   donate_argnums=(0,))
        self._train_multi_step = jax.jit(self._train_multi_step_impl,
                                         static_argnames=('freeze_base',),
                                         donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval_step_impl)
        self._eval_multi_step = jax.jit(self._eval_multi_step_impl)

    def init_state(self, rng=None, height=None, width=None):
        h = height or (self.config.data.height if self.config else 256)
        w = width or (self.config.data.width if self.config else 128)
        rng = rng if rng is not None else self._rng
        dummy = jnp.zeros((2, h, w, 3), jnp.float32)
        variables = self.model.init(rng, dummy, train=True)
        params = variables['params']
        batch_stats = variables.get('batch_stats', {})
        self.state = TrainState(params=params, batch_stats=batch_stats,
                                opt_state=self.optimizer.init(params),
                                step=jnp.zeros((), jnp.int32))
        return self.state

    def load_variables(self, variables):
        params = variables['params']
        batch_stats = variables.get('batch_stats', {})
        if self.state is None:
            self.state = TrainState(params=params, batch_stats=batch_stats,
                                    opt_state=self.optimizer.init(params),
                                    step=jnp.zeros((), jnp.int32))
        else:
            self.state = self.state.replace(params=params,
                                            batch_stats=batch_stats)
        return self.state

    def set_freeze_base(self, freeze):
        self._freeze_base = bool(freeze)

    def apply_lr(self, lr):
        if self.state is not None and self.lr_schedule is not None:
            self.lr_schedule.set_in_opt_state(self.state.opt_state, self.epoch)

    def save_model(self, epoch, save_dir, cmc=None, mAP=None, ssmd=None,
                   is_best=False, force=False):
        # ``force`` (preemption checkpointing) overrides save_model_flag
        if (not self.save_model_flag and not force) or self.state is None:
            return
        save_checkpoint(
            {'state': self.state, 'epoch': epoch,
             'rank1': float(cmc[0]) if cmc is not None else None,
             'mAP': float(mAP) if mAP is not None else None,
             'config': self.config.to_dict() if self.config else {}},
            save_dir, epoch=epoch, is_best=is_best)

    # ------------------------------------------------------------------
    def _compute_loss(self, outputs, pids):
        loss = self.criterion(outputs, pids)
        acc = (jnp.argmax(outputs, -1) == pids).mean()
        return loss, {'softmax': {'loss': loss, 'acc': acc}}

    def _train_step_impl(self, state, imgs_u8, pids, rng, freeze_base=False):
        # carry key derived in-jit: no per-step host split dispatch
        # (see part_based._train_step_impl)
        next_rng, aug_rng, model_rng = jax.random.split(rng, 3)
        cj = self.config.data.cj if self.config else None
        cj_kwargs = dict(cj_brightness=cj.brightness, cj_contrast=cj.contrast,
                         cj_saturation=cj.saturation, cj_hue=cj.hue,
                         cj_p=cj.p) if cj else {}
        imgs, _ = train_augment(imgs_u8, None, aug_rng,
                                transforms=tuple(self.transforms),
                                norm_mean=self.norm_mean,
                                norm_std=self.norm_std, **cj_kwargs)

        def loss_fn(params):
            outputs, new_state = self.model.apply(
                {'params': params, 'batch_stats': state.batch_stats}, imgs,
                train=True, mutable=['batch_stats'],
                rngs={'dropout': model_rng})
            loss, summary = self._compute_loss(outputs, pids)
            return loss, (new_state.get('batch_stats', state.batch_stats),
                          summary)

        (loss, (bs, summary)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        if freeze_base:
            open_layers = self.open_layers

            def mask_grad(path, g):
                p = '/'.join(str(getattr(x, 'key', x)) for x in path)
                return g if any(ol in p for ol in open_layers) \
                    else jnp.zeros_like(g)

            grads = jax.tree_util.tree_map_with_path(mask_grad, grads)
        updates, opt_state = self.optimizer.update(grads, state.opt_state,
                                                   state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, state.params,
                                        updates)
        return state.replace(params=params, batch_stats=bs,
                             opt_state=opt_state, step=state.step + 1), \
            next_rng, loss, summary

    def _train_multi_step_impl(self, state, imgs_u8, pids, rng,
                               freeze_base=False):
        """k train steps in one compiled program
        (cfg.train.steps_per_dispatch; see
        part_based._train_multi_step_impl for the rationale)."""
        def body(carry, xs):
            st, r = carry
            st, r, loss, summary = self._train_step_impl(
                st, xs['image'], xs['pid'], r, freeze_base=freeze_base)
            return (st, r), (loss, summary)

        (state, rng), (losses, summaries) = jax.lax.scan(
            body, (state, rng), {'image': imgs_u8, 'pid': pids})
        return state, rng, losses, summaries

    def forward_backward_multi(self, batch):
        """Step-stacked ``[k, B, ...]`` batches -> per-step loss vector
        and a summary tree with a leading ``[k]`` axis."""
        if self.state is None:
            self.init_state()
        self.state, self._rng, losses, summaries = self._train_multi_step(
            self.state, jnp.asarray(batch['image']),
            jnp.asarray(batch['pid']), self._rng,
            freeze_base=self._freeze_base)
        return losses, summaries

    def _eval_step_impl(self, params, batch_stats, imgs_u8):
        imgs, _ = eval_preprocess(imgs_u8, None, norm_mean=self.norm_mean,
                                  norm_std=self.norm_std)
        return self.model.apply({'params': params, 'batch_stats': batch_stats},
                                imgs, train=False)

    # ------------------------------------------------------------------
    def forward_backward(self, batch):
        if self.state is None:
            self.init_state()
        self.state, self._rng, loss, summary = self._train_step(
            self.state, jnp.asarray(batch['image']),
            jnp.asarray(batch['pid']), self._rng,
            freeze_base=self._freeze_base)
        # device scalars: MetricsSummary drains them lazily (see
        # part_based.forward_backward) so the step pipeline never blocks
        return loss, summary

    def _eval_multi_step_impl(self, params, batch_stats, imgs_u8):
        """k eval batches per compiled dispatch
        (cfg.test.batches_per_dispatch; see
        part_based._eval_multi_step_impl for the rationale)."""
        def body(_, im):
            return None, self._eval_step_impl(params, batch_stats, im)
        _, feats = jax.lax.scan(body, None, imgs_u8)
        return feats

    @staticmethod
    def _drain_group(feats, group, f_, pids_, camids_):
        feats = np.asarray(feats)
        for i, b in enumerate(group):
            valid = np.asarray(b['valid'])
            f_.append(feats[i][valid])
            pids_.append(np.asarray(b['pid'])[valid])
            camids_.append(np.asarray(b['camid'])[valid])

    def _feature_extraction(self, loader):
        from bpbreid_tpu.engine.engine import device_prefetch
        f_, pids_, camids_ = [], [], []
        k = max(1, int(getattr(self.config.test, 'batches_per_dispatch', 1)
                       or 1)) if self.config is not None else 1
        if k > 1:
            # readback one group behind the dispatch (see
            # part_based._feature_extraction): group i converts to host
            # only after group i+1 is enqueued
            pending = None
            for group in self._eval_batch_groups(loader, k):
                imgs = jnp.asarray(np.stack([b['image'] for b in group]))
                feats = self._eval_multi_step(
                    self.state.params, self.state.batch_stats, imgs)
                if pending is not None:
                    self._drain_group(*pending, f_, pids_, camids_)
                pending = (feats, group)
            if pending is not None:
                self._drain_group(*pending, f_, pids_, camids_)
        else:
            for batch in device_prefetch(loader):
                feats = self._eval_step(self.state.params,
                                        self.state.batch_stats,
                                        jnp.asarray(batch['image']))
                valid = batch['valid']
                f_.append(np.asarray(feats)[valid])
                pids_.append(batch['pid'][valid])
                camids_.append(batch['camid'][valid])
        return np.concatenate(f_), np.concatenate(pids_), np.concatenate(camids_)

    def _evaluate(self, epoch, dataset_name='', query_loader=None,
                  gallery_loader=None, dist_metric='euclidean',
                  normalize_feature=False, save_dir='',
                  use_metric_cuhk03=False, ranks=(1, 5, 10, 20), rerank=False,
                  **kwargs):
        if self.state is None:
            self.init_state()
        qf, q_pids, q_camids = self._feature_extraction(query_loader)
        gf, g_pids, g_camids = self._feature_extraction(gallery_loader)
        if normalize_feature:
            qf = self.normalize(qf)
            gf = self.normalize(gf)
        distmat = np.asarray(metrics.compute_distance_matrix(
            qf, gf, dist_metric))
        if rerank:
            from bpbreid_tpu.utils.rerank import re_ranking
            d_qq = np.asarray(metrics.compute_distance_matrix(qf, qf, dist_metric))
            d_gg = np.asarray(metrics.compute_distance_matrix(gf, gf, dist_metric))
            distmat = re_ranking(distmat, d_qq, d_gg)
        eval_metric = 'cuhk03' if use_metric_cuhk03 else 'default'
        result = metrics.evaluate_rank(distmat, q_pids, g_pids, q_camids,
                                       g_camids, eval_metric=eval_metric)
        cmc, mAP = result['cmc'], result['mAP']
        print('** Results: mAP {:.2%}'.format(mAP))
        for r in ranks:
            if r <= len(cmc):      # tiny galleries: CMC shorter than max_rank
                print('Rank-{:<3}: {:.2%}'.format(r, cmc[r - 1]))
        *_, ssmd = plot_pairs_distance_distribution(distmat, q_pids, g_pids)
        return cmc, mAP, ssmd, 0.0
