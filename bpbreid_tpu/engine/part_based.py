"""Part-based image engine: the jitted TPU train/eval compute path.

Rebuild of the reference ImagePartBasedEngine
(reference: torchreid/engine/image/part_based_engine.py:22-388) as two
compiled XLA programs:

- ``train_step``: device-side augmentation + mask chain -> model forward
  (train mode, mutable BN stats) -> GiLt + body-part-attention losses ->
  grads -> optax update. One fused program per epoch phase (frozen /
  unfrozen base), donated state.
- ``eval_step``: preprocess -> forward (eval) -> configured test
  embedding streams concatenated to ``[N, P+2, D]`` + visibility.

Evaluation then computes the visibility-weighted part distance and
CMC/mAP through bpbreid_tpu.metrics.
"""
import contextlib
import os.path as osp
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from bpbreid_tpu import metrics
from bpbreid_tpu.constants import PARTS, PIXELS, bn_correspondants
from bpbreid_tpu.data.augment import eval_preprocess, train_augment
from bpbreid_tpu.engine.engine import Engine
from bpbreid_tpu.losses.bpa import BodyPartAttentionLoss
from bpbreid_tpu.losses.gilt import GiLtLoss
from bpbreid_tpu.metrics.distance import compute_distance_matrix_using_bp_features
from bpbreid_tpu.ops.quant import QuantOpts
from bpbreid_tpu.ops.resize import resize_bilinear_align_corners
from bpbreid_tpu.utils.distribution import plot_pairs_distance_distribution
from bpbreid_tpu.utils.checkpoint import save_checkpoint

__all__ = ['ImagePartBasedEngine', 'TrainState']


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray

    def variables(self):
        return {'params': self.params, 'batch_stats': self.batch_stats}


class ImagePartBasedEngine(Engine):
    def __init__(self, config, datamanager, model, optimizer, writer=None,
                 engine_state=None, lr_schedule=None, scheduler=None,
                 use_gpu=False, save_model_flag=False, margin=0.3,
                 loss_name='part_averaged_triplet_loss',
                 mask_filtering_training=False, mask_filtering_testing=True,
                 dist_combine_strat='mean', batch_size_pairwise_dist_matrix=500,
                 detailed_ranking=False, seed=0):
        super().__init__(config, datamanager, writer=writer,
                         engine_state=engine_state)
        self.model = model
        self.optimizer = optimizer
        self.lr_schedule = lr_schedule or scheduler
        self.save_model_flag = save_model_flag
        self.mask_filtering_training = mask_filtering_training
        self.mask_filtering_testing = mask_filtering_testing
        self.dist_combine_strat = dist_combine_strat
        self.batch_size_pairwise_dist_matrix = batch_size_pairwise_dist_matrix
        self.detailed_ranking = detailed_ranking
        self.parts_num = config.model.bpbreid.masks.parts_num
        self.test_embeddings = list(config.model.bpbreid.test_embeddings)
        self.losses_weights = config.loss.part_based.weights

        self.GiLt = GiLtLoss(self.losses_weights,
                             use_visibility_scores=mask_filtering_training,
                             triplet_margin=margin, loss_name=loss_name,
                             writer=writer)
        self.body_part_attention_loss = BodyPartAttentionLoss(
            loss_type=config.loss.part_based.ppl)

        self._rng = jax.random.PRNGKey(config.train.seed)
        self._freeze_base = False
        self.open_layers = list(config.train.open_layers or [])
        self.mask_kwargs = datamanager.mask_chain_kwargs() \
            if hasattr(datamanager, 'mask_chain_kwargs') else None
        self.transforms = list(datamanager.transforms)
        self.norm_mean = tuple(datamanager.norm_mean)
        self.norm_std = tuple(datamanager.norm_std)
        self.state = None

        self._train_step = jax.jit(self._train_step_impl,
                                   static_argnames=('freeze_base',),
                                   donate_argnums=(0,))
        self._train_multi_step = jax.jit(self._train_multi_step_impl,
                                         static_argnames=('freeze_base',),
                                         donate_argnums=(0,))
        # quant_opts is static: it keys the jit cache on the int8 knobs
        # (trace-time contextvars, invisible to the cache otherwise)
        self._eval_step = jax.jit(self._eval_step_impl,
                                  static_argnames=('quant_opts',))
        self._eval_multi_step = jax.jit(self._eval_multi_step_impl,
                                        static_argnames=('quant_opts',))
        # calibrated int8 eval path (cfg.test.int8): calibration runs
        # lazily on the first eval batches (see _maybe_int8_eval_step)
        self._int8_eval_step = None
        self._quant_coll = None
        # above this many distance-matrix elements, _evaluate ranks on
        # device with the sort-free counting kernel instead of pulling
        # the full matrix to host (market1501_500k: [3368, 500k] ~ 6.7GB)
        self.device_ranking_threshold = int(2e8)

    # ------------------------------------------------------------------
    # state init / checkpointing
    # ------------------------------------------------------------------
    def init_state(self, rng=None, height=None, width=None):
        h = height or self.config.data.height
        w = width or self.config.data.width
        rng = rng if rng is not None else jax.random.PRNGKey(
            self.config.train.seed)
        dummy = jnp.zeros((2, h, w, 3), jnp.float32)
        dummy_masks = jnp.full((2, h // 4, w // 4, self.parts_num + 1),
                               1.0 / (self.parts_num + 1), jnp.float32)
        # jitted init: eager (op-by-op) initialization of the deep
        # backbones costs minutes on CPU and through a tunneled TPU
        # backend (one host round trip per op); one compiled program is
        # numerically identical and orders of magnitude faster
        variables = jax.jit(self.model.init, static_argnames=('train',))(
            rng, dummy, dummy_masks, train=False)
        params = variables['params']
        batch_stats = variables.get('batch_stats', {})
        opt_state = self.optimizer.init(params)
        self.state = TrainState(params=params, batch_stats=batch_stats,
                                opt_state=opt_state,
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

    def save_model(self, epoch, save_dir, cmc=None, mAP=None, ssmd=None,
                   is_best=False, force=False):
        # ``force`` (preemption checkpointing) overrides save_model_flag
        if (not self.save_model_flag and not force) or self.state is None:
            return
        save_checkpoint(
            {'state': self.state, 'epoch': epoch,
             'rank1': float(cmc[0]) if cmc is not None else None,
             'mAP': float(mAP) if mAP is not None else None,
             'ssmd': float(ssmd) if ssmd is not None else None,
             'config': self.config.to_dict()},
            save_dir, job_id=self.config.project.job_id, epoch=epoch,
            is_best=is_best)

    def set_freeze_base(self, freeze):
        self._freeze_base = bool(freeze)

    def apply_lr(self, lr):
        if self.state is not None and self.lr_schedule is not None:
            self.lr_schedule.set_in_opt_state(self.state.opt_state, self.epoch)

    # ------------------------------------------------------------------
    # compiled steps
    # ------------------------------------------------------------------
    def _loss_fn(self, params, batch_stats, imgs, masks, pids, rng):
        outputs, new_model_state = self.model.apply(
            {'params': params, 'batch_stats': batch_stats}, imgs, masks,
            train=True, mutable=['batch_stats'],
            rngs={'dropout': rng})
        (embeddings, visibility, id_cls_scores, pixels_cls_scores,
         _spatial, _masks) = outputs
        loss, loss_summary = self.GiLt(embeddings, visibility, id_cls_scores,
                                       pids, rng=rng)
        bpa_w = float(self.losses_weights[PIXELS]['ce'])
        if pixels_cls_scores is not None and masks is not None and bpa_w > 0:
            hf, wf = pixels_cls_scores.shape[1:3]
            # bilinear align_corners target resize + argmax part labels
            # (reference: part_based_engine.py:118-126)
            target = resize_bilinear_align_corners(masks, hf, wf)
            target_idx = jnp.argmax(target, axis=-1)
            bpa_loss, bpa_summary = self.body_part_attention_loss(
                pixels_cls_scores, target_idx)
            loss = loss + bpa_w * bpa_loss
            loss_summary = {**loss_summary, **bpa_summary}
        return loss, (new_model_state.get('batch_stats', batch_stats),
                      loss_summary)

    def _train_step_impl(self, state, imgs_u8, raw_masks, pids, rng,
                         freeze_base=False):
        # the step's keys AND the next step's carry key are derived
        # inside the jit: the host never dispatches a separate
        # random.split kernel per step (a measurable RPC through a
        # tunneled/remote backend)
        next_rng, aug_rng, model_rng = jax.random.split(rng, 3)
        imgs, masks = train_augment(
            imgs_u8, raw_masks, aug_rng, transforms=tuple(self.transforms),
            norm_mean=self.norm_mean, norm_std=self.norm_std,
            cj_brightness=self.config.data.cj.brightness,
            cj_contrast=self.config.data.cj.contrast,
            cj_saturation=self.config.data.cj.saturation,
            cj_hue=self.config.data.cj.hue,
            cj_p=self.config.data.cj.p,
            mask_kwargs=self.mask_kwargs)
        (loss, (new_batch_stats, loss_summary)), grads = jax.value_and_grad(
            self._loss_fn, has_aux=True)(state.params, state.batch_stats,
                                         imgs, masks, pids, model_rng)
        if freeze_base:
            open_layers = self.open_layers

            def mask_grad(path, g):
                p = '/'.join(str(getattr(x, 'key', x)) for x in path)
                keep = any(ol in p for ol in open_layers)
                return g if keep else jnp.zeros_like(g)

            grads = jax.tree_util.tree_map_with_path(mask_grad, grads)
        updates, new_opt_state = self.optimizer.update(grads, state.opt_state,
                                                       state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates)
        new_state = state.replace(params=new_params,
                                  batch_stats=new_batch_stats,
                                  opt_state=new_opt_state,
                                  step=state.step + 1)
        return new_state, next_rng, loss, loss_summary

    def _train_multi_step_impl(self, state, imgs_u8, raw_masks, pids, rng,
                               freeze_base=False):
        """k train steps in ONE compiled program: ``lax.scan`` of the
        single-step body over the leading (step) axis of the stacked
        batch arrays ``[k, B, ...]``.

        Dispatching a compiled program costs a host->device round trip —
        the dominant per-step cost through a tunneled/remote TPU backend
        (measured: the flagship step is ~28 ms of device compute but
        ~90 ms wall when dispatched one batch at a time). The scan pays
        that once per k steps. The carried rng reproduces the exact
        split chain of k single dispatches, so losses, parameter
        updates, and metrics are identical either way.
        """
        def body(carry, xs):
            st, r = carry
            st, r, loss, summary = self._train_step_impl(
                st, xs['image'], xs.get('mask'), xs['pid'], r,
                freeze_base=freeze_base)
            return (st, r), (loss, summary)

        xs = {'image': imgs_u8, 'pid': pids}
        if raw_masks is not None:
            xs['mask'] = raw_masks
        (state, rng), (losses, summaries) = jax.lax.scan(
            body, (state, rng), xs)
        return state, rng, losses, summaries

    def forward_backward_multi(self, batch):
        """Run ``k = batch['image'].shape[0]`` train steps in one
        dispatch (see ``_train_multi_step_impl``). ``batch`` holds
        step-stacked arrays ``[k, B, ...]``. Returns the per-step loss
        vector and a loss-summary tree with a leading ``[k]`` axis —
        both device arrays, drained lazily by the meters."""
        if self.state is None:
            self.init_state()
        imgs = jnp.asarray(batch['image'])
        masks = jnp.asarray(batch['mask']) if 'mask' in batch else None
        pids = jnp.asarray(batch['pid'])
        sharding = getattr(self, 'multi_batch_sharding', None)
        if sharding is not None:    # mesh-distributed (parallel/train.py)
            imgs = jax.device_put(imgs, sharding)
            pids = jax.device_put(pids, sharding)
            if masks is not None:
                masks = jax.device_put(masks, sharding)
        self.state, self._rng, losses, summaries = self._train_multi_step(
            self.state, imgs, masks, pids, self._rng,
            freeze_base=self._freeze_base)
        return losses, summaries

    def _eval_step_impl(self, params, batch_stats, imgs_u8, raw_masks,
                        quant=None, quant_opts=None):
        imgs, masks = eval_preprocess(imgs_u8, raw_masks,
                                      norm_mean=self.norm_mean,
                                      norm_std=self.norm_std,
                                      mask_kwargs=self.mask_kwargs)
        variables = {'params': params, 'batch_stats': batch_stats}
        if quant is not None:
            variables['quant'] = quant
            # quant_opts is a STATIC jit argument: the int8 knobs are
            # read from contextvars at trace time and are otherwise
            # invisible to the jit cache — without them in the key, a
            # knob change after the first int8 trace silently reuses
            # the stale graph (see ops/quant.py QuantOpts)
            ctx = (quant_opts or QuantOpts()).inference_context()
        else:
            ctx = contextlib.nullcontext()
        with ctx:
            outputs = self.model.apply(variables, imgs, masks, train=False)
        features, visibility, parts_masks, pixels_cls_scores = \
            self.extract_test_embeddings(outputs)
        # pixel part-prediction accuracy vs the target masks
        # (reference: part_based_engine.py:297-306)
        pxl_correct = pxl_total = jnp.zeros((), jnp.float32)
        if pixels_cls_scores is not None and masks is not None:
            hf, wf = pixels_cls_scores.shape[1:3]
            target = resize_bilinear_align_corners(masks, hf, wf)
            target_idx = jnp.argmax(target, axis=-1)
            pred_idx = jnp.argmax(pixels_cls_scores, axis=-1)
            correct_map = (pred_idx == target_idx).astype(jnp.float32)
            pxl_correct = correct_map.sum(axis=(1, 2))      # [N]
            pxl_total = jnp.full((imgs.shape[0],), float(hf * wf))
        return (features, visibility, parts_masks, pixels_cls_scores, masks,
                pxl_correct, pxl_total)

    def _eval_multi_step_impl(self, params, batch_stats, imgs_u8, raw_masks,
                              quant=None, quant_opts=None):
        """k eval batches in ONE compiled program: ``lax.scan`` of the
        single-batch eval body over the leading (batch-group) axis of
        the stacked ``[k, B, ...]`` inputs — the eval-side analogue of
        ``_train_multi_step_impl`` (cfg.test.batches_per_dispatch).

        Only the small per-sample outputs (embeddings, visibility,
        pixel-accuracy counts) leave the scan; the [B, Hf, Wf, ...]
        attention/pixel maps are consumed inside the body, so HBM holds
        k × a few MB of results, not k full map stacks."""
        def body(_, xs):
            out = self._eval_step_impl(params, batch_stats,
                                       xs['image'], xs.get('mask'),
                                       quant=quant, quant_opts=quant_opts)
            feats, vis, _masks, _pxl, _m, corr, tot = out
            return None, (feats, vis, corr, tot)

        xs = {'image': imgs_u8}
        if raw_masks is not None:
            xs['mask'] = raw_masks
        _, outs = jax.lax.scan(body, None, xs)
        return outs

    def extract_test_embeddings(self, model_output):
        """Concatenate the configured embedding streams to [N, P+2, D]
        (reference: part_based_engine.py:365-387)."""
        (embeddings, visibility_scores, _id_cls, pixels_cls_scores,
         _spatial, masks) = model_output
        emb_list, vis_list, mask_list = [], [], []
        for key in self.test_embeddings:
            e = embeddings[key]
            emb_list.append(e if e.ndim == 3 else e[:, None, :])
            raw = bn_correspondants.get(key, key)
            v = visibility_scores[raw]
            vis_list.append(v if v.ndim == 2 else v[:, None])
            m = masks[raw]
            mask_list.append(m if m.ndim == 4 else m[..., None])
        features = jnp.concatenate(emb_list, axis=1)
        visibility = jnp.concatenate(
            [v.astype(jnp.float32) for v in vis_list], axis=1)
        emb_masks = jnp.concatenate(mask_list, axis=-1)
        return features, visibility, emb_masks, pixels_cls_scores

    # ------------------------------------------------------------------
    # host control flow
    # ------------------------------------------------------------------
    def forward_backward(self, batch):
        if self.state is None:
            self.init_state()
        imgs = jnp.asarray(batch['image'])
        masks = jnp.asarray(batch['mask']) if 'mask' in batch else None
        pids = jnp.asarray(batch['pid'])
        sharding = getattr(self, 'batch_sharding', None)
        if sharding is not None:    # mesh-distributed (parallel/train.py)
            imgs = jax.device_put(imgs, sharding)
            pids = jax.device_put(pids, sharding)
            if masks is not None:
                masks = jax.device_put(masks, sharding)
        self.state, self._rng, loss, loss_summary = self._train_step(
            self.state, imgs, masks, pids, self._rng,
            freeze_base=self._freeze_base)

        freq = getattr(self.config.train, 'batch_debug_freq', 0) \
            if self.config is not None else 0
        if freq and self.engine_state.global_step % freq == 0:
            self._debug_visualize_batch(batch)
        # device scalars, NOT floats: a host readback here would block
        # on the async step every batch and serialize the pipeline —
        # MetricsSummary drains them lazily at print/log events
        return loss, loss_summary

    def _debug_visualize_batch(self, batch, max_samples=4):
        """Per-batch feature-map/part-mask debug dump, gated by
        cfg.train.batch_debug_freq (reference: part_based_engine.py:84)."""
        try:
            from bpbreid_tpu.utils.visualization import display_feature_maps
            imgs_u8 = jnp.asarray(batch['image'])
            raw_masks = jnp.asarray(batch['mask']) if 'mask' in batch \
                else None
            imgs, masks = eval_preprocess(imgs_u8, raw_masks,
                                          norm_mean=self.norm_mean,
                                          norm_std=self.norm_std,
                                          mask_kwargs=self.mask_kwargs)
            emb, vis, _idc, _pix, spatial, out_masks = self.model.apply(
                {'params': self.state.params,
                 'batch_stats': self.state.batch_stats},
                imgs, masks, train=False)
            base_dir = (self.config.data.save_dir
                        if self.config is not None else '.') or '.'
            save_dir = osp.join(base_dir, 'debug_feature_maps')
            display_feature_maps(
                emb, spatial[:max_samples], out_masks[PARTS][:max_samples],
                batch.get('img_path', [''] * max_samples),
                batch['pid'][:max_samples], save_dir=save_dir)
            from bpbreid_tpu.utils.visualization import (
                display_batch_triplets)
            display_batch_triplets(
                batch['image'], emb[PARTS], batch['pid'],
                osp.join(base_dir, 'debug_triplets'))
        except Exception as e:                        # debug-only path
            print('feature-map debug visualization failed: {}'.format(e))

    def _calibrate_int8(self, loader):
        """Accumulate int8 activation ranges over the first
        ``cfg.test.int8_calib_batches`` batches of ``loader``.

        Each calibration step threads the previous ``quant`` collection
        back in, so the per-conv |activation|max is a running maximum
        across batches (common.py PConv/calibrated_quant take
        ``maximum(prev, batch_amax)``) — one outlier-free batch can't
        under-scale the whole eval. The reference has no quantized
        path; its eval is exact fp32
        (torchreid/engine/image/part_based_engine.py:168-295)."""
        from bpbreid_tpu.ops.quant import int8_calibration

        def calibrate(params, batch_stats, quant_coll, imgs_u8, raw_masks):
            im, m = eval_preprocess(imgs_u8, raw_masks,
                                    norm_mean=self.norm_mean,
                                    norm_std=self.norm_std,
                                    mask_kwargs=self.mask_kwargs)
            variables = {'params': params, 'batch_stats': batch_stats}
            if quant_coll is not None:
                variables['quant'] = quant_coll
            _, qvars = self.model.apply(variables, im, m,
                                        train=False, mutable=['quant'])
            return qvars['quant']

        n_calib = max(1, int(getattr(self.config.test,
                                     'int8_calib_batches', 4)))
        pct = float(getattr(self.config.test, 'int8_calib_percentile', 99.9))
        quant_coll = None
        # one explicit jit wrapper: the first batch traces with
        # quant_coll=None (creates the collection), later batches
        # retrace once for the dict structure and then hit the cache —
        # never one full-graph compile per calibration batch
        calibrate_jit = jax.jit(calibrate)
        with int8_calibration(percentile=pct):
            for i, batch in enumerate(loader):
                if i >= n_calib:
                    break
                imgs = jnp.asarray(batch['image'])
                masks = jnp.asarray(batch['mask']) \
                    if 'mask' in batch else None
                quant_coll = calibrate_jit(
                    self.state.params, self.state.batch_stats,
                    quant_coll, imgs, masks)
        return quant_coll

    def _maybe_int8_eval_step(self, loader):
        """Return the int8 eval step (calibrating on the first
        ``int8_calib_batches`` batches of ``loader`` the first time)
        when cfg.test.int8 is on; None otherwise."""
        if self.config is None or not getattr(self.config.test, 'int8', False):
            return None
        if self._quant_coll is None:
            self._quant_coll = self._calibrate_int8(loader)
        # rebuilt every eval so cfg.test.int8_* changes take effect: the
        # knobs travel as a static jit arg of _eval_step (QuantOpts), so
        # a changed knob — not the contextvars — forces the retrace.
        # Stashed on self so the grouped path uses the SAME opts object
        # (one source of truth for which quantization graph runs).
        opts = self._active_quant_opts = QuantOpts.from_config(
            self.config.test)

        def int8_step(params, batch_stats, imgs, masks, quant):
            return self._eval_step(params, batch_stats, imgs, masks,
                                   quant, quant_opts=opts)

        self._int8_eval_step = int8_step
        return self._int8_eval_step

    def _feature_extraction(self, loader):
        f_, vis_, pids_, camids_ = [], [], [], []
        corr_, tot_, valid_ = [], [], []
        from bpbreid_tpu.engine.engine import device_prefetch
        sharding = getattr(self, 'batch_sharding', None)
        msharding = getattr(self, 'multi_batch_sharding', None)
        n_dev = self.mesh.devices.size if getattr(self, 'mesh', None) else 1
        int8_step = self._maybe_int8_eval_step(loader)
        k = 1
        if self.config is not None:
            k = max(1, int(getattr(self.config.test,
                                   'batches_per_dispatch', 1) or 1))
        if sharding is not None and msharding is None:
            k = 1       # mesh eval without a stacked-batch sharding

        # readback runs one dispatch behind: batch i's device->host
        # conversion happens only after dispatch i+1 is enqueued, so the
        # host never stalls the device pipeline, while HBM holds at most
        # two dispatches' outputs (a full eval's features must not
        # accumulate on device — 500k distractors x [P+2, 512] ~ 8 GB)
        flushed = 0

        def _flush(upto):
            nonlocal flushed
            for i in range(flushed, upto):
                f_[i] = np.asarray(f_[i])[valid_[i]]
                vis_[i] = np.asarray(vis_[i])[valid_[i]]
            flushed = upto

        if k > 1:
            # grouped dispatch: k batches per compiled program
            # (cfg.test.batches_per_dispatch; see _eval_multi_step_impl).
            # Stacking + H2D staging runs on a transfer thread one group
            # ahead (same rationale as device_prefetch): the ~75 MB
            # uint8 group copy overlaps the previous group's compute.
            qopts = self._active_quant_opts \
                if int8_step is not None else None

            def _stage(group):
                imgs = jnp.asarray(np.stack([b['image'] for b in group]))
                masks = jnp.asarray(
                    np.stack([b['mask'] for b in group])) \
                    if 'mask' in group[0] else None
                if msharding is not None and imgs.shape[1] % n_dev == 0:
                    imgs = jax.device_put(imgs, msharding)
                    if masks is not None:
                        masks = jax.device_put(masks, msharding)
                return group, imgs, masks

            def _staged_groups():
                from collections import deque
                from concurrent.futures import ThreadPoolExecutor
                with ThreadPoolExecutor(max_workers=1) as pool:
                    pending = deque()
                    for g in self._eval_batch_groups(loader, k):
                        pending.append(pool.submit(_stage, g))
                        if len(pending) > 1:
                            yield pending.popleft().result()
                    while pending:
                        yield pending.popleft().result()

            for group, imgs, masks in _staged_groups():
                if int8_step is not None:
                    feats, vis, corr, tot = self._eval_multi_step(
                        self.state.params, self.state.batch_stats, imgs,
                        masks, self._quant_coll, quant_opts=qopts)
                else:
                    feats, vis, corr, tot = self._eval_multi_step(
                        self.state.params, self.state.batch_stats, imgs,
                        masks)
                n_prev = len(valid_)
                for i, b in enumerate(group):
                    f_.append(feats[i])
                    vis_.append(vis[i])
                    corr_.append(corr[i])
                    tot_.append(tot[i])
                    valid = np.asarray(b['valid'])
                    valid_.append(valid)
                    pids_.append(np.asarray(b['pid'])[valid])
                    camids_.append(np.asarray(b['camid'])[valid])
                _flush(n_prev)      # previous group, post-dispatch
        else:
            for batch in device_prefetch(loader):
                imgs = jnp.asarray(batch['image'])
                masks = jnp.asarray(batch['mask']) \
                    if 'mask' in batch else None
                if sharding is not None and imgs.shape[0] % n_dev == 0:
                    imgs = jax.device_put(imgs, sharding)
                    if masks is not None:
                        masks = jax.device_put(masks, sharding)
                if int8_step is not None:
                    (feats, vis, _masks, _pxl, _m, corr, tot) = int8_step(
                        self.state.params, self.state.batch_stats, imgs,
                        masks, self._quant_coll)
                else:
                    (feats, vis, _masks, _pxl, _m, corr, tot) = \
                        self._eval_step(self.state.params,
                                        self.state.batch_stats, imgs, masks)
                f_.append(feats)
                vis_.append(vis)
                corr_.append(corr)
                tot_.append(tot)
                valid_.append(np.asarray(batch['valid']))
                pids_.append(np.asarray(batch['pid'])[valid_[-1]])
                camids_.append(np.asarray(batch['camid'])[valid_[-1]])
                _flush(len(valid_) - 1)     # previous batch

        _flush(len(valid_))
        # the [N]-scalar pixel-accuracy counts are tiny; read them last
        pxl_correct = pxl_total = 0.0
        for i, valid in enumerate(valid_):
            if np.ndim(corr_[i]):
                pxl_correct += float(np.asarray(corr_[i])[valid].sum())
                pxl_total += float(np.asarray(tot_[i])[valid].sum())
        acc = pxl_correct / pxl_total if pxl_total else 0.0
        return (np.concatenate(f_), np.concatenate(vis_),
                np.concatenate(pids_), np.concatenate(camids_), acc)

    def _evaluate(self, epoch, dataset_name='', query_loader=None,
                  gallery_loader=None, dist_metric='euclidean',
                  normalize_feature=False, visrank=False, visrank_topk=10,
                  visrank_q_idx_list=None, visrank_count=10, save_dir='',
                  use_metric_cuhk03=False, ranks=(1, 5, 10, 20), rerank=False,
                  save_features=False, **kwargs):
        if self.state is None:
            self.init_state()
        print('Extracting features from query set ...')
        qf, q_vis, q_pids, q_camids, q_pxl_acc = \
            self._feature_extraction(query_loader)
        print('Done, obtained {} tensor'.format(qf.shape))
        print('Extracting features from gallery set ...')
        gf, g_vis, g_pids, g_camids, g_pxl_acc = \
            self._feature_extraction(gallery_loader)
        print('Done, obtained {} tensor'.format(gf.shape))
        n_q, n_g = len(q_pids), len(g_pids)
        avg_pxl_acc = ((q_pxl_acc * n_q + g_pxl_acc * n_g) / (n_q + n_g)
                       if (n_q + n_g) else 0.0)
        if avg_pxl_acc:
            print('Pixel prediction accuracy: query {:.2%}, gallery {:.2%}, '
                  'average {:.2%}'.format(q_pxl_acc, g_pxl_acc, avg_pxl_acc))

        if normalize_feature:
            qf = self.normalize(qf)
            gf = self.normalize(gf)
        q_vis_arr = q_vis if self.mask_filtering_testing else None
        g_vis_arr = g_vis if self.mask_filtering_testing else None
        if q_vis_arr is not None \
                and self.config.model.bpbreid.testing_binary_visibility_score:
            q_vis_arr = q_vis_arr.astype(bool)
            g_vis_arr = g_vis_arr.astype(bool)
        # ad-hoc loaders (e.g. train-set retrieval in the learning gate)
        # pass a dataset_name the datamanager does not know — default
        # metric rather than KeyError
        _test_ds = getattr(self.datamanager, 'test_dataset', {}) or {}
        _entry = _test_ds.get(dataset_name)
        eval_metric = getattr(_entry['query'], 'eval_metric', 'default') \
            if _entry else 'default'
        if use_metric_cuhk03:
            eval_metric = 'cuhk03'
        mesh = getattr(self, 'mesh', None)

        # distractor-scale galleries: the whole device pipeline is
        # query-chunked — at market1501_500k the per-part distance
        # tensor alone is [K, 3368, 500k] ~ 40 GB, so neither the full
        # distance matrices nor a host round-trip are feasible (the
        # reference's part-based path has the same wall). Each chunk
        # computes distances + counting-ranking stats on device;
        # host-side consumers (SSMD, writer stats, per-part table) get
        # the first chunk over a gallery-column subsample.
        big_gallery = (len(q_pids) * len(g_pids)
                       > self.device_ranking_threshold
                       and eval_metric == 'default' and not rerank)
        if big_gallery:
            print('Large evaluation ({} queries x {} gallery): '
                  'query-chunked on-device distance + counting ranking; '
                  'host statistics on a subsample'
                  .format(len(q_pids), len(g_pids)))
            (cmc, mAP, distmat, body_parts_distmat, n_q_host, g_pids_host,
             g_camids_host, part_rows, pair_stats) = \
                self._chunked_device_eval(
                    qf, gf, q_vis_arr, g_vis_arr, q_pids, g_pids, q_camids,
                    g_camids, dist_metric, mesh)
            # host-side consumers see the first query chunk only
            q_pids_host = q_pids[:n_q_host]
            q_camids_host = q_camids[:n_q_host]
            q_vis_host = q_vis[:n_q_host]
        else:
            if mesh is not None and mesh.devices.size > 1:
                # gallery axis sharded over the mesh
                # (parallel/retrieval.py) — the framework's long-axis
                # parallelism (SURVEY §5)
                from bpbreid_tpu.parallel.retrieval import sharded_bp_distance
                distmat_dev, bp_distmat_dev, n_gal = sharded_bp_distance(
                    mesh, qf, gf, q_vis_arr, g_vis_arr,
                    self.dist_combine_strat, metric=dist_metric)
                distmat_dev = distmat_dev[:, :n_gal]
                bp_distmat_dev = bp_distmat_dev[..., :n_gal]
            else:
                distmat_dev, bp_distmat_dev = \
                    compute_distance_matrix_using_bp_features(
                        qf, gf, q_vis_arr, g_vis_arr,
                        self.dist_combine_strat,
                        self.batch_size_pairwise_dist_matrix,
                        metric=dist_metric)
            distmat = np.asarray(distmat_dev)
            body_parts_distmat = np.asarray(bp_distmat_dev)
            g_pids_host, g_camids_host = g_pids, g_camids
            q_pids_host, q_camids_host, q_vis_host = q_pids, q_camids, q_vis
            del distmat_dev
        if self.writer is not None:
            self.writer.qg_pairwise_dist_statistics(
                distmat, body_parts_distmat, q_vis_host, g_vis,
                subsample=big_gallery)

        if rerank:
            from bpbreid_tpu.utils.rerank import re_ranking
            d_qq, _ = compute_distance_matrix_using_bp_features(
                qf, qf, q_vis_arr, q_vis_arr, self.dist_combine_strat,
                self.batch_size_pairwise_dist_matrix, metric=dist_metric)
            d_gg, _ = compute_distance_matrix_using_bp_features(
                gf, gf, g_vis_arr, g_vis_arr, self.dist_combine_strat,
                self.batch_size_pairwise_dist_matrix, metric=dist_metric)
            distmat = re_ranking(distmat, np.asarray(d_qq), np.asarray(d_gg))

        if not big_gallery:
            print('Computing CMC and mAP ...')
            eval_metrics = metrics.evaluate_rank(distmat, q_pids, g_pids,
                                                 q_camids, g_camids,
                                                 eval_metric=eval_metric)
            mAP = eval_metrics['mAP']
            cmc = eval_metrics['cmc']
        print('** Results **')
        print('mAP: {:.2%}'.format(mAP))
        print('CMC curve')
        for r in ranks:
            if r <= len(cmc):      # tiny galleries: CMC shorter than max_rank
                print('Rank-{:<3}: {:.2%}'.format(r, cmc[r - 1]))

        if self.detailed_ranking:
            self.display_individual_parts_ranking_performances(
                body_parts_distmat, cmc, g_camids_host, g_pids_host, mAP,
                q_camids_host, q_pids_host, eval_metric,
                precomputed_rows=part_rows if big_gallery else None)

        if big_gallery and pair_stats is not None:
            # exact full-run moments accumulated per chunk on device
            from bpbreid_tpu.utils.distribution import compute_ssmd
            pm, ps, nm, ns = pair_stats
            ssmd = compute_ssmd(pm, ps, nm, ns)
            print('SSMD = {:.4f}'.format(ssmd))
        else:
            pm, ps, nm, ns, ssmd = plot_pairs_distance_distribution(
                distmat, q_pids_host, g_pids_host, 'Query-gallery')
            print('SSMD = {:.4f}{}'.format(
                ssmd, ' (gallery subsample)' if big_gallery else ''))

        if visrank and big_gallery:
            print('visrank skipped: gallery too large for ranking grids')
            visrank = False
        if visrank and hasattr(self.datamanager, 'test_dataset') \
                and dataset_name in self.datamanager.test_dataset:
            # top-k ranking grids per query with match highlighting
            # (reference: part_based_engine.py visualize_ranked_results)
            from bpbreid_tpu.utils.visualization.rankings import (
                visualize_ranking_grid)
            tds = self.datamanager.test_dataset[dataset_name]
            out_dir = osp.join(save_dir, 'visrank_{}'.format(dataset_name))

            def _masks_for(idxs, kind):
                """Recompute the [M, Hf, Wf, P] per-stream attention maps
                for a handful of selected samples — the reference holds
                full query/gallery mask tensors through eval
                (part_based_engine.py:150-157); recomputing on demand
                keeps eval memory flat. Padded to a fixed mini-batch so
                the jitted eval step traces at most one extra shape."""
                loader = query_loader if kind == 'query' else gallery_loader
                ds = tds['query' if kind == 'query' else 'gallery']
                pad_to = max(int(visrank_topk), 1)
                padded = list(idxs) + [idxs[0]] * (pad_to - len(idxs))
                imgs, masks = [], []
                for i in padded[:pad_to]:
                    s = ds.get(kind, i, loader.height, loader.width,
                               mask_grid=getattr(loader, 'mask_grid', None))
                    imgs.append(s['image'])
                    if 'mask' in s:
                        masks.append(s['mask'])
                imgs = jnp.asarray(np.stack(imgs))
                m = jnp.asarray(np.stack(masks)) if masks else None
                out = self._eval_step(self.state.params,
                                      self.state.batch_stats, imgs, m)
                return np.asarray(out[2])[:len(idxs)]

            paths = visualize_ranking_grid(
                distmat, tds['query'].query, tds['gallery'].gallery,
                out_dir, topk=visrank_topk, q_idx_list=visrank_q_idx_list,
                count=visrank_count, mAP=mAP, rank1=float(cmc[0]),
                dataset_name=dataset_name,
                bp_distmat=body_parts_distmat,
                q_vis=np.asarray(q_vis_host), g_vis=np.asarray(g_vis),
                masks_fn=_masks_for)
            print('Saved {} ranking grids to {}'.format(len(paths), out_dir))

        if save_features and save_dir:
            # dump part-based features for offline use
            # (reference: engine.py save_features -> features.pth per set)
            import os
            feat_dir = osp.join(save_dir, 'features_{}'.format(dataset_name))
            os.makedirs(feat_dir, exist_ok=True)
            np.savez(osp.join(feat_dir, 'features.npz'),
                     qf=qf, gf=gf, q_vis=q_vis, g_vis=g_vis,
                     q_pids=q_pids, g_pids=g_pids,
                     q_camids=q_camids, g_camids=g_camids)
            print('Saved features to {}'.format(feat_dir))

        if self.config is not None and getattr(
                self.config.test, 'vis_embedding_projection', False):
            from bpbreid_tpu.utils.visualization.embeddings import (
                visualize_embeddings_projection)
            visualize_embeddings_projection(
                qf, gf, q_pids, g_pids,
                osp.join(save_dir, 'embeddings_{}'.format(dataset_name)),
                dataset_name=dataset_name)

        if self.writer is not None:
            self.writer.report_eval(dataset_name, cmc, mAP, ssmd)
        return cmc, mAP, ssmd, avg_pxl_acc

    def _chunked_device_eval(self, qf, gf, q_vis_arr, g_vis_arr, q_pids,
                             g_pids, q_camids, g_camids, dist_metric, mesh,
                             max_rank=50, part_bytes_budget=2 << 30):
        """Distractor-scale evaluation: stream query chunks through the
        on-device distance + sort-free counting-ranking pipeline.

        Per chunk the [K, c, Ng] part-distance tensor is bounded by
        ``part_bytes_budget``; chunk CMC/mAP partials combine exactly
        (weighted by valid-query counts; padded queries get pid -1,
        which never matches, so they drop out as invalid). When
        ``detailed_ranking`` is on, the PER-PART CMC/mAP accumulate the
        same way — the per-part table at distractor scale is exact, not
        a subsample. Returns ``(cmc, mAP, sub_distmat, sub_bp_distmat,
        n_q_host, sub_g_pids, sub_g_camids, part_rows)`` where the
        ``sub_*`` arrays are the FIRST chunk over a deterministic
        gallery-column subsample for the host-side statistics/visuals
        and ``part_rows`` is ``[(mAP_p, rank1_p)] * K`` (or None).
        """
        from bpbreid_tpu.ops.ranking import cmc_map, cmc_map_counting
        nq, ngal = len(q_pids), len(g_pids)
        k_streams = qf.shape[1]
        c = int(part_bytes_budget // max(1, 4 * k_streams * ngal))
        c = max(16, min(nq, c))
        max_rank = min(max_rank, ngal)
        g_pids_d = jnp.asarray(g_pids)
        g_camids_d = jnp.asarray(g_camids)

        cmc_sum = np.zeros(max_rank, np.float64)
        map_sum, n_valid_total = 0.0, 0
        part_r1_sum = np.zeros(k_streams, np.float64)
        part_map_sum = np.zeros(k_streams, np.float64)
        # exact SSMD at any scale: pos/neg pair-distance moments
        # accumulate per chunk on device (f32 within a chunk, f64 across
        # chunks); padded queries (pid -1) are excluded from BOTH sets
        pair_acc = np.zeros(6, np.float64)   # pos: sum, sq, n; neg: ...

        @jax.jit
        def _pair_moments(d, qp, gp):
            valid = (qp >= 0)[:, None]
            same = (qp[:, None] == gp[None, :]) & valid
            diff = (qp[:, None] != gp[None, :]) & valid
            d32 = d.astype(jnp.float32)
            s = same.astype(jnp.float32)
            n = diff.astype(jnp.float32)
            return jnp.stack([
                jnp.sum(d32 * s), jnp.sum(d32 * d32 * s), jnp.sum(s),
                jnp.sum(d32 * n), jnp.sum(d32 * d32 * n), jnp.sum(n)])

        sub = None
        sub_dist = sub_bp = None
        for start in range(0, nq, c):
            qf_c = qf[start:start + c]
            qv_c = q_vis_arr[start:start + c] \
                if q_vis_arr is not None else None
            qp_c = np.asarray(q_pids[start:start + c])
            qc_c = np.asarray(q_camids[start:start + c])
            if len(qp_c) < c:          # pad to the static chunk shape;
                pad = c - len(qp_c)    # pid -1 never matches -> invalid
                qf_c = np.concatenate(
                    [qf_c, np.zeros((pad,) + qf_c.shape[1:], qf_c.dtype)])
                if qv_c is not None:
                    # constant filler independent of the remainder size:
                    # qv_c[:pad] under-pads whenever the final chunk holds
                    # fewer than `pad` real queries. Padded queries carry
                    # pid -1 and are dropped as invalid, so the fill value
                    # is irrelevant — use all-visible ones.
                    qv_c = np.concatenate(
                        [qv_c,
                         np.ones((pad,) + qv_c.shape[1:], qv_c.dtype)])
                qp_c = np.concatenate([qp_c, -np.ones(pad, qp_c.dtype)])
                qc_c = np.concatenate([qc_c, np.zeros(pad, qc_c.dtype)])
            if mesh is not None and mesh.devices.size > 1:
                from bpbreid_tpu.parallel.retrieval import sharded_bp_distance
                d_c, bp_c, n_gal = sharded_bp_distance(
                    mesh, qf_c, gf, qv_c, g_vis_arr,
                    self.dist_combine_strat, metric=dist_metric)
                d_c, bp_c = d_c[:, :n_gal], bp_c[..., :n_gal]
            else:
                d_c, bp_c = compute_distance_matrix_using_bp_features(
                    qf_c, gf, qv_c, g_vis_arr, self.dist_combine_strat,
                    self.batch_size_pairwise_dist_matrix,
                    metric=dist_metric)
            args = (d_c, jnp.asarray(qp_c), g_pids_d,
                    jnp.asarray(qc_c), g_camids_d)
            pair_acc += np.asarray(
                _pair_moments(d_c, args[1], g_pids_d), np.float64)
            cmc_c, map_c, nv_c, nover_c = cmc_map_counting(
                *args, max_rank=max_rank)
            if int(nover_c):           # exact full-sort fallback
                cmc_c, map_c, nv_c = cmc_map(*args, max_rank=max_rank)
            nv = int(nv_c)
            cmc_sum += np.asarray(cmc_c, np.float64) * nv
            map_sum += float(map_c) * nv
            n_valid_total += nv
            if self.detailed_ranking:
                # per-part partials: query validity is pid/camid-based,
                # identical across parts, so the same nv weights apply
                for p in range(k_streams):
                    pc, pm, _pnv, pov = cmc_map_counting(
                        bp_c[p], *args[1:], max_rank=max_rank)
                    if int(pov):
                        pc, pm, _pnv = cmc_map(bp_c[p], *args[1:],
                                               max_rank=max_rank)
                    part_r1_sum[p] += float(pc[0]) * nv
                    part_map_sum[p] += float(pm) * nv
            if sub is None:            # host stats from the first chunk
                sub = np.unique(np.linspace(
                    0, ngal - 1, min(20_000, ngal)).astype(np.int64))
                n_real = min(c, nq - start)
                sub_dist = np.asarray(d_c[:n_real, sub])
                sub_bp = np.asarray(bp_c[:, :n_real, :][..., sub])
            del d_c, bp_c
        if n_valid_total == 0:
            raise RuntimeError(
                'Error: all query identities do not appear in gallery')
        cmc = (cmc_sum / n_valid_total).astype(np.float32)
        mAP = map_sum / n_valid_total
        part_rows = [(part_map_sum[p] / n_valid_total,
                      part_r1_sum[p] / n_valid_total)
                     for p in range(k_streams)] \
            if self.detailed_ranking else None
        ps_, pq_, pn_, ns_, nq_, nn_ = pair_acc
        pair_stats = None
        if pn_ > 0 and nn_ > 0:
            pmean, nmean = ps_ / pn_, ns_ / nn_
            pair_stats = (pmean,
                          float(np.sqrt(max(0.0, pq_ / pn_ - pmean ** 2))),
                          nmean,
                          float(np.sqrt(max(0.0, nq_ / nn_ - nmean ** 2))))
        return (cmc, mAP, sub_dist, sub_bp, sub_dist.shape[0],
                g_pids[sub], g_camids[sub], part_rows, pair_stats)

    def display_individual_parts_ranking_performances(
            self, body_parts_distmat, cmc, g_camids, g_pids, mAP, q_camids,
            q_pids, eval_metric, subsample=False, precomputed_rows=None):
        """Per-part ranking table (reference: part_based_engine.py:308-339).

        At distractor scale the table comes from ``precomputed_rows`` —
        exact per-part CMC/mAP accumulated from the per-chunk
        counting-ranker partials (see ``_chunked_device_eval``) — never
        from a subsample. ``subsample=True`` remains for callers that
        pass a subsampled distance matrix directly and marks the header,
        mirroring the SSMD print.
        """
        from bpbreid_tpu.constants import get_test_embeddings_names
        names = get_test_embeddings_names(
            self.config.model.bpbreid.masks.parts_names, self.test_embeddings)
        if precomputed_rows is not None:
            print('Parts embeddings individual rankings :')
            rows = [(names[p] if p < len(names) else 'p{}'.format(p),
                     m * 100, r1 * 100)
                    for p, (m, r1) in enumerate(precomputed_rows)]
            print('{:<20} {:>8} {:>8}'.format('embedding', 'mAP', 'R-1'))
            for name, m, r1 in rows:
                print('{:<20} {:>8.2f} {:>8.2f}'.format(name, m, r1))
            return rows
        print('Parts embeddings individual rankings{} :'.format(
            ' (first query chunk x gallery subsample)' if subsample else ''))
        rows = []
        for p in range(body_parts_distmat.shape[0]):
            try:
                perf = metrics.evaluate_rank(
                    body_parts_distmat[p], q_pids, g_pids, q_camids, g_camids,
                    eval_metric=eval_metric)
                name = names[p] if p < len(names) else 'p{}'.format(p)
                rows.append((name, perf['mAP'] * 100, perf['cmc'][0] * 100))
            except (AssertionError, RuntimeError):
                continue
        print('{:<20} {:>8} {:>8}'.format('embedding', 'mAP', 'R-1'))
        for name, m, r1 in rows:
            print('{:<20} {:>8.2f} {:>8.2f}'.format(name, m, r1))
        return rows
