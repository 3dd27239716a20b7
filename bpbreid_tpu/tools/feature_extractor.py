"""Inference API: paths / arrays (+ optional external masks) -> model
outputs.

Mirror of the reference FeatureExtractor
(reference: torchreid/tools/feature_extractor.py:14-191): builds the
model + test preprocessing internally; callable on a list of image
paths, a list of HWC uint8 arrays, or a single batched array. Batches
are padded to a fixed shape so the jitted forward compiles once.
"""
import numpy as np

__all__ = ['FeatureExtractor']


class FeatureExtractor:
    def __init__(self, cfg, model_path='', device=None, num_classes=1,
                 model=None, engine=None, verbose=True):
        import jax
        import jax.numpy as jnp
        from bpbreid_tpu import models as model_registry
        from bpbreid_tpu.data.augment import eval_preprocess

        self.cfg = cfg
        self.height = cfg.data.height
        self.width = cfg.data.width
        self.norm_mean = tuple(cfg.data.norm_mean)
        self.norm_std = tuple(cfg.data.norm_std)
        self.batch_size = cfg.test.batch_size

        if engine is not None:
            self.model = engine.model
            self.variables = {'params': engine.state.params,
                              'batch_stats': engine.state.batch_stats}
            self.mask_kwargs = engine.mask_kwargs
        else:
            self.model = model if model is not None else \
                model_registry.build_model(
                    name=cfg.model.name, num_classes=num_classes,
                    loss=cfg.loss.name, pretrained=cfg.model.pretrained,
                    config=cfg)
            rng = jax.random.PRNGKey(0)
            dummy = jnp.zeros((1, self.height, self.width, 3), jnp.float32)
            self.variables = self.model.init(rng, dummy, train=False)
            from bpbreid_tpu.ops.masks import masks_preprocess_all, GroupingSpec
            spec = masks_preprocess_all.get(cfg.model.bpbreid.masks.preprocess)
            self.mask_kwargs = None
            if isinstance(spec, GroupingSpec):
                mc = cfg.model.bpbreid.masks
                self.mask_kwargs = dict(
                    grouping_matrix=spec.matrix, combine=spec.combine,
                    background_strategy=mc.background_computation_strategy,
                    softmax_weight=mc.softmax_weight,
                    mask_filtering_threshold=mc.mask_filtering_threshold)
            if model_path:
                self._load_weights(model_path)

        mk = self.mask_kwargs

        import contextlib

        def forward(variables, imgs_u8, masks, quant_opts=None):
            imgs, m = eval_preprocess(imgs_u8, masks,
                                      norm_mean=self.norm_mean,
                                      norm_std=self.norm_std, mask_kwargs=mk)
            ctx = quant_opts.inference_context() if quant_opts is not None \
                else contextlib.nullcontext()
            with ctx:
                return self.model.apply(variables, imgs, m, train=False)

        def forward_nomask(variables, imgs_u8, quant_opts=None):
            imgs, _ = eval_preprocess(imgs_u8, None,
                                      norm_mean=self.norm_mean,
                                      norm_std=self.norm_std)
            ctx = quant_opts.inference_context() if quant_opts is not None \
                else contextlib.nullcontext()
            with ctx:
                return self.model.apply(variables, imgs, train=False)

        # quant_opts is static: the int8 knobs are trace-time
        # contextvars, invisible to the jit cache unless keyed here
        # (ops/quant.py QuantOpts)
        self._forward = jax.jit(forward, static_argnames=('quant_opts',))
        self._forward_nomask = jax.jit(forward_nomask,
                                       static_argnames=('quant_opts',))
        # calibrated int8 backbone (ops/quant.py), honoring cfg.test.int8:
        # calibrate activation ranges on the first batch, then pass the
        # QuantOpts static arg so the int8 graph gets its own cache entry
        self._use_int8 = bool(getattr(cfg.test, 'int8', False))
        self._quant_opts = None
        self._int8_ready = False
        if verbose:
            print('FeatureExtractor ready: {} @ {}x{}{}'.format(
                cfg.model.name, self.height, self.width,
                ' [int8]' if self._use_int8 else ''))

    def _ensure_int8(self, imgs, masks):
        if self._int8_ready:
            return
        import jax
        import jax.numpy as jnp
        from bpbreid_tpu.data.augment import eval_preprocess
        from bpbreid_tpu.ops.quant import int8_calibration
        mk = self.mask_kwargs

        def calibrate(variables, imgs_u8, raw_masks=None):
            im, m = eval_preprocess(imgs_u8, raw_masks,
                                    norm_mean=self.norm_mean,
                                    norm_std=self.norm_std, mask_kwargs=mk)
            args = (im, m) if raw_masks is not None else (im,)
            _, qvars = self.model.apply(variables, *args, train=False,
                                        mutable=['quant'])
            return qvars

        tcfg = getattr(self.cfg, 'test', None) \
            if getattr(self, 'cfg', None) is not None else None
        pct = float(getattr(tcfg, 'int8_calib_percentile', 99.9))
        with int8_calibration(percentile=pct):
            if masks is not None:
                qvars = jax.jit(calibrate)(self.variables, jnp.asarray(imgs),
                                           jnp.asarray(masks))
            else:
                qvars = jax.jit(calibrate)(self.variables, jnp.asarray(imgs))
        self.variables = {**self.variables, **qvars}
        from bpbreid_tpu.ops.quant import QuantOpts
        self._quant_opts = QuantOpts.from_config(tcfg)
        self._int8_ready = True

    def _load_weights(self, path):
        from bpbreid_tpu.utils.torch_weights import (
            load_torch_state_dict, torch_to_flax)
        sd, _ = load_torch_state_dict(path)
        self.variables, matched, _d = torch_to_flax(sd, self.variables)
        print('Loaded {} tensors from {}'.format(len(matched), path))

    def _prepare(self, inputs):
        import cv2
        arrays = []
        for item in inputs:
            if isinstance(item, str):
                img = cv2.cvtColor(cv2.imread(item), cv2.COLOR_BGR2RGB)
            else:
                img = np.asarray(item)
            if img.shape[:2] != (self.height, self.width):
                img = cv2.resize(img, (self.width, self.height),
                                 interpolation=cv2.INTER_LINEAR)
            arrays.append(img.astype(np.uint8))
        return np.stack(arrays)

    def __call__(self, inputs, external_parts_masks=None):
        """Returns the raw model output tuple for the batch (embeddings,
        visibility, cls scores, pixel scores, spatial features, masks)."""
        import jax.numpy as jnp
        if isinstance(inputs, (list, tuple)):
            imgs = self._prepare(inputs)
        else:
            imgs = np.asarray(inputs)
            if imgs.ndim == 3:
                imgs = imgs[None]
        if self._use_int8:
            self._ensure_int8(imgs, external_parts_masks)
        if external_parts_masks is not None:
            return self._forward(self.variables, jnp.asarray(imgs),
                                 jnp.asarray(external_parts_masks),
                                 quant_opts=self._quant_opts)
        return self._forward_nomask(self.variables, jnp.asarray(imgs),
                                    quant_opts=self._quant_opts)
