"""BPBreID: part-based re-identification model (NHWC, flax.linen).

TPU-native rebuild of the reference model
(reference: torchreid/models/bpbreid.py:15-279):

backbone feature map -> learned pixel-to-part attention (or external /
stripe masks) -> masked pooling (GWAP/GAP/GMP) -> per-stream dim-reduce
-> BNNeck classifiers, emitting 5 embedding streams (+BN variants),
visibility scores, id logits and pixel part logits.

TPU-first design decisions:
- everything is channel-last; the GWAP pooling is a single
  ``einsum('nhwk,nhwd->nkd')`` batched matmul (MXU) instead of the
  reference's [N,K,D,H,W] broadcast (bpbreid.py:489-503);
- the K per-part BNNeck classifiers are small fused matmuls unrolled at
  trace time (reference loop: bpbreid.py:272-275);
- masks are interpolated with exact align_corners bilinear
  (ops/resize.py) for parity with bpbreid.py:153.

Parameter paths mirror the reference ``state_dict`` so the published
BPBReID ``.pth`` checkpoints load via utils/torch_weights.
PCB stripe mode ('horizontal_stripes') is implemented with a zero
background channel (the reference's stripe path indexes a batchless
tensor inconsistently, bpbreid.py:141-158; here stripes behave as
documented: fixed attention, all parts visible).
"""
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from bpbreid_tpu import models as model_registry
from bpbreid_tpu.constants import (
    BACKGROUND, BN_BACKGROUND, BN_CONCAT_PARTS, BN_FOREGROUND, BN_GLOBAL,
    BN_PARTS, CONCAT_PARTS, FOREGROUND, GLOBAL, PARTS,
)
from bpbreid_tpu.models.common import BN_EPS, BN_MOMENTUM
from bpbreid_tpu.ops.pooling import parts_pooling
from bpbreid_tpu.ops.resize import (
    _linear_matrix_align_corners, resize_bilinear_align_corners)


def _bn1d(x, train, name, dtype, use_bias=True):
    return nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                        epsilon=BN_EPS, dtype=dtype, use_bias=use_bias,
                        name=name)(x)


class BNClassifier(nn.Module):
    """BNNeck: 1-D batchnorm (frozen zero bias) + bias-free linear
    (reference: bpbreid.py:398-425)."""
    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        # reference freezes the BN bias at zero -> simply omit it
        feature = _bn1d(x, train, 'bn', self.dtype, use_bias=False)
        scores = nn.Dense(self.num_classes, use_bias=False, dtype=self.dtype,
                          name='classifier')(feature)
        return feature, scores


class _BNParams(nn.Module):
    """Parameter/stat container matching nn.BatchNorm's tree layout
    (params: scale/bias, batch_stats: mean/var)."""
    features: int

    @nn.compact
    def __call__(self):
        scale = self.param('scale', nn.initializers.ones, (self.features,))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((self.features,)))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((self.features,)))
        return scale, bias, ra_mean, ra_var


class _Conv1x1Params(nn.Module):
    """Parameter container matching nn.Conv's tree layout."""
    in_features: int
    out_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (1, 1, self.in_features, self.out_features))
        bias = self.param('bias', nn.initializers.zeros,
                          (self.out_features,))
        return kernel, bias


class PixelToPartClassifier(nn.Module):
    """2-D batchnorm + 1x1 conv -> K+1 per-pixel part logits
    (reference: bpbreid.py:376-395).

    Two call modes with one parameter tree (identical to the
    nn.BatchNorm + nn.Conv layout so torch-weight conversion is
    unchanged):

    - ``__call__(x, train)``: the materialized path over the
      [N, Hf, Wf, D] concat map, exact nn.BatchNorm semantics.
    - ``__call__(branches=..., out_hw=(Hf, Wf), train=...)``: the
      multi-resolution path. BN + 1x1 conv are affine per channel and
      commute with align-corners bilinear upsampling (rows sum to 1),
      so logits are computed per HRNet branch at native resolution with
      the BN folded into sliced kernels, and only (K+1)-channel maps are
      upsampled. In train mode the batch statistics of the VIRTUAL
      upsampled concat are computed without materializing it: the mean
      is linear in each branch, and E[(A y B^T)^2] per channel equals
      tr(G_h y G_w y^T)/P with the Gram matrices G = A^T A of the
      static interpolation operators. Exactly equal to the materialized
      path; running stats are updated identically.
    """
    parts_num: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x=None, train=False, branches=None, out_hw=None):
        if branches is not None:
            channels = sum(b.shape[-1] for b in branches)
        else:
            channels = x.shape[-1]
        k1 = self.parts_num + 1
        scale, beta, ra_mean, ra_var = _BNParams(channels, name='bn')()
        kernel, cbias = _Conv1x1Params(channels, k1, name='classifier')()

        if branches is None:
            if train:
                xf = x.astype(jnp.float32)
                mean = xf.mean(axis=(0, 1, 2))
                var = (xf * xf).mean(axis=(0, 1, 2)) - mean * mean
            else:
                mean, var = ra_mean.value, ra_var.value
        else:
            hf, wf = out_hw
            p = hf * wf
            n = branches[0].shape[0]
            if train:
                means, e2s = [], []
                for y in branches:
                    h_i, w_i = y.shape[1], y.shape[2]
                    if (h_i, w_i) == (hf, wf):
                        # identity resize (the full-resolution branch):
                        # A = I so the Gram operators collapse and the
                        # virtual stats are the plain moments — a fused
                        # convert+reduce instead of two [hf,hf] matmuls
                        # over the largest branch tensor
                        yf = y.astype(jnp.float32)
                        means.append(yf.mean(axis=(0, 1, 2)))
                        e2s.append((yf * yf).mean(axis=(0, 1, 2)))
                        continue
                    a = _linear_matrix_align_corners(h_i, hf)  # [hf, h_i]
                    b = _linear_matrix_align_corners(w_i, wf)
                    mh, mw = jnp.asarray(a.sum(0)), jnp.asarray(b.sum(0))
                    gh = jnp.asarray(a.T @ a)
                    gw = jnp.asarray(b.T @ b)
                    yf = y.astype(jnp.float32)
                    means.append(
                        jnp.einsum('nhwc,h,w->c', yf, mh, mw,
                                   precision=jax.lax.Precision.HIGHEST)
                        / (n * p))
                    t = jnp.einsum('nhwc,hk->nkwc', yf, gh,
                                   precision=jax.lax.Precision.HIGHEST)
                    e2s.append(
                        jnp.einsum('nkwc,wl,nklc->c', t, gw, yf,
                                   precision=jax.lax.Precision.HIGHEST)
                        / (n * p))
                mean = jnp.concatenate(means)
                var = jnp.concatenate(e2s) - mean * mean
            else:
                mean, var = ra_mean.value, ra_var.value

        if train and not self.is_initializing():
            ra_mean.value = (BN_MOMENTUM * ra_mean.value
                             + (1.0 - BN_MOMENTUM) * mean)
            ra_var.value = (BN_MOMENTUM * ra_var.value
                            + (1.0 - BN_MOMENTUM) * var)

        if branches is None:
            # exact nn.BatchNorm op order in compute dtype
            xd = x.astype(self.dtype)
            mul = (jax.lax.rsqrt(var + BN_EPS) * scale).astype(self.dtype)
            y = (xd - mean.astype(self.dtype)) * mul + beta.astype(self.dtype)
            return jnp.einsum('nhwc,cd->nhwd', y, kernel[0, 0].astype(
                self.dtype)) + cbias.astype(self.dtype)

        a_full = scale * jax.lax.rsqrt(var + BN_EPS)
        b_full = beta - mean * a_full
        w_mat = kernel[0, 0]                                   # [D, K+1]
        const = b_full @ w_mat + cbias
        logits, off = None, 0
        for y in branches:
            d = y.shape[-1]
            w_i = a_full[off:off + d, None] * w_mat[off:off + d]
            # contract in the branch's own dtype (f32 accumulation via
            # preferred_element_type): casting y to f32 here pushed
            # full-size f32 activation copies AND f32 cotangents through
            # the branch backward (2x HBM traffic in bf16 mode)
            part = jnp.einsum('nhwd,dk->nhwk', y, w_i.astype(y.dtype),
                              preferred_element_type=jnp.float32)
            if part.shape[1:3] != (hf, wf):
                part = resize_bilinear_align_corners(part, hf, wf)
            logits = part if logits is None else logits + part
            off += d
        return (logits + const).astype(self.dtype)


class AfterPoolingDimReduce(nn.Module):
    """Linear + BN1d + ReLU; handles [N, D] and [N, K, D]
    (reference: bpbreid.py:324-350; BN reduces over N*K)."""
    output_dim: int
    dropout_rate: Optional[float] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Dense(self.output_dim, use_bias=True, dtype=self.dtype,
                     name='layers.0')(x)
        x = _bn1d(x, train, 'layers.1', self.dtype)
        x = nn.relu(x)
        if self.dropout_rate:
            x = nn.Dropout(self.dropout_rate, deterministic=not train,
                           name='layers.3')(x)
        return x


class BeforePoolingDimReduce(nn.Module):
    """1x1 conv + BN + ReLU (reference: bpbreid.py:286-321)."""
    output_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.output_dim, (1, 1), use_bias=True, dtype=self.dtype,
                    name='layers.0')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name='layers.1')(x)
        return nn.relu(x)


class BPBreID(nn.Module):
    """Part-based re-id network. See module docstring.

    Call: ``(images [N,H,W,3], external_parts_masks [N,Hm,Wm,K+1] | None)``
    -> ``(embeddings, visibility_scores, id_cls_scores, pixels_cls_scores,
    spatial_features, masks)`` with the same dict keys as the reference
    (bpbreid.py:222-259).
    """
    num_classes: int
    parts_num: int
    backbone: str = 'resnet50'
    pooling: str = 'gwap'
    normalization: str = 'identity'
    last_stride: int = 1
    dim_reduce: str = 'after_pooling'
    dim_reduce_output: int = 512
    learnable_attention_enabled: bool = True
    shared_parts_id_classifier: bool = False
    test_use_target_segmentation: str = 'none'
    training_binary_visibility_score: bool = True
    testing_binary_visibility_score: bool = True
    horizontal_stripes: bool = False
    use_pallas_pooling: bool = False
    # Inference fast path for HRNet: GWAP/GAP pooling and the pixel
    # classifier are linear in the features, and align-corners bilinear
    # upsampling is a row-stochastic linear map, so
    # ``pool(upsample(y), m) == pool(y, upsample_T(m))`` exactly. Pool
    # each HRNet branch at its native resolution with transposed-resized
    # masks and let XLA dead-code-eliminate the [N, H/4, W/4, 1920]
    # upsampled concat map (the reference materializes it:
    # torchreid/models/hrnet.py:532-545) — it dominates eval HBM traffic.
    multires_pooling: bool = True
    # hrnet32-only: stage-config override forwarded to the backbone
    # (HighResolutionNet.stages) — lets the flagship learning gate train
    # a depth-reduced W32 on a CPU test budget
    backbone_stages: Any = None
    dtype: Any = jnp.float32

    def setup(self):
        # attribute name == torch state_dict prefix (flax scopes by
        # attribute name for modules assigned in setup)
        if self.normalization != 'identity':
            # the reference marks the option obsolete ("always use
            # identity", default_config.py:46); fail loudly rather than
            # silently ignoring a requested pooling normalization
            raise NotImplementedError(
                "pooling normalization '{}' is not supported (the "
                "reference marks it obsolete; use 'identity')".format(
                    self.normalization))
        backbone_kwargs = {}
        self._multires = (
            self.multires_pooling and self.backbone == 'hrnet32'
            and self.learnable_attention_enabled
            and not self.horizontal_stripes
            and self.pooling in ('gwap', 'gap')
            and self.dim_reduce != 'before_pooling')
        if self._multires:
            backbone_kwargs['return_branches'] = True
        if self.backbone_stages is not None:
            backbone_kwargs['stages'] = self.backbone_stages
        self.backbone_appearance_feature_extractor = model_registry.build_model(
            self.backbone, self.num_classes, loss='part_based',
            pretrained=False, last_stride=self.last_stride,
            enable_dim_reduction=(self.dim_reduce == 'before_pooling'),
            dim_reduction_channels=self.dim_reduce_output,
            dtype=self.dtype, **backbone_kwargs)
        spatial_dim = self.backbone_appearance_feature_extractor.feature_dim

        self.use_before_reduce = (
            self.dim_reduce in ('before_pooling', 'before_and_after_pooling')
            and spatial_dim != self.dim_reduce_output
            and self.backbone != 'hrnet32')
        before_out = self.dim_reduce_output
        if self.dim_reduce == 'before_and_after_pooling':
            before_out = self.dim_reduce_output * 2
        if self.use_before_reduce:
            self.before_pooling_dim_reduce = BeforePoolingDimReduce(
                before_out, dtype=self.dtype, name='before_pooling_dim_reduce')
            spatial_dim = before_out

        self.spatial_dim = spatial_dim
        self.use_after_reduce = self.dim_reduce in (
            'after_pooling', 'before_and_after_pooling',
            'after_pooling_with_dropout')
        dropout = 0.5 if self.dim_reduce == 'after_pooling_with_dropout' else None
        if self.use_after_reduce:
            self.out_dim = self.dim_reduce_output
            for stream in ('global', 'foreground', 'background', 'parts'):
                setattr(self, '{}_reduce'.format(stream), AfterPoolingDimReduce(
                    self.dim_reduce_output, dropout, dtype=self.dtype,
                    name='{}_after_pooling_dim_reduce'.format(stream)))
        elif self.dim_reduce == 'before_pooling':
            self.out_dim = self.dim_reduce_output
        else:
            self.out_dim = spatial_dim

        self.pixel_classifier = PixelToPartClassifier(
            self.parts_num, dtype=self.dtype, name='pixel_classifier')

        self.global_identity_classifier = BNClassifier(
            self.num_classes, dtype=self.dtype, name='global_identity_classifier')
        self.background_identity_classifier = BNClassifier(
            self.num_classes, dtype=self.dtype,
            name='background_identity_classifier')
        self.foreground_identity_classifier = BNClassifier(
            self.num_classes, dtype=self.dtype,
            name='foreground_identity_classifier')
        self.concat_parts_identity_classifier = BNClassifier(
            self.num_classes, dtype=self.dtype,
            name='concat_parts_identity_classifier')
        if self.shared_parts_id_classifier:
            self.parts_identity_classifier = BNClassifier(
                self.num_classes, dtype=self.dtype,
                name='parts_identity_classifier')
        else:
            self.parts_identity_classifier = [
                BNClassifier(self.num_classes, dtype=self.dtype,
                             name='parts_identity_classifier.{}'.format(i))
                for i in range(self.parts_num)]

    def __call__(self, images, external_parts_masks=None, train: bool = False):
        K = self.parts_num
        spatial_features = self.backbone_appearance_feature_extractor(
            images, train=train)                           # [N,Hf,Wf,D]
        branch_features = None
        if isinstance(spatial_features, tuple):
            spatial_features, branch_features = spatial_features
        multires = (getattr(self, '_multires', False)
                    and branch_features is not None
                    and (train or
                         self.test_use_target_segmentation == 'none'))
        if self.use_before_reduce:
            spatial_features = self.before_pooling_dim_reduce(
                spatial_features, train=train)
        n, hf, wf, d = spatial_features.shape

        # ------------------------------------------------------------------
        # attention: per-pixel part probabilities [N, Hf, Wf, K+1]
        # ------------------------------------------------------------------
        pixels_cls_scores = None
        if self.horizontal_stripes:
            from bpbreid_tpu.ops.masks import pcb_stripe_masks
            stripes = pcb_stripe_masks(K, hf, wf, dtype=spatial_features.dtype)
            background = jnp.zeros((hf, wf, 1), spatial_features.dtype)
            probs = jnp.concatenate([background, stripes], axis=-1)
            probs = jnp.broadcast_to(probs[None], (n, hf, wf, K + 1))
        elif self.learnable_attention_enabled:
            if multires:
                # per-branch logits + virtual BN stats; the unused
                # upsample+concat map is dead-code-eliminated by XLA
                pixels_cls_scores = self.pixel_classifier(
                    train=train, branches=branch_features, out_hw=(hf, wf))
            else:
                pixels_cls_scores = self.pixel_classifier(spatial_features,
                                                          train=train)
            probs = jax.nn.softmax(pixels_cls_scores, axis=-1)
        else:
            if external_parts_masks is None:
                raise ValueError('external masks required when learnable '
                                 'attention is disabled')
            probs = resize_bilinear_align_corners(
                external_parts_masks.astype(spatial_features.dtype), hf, wf)

        background_masks = probs[..., 0]                  # [N, Hf, Wf]
        parts_masks = probs[..., 1:]                      # [N, Hf, Wf, K]

        # test-time refinement with external masks (bpbreid.py:160-175)
        if not train and self.test_use_target_segmentation != 'none':
            if external_parts_masks is None:
                raise ValueError('external masks required for '
                                 'test_use_target_segmentation')
            ext = resize_bilinear_align_corners(
                external_parts_masks.astype(spatial_features.dtype), hf, wf)
            if self.test_use_target_segmentation == 'hard':
                target = ext[..., 1:].max(axis=-1) > ext[..., 0]
                background_masks = (~target).astype(parts_masks.dtype)
                parts_masks = jnp.where(target[..., None], parts_masks, 1e-12)
                # reference parity: the torch in-place write
                # `parts_masks[bck] = 1e-12` (bpbreid.py:169) mutates a
                # VIEW of pixels_parts_probabilities, so the visibility
                # argmax/amax below sees the floored parts channels with
                # the original background channel
                probs = jnp.concatenate([probs[..., :1], parts_masks],
                                        axis=-1)
            elif self.test_use_target_segmentation == 'soft':
                # out-of-place in the reference (rebind, no view write):
                # visibility keeps the unrefined probabilities
                parts_masks = parts_masks * ext[..., 1:]

        foreground_masks = parts_masks.max(axis=-1)       # [N, Hf, Wf]
        global_masks = jnp.ones_like(foreground_masks)

        # ------------------------------------------------------------------
        # visibility scores (bpbreid.py:182-192)
        # ------------------------------------------------------------------
        binary = (train and self.training_binary_visibility_score) or \
                 (not train and self.testing_binary_visibility_score)
        if binary:
            pred = jnp.argmax(probs, axis=-1)             # [N, Hf, Wf]
            one_hot = jax.nn.one_hot(pred, K + 1, dtype=jnp.float32)
            vis = one_hot.max(axis=(1, 2)) > 0            # [N, K+1] bool
        else:
            vis = probs.max(axis=(1, 2))                  # [N, K+1] float
        background_visibility = vis[:, 0]
        foreground_visibility = vis.max(axis=1)
        parts_visibility = vis[:, 1:]
        concat_parts_visibility = foreground_visibility
        global_visibility = jnp.ones_like(foreground_visibility)

        # ------------------------------------------------------------------
        # pooling (fused einsum; ops/pooling.py)
        # ------------------------------------------------------------------
        if multires:
            # pool every stream per HRNet branch at native resolution
            # (see multires_pooling docstring): stack the full-res masks
            # [ones | foreground | background | parts], transpose-resize
            # them to each branch's grid, and contract there. Exactly
            # equal to pooling the upsampled concat map.
            dt = branch_features[0].dtype
            stack = jnp.concatenate([
                jnp.ones_like(foreground_masks)[..., None],
                foreground_masks[..., None],
                background_masks[..., None],
                parts_masks], axis=-1).astype(jnp.float32)   # [N,Hf,Wf,K+3]
            nums = []
            for y in branch_features:
                h_i, w_i = y.shape[1], y.shape[2]
                if (h_i, w_i) == (hf, wf):
                    adj = stack
                else:
                    mh = jnp.asarray(_linear_matrix_align_corners(h_i, hf))
                    mw = jnp.asarray(_linear_matrix_align_corners(w_i, wf))
                    adj = jnp.einsum('qh,nqpc,pw->nhwc', mh, stack, mw,
                                     precision=jax.lax.Precision.HIGHEST)
                # contract masks x features in the branch dtype with f32
                # accumulation — an f32 cast of y doubles the activation
                # (and cotangent) HBM traffic in bf16 mode
                nums.append(jnp.einsum(
                    'nhwc,nhwd->ncd', adj.astype(dt), y,
                    preferred_element_type=jnp.float32))
            num = jnp.concatenate(nums, axis=-1)             # [N,K+3,D]
            area = hf * wf
            global_embeddings = (num[:, 0] / area).astype(dt)
            foreground_embeddings = (num[:, 1] / area).astype(dt)
            background_embeddings = (num[:, 2] / area).astype(dt)
            if self.pooling == 'gwap':
                den = jnp.clip(parts_masks.astype(jnp.float32).sum(
                    axis=(1, 2)), 1e-6, None)                # [N,K]
                parts_embeddings = (num[:, 3:] / den[..., None]).astype(dt)
            else:
                parts_embeddings = (num[:, 3:] / area).astype(dt)
        else:
            global_embeddings, foreground_embeddings, background_embeddings, \
                parts_embeddings = self._pool_materialized(
                    spatial_features, foreground_masks, background_masks,
                    parts_masks, pixels_cls_scores, train, hf, wf)

        if self.use_after_reduce:
            global_embeddings = self.global_reduce(global_embeddings, train=train)
            foreground_embeddings = self.foreground_reduce(
                foreground_embeddings, train=train)
            background_embeddings = self.background_reduce(
                background_embeddings, train=train)
            parts_embeddings = self.parts_reduce(parts_embeddings, train=train)

        concat_parts_embeddings = parts_embeddings.reshape(n, -1)    # [N, K*D]

        # ------------------------------------------------------------------
        # BNNeck id classifiers
        # ------------------------------------------------------------------
        bn_global, global_cls = self.global_identity_classifier(
            global_embeddings, train=train)
        bn_background, background_cls = self.background_identity_classifier(
            background_embeddings, train=train)
        bn_foreground, foreground_cls = self.foreground_identity_classifier(
            foreground_embeddings, train=train)
        bn_concat, concat_cls = self.concat_parts_identity_classifier(
            concat_parts_embeddings, train=train)
        bn_parts, parts_cls = self._parts_identity_classification(
            parts_embeddings, train=train)

        embeddings = {
            GLOBAL: global_embeddings, BACKGROUND: background_embeddings,
            FOREGROUND: foreground_embeddings,
            CONCAT_PARTS: concat_parts_embeddings, PARTS: parts_embeddings,
            BN_GLOBAL: bn_global, BN_BACKGROUND: bn_background,
            BN_FOREGROUND: bn_foreground, BN_CONCAT_PARTS: bn_concat,
            BN_PARTS: bn_parts,
        }
        visibility_scores = {
            GLOBAL: global_visibility, BACKGROUND: background_visibility,
            FOREGROUND: foreground_visibility,
            CONCAT_PARTS: concat_parts_visibility, PARTS: parts_visibility,
        }
        id_cls_scores = {
            GLOBAL: global_cls, BACKGROUND: background_cls,
            FOREGROUND: foreground_cls, CONCAT_PARTS: concat_cls,
            PARTS: parts_cls,
        }
        masks = {
            GLOBAL: global_masks, BACKGROUND: background_masks,
            FOREGROUND: foreground_masks, CONCAT_PARTS: foreground_masks,
            PARTS: parts_masks,
        }
        return (embeddings, visibility_scores, id_cls_scores,
                pixels_cls_scores, spatial_features, masks)

    def _pool_materialized(self, spatial_features, foreground_masks,
                           background_masks, parts_masks, pixels_cls_scores,
                           train, hf, wf):
        """Default pooling over the materialized spatial feature map."""
        global_embeddings = spatial_features.mean(axis=(1, 2))       # [N, D]
        foreground_embeddings = parts_pooling(
            spatial_features, foreground_masks[..., None], 'gap')[:, 0]
        # Optional Pallas fast path: one fused VMEM pass computes
        # softmax + numerator/denominator for the background-GAP and
        # parts-GWAP reductions (ops/pallas/pooling.py). Only valid when
        # the masks really are softmax(pixel logits), i.e. learnable
        # attention, no stripes and no test-time mask refinement.
        fused = (self.use_pallas_pooling and self.pooling == 'gwap'
                 and self.learnable_attention_enabled
                 and not self.horizontal_stripes
                 and pixels_cls_scores is not None
                 and (train or self.test_use_target_segmentation == 'none'))
        if fused:
            from bpbreid_tpu.ops.pallas.pooling import fused_attention_pool
            num, den, _ = fused_attention_pool(spatial_features,
                                               pixels_cls_scores)
            background_embeddings = (num[:, 0] / (hf * wf)).astype(
                spatial_features.dtype)
            parts_embeddings = (
                num[:, 1:] / jnp.clip(den[:, 1:], 1e-6, None)[..., None]
            ).astype(spatial_features.dtype)                          # [N,K,D]
        else:
            background_embeddings = parts_pooling(
                spatial_features, background_masks[..., None], 'gap')[:, 0]
            parts_embeddings = parts_pooling(
                spatial_features, parts_masks, self.pooling)          # [N,K,D]
        return (global_embeddings, foreground_embeddings,
                background_embeddings, parts_embeddings)

    def _parts_identity_classification(self, parts_embeddings, train):
        n, k, d = parts_embeddings.shape
        if self.shared_parts_id_classifier:
            flat = parts_embeddings.reshape(n * k, d)
            bn_flat, cls_flat = self.parts_identity_classifier(flat, train=train)
            return (bn_flat.reshape(n, k, d),
                    cls_flat.reshape(n, k, -1))
        bn_list, cls_list = [], []
        for i in range(k):
            bn_i, cls_i = self.parts_identity_classifier[i](
                parts_embeddings[:, i], train=train)
            bn_list.append(bn_i)
            cls_list.append(cls_i)
        return jnp.stack(bn_list, axis=1), jnp.stack(cls_list, axis=1)


def bpbreid(num_classes, loss='part_based', pretrained=True, config=None,
            **kwargs):
    """Factory mirroring the reference ctor (bpbreid.py:510-518)."""
    del loss, pretrained
    mc = config.model.bpbreid
    # honor the PCB stripes mode of the shipped pcb_*.yaml configs (the
    # reference never routes masks.type='stripes' into the model when
    # built under name 'bpbreid' — see compute_parts_num_and_names note)
    kwargs.setdefault('horizontal_stripes', mc.masks.type == 'stripes')
    dtype = jnp.bfloat16 if getattr(config.model, 'compute_dtype', 'float32') \
        == 'bfloat16' else jnp.float32
    return BPBreID(
        num_classes=num_classes,
        parts_num=mc.masks.parts_num,
        backbone=mc.backbone,
        pooling=mc.pooling,
        normalization=mc.normalization,
        last_stride=mc.last_stride,
        dim_reduce=mc.dim_reduce,
        dim_reduce_output=mc.dim_reduce_output,
        learnable_attention_enabled=mc.learnable_attention_enabled,
        shared_parts_id_classifier=mc.shared_parts_id_classifier,
        test_use_target_segmentation=mc.test_use_target_segmentation,
        training_binary_visibility_score=mc.training_binary_visibility_score,
        testing_binary_visibility_score=mc.testing_binary_visibility_score,
        use_pallas_pooling=getattr(mc, 'use_pallas_pooling', False),
        multires_pooling=getattr(mc, 'multires_pooling', True),
        dtype=dtype,
        **kwargs)


def pcb(num_classes, loss='part_based', pretrained=True, config=None, **kwargs):
    config.model.bpbreid.learnable_attention_enabled = False
    m = config.model.bpbreid
    model = bpbreid(num_classes, loss, pretrained, config,
                    horizontal_stripes=True, **kwargs)
    return model


def bot(num_classes, loss='part_based', pretrained=True, config=None, **kwargs):
    config.model.bpbreid.masks.parts_num = 1
    config.model.bpbreid.learnable_attention_enabled = False
    return bpbreid(num_classes, loss, pretrained, config,
                   horizontal_stripes=True, **kwargs)
