"""Shared conv-net building blocks (NHWC, flax.linen).

Parameter paths mirror the reference torch ``state_dict`` paths exactly
(e.g. ``layer1.0.conv1``) so pretrained torch checkpoints convert to
flax variables with a single generic name-preserving pass
(see bpbreid_tpu/utils/torch_weights.py). Convolution padding is
explicit (torch-style symmetric) rather than XLA 'SAME' to keep
numerical parity for stride-2 convs.

Compute dtype is configurable (bfloat16 on TPU); parameters and BN
statistics stay float32.
"""
from functools import partial
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from bpbreid_tpu.ops.quant import (QTensor, act_scale_from_amax, calib_amax,
                                   dequantize, quant_conv, quant_mode,
                                   quant_shared_points, quant_skipped,
                                   quantize_static)

BN_MOMENTUM = 0.9   # == torch momentum 0.1 (flax momentum keeps the old value)
BN_EPS = 1e-5


class PConv(nn.Module):
    """nn.Conv drop-in (same 'kernel'/'bias' params, init, and float
    semantics) with a calibrated int8 inference mode (see ops/quant.py):
    traced inside ``int8_calibration()`` it records |x|max into the
    'quant' collection; inside ``int8_inference()`` it quantizes with
    that static scale and runs the conv on the MXU in int8."""
    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Any = ((0, 0), (0, 0))
    use_bias: bool = True
    feature_group_count: int = 1
    # >1: input is space-to-depth packed (ops/lane_pack.py); the kernel
    # param keeps the LOGICAL [3,3,Cin,Cout] shape (torch-checkpoint
    # compatible) and is folded to the equivalent packed kernel at
    # trace time. Train-mode only (3x3, stride 1, pad 1).
    s2d_fold: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        data = x.q if isinstance(x, QTensor) else x
        if self.s2d_fold > 1:
            from bpbreid_tpu.ops.lane_pack import pack_conv3x3_kernel
            assert tuple(self.kernel_size) == (3, 3) \
                and tuple(self.strides) == (1, 1) \
                and self.feature_group_count == 1 \
                and not isinstance(x, QTensor)
            cin = data.shape[-1] // self.s2d_fold
            kernel = self.param('kernel', nn.initializers.lecun_normal(),
                                (3, 3, cin, self.features), jnp.float32)
            y = jax.lax.conv_general_dilated(
                data.astype(self.dtype),
                pack_conv3x3_kernel(kernel).astype(self.dtype),
                (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            if self.use_bias:
                bias = self.param('bias', nn.initializers.zeros,
                                  (self.features,), jnp.float32)
                y = y + jnp.tile(bias, self.s2d_fold).astype(self.dtype)
            return y
        kshape = (*self.kernel_size,
                  data.shape[-1] // self.feature_group_count, self.features)
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            kshape, jnp.float32)
        bias = self.param('bias', nn.initializers.zeros,
                          (self.features,), jnp.float32) \
            if self.use_bias else None
        mode = quant_mode()
        if mode == 'calibrate':
            amax = self.variable('quant', 'act_amax',
                                 lambda: jnp.zeros((data.shape[-1],),
                                                   jnp.float32))
            amax.value = jnp.maximum(amax.value, calib_amax(x))
        skipped = mode == 'int8' and quant_skipped(self.path)
        if skipped and isinstance(x, QTensor):
            x = dequantize(x, self.dtype)
        if isinstance(x, QTensor):
            # pre-quantized by the enclosing block/module (shared int8
            # copy across all consumers) — scale travels with the tensor
            y = quant_conv(x, kernel, tuple(self.strides), self.padding,
                           groups=self.feature_group_count,
                           out_dtype=self.dtype)
        elif mode == 'int8' and not skipped:
            if self.has_variable('quant', 'act_amax'):
                scale = act_scale_from_amax(
                    self.get_variable('quant', 'act_amax'))
            else:     # uncalibrated: dynamic fallback, same granularity
                # as the calibrated path (act_scale_from_amax) so the
                # two agree whenever calibration saw the same batch
                scale = act_scale_from_amax(
                    jnp.max(jnp.abs(x.astype(jnp.float32)),
                            axis=tuple(range(x.ndim - 1))))
            y = quant_conv(x, kernel, tuple(self.strides), self.padding,
                           scale, groups=self.feature_group_count,
                           out_dtype=self.dtype)
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                tuple(self.strides), self.padding,
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                feature_group_count=self.feature_group_count)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


def calibrated_quant(module, x, name='in_amax'):
    """Module-level single-quantization point for a hot tensor.

    In ``calibrate`` mode: records the running |x|max into the module's
    ``quant`` collection under ``name`` and returns ``x`` unchanged.
    In ``int8`` mode (with a calibrated scale present): returns a
    ``QTensor`` — one int8 HBM copy shared by every consumer (convs use
    it directly; residual/fusion adds read it through ``dequantize``,
    which fuses). Otherwise returns ``x`` unchanged.
    """
    if isinstance(x, QTensor):      # already quantized by an outer scope
        return x
    mode = quant_mode()
    if mode == 'calibrate':
        amax = module.variable('quant', name,
                               lambda: jnp.zeros((x.shape[-1],),
                                                 jnp.float32))
        amax.value = jnp.maximum(amax.value, calib_amax(x))
        return x
    if (mode == 'int8' and module.has_variable('quant', name)
            and quant_shared_points() and not quant_skipped(module.path)):
        return quantize_static(
            x, act_scale_from_amax(module.get_variable('quant', name)))
    return x


def conv(x, features, kernel, stride=1, name='conv', dtype=jnp.float32,
         groups=1, use_bias=False, padding=None):
    """torch-parity conv: symmetric padding of kernel//2 unless given."""
    pad = kernel // 2 if padding is None else padding
    return PConv(features, (kernel, kernel), strides=(stride, stride),
                 padding=((pad, pad), (pad, pad)), use_bias=use_bias,
                 feature_group_count=groups, dtype=dtype, name=name)(x)


def _bn_channel_sums(u, v, c):
    """(sum u, sum v) over all logical-channel groups in f32: the last
    axis holds ``fold`` spatial phases of ``c`` logical channels
    (``fold == 1`` for plain NHWC; ``fold == 4`` for space-to-depth
    packed activations, see ops/lane_pack.py) — phases of the same
    logical channel are summed together, so the statistics are
    bit-equal to the unpacked layout.

    Negative results from the round-4 chip measurements, kept so nobody
    re-tries them: (a) reducing over a lane-dense [M, 128] reshape
    (folding the [128] partial to [c] by ``lane % c``) regressed the
    train step 84 -> 231 ms — XLA must materialize the logical reshape
    as a physical relayout because NHWC activations carry a {C,N,W,H}
    minor-to-major layout (the lane_pack s2d layout avoids this: the
    pack happens ONCE per branch, not per BN); (b) a Pallas kernel
    (VMEM scratch accumulator + MXU ones-dot row reduction,
    experiments/pallas_bn_v2.py) measured slower than XLA's
    convert_reduce fusions at every branch shape."""
    axes = tuple(range(u.ndim - 1))
    s1, s2 = u.sum(axes), v.sum(axes)
    if s1.shape[-1] != c:
        fold = s1.shape[-1] // c
        s1 = s1.reshape(fold, c).sum(0)
        s2 = s2.reshape(fold, c).sum(0)
    return s1, s2


def _bn_tile(p, packed_c):
    """Broadcast a per-logical-channel vector to the packed channel
    axis (phase-major layout ``(phase, c)``, matching space_to_depth)."""
    c = p.shape[-1]
    return jnp.tile(p, packed_c // c) if packed_c != c else p


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _bn_train(x, scale, bias, eps):
    y, mean, var, _ = _bn_train_fwd_core(x, scale, bias, eps)
    return y, mean, var


def _bn_train_fwd_core(x, scale, bias, eps):
    c = scale.shape[-1]
    m = x.size // c
    xf = x.astype(jnp.float32)
    s1, s2 = _bn_channel_sums(xf, xf * xf, c)
    mean = s1 / m
    # fast variance E[x^2]-E[x]^2, clipped like flax _compute_stats
    var = jnp.maximum(0.0, s2 / m - mean * mean)
    rstd = jax.lax.rsqrt(var + eps)
    pc = x.shape[-1]
    y = (xf - _bn_tile(mean, pc)) * _bn_tile(rstd * scale, pc) \
        + _bn_tile(bias, pc)
    return y, mean, var, rstd


def _bn_train_vjp_fwd(x, scale, bias, eps):
    y, mean, var, rstd = _bn_train_fwd_core(x, scale, bias, eps)
    return (y, mean, var), (x, scale, mean, rstd)


def _bn_train_vjp_bwd(eps, res, cts):
    dy, dmean_ct, dvar_ct = cts
    x, scale, mean, rstd = res
    c = scale.shape[-1]
    pc = x.shape[-1]
    m = x.size // c
    dyf = dy.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    xhat = (xf - _bn_tile(mean, pc)) * _bn_tile(rstd, pc)
    dbias, dscale = _bn_channel_sums(dyf, dyf * xhat, c)
    # d/dx of the normalize with batch statistics, plus the (normally
    # zero — running stats are an aux output) mean/var cotangents
    g = _bn_tile(rstd * scale, pc)
    dx = g * (dyf - _bn_tile(dbias, pc) / m
              - xhat * (_bn_tile(dscale, pc) / m)) \
        + _bn_tile(dmean_ct, pc) / m \
        + _bn_tile(dvar_ct, pc) * (2.0 / m) * (xf - _bn_tile(mean, pc))
    return dx.astype(x.dtype), dscale, dbias


_bn_train.defvjp(_bn_train_vjp_fwd, _bn_train_vjp_bwd)


class FastBatchNorm(nn.Module):
    """``nn.BatchNorm`` drop-in (same params/variables/output) whose
    train-mode statistics and gradient reductions run lane-dense (see
    _bn_channel_sums). Semantics replicate flax: f32 fast-variance
    stats, running update ``m*ra + (1-m)*batch``, normalize in f32 cast
    to ``canonicalize_dtype(x, scale, bias, dtype)``."""
    use_running_average: bool = False
    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPS
    # >1: the input is space-to-depth packed with `fold` spatial phases
    # per logical channel (ops/lane_pack.py); params/stats keep the
    # logical channel count and statistics are bit-equal to unpacked
    fold: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from flax.linen import dtypes as flax_dtypes
        pc = x.shape[-1]
        c = pc // self.fold
        scale = self.param('scale', nn.initializers.ones, (c,), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda s: jnp.zeros(s, jnp.float32), (c,))
        ra_var = self.variable('batch_stats', 'var',
                               lambda s: jnp.ones(s, jnp.float32), (c,))
        out_dtype = flax_dtypes.canonicalize_dtype(x, scale, bias,
                                                   dtype=self.dtype)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
            y = (x.astype(jnp.float32) - _bn_tile(mean, pc)) \
                * _bn_tile(jax.lax.rsqrt(var + self.epsilon) * scale, pc) \
                + _bn_tile(bias, pc)
            return y.astype(out_dtype)
        y, mean, var = _bn_train(x, scale, bias, self.epsilon)
        if not self.is_initializing():
            ra_mean.value = (self.momentum * ra_mean.value
                             + (1.0 - self.momentum) * mean)
            ra_var.value = (self.momentum * ra_var.value
                            + (1.0 - self.momentum) * var)
        return y.astype(out_dtype)


def bn(x, train, name='bn', dtype=jnp.float32):
    return FastBatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=dtype, name=name)(x)


class BasicBlock(nn.Module):
    """Two 3x3 convs + residual (expansion 1).

    ``packed=True``: the input/output are space-to-depth lane-packed
    (ops/lane_pack.py; train-mode 32-ch HRNet branches) — convs fold
    their logical kernels, BNs fold their statistics, parameters keep
    the logical shapes.

    ``quant_out=True``: under shared-point int8 inference the block
    RETURNS a ``QTensor`` — the quantize (with this tensor's own
    calibrated scale, identical to what the consumer would use) fuses
    into the block's final add+relu, so the bf16 block output is never
    materialized in HBM: the residual trunk rides one s8 copy per
    block instead of bf16-write + bf16-read + s8-write (the
    clamp_convert fusions that dominate the int8 inference profile).
    Only safe when every consumer is QTensor-aware (PConv /
    calibrated_quant / dequantize)."""
    planes: int
    stride: int = 1
    has_downsample: bool = False
    groups: int = 1
    base_width: int = 64
    packed: bool = False
    quant_out: bool = False
    dtype: Any = jnp.float32
    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.packed:
            from bpbreid_tpu.ops.lane_pack import FOLD
            assert train and self.stride == 1 and not self.has_downsample
            residual = x
            out = nn.relu(FastBatchNorm(
                use_running_average=False, momentum=BN_MOMENTUM,
                epsilon=BN_EPS, fold=FOLD, dtype=self.dtype, name='bn1')(
                PConv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, s2d_fold=FOLD, dtype=self.dtype,
                      name='conv1')(x)))
            out = FastBatchNorm(
                use_running_average=False, momentum=BN_MOMENTUM,
                epsilon=BN_EPS, fold=FOLD, dtype=self.dtype, name='bn2')(
                PConv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, s2d_fold=FOLD, dtype=self.dtype,
                      name='conv2')(out))
            return nn.relu(out + residual)
        x = calibrated_quant(self, x)
        residual = dequantize(x, self.dtype) if isinstance(x, QTensor) else x
        out = nn.relu(bn(conv(x, self.planes, 3, self.stride, 'conv1',
                              self.dtype), train, 'bn1', self.dtype))
        out = bn(conv(out, self.planes, 3, 1, 'conv2', self.dtype),
                 train, 'bn2', self.dtype)
        if self.has_downsample:
            residual = bn(conv(x, self.planes, 1, self.stride, 'downsample.0',
                               self.dtype), train, 'downsample.1', self.dtype)
        y = nn.relu(out + residual)
        if self.quant_out:
            y = calibrated_quant(self, y, name='out_amax')
        return y


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck + residual (expansion 4).

    ``groups``/``base_width`` support the ResNeXt variants.
    ``quant_out``: producer-side shared-int8 output — see BasicBlock."""
    planes: int
    stride: int = 1
    has_downsample: bool = False
    groups: int = 1
    base_width: int = 64
    quant_out: bool = False
    dtype: Any = jnp.float32
    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = calibrated_quant(self, x)
        residual = dequantize(x, self.dtype) if isinstance(x, QTensor) else x
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out = nn.relu(bn(conv(x, width, 1, 1, 'conv1', self.dtype),
                         train, 'bn1', self.dtype))
        out = nn.relu(bn(conv(out, width, 3, self.stride, 'conv2', self.dtype,
                              groups=self.groups), train, 'bn2', self.dtype))
        out = bn(conv(out, self.planes * 4, 1, 1, 'conv3', self.dtype),
                 train, 'bn3', self.dtype)
        if self.has_downsample:
            residual = bn(conv(x, self.planes * 4, 1, self.stride,
                               'downsample.0', self.dtype),
                          train, 'downsample.1', self.dtype)
        y = nn.relu(out + residual)
        if self.quant_out:
            y = calibrated_quant(self, y, name='out_amax')
        return y


class ResLayer(nn.Module):
    """A stack of residual blocks named ``<i>`` like a torch Sequential.

    ``packed=True`` (BasicBlock only): input arrives space-to-depth
    lane-packed; the logical channel count is ``cin / 4``.

    ``quant_out=True``: under shared-point int8 inference the LAYER
    output is produced as a QTensor — see BasicBlock.quant_out; needs
    every downstream consumer QTensor-aware, so it is opt-in.
    ``quant_blocks=True`` (default): intermediate block outputs are
    producer-quantized — always safe, their only consumer is the next
    block. Producer-side quantization is numerically IDENTICAL to the
    consumer-side quantize it replaces (both quantize the same tensor
    with the scale calibrated on that tensor); the knob exists for the
    equivalence test and as a fallback."""
    block: Callable
    planes: int
    num_blocks: int
    stride: int = 1
    groups: int = 1
    base_width: int = 64
    packed: bool = False
    quant_out: bool = False
    quant_blocks: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        expansion = self.block.expansion
        cin = (x.q if isinstance(x, QTensor) else x).shape[-1]
        if self.packed:
            from bpbreid_tpu.ops.lane_pack import FOLD
            cin //= FOLD
        needs_ds = self.stride != 1 or cin != self.planes * expansion
        kw = {'packed': True} if self.packed else {}
        last = self.num_blocks - 1
        x = self.block(self.planes, self.stride, needs_ds, groups=self.groups,
                       base_width=self.base_width, dtype=self.dtype,
                       quant_out=self.quant_out if last == 0
                       else self.quant_blocks,
                       name='0', **kw)(x, train)
        for i in range(1, self.num_blocks):
            x = self.block(self.planes, 1, False, groups=self.groups,
                           base_width=self.base_width, dtype=self.dtype,
                           quant_out=self.quant_out if i == last
                           else self.quant_blocks,
                           name=str(i), **kw)(x, train)
        return x


def max_pool_torch(x, window=3, stride=2, padding=1):
    """torch-style max pool with symmetric -inf padding."""
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding=((padding, padding), (padding, padding)))
