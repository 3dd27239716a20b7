"""MobileNetV2 (NHWC, flax).

Rebuild of the reference (torchreid/models/mobilenetv2.py:18-230):
inverted-residual bottlenecks with relu6, width multiplier variants
x1_0 / x1_4.
"""
from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from bpbreid_tpu.models.common import BN_EPS, BN_MOMENTUM

__all__ = ['MobileNetV2', 'mobilenetv2_x1_0', 'mobilenetv2_x1_4']


def _conv_block(x, features, kernel, stride, pad, groups, train, name, dtype):
    x = nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                padding=((pad, pad), (pad, pad)), use_bias=False,
                feature_group_count=groups, dtype=dtype,
                name=name + '.conv')(x)
    x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                     epsilon=BN_EPS, dtype=dtype, name=name + '.bn')(x)
    return jnp.minimum(nn.relu(x), 6.0)


class InvertedBottleneck(nn.Module):
    features: int
    expansion: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        in_c = x.shape[-1]
        mid = in_c * self.expansion
        use_residual = self.stride == 1 and in_c == self.features
        m = _conv_block(x, mid, 1, 1, 0, 1, train, 'conv1', self.dtype)
        m = _conv_block(m, mid, 3, self.stride, 1, mid, train, 'dwconv2',
                        self.dtype)
        m = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name='conv3.0')(m)
        m = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name='conv3.1')(m)
        return x + m if use_residual else m


class MobileNetV2(nn.Module):
    num_classes: int
    width_mult: float = 1.0
    loss: str = 'softmax'
    fc_dims: Optional[Sequence[int]] = None
    dtype: Any = jnp.float32

    @property
    def feature_dim(self):
        base = int(1280 * self.width_mult) if self.width_mult > 1 else 1280
        return self.fc_dims[-1] if self.fc_dims else base

    @nn.compact
    def __call__(self, x, train: bool = False):
        wm = self.width_mult
        x = _conv_block(x, int(32 * wm), 3, 2, 1, 1, train, 'conv1',
                        self.dtype)
        # (expansion t, out channels c, blocks n, stride s) per stage
        stages = [(1, int(16 * wm), 1, 1), (6, int(24 * wm), 2, 2),
                  (6, int(32 * wm), 3, 2), (6, int(64 * wm), 4, 2),
                  (6, int(96 * wm), 3, 1), (6, int(160 * wm), 3, 2),
                  (6, int(320 * wm), 1, 1)]
        for si, (t, c, n, s) in enumerate(stages):
            for b in range(n):
                x = InvertedBottleneck(
                    c, t, s if b == 0 else 1, dtype=self.dtype,
                    name='conv{}.{}'.format(si + 2, b))(x, train)
        out_c = int(1280 * wm) if wm > 1 else 1280
        x = _conv_block(x, out_c, 1, 1, 0, 1, train, 'conv9', self.dtype)
        if self.loss == 'part_based':
            return x
        v = x.mean(axis=(1, 2))
        if self.fc_dims:
            for i, dim in enumerate(self.fc_dims):
                v = nn.Dense(dim, dtype=self.dtype,
                             name='fc.{}'.format(i * 3))(v)
                v = nn.BatchNorm(use_running_average=not train,
                                 momentum=BN_MOMENTUM, epsilon=BN_EPS,
                                 dtype=self.dtype,
                                 name='fc.{}'.format(i * 3 + 1))(v)
                v = nn.relu(v)
        if not train:
            return v
        y = nn.Dense(self.num_classes, dtype=self.dtype, name='classifier')(v)
        if self.loss == 'softmax':
            return y
        elif self.loss == 'triplet':
            return y, v
        raise KeyError('Unsupported loss: {}'.format(self.loss))


def mobilenetv2_x1_0(num_classes, loss='softmax', pretrained=True, **kwargs):
    dtype = kwargs.pop('dtype', jnp.float32)
    return MobileNetV2(num_classes=num_classes, width_mult=1.0, loss=loss,
                       dtype=dtype)


def mobilenetv2_x1_4(num_classes, loss='softmax', pretrained=True, **kwargs):
    dtype = kwargs.pop('dtype', jnp.float32)
    return MobileNetV2(num_classes=num_classes, width_mult=1.4, loss=loss,
                       dtype=dtype)
