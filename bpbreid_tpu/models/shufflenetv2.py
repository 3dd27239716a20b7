"""ShuffleNetV2 (NHWC, flax).

Rebuild of the reference (torchreid/models/shufflenetv2.py:36-262,
Ma et al. ECCV18): channel-split inverted residuals with channel
shuffle; x0.5/x1.0/x1.5/x2.0 width variants.
"""
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from bpbreid_tpu.models.common import BN_EPS, BN_MOMENTUM, max_pool_torch

__all__ = ['ShuffleNetV2', 'shufflenet_v2_x0_5', 'shufflenet_v2_x1_0',
           'shufflenet_v2_x1_5', 'shufflenet_v2_x2_0']


def channel_shuffle(x, groups=2):
    """NHWC channel shuffle (reference: shufflenetv2.py:43-53)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h, w, groups, c // groups)
    x = jnp.swapaxes(x, -1, -2)
    return x.reshape(n, h, w, c)


def _cbr(x, features, kernel, stride, groups, train, prefix, dtype,
         relu=True, conv_i=0, bn_i=1):
    pad = kernel // 2
    x = nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                padding=((pad, pad), (pad, pad)), use_bias=False,
                feature_group_count=groups, dtype=dtype,
                name='{}.{}'.format(prefix, conv_i))(x)
    x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                     epsilon=BN_EPS, dtype=dtype,
                     name='{}.{}'.format(prefix, bn_i))(x)
    return nn.relu(x) if relu else x


class InvertedResidual(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        branch_features = self.features // 2
        if self.stride > 1:
            inp = x.shape[-1]
            # branch1: dw conv + bn + 1x1 conv + bn + relu
            b1 = _cbr(x, inp, 3, self.stride, inp, train, 'branch1',
                      self.dtype, relu=False, conv_i=0, bn_i=1)
            b1 = _cbr(b1, branch_features, 1, 1, 1, train, 'branch1',
                      self.dtype, relu=True, conv_i=2, bn_i=3)
            b2_in = x
        else:
            x1, b2_in = jnp.split(x, 2, axis=-1)
            b1 = x1
        # branch2: 1x1 conv bn relu + dw conv bn + 1x1 conv bn relu
        b2 = _cbr(b2_in, branch_features, 1, 1, 1, train, 'branch2',
                  self.dtype, relu=True, conv_i=0, bn_i=1)
        b2 = _cbr(b2, branch_features, 3, self.stride, branch_features,
                  train, 'branch2', self.dtype, relu=False, conv_i=3, bn_i=4)
        b2 = _cbr(b2, branch_features, 1, 1, 1, train, 'branch2',
                  self.dtype, relu=True, conv_i=5, bn_i=6)
        out = jnp.concatenate([b1, b2], axis=-1)
        return channel_shuffle(out, 2)


class ShuffleNetV2(nn.Module):
    num_classes: int
    loss: str = 'softmax'
    stages_repeats: Sequence[int] = (4, 8, 4)
    stages_out_channels: Sequence[int] = (24, 116, 232, 464, 1024)
    dtype: Any = jnp.float32

    @property
    def feature_dim(self):
        return self.stages_out_channels[-1]

    @nn.compact
    def __call__(self, x, train: bool = False):
        oc = self.stages_out_channels
        x = _cbr(x, oc[0], 3, 2, 1, train, 'conv1', self.dtype)
        x = max_pool_torch(x)
        for si, (repeats, features) in enumerate(zip(self.stages_repeats,
                                                     oc[1:4])):
            stage = 'stage{}'.format(si + 2)
            x = InvertedResidual(features, 2, dtype=self.dtype,
                                 name='{}.0'.format(stage))(x, train)
            for b in range(1, repeats):
                x = InvertedResidual(features, 1, dtype=self.dtype,
                                     name='{}.{}'.format(stage, b))(x, train)
        x = _cbr(x, oc[4], 1, 1, 1, train, 'conv5', self.dtype)
        if self.loss == 'part_based':
            return x
        v = x.mean(axis=(1, 2))
        if not train:
            return v
        y = nn.Dense(self.num_classes, dtype=self.dtype, name='classifier')(v)
        if self.loss == 'softmax':
            return y
        elif self.loss == 'triplet':
            return y, v
        raise KeyError('Unsupported loss: {}'.format(self.loss))


def _shufflenet(repeats, channels, **kwargs):
    num_classes = kwargs.pop('num_classes', 1000)
    loss = kwargs.pop('loss', 'softmax')
    dtype = kwargs.pop('dtype', jnp.float32)
    return ShuffleNetV2(num_classes=num_classes, loss=loss,
                        stages_repeats=tuple(repeats),
                        stages_out_channels=tuple(channels), dtype=dtype)


def shufflenet_v2_x0_5(num_classes, loss='softmax', pretrained=True, **kwargs):
    return _shufflenet([4, 8, 4], [24, 48, 96, 192, 1024],
                       num_classes=num_classes, loss=loss, **kwargs)


def shufflenet_v2_x1_0(num_classes, loss='softmax', pretrained=True, **kwargs):
    return _shufflenet([4, 8, 4], [24, 116, 232, 464, 1024],
                       num_classes=num_classes, loss=loss, **kwargs)


def shufflenet_v2_x1_5(num_classes, loss='softmax', pretrained=True, **kwargs):
    return _shufflenet([4, 8, 4], [24, 176, 352, 704, 1024],
                       num_classes=num_classes, loss=loss, **kwargs)


def shufflenet_v2_x2_0(num_classes, loss='softmax', pretrained=True, **kwargs):
    return _shufflenet([4, 8, 4], [24, 244, 488, 976, 2048],
                       num_classes=num_classes, loss=loss, **kwargs)
