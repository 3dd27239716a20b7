"""ShuffleNet v1 (NHWC, flax).

Rebuild of the reference (torchreid/models/shufflenet.py:16-198,
Zhang et al. CVPR18): grouped 1x1 convs + channel shuffle + depthwise
3x3; stride-2 blocks concat an avg-pooled shortcut.
"""
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from bpbreid_tpu.models.common import BN_EPS, BN_MOMENTUM, max_pool_torch
from bpbreid_tpu.models.shufflenetv2 import channel_shuffle

__all__ = ['ShuffleNet', 'shufflenet']

# num_groups -> stage out_channels (reference: shufflenet.py:91-99)
_CFG = {1: [144, 288, 576], 2: [200, 400, 800], 3: [240, 480, 960],
        4: [272, 544, 1088], 8: [384, 768, 1536]}


def _bn(x, train, name, dtype):
    return nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                        epsilon=BN_EPS, dtype=dtype, name=name)(x)


class ShuffleBottleneck(nn.Module):
    out_channels: int
    stride: int
    num_groups: int
    group_conv1x1: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        out_channels = self.out_channels
        mid = out_channels // 4
        if self.stride == 2:
            out_channels = out_channels - x.shape[-1]
        g1 = self.num_groups if self.group_conv1x1 else 1
        out = nn.Conv(mid, (1, 1), use_bias=False, feature_group_count=g1,
                      dtype=self.dtype, name='conv1')(x)
        out = nn.relu(_bn(out, train, 'bn1', self.dtype))
        out = channel_shuffle(out, self.num_groups)
        out = nn.Conv(mid, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False,
                      feature_group_count=mid, dtype=self.dtype,
                      name='conv2')(out)
        out = _bn(out, train, 'bn2', self.dtype)
        out = nn.Conv(out_channels, (1, 1), use_bias=False,
                      feature_group_count=self.num_groups, dtype=self.dtype,
                      name='conv3')(out)
        out = _bn(out, train, 'bn3', self.dtype)
        if self.stride == 2:
            res = nn.avg_pool(x, (3, 3), strides=(2, 2),
                              padding=((1, 1), (1, 1)),
                              count_include_pad=True)
            return nn.relu(jnp.concatenate([res, out], axis=-1))
        return nn.relu(x + out)


class ShuffleNet(nn.Module):
    num_classes: int
    loss: str = 'softmax'
    num_groups: int = 3
    dtype: Any = jnp.float32

    @property
    def feature_dim(self):
        return _CFG[self.num_groups][2]

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = _CFG[self.num_groups]
        x = nn.Conv(24, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name='conv1.0')(x)
        x = nn.relu(_bn(x, train, 'conv1.1', self.dtype))
        x = max_pool_torch(x)
        stage_blocks = (4, 8, 4)
        for si, (n_blocks, feats) in enumerate(zip(stage_blocks, cfg)):
            stage = 'stage{}'.format(si + 2)
            for b in range(n_blocks):
                x = ShuffleBottleneck(
                    feats, 2 if b == 0 else 1, self.num_groups,
                    group_conv1x1=not (si == 0 and b == 0),
                    dtype=self.dtype,
                    name='{}.{}'.format(stage, b))(x, train)
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


def shufflenet(num_classes, loss='softmax', pretrained=True, **kwargs):
    dtype = kwargs.pop('dtype', jnp.float32)
    return ShuffleNet(num_classes=num_classes, loss=loss, dtype=dtype)
