"""ResNet-mid: ResNet50 with mid-level feature fusion (NHWC, flax).

Rebuild of the reference (torchreid/models/resnetmid.py:125-307, Yu et
al. "The Devil is in the Middle"): the three layer-4 block outputs are
pooled; blocks a+b fuse through an fc layer and concatenate with block
c's embedding.
"""
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from bpbreid_tpu.models.common import (
    BN_EPS, BN_MOMENTUM, Bottleneck, ResLayer, max_pool_torch)

__all__ = ['ResNetMid', 'resnet50mid']


class ResNetMid(nn.Module):
    num_classes: int
    loss: str = 'softmax'
    layers: Sequence[int] = (3, 4, 6, 3)
    last_stride: int = 2
    fc_dims: Sequence[int] = (1024,)
    dtype: Any = jnp.float32

    @property
    def feature_dim(self):
        return self.fc_dims[-1] + 2048

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name='conv1')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name='bn1')(x)
        x = nn.relu(x)
        x = max_pool_torch(x)
        x = ResLayer(Bottleneck, 64, self.layers[0], 1, dtype=self.dtype,
                     name='layer1')(x, train)
        x = ResLayer(Bottleneck, 128, self.layers[1], 2, dtype=self.dtype,
                     name='layer2')(x, train)
        x = ResLayer(Bottleneck, 256, self.layers[2], 2, dtype=self.dtype,
                     name='layer3')(x, train)
        # layer4 unrolled to expose mid outputs
        needs_ds = self.last_stride != 1 or x.shape[-1] != 2048
        x4a = Bottleneck(512, self.last_stride, needs_ds, dtype=self.dtype,
                         name='layer4.0')(x, train)
        x4b = Bottleneck(512, 1, False, dtype=self.dtype,
                         name='layer4.1')(x4a, train)
        x4c = Bottleneck(512, 1, False, dtype=self.dtype,
                         name='layer4.2')(x4b, train)
        if self.loss == 'part_based':
            return x4c
        v4a = x4a.mean(axis=(1, 2))
        v4b = x4b.mean(axis=(1, 2))
        v4c = x4c.mean(axis=(1, 2))
        v4ab = jnp.concatenate([v4a, v4b], axis=-1)
        for i, dim in enumerate(self.fc_dims):
            v4ab = nn.Dense(dim, dtype=self.dtype,
                            name='fc_fusion.{}'.format(i * 3))(v4ab)
            v4ab = nn.BatchNorm(use_running_average=not train,
                                momentum=BN_MOMENTUM, epsilon=BN_EPS,
                                dtype=self.dtype,
                                name='fc_fusion.{}'.format(i * 3 + 1))(v4ab)
            v4ab = nn.relu(v4ab)
        v = jnp.concatenate([v4ab, v4c], axis=-1)
        if not train:
            return v
        y = nn.Dense(self.num_classes, dtype=self.dtype, name='classifier')(v)
        if self.loss == 'softmax':
            return y
        elif self.loss == 'triplet':
            return y, v
        raise KeyError('Unsupported loss: {}'.format(self.loss))


def resnet50mid(num_classes, loss='softmax', pretrained=True, **kwargs):
    dtype = kwargs.pop('dtype', jnp.float32)
    return ResNetMid(num_classes=num_classes, loss=loss, fc_dims=(1024,),
                     dtype=dtype)
