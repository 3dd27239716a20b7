"""IBN-Net ResNets: resnet50_ibn_a / resnet50_ibn_b (NHWC, flax).

Rebuild of the reference ports (torchreid/models/resnet_ibn_a.py:63-300,
resnet_ibn_b.py:62-290, Pan et al. ECCV18):

- IBN-a: each bottleneck's bn1 is half-InstanceNorm / half-BatchNorm
  (except the 512-planes stage);
- IBN-b: InstanceNorm stem bn1 + InstanceNorm appended after the LAST
  block of layers 1 and 2.
"""
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from bpbreid_tpu.models.common import BN_EPS, BN_MOMENTUM, max_pool_torch
from bpbreid_tpu.models.resnet_fastreid import IBNLayer

__all__ = ['resnet50_ibn_a', 'resnet50_ibn_b']


def _bn(x, train, name, dtype):
    return nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                        epsilon=BN_EPS, dtype=dtype, name=name)(x)


def _inorm(x, name, dtype):
    return nn.GroupNorm(num_groups=x.shape[-1], epsilon=1e-5, dtype=dtype,
                        name=name)(x)


class IBNBottleneck(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    ibn_a: bool = False          # IBN on bn1 (variant a)
    in_after: bool = False       # InstanceNorm on the block output (variant b)
    dtype: Any = jnp.float32
    expansion = 4

    @nn.compact
    def __call__(self, x, train=False):
        residual = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      name='conv1')(x)
        if self.ibn_a:
            out = IBNLayer(dtype=self.dtype, name='bn1')(out, train)
        else:
            out = _bn(out, train, 'bn1', self.dtype)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3),
                      strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False,
                      dtype=self.dtype, name='conv2')(out)
        out = nn.relu(_bn(out, train, 'bn2', self.dtype))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      dtype=self.dtype, name='conv3')(out)
        out = _bn(out, train, 'bn3', self.dtype)
        if self.has_downsample:
            residual = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name='downsample.0')(x)
            residual = _bn(residual, train, 'downsample.1', self.dtype)
        out = out + residual
        if self.in_after:
            out = _inorm(out, 'IN', self.dtype)
        return nn.relu(out)


class ResNetIBN(nn.Module):
    num_classes: int = 1000
    loss: str = 'softmax'
    variant: str = 'a'
    layers: Sequence[int] = (3, 4, 6, 3)
    dtype: Any = jnp.float32
    feature_dim = 2048

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name='conv1')(x)
        if self.variant == 'b':
            x = _inorm(x, 'bn1', self.dtype)
        else:
            x = _bn(x, train, 'bn1', self.dtype)
        x = nn.relu(x)
        x = max_pool_torch(x)
        planes = (64, 128, 256, 512)
        strides = (1, 2, 2, 2)
        for s in range(4):
            n_blocks = self.layers[s]
            for b in range(n_blocks):
                stride = strides[s] if b == 0 else 1
                needs_ds = stride != 1 or x.shape[-1] != planes[s] * 4
                ibn_a = self.variant == 'a' and planes[s] != 512
                in_after = (self.variant == 'b' and s < 2
                            and b == n_blocks - 1)
                x = IBNBottleneck(planes[s], stride, needs_ds, ibn_a=ibn_a,
                                  in_after=in_after, dtype=self.dtype,
                                  name='layer{}.{}'.format(s + 1, b))(x, train)
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


def resnet50_ibn_a(num_classes, loss='softmax', pretrained=False, **kwargs):
    dtype = kwargs.pop('dtype', jnp.float32)
    return ResNetIBN(num_classes=num_classes, loss=loss, variant='a',
                     dtype=dtype)


def resnet50_ibn_b(num_classes, loss='softmax', pretrained=False, **kwargs):
    dtype = kwargs.pop('dtype', jnp.float32)
    return ResNetIBN(num_classes=num_classes, loss=loss, variant='b',
                     dtype=dtype)
