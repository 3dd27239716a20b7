"""SqueezeNet 1.0/1.1 (+fc512) (NHWC, flax).

Rebuild of the reference (torchreid/models/squeezenet.py:19-236,
Iandola et al.): Fire modules (squeeze 1x1 -> parallel 1x1/3x3 expand),
stem convs WITHOUT padding and ceil-mode maxpools like torchvision.
"""
from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from bpbreid_tpu.models.common import BN_EPS, BN_MOMENTUM

__all__ = ['SqueezeNet', 'squeezenet1_0', 'squeezenet1_1',
           'squeezenet1_0_fc512']


def _max_pool_ceil(x, window=3, stride=2):
    h, w = x.shape[1], x.shape[2]
    out_h = -(-(h - window) // stride) + 1
    out_w = -(-(w - window) // stride) + 1
    pad_h = max(0, (out_h - 1) * stride + window - h)
    pad_w = max(0, (out_w - 1) * stride + window - w)
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding=((0, pad_h), (0, pad_w)))


class Fire(nn.Module):
    squeeze_planes: int
    expand1x1_planes: int
    expand3x3_planes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(self.squeeze_planes, (1, 1), use_bias=True,
                            dtype=self.dtype, name='squeeze')(x))
        e1 = nn.relu(nn.Conv(self.expand1x1_planes, (1, 1), use_bias=True,
                             dtype=self.dtype, name='expand1x1')(x))
        e3 = nn.relu(nn.Conv(self.expand3x3_planes, (3, 3),
                             padding=((1, 1), (1, 1)), use_bias=True,
                             dtype=self.dtype, name='expand3x3')(x))
        return jnp.concatenate([e1, e3], axis=-1)


# (layer type, args) sequences with torchvision Sequential indices
_V10 = [('conv', 96, 7, 2), ('pool',), ('fire', 16, 64, 64),
        ('fire', 16, 64, 64), ('fire', 32, 128, 128), ('pool',),
        ('fire', 32, 128, 128), ('fire', 48, 192, 192),
        ('fire', 48, 192, 192), ('fire', 64, 256, 256), ('pool',),
        ('fire', 64, 256, 256)]
_V11 = [('conv', 64, 3, 2), ('pool',), ('fire', 16, 64, 64),
        ('fire', 16, 64, 64), ('pool',), ('fire', 32, 128, 128),
        ('fire', 32, 128, 128), ('pool',), ('fire', 48, 192, 192),
        ('fire', 48, 192, 192), ('fire', 64, 256, 256),
        ('fire', 64, 256, 256)]


class SqueezeNet(nn.Module):
    num_classes: int
    loss: str = 'softmax'
    version: float = 1.0
    fc_dims: Optional[Sequence[int]] = None
    dtype: Any = jnp.float32

    @property
    def feature_dim(self):
        return self.fc_dims[-1] if self.fc_dims else 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        plan = _V10 if self.version == 1.0 else _V11
        seq_idx = 0
        for item in plan:
            if item[0] == 'conv':
                _, feats, k, s = item
                x = nn.relu(nn.Conv(feats, (k, k), strides=(s, s),
                                    padding='VALID', use_bias=True,
                                    dtype=self.dtype,
                                    name='features.{}'.format(seq_idx))(x))
                seq_idx += 2                      # conv + relu
            elif item[0] == 'pool':
                x = _max_pool_ceil(x)
                seq_idx += 1
            else:
                _, sq, e1, e3 = item
                x = Fire(sq, e1, e3, dtype=self.dtype,
                         name='features.{}'.format(seq_idx))(x)
                seq_idx += 1
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


def squeezenet1_0(num_classes, loss='softmax', pretrained=True, **kwargs):
    dtype = kwargs.pop('dtype', jnp.float32)
    return SqueezeNet(num_classes=num_classes, loss=loss, version=1.0,
                      dtype=dtype)


def squeezenet1_0_fc512(num_classes, loss='softmax', pretrained=True,
                        **kwargs):
    dtype = kwargs.pop('dtype', jnp.float32)
    return SqueezeNet(num_classes=num_classes, loss=loss, version=1.0,
                      fc_dims=(512,), dtype=dtype)


def squeezenet1_1(num_classes, loss='softmax', pretrained=True, **kwargs):
    dtype = kwargs.pop('dtype', jnp.float32)
    return SqueezeNet(num_classes=num_classes, loss=loss, version=1.1,
                      dtype=dtype)
