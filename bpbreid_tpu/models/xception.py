"""Xception (NHWC, flax).

Rebuild of the reference (torchreid/models/xception.py:26-344, Chollet
CVPR17): depthwise-separable conv blocks with linear residual skips;
stem convs are padding-free like the torch port.
"""
from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from bpbreid_tpu.models.common import BN_EPS, BN_MOMENTUM, max_pool_torch

__all__ = ['Xception', 'xception']


def _bn(x, train, name, dtype):
    return nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                        epsilon=BN_EPS, dtype=dtype, name=name)(x)


def _sep_conv(x, out_c, train, prefix, dtype, pad=1):
    in_c = x.shape[-1]
    x = nn.Conv(in_c, (3, 3), padding=((pad, pad), (pad, pad)),
                use_bias=False, feature_group_count=in_c, dtype=dtype,
                name=prefix + '.conv1')(x)
    return nn.Conv(out_c, (1, 1), use_bias=False, dtype=dtype,
                   name=prefix + '.pointwise')(x)


class XBlock(nn.Module):
    out_filters: int
    reps: int
    strides: int = 1
    start_with_relu: bool = True
    grow_first: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        inp = x
        in_filters = x.shape[-1]
        # mirror the torch Sequential construction to get matching indices
        ops = []                      # ('relu'|'sep'|'bn'|'pool', out_c)
        filters = in_filters
        if self.grow_first:
            ops += [('relu', None), ('sep', self.out_filters),
                    ('bn', self.out_filters)]
            filters = self.out_filters
        for _ in range(self.reps - 1):
            ops += [('relu', None), ('sep', filters), ('bn', filters)]
        if not self.grow_first:
            ops += [('relu', None), ('sep', self.out_filters),
                    ('bn', self.out_filters)]
        if not self.start_with_relu:
            ops = ops[1:]
        if self.strides != 1:
            ops.append(('pool', None))
        for idx, (kind, out_c) in enumerate(ops):
            if kind == 'relu':
                x = nn.relu(x)
            elif kind == 'sep':
                x = _sep_conv(x, out_c, train, 'rep.{}'.format(idx),
                              self.dtype)
            elif kind == 'bn':
                x = _bn(x, train, 'rep.{}'.format(idx), self.dtype)
            else:
                x = max_pool_torch(x, 3, self.strides, 1)
        if self.out_filters != in_filters or self.strides != 1:
            skip = nn.Conv(self.out_filters, (1, 1),
                           strides=(self.strides, self.strides),
                           use_bias=False, dtype=self.dtype, name='skip')(inp)
            skip = _bn(skip, train, 'skipbn', self.dtype)
        else:
            skip = inp
        return x + skip


class Xception(nn.Module):
    num_classes: int
    loss: str = 'softmax'
    fc_dims: Optional[Sequence[int]] = None
    dtype: Any = jnp.float32

    @property
    def feature_dim(self):
        return self.fc_dims[-1] if self.fc_dims else 2048

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding='VALID',
                    use_bias=False, dtype=self.dtype, name='conv1')(x)
        x = nn.relu(_bn(x, train, 'bn1', self.dtype))
        x = nn.Conv(64, (3, 3), padding='VALID', use_bias=False,
                    dtype=self.dtype, name='conv2')(x)
        x = nn.relu(_bn(x, train, 'bn2', self.dtype))
        specs = [(128, 2, 2, False, True), (256, 2, 2, True, True),
                 (728, 2, 2, True, True)] \
            + [(728, 3, 1, True, True)] * 8 \
            + [(1024, 2, 2, True, False)]
        for i, (out_f, reps, strides, swr, gf) in enumerate(specs):
            x = XBlock(out_f, reps, strides, start_with_relu=swr,
                       grow_first=gf, dtype=self.dtype,
                       name='block{}'.format(i + 1))(x, train)
        x = _sep_conv(x, 1536, train, 'conv3', self.dtype)
        x = nn.relu(_bn(x, train, 'bn3', self.dtype))
        x = _sep_conv(x, 2048, train, 'conv4', self.dtype)
        x = nn.relu(_bn(x, train, 'bn4', self.dtype))
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


def xception(num_classes, loss='softmax', pretrained=True, **kwargs):
    dtype = kwargs.pop('dtype', jnp.float32)
    return Xception(num_classes=num_classes, loss=loss, dtype=dtype)
