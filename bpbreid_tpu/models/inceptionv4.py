"""InceptionV4 (NHWC, flax).

Rebuild of the reference (torchreid/models/inceptionv4.py:37-381,
Szegedy et al. AAAI17). BasicConv2d uses eps=1e-3 batchnorm; pooling
branches use count_include_pad=False averages and padding-free maxpools
like the torch port. ``features.{i}`` indices mirror the torch
Sequential for checkpoint conversion.
"""
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from bpbreid_tpu.models.common import BN_MOMENTUM

__all__ = ['InceptionV4', 'inceptionv4']


def _pair(v):
    return v if isinstance(v, tuple) else (v, v)


class BasicConv2d(nn.Module):
    out_planes: int
    kernel_size: Any
    stride: int = 1
    padding: Any = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        kh, kw = _pair(self.kernel_size)
        ph, pw = _pair(self.padding)
        x = nn.Conv(self.out_planes, (kh, kw),
                    strides=(self.stride, self.stride),
                    padding=((ph, ph), (pw, pw)), use_bias=False,
                    dtype=self.dtype, name='conv')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=1e-3, dtype=self.dtype, name='bn')(x)
        return nn.relu(x)


def _maxpool_nopad(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding='VALID')


def _avgpool_excl(x):
    """3x3 stride-1 avg pool, count_include_pad=False."""
    ones = jnp.ones(x.shape[:-1] + (1,), x.dtype)
    s = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                    count_include_pad=True)
    c = nn.avg_pool(ones, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                    count_include_pad=True)
    return s / c


class InceptionV4(nn.Module):
    num_classes: int
    loss: str = 'softmax'
    dtype: Any = jnp.float32
    feature_dim = 1536

    def _c(self, x, train, idx, sub, out_c, k, s=1, p=0):
        return BasicConv2d(out_c, k, s, p, dtype=self.dtype,
                           name='features.{}.{}'.format(idx, sub) if sub
                           else 'features.{}'.format(idx))(x, train)

    @nn.compact
    def __call__(self, x, train: bool = False):
        t = train
        x = self._c(x, t, 0, '', 32, 3, 2)
        x = self._c(x, t, 1, '', 32, 3, 1)
        x = self._c(x, t, 2, '', 64, 3, 1, 1)
        # Mixed_3a (features.3)
        x = jnp.concatenate([_maxpool_nopad(x),
                             self._c(x, t, 3, 'conv', 96, 3, 2)], axis=-1)
        # Mixed_4a (features.4)
        b0 = self._c(x, t, 4, 'branch0.0', 64, 1)
        b0 = self._c(b0, t, 4, 'branch0.1', 96, 3)
        b1 = self._c(x, t, 4, 'branch1.0', 64, 1)
        b1 = self._c(b1, t, 4, 'branch1.1', 64, (1, 7), 1, (0, 3))
        b1 = self._c(b1, t, 4, 'branch1.2', 64, (7, 1), 1, (3, 0))
        b1 = self._c(b1, t, 4, 'branch1.3', 96, 3)
        x = jnp.concatenate([b0, b1], axis=-1)
        # Mixed_5a (features.5)
        x = jnp.concatenate([self._c(x, t, 5, 'conv', 192, 3, 2),
                             _maxpool_nopad(x)], axis=-1)
        idx = 6
        for _ in range(4):                                  # Inception_A x4
            b0 = self._c(x, t, idx, 'branch0', 96, 1)
            b1 = self._c(x, t, idx, 'branch1.0', 64, 1)
            b1 = self._c(b1, t, idx, 'branch1.1', 96, 3, 1, 1)
            b2 = self._c(x, t, idx, 'branch2.0', 64, 1)
            b2 = self._c(b2, t, idx, 'branch2.1', 96, 3, 1, 1)
            b2 = self._c(b2, t, idx, 'branch2.2', 96, 3, 1, 1)
            b3 = self._c(_avgpool_excl(x), t, idx, 'branch3.1', 96, 1)
            x = jnp.concatenate([b0, b1, b2, b3], axis=-1)
            idx += 1
        # Reduction_A (features.10)
        b0 = self._c(x, t, idx, 'branch0', 384, 3, 2)
        b1 = self._c(x, t, idx, 'branch1.0', 192, 1)
        b1 = self._c(b1, t, idx, 'branch1.1', 224, 3, 1, 1)
        b1 = self._c(b1, t, idx, 'branch1.2', 256, 3, 2)
        x = jnp.concatenate([b0, b1, _maxpool_nopad(x)], axis=-1)
        idx += 1
        for _ in range(7):                                  # Inception_B x7
            b0 = self._c(x, t, idx, 'branch0', 384, 1)
            b1 = self._c(x, t, idx, 'branch1.0', 192, 1)
            b1 = self._c(b1, t, idx, 'branch1.1', 224, (1, 7), 1, (0, 3))
            b1 = self._c(b1, t, idx, 'branch1.2', 256, (7, 1), 1, (3, 0))
            b2 = self._c(x, t, idx, 'branch2.0', 192, 1)
            b2 = self._c(b2, t, idx, 'branch2.1', 192, (7, 1), 1, (3, 0))
            b2 = self._c(b2, t, idx, 'branch2.2', 224, (1, 7), 1, (0, 3))
            b2 = self._c(b2, t, idx, 'branch2.3', 224, (7, 1), 1, (3, 0))
            b2 = self._c(b2, t, idx, 'branch2.4', 256, (1, 7), 1, (0, 3))
            b3 = self._c(_avgpool_excl(x), t, idx, 'branch3.1', 128, 1)
            x = jnp.concatenate([b0, b1, b2, b3], axis=-1)
            idx += 1
        # Reduction_B (features.18)
        b0 = self._c(x, t, idx, 'branch0.0', 192, 1)
        b0 = self._c(b0, t, idx, 'branch0.1', 192, 3, 2)
        b1 = self._c(x, t, idx, 'branch1.0', 256, 1)
        b1 = self._c(b1, t, idx, 'branch1.1', 256, (1, 7), 1, (0, 3))
        b1 = self._c(b1, t, idx, 'branch1.2', 320, (7, 1), 1, (3, 0))
        b1 = self._c(b1, t, idx, 'branch1.3', 320, 3, 2)
        x = jnp.concatenate([b0, b1, _maxpool_nopad(x)], axis=-1)
        idx += 1
        for _ in range(3):                                  # Inception_C x3
            b0 = self._c(x, t, idx, 'branch0', 256, 1)
            b1_0 = self._c(x, t, idx, 'branch1_0', 384, 1)
            b1a = self._c(b1_0, t, idx, 'branch1_1a', 256, (1, 3), 1, (0, 1))
            b1b = self._c(b1_0, t, idx, 'branch1_1b', 256, (3, 1), 1, (1, 0))
            b2_0 = self._c(x, t, idx, 'branch2_0', 384, 1)
            b2_1 = self._c(b2_0, t, idx, 'branch2_1', 448, (3, 1), 1, (1, 0))
            b2_2 = self._c(b2_1, t, idx, 'branch2_2', 512, (1, 3), 1, (0, 1))
            b2a = self._c(b2_2, t, idx, 'branch2_3a', 256, (1, 3), 1, (0, 1))
            b2b = self._c(b2_2, t, idx, 'branch2_3b', 256, (3, 1), 1, (1, 0))
            b3 = self._c(_avgpool_excl(x), t, idx, 'branch3.1', 256, 1)
            x = jnp.concatenate([b0, b1a, b1b, b2a, b2b, b3], axis=-1)
            idx += 1
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


def inceptionv4(num_classes, loss='softmax', pretrained=True, **kwargs):
    dtype = kwargs.pop('dtype', jnp.float32)
    return InceptionV4(num_classes=num_classes, loss=loss, dtype=dtype)
