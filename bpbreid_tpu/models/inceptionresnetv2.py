"""Inception-ResNet-V2 (NHWC, flax).

Rebuild of the reference (torchreid/models/inceptionresnetv2.py:37-361,
Szegedy et al. AAAI17): residual inception blocks (Block35/17/8) with
scaled residual sums; stem convs padding-free like the torch port.
"""
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from bpbreid_tpu.models.common import BN_MOMENTUM

__all__ = ['InceptionResNetV2', 'inceptionresnetv2']


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
    ones = jnp.ones(x.shape[:-1] + (1,), x.dtype)
    s = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                    count_include_pad=True)
    c = nn.avg_pool(ones, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                    count_include_pad=True)
    return s / c


class InceptionResNetV2(nn.Module):
    num_classes: int
    loss: str = 'softmax'
    dtype: Any = jnp.float32
    feature_dim = 1536

    def _c(self, x, train, name, out_c, k, s=1, p=0):
        return BasicConv2d(out_c, k, s, p, dtype=self.dtype,
                           name=name)(x, train)

    @nn.compact
    def __call__(self, x, train: bool = False):
        t = train
        x = self._c(x, t, 'conv2d_1a', 32, 3, 2)
        x = self._c(x, t, 'conv2d_2a', 32, 3, 1)
        x = self._c(x, t, 'conv2d_2b', 64, 3, 1, 1)
        x = _maxpool_nopad(x)
        x = self._c(x, t, 'conv2d_3b', 80, 1)
        x = self._c(x, t, 'conv2d_4a', 192, 3, 1)
        x = _maxpool_nopad(x)
        # Mixed_5b
        b0 = self._c(x, t, 'mixed_5b.branch0', 96, 1)
        b1 = self._c(x, t, 'mixed_5b.branch1.0', 48, 1)
        b1 = self._c(b1, t, 'mixed_5b.branch1.1', 64, 5, 1, 2)
        b2 = self._c(x, t, 'mixed_5b.branch2.0', 64, 1)
        b2 = self._c(b2, t, 'mixed_5b.branch2.1', 96, 3, 1, 1)
        b2 = self._c(b2, t, 'mixed_5b.branch2.2', 96, 3, 1, 1)
        b3 = self._c(_avgpool_excl(x), t, 'mixed_5b.branch3.1', 64, 1)
        x = jnp.concatenate([b0, b1, b2, b3], axis=-1)
        # 10x Block35 (scale .17)
        for i in range(10):
            p = 'repeat.{}'.format(i)
            b0 = self._c(x, t, p + '.branch0', 32, 1)
            b1 = self._c(x, t, p + '.branch1.0', 32, 1)
            b1 = self._c(b1, t, p + '.branch1.1', 32, 3, 1, 1)
            b2 = self._c(x, t, p + '.branch2.0', 32, 1)
            b2 = self._c(b2, t, p + '.branch2.1', 48, 3, 1, 1)
            b2 = self._c(b2, t, p + '.branch2.2', 64, 3, 1, 1)
            mix = jnp.concatenate([b0, b1, b2], axis=-1)
            mix = nn.Conv(320, (1, 1), use_bias=True, dtype=self.dtype,
                          name=p + '.conv2d')(mix)
            x = nn.relu(mix * 0.17 + x)
        # Mixed_6a
        b0 = self._c(x, t, 'mixed_6a.branch0', 384, 3, 2)
        b1 = self._c(x, t, 'mixed_6a.branch1.0', 256, 1)
        b1 = self._c(b1, t, 'mixed_6a.branch1.1', 256, 3, 1, 1)
        b1 = self._c(b1, t, 'mixed_6a.branch1.2', 384, 3, 2)
        x = jnp.concatenate([b0, b1, _maxpool_nopad(x)], axis=-1)
        # 20x Block17 (scale .10)
        for i in range(20):
            p = 'repeat_1.{}'.format(i)
            b0 = self._c(x, t, p + '.branch0', 192, 1)
            b1 = self._c(x, t, p + '.branch1.0', 128, 1)
            b1 = self._c(b1, t, p + '.branch1.1', 160, (1, 7), 1, (0, 3))
            b1 = self._c(b1, t, p + '.branch1.2', 192, (7, 1), 1, (3, 0))
            mix = jnp.concatenate([b0, b1], axis=-1)
            mix = nn.Conv(1088, (1, 1), use_bias=True, dtype=self.dtype,
                          name=p + '.conv2d')(mix)
            x = nn.relu(mix * 0.10 + x)
        # Mixed_7a
        b0 = self._c(x, t, 'mixed_7a.branch0.0', 256, 1)
        b0 = self._c(b0, t, 'mixed_7a.branch0.1', 384, 3, 2)
        b1 = self._c(x, t, 'mixed_7a.branch1.0', 256, 1)
        b1 = self._c(b1, t, 'mixed_7a.branch1.1', 288, 3, 2)
        b2 = self._c(x, t, 'mixed_7a.branch2.0', 256, 1)
        b2 = self._c(b2, t, 'mixed_7a.branch2.1', 288, 3, 1, 1)
        b2 = self._c(b2, t, 'mixed_7a.branch2.2', 320, 3, 2)
        x = jnp.concatenate([b0, b1, b2, _maxpool_nopad(x)], axis=-1)

        def block8(x, prefix, scale, no_relu=False):
            b0 = self._c(x, t, prefix + '.branch0', 192, 1)
            b1 = self._c(x, t, prefix + '.branch1.0', 192, 1)
            b1 = self._c(b1, t, prefix + '.branch1.1', 224, (1, 3), 1, (0, 1))
            b1 = self._c(b1, t, prefix + '.branch1.2', 256, (3, 1), 1, (1, 0))
            mix = jnp.concatenate([b0, b1], axis=-1)
            mix = nn.Conv(2080, (1, 1), use_bias=True, dtype=self.dtype,
                          name=prefix + '.conv2d')(mix)
            out = mix * scale + x
            return out if no_relu else nn.relu(out)

        for i in range(9):
            x = block8(x, 'repeat_2.{}'.format(i), 0.20)
        x = block8(x, 'block8', 1.0, no_relu=True)
        x = self._c(x, t, 'conv2d_7b', 1536, 1)
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


def inceptionresnetv2(num_classes, loss='softmax', pretrained=True, **kwargs):
    dtype = kwargs.pop('dtype', jnp.float32)
    return InceptionResNetV2(num_classes=num_classes, loss=loss, dtype=dtype)
