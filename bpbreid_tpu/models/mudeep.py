"""MuDeep: multiscale deep network (NHWC, flax).

Rebuild of the reference (torchreid/models/mudeep.py:10-253, Qian et al.
ICCV17): multiscale inception-style streams, a learned per-stream fusion
gate, and a big fc head. Input fixed at 256x128.
"""
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from bpbreid_tpu.models.common import BN_EPS, BN_MOMENTUM, max_pool_torch

__all__ = ['MuDeep', 'mudeep']


class ConvBlock(nn.Module):
    out_c: int
    k: tuple
    s: tuple = (1, 1)
    p: tuple = (0, 0)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        kh, kw = self.k if isinstance(self.k, tuple) else (self.k, self.k)
        ph, pw = self.p if isinstance(self.p, tuple) else (self.p, self.p)
        sh, sw = self.s if isinstance(self.s, tuple) else (self.s, self.s)
        x = nn.Conv(self.out_c, (kh, kw), strides=(sh, sw),
                    padding=((ph, ph), (pw, pw)), use_bias=True,
                    dtype=self.dtype, name='conv')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name='bn')(x)
        return nn.relu(x)


class MuDeep(nn.Module):
    num_classes: int
    loss: str = 'softmax'
    dtype: Any = jnp.float32
    feature_dim = 4096

    def _cb(self, x, out_c, k, s, p, train, name):
        return ConvBlock(out_c, k, s, p, dtype=self.dtype, name=name)(x, train)

    @nn.compact
    def __call__(self, x, train: bool = False):
        # block1: ConvLayers
        x = self._cb(x, 48, 3, 1, 1, train, 'block1.conv1')
        x = self._cb(x, 96, 3, 1, 1, train, 'block1.conv2')
        x = max_pool_torch(x)
        # block2: MultiScaleA
        s1 = self._cb(x, 96, 1, 1, 0, train, 'block2.stream1.0')
        s1 = self._cb(s1, 24, 3, 1, 1, train, 'block2.stream1.1')
        s2 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                         count_include_pad=True)
        s2 = self._cb(s2, 24, 1, 1, 0, train, 'block2.stream2.1')
        s3 = self._cb(x, 24, 1, 1, 0, train, 'block2.stream3')
        s4 = self._cb(x, 16, 1, 1, 0, train, 'block2.stream4.0')
        s4 = self._cb(s4, 24, 3, 1, 1, train, 'block2.stream4.1')
        s4 = self._cb(s4, 24, 3, 1, 1, train, 'block2.stream4.2')
        x = jnp.concatenate([s1, s2, s3, s4], axis=-1)
        # block3: Reduction
        r1 = max_pool_torch(x)
        r2 = self._cb(x, 96, 3, 2, 1, train, 'block3.stream2')
        r3 = self._cb(x, 48, 1, 1, 0, train, 'block3.stream3.0')
        r3 = self._cb(r3, 56, 3, 1, 1, train, 'block3.stream3.1')
        r3 = self._cb(r3, 64, 3, 2, 1, train, 'block3.stream3.2')
        x = jnp.concatenate([r1, r2, r3], axis=-1)
        # block4: MultiScaleB (returns 4 streams)
        b1 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                         count_include_pad=True)
        b1 = self._cb(b1, 256, 1, 1, 0, train, 'block4.stream1.1')
        b2 = self._cb(x, 64, 1, 1, 0, train, 'block4.stream2.0')
        b2 = self._cb(b2, 128, (1, 3), 1, (0, 1), train, 'block4.stream2.1')
        b2 = self._cb(b2, 256, (3, 1), 1, (1, 0), train, 'block4.stream2.2')
        b3 = self._cb(x, 256, 1, 1, 0, train, 'block4.stream3')
        b4 = self._cb(x, 64, 1, 1, 0, train, 'block4.stream4.0')
        b4 = self._cb(b4, 64, (1, 3), 1, (0, 1), train, 'block4.stream4.1')
        b4 = self._cb(b4, 128, (3, 1), 1, (1, 0), train, 'block4.stream4.2')
        b4 = self._cb(b4, 128, (1, 3), 1, (0, 1), train, 'block4.stream4.3')
        b4 = self._cb(b4, 256, (3, 1), 1, (1, 0), train, 'block4.stream4.4')
        # block5: Fusion with learned per-stream channel gates
        gates = [self.param('block5.a{}'.format(i + 1),
                            nn.initializers.uniform(scale=1.0), (1, 1, 1, 256))
                 for i in range(4)]
        fused = (gates[0] * b1 + gates[1] * b2 + gates[2] * b3
                 + gates[3] * b4)
        x = nn.avg_pool(fused, (4, 4), strides=(4, 4))
        if self.loss == 'part_based':
            return x
        # torch flattens NCHW -> channel-major
        v = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        v = nn.Dense(4096, dtype=self.dtype, name='fc.0')(v)
        v = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name='fc.1')(v)
        v = nn.relu(v)
        y = nn.Dense(self.num_classes, dtype=self.dtype, name='classifier')(v)
        if self.loss == 'softmax':
            return y
        elif self.loss == 'triplet':
            return y, v
        raise KeyError('Unsupported loss: {}'.format(self.loss))


def mudeep(num_classes, loss='softmax', pretrained=True, **kwargs):
    dtype = kwargs.pop('dtype', jnp.float32)
    return MuDeep(num_classes=num_classes, loss=loss, dtype=dtype)
