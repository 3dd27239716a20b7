"""HACNN: Harmonious Attention CNN (NHWC, flax).

Rebuild of the reference (torchreid/models/hacnn.py:9-414, Li et al.
CVPR18): global branch of Inception-A/B blocks with soft (spatial x
channel) attention, plus a local branch where 4 learned regions are
cropped via a spatial transformer (ops/grid_sample.py) and refined
across blocks. Input is fixed 160x64.

The reference's eval path calls a non-existent ``Tensor.normalization``
(hacnn.py:391-392); the intended L2 normalization is implemented here.
"""
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from bpbreid_tpu.models.common import BN_EPS, BN_MOMENTUM, max_pool_torch
from bpbreid_tpu.ops.grid_sample import affine_grid_sample
from bpbreid_tpu.ops.resize import resize_bilinear_align_corners

__all__ = ['HACNN', 'hacnn']


class ConvBlock(nn.Module):
    out_c: int
    k: int
    s: int = 1
    p: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.out_c, (self.k, self.k), strides=(self.s, self.s),
                    padding=((self.p, self.p), (self.p, self.p)),
                    use_bias=True, dtype=self.dtype, name='conv')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name='bn')(x)
        return nn.relu(x)


class InceptionA(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        mid = self.out_channels // 4
        streams = []
        for i in range(3):
            s = ConvBlock(mid, 1, dtype=self.dtype,
                          name='stream{}.0'.format(i + 1))(x, train)
            s = ConvBlock(mid, 3, p=1, dtype=self.dtype,
                          name='stream{}.1'.format(i + 1))(s, train)
            streams.append(s)
        s4 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                         count_include_pad=True)
        s4 = ConvBlock(mid, 1, dtype=self.dtype, name='stream4.1')(s4, train)
        streams.append(s4)
        return jnp.concatenate(streams, axis=-1)


class InceptionB(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        mid = self.out_channels // 4
        s1 = ConvBlock(mid, 1, dtype=self.dtype, name='stream1.0')(x, train)
        s1 = ConvBlock(mid, 3, s=2, p=1, dtype=self.dtype,
                       name='stream1.1')(s1, train)
        s2 = ConvBlock(mid, 1, dtype=self.dtype, name='stream2.0')(x, train)
        s2 = ConvBlock(mid, 3, p=1, dtype=self.dtype,
                       name='stream2.1')(s2, train)
        s2 = ConvBlock(mid, 3, s=2, p=1, dtype=self.dtype,
                       name='stream2.2')(s2, train)
        s3 = max_pool_torch(x, 3, 2, 1)
        s3 = ConvBlock(mid * 2, 1, dtype=self.dtype,
                       name='stream3.1')(s3, train)
        return jnp.concatenate([s1, s2, s3], axis=-1)


class SoftAttn(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        # spatial attention: channel-mean -> stride-2 conv -> x2 bilinear
        # upsample (align_corners=True) -> 1x1 conv
        s = x.mean(axis=-1, keepdims=True)
        s = ConvBlock(1, 3, s=2, p=1, dtype=self.dtype,
                      name='spatial_attn.conv1')(s, train)
        s = resize_bilinear_align_corners(s, s.shape[1] * 2, s.shape[2] * 2)
        s = ConvBlock(1, 1, dtype=self.dtype,
                      name='spatial_attn.conv2')(s, train)
        # channel attention: GAP -> 2 conv blocks
        c = x.mean(axis=(1, 2), keepdims=True)
        c = ConvBlock(x.shape[-1] // 16, 1, dtype=self.dtype,
                      name='channel_attn.conv1')(c, train)
        c = ConvBlock(x.shape[-1], 1, dtype=self.dtype,
                      name='channel_attn.conv2')(c, train)
        y = s * c
        y = ConvBlock(x.shape[-1], 1, dtype=self.dtype, name='conv')(y, train)
        # reference applies sigmoid on the conv-bn-RELU output
        return nn.sigmoid(y)


class HardAttn(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        v = x.mean(axis=(1, 2))
        bias_init = jnp.asarray([0, -0.75, 0, -0.25, 0, 0.25, 0, 0.75],
                                jnp.float32)
        theta = nn.Dense(8, dtype=self.dtype,
                         kernel_init=nn.initializers.zeros,
                         bias_init=lambda *a: bias_init, name='fc')(v)
        return jnp.tanh(theta).reshape(-1, 4, 2)


class HACNN(nn.Module):
    num_classes: int
    loss: str = 'softmax'
    nchannels: Sequence[int] = (128, 256, 384)
    feat_dim_stream: int = 512
    learn_region: bool = True
    dtype: Any = jnp.float32

    @property
    def feature_dim(self):
        return self.feat_dim_stream * (2 if self.learn_region else 1)

    def _fc(self, v, train, name):
        v = nn.Dense(self.feat_dim_stream, dtype=self.dtype,
                     name=name + '.0')(v)
        v = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name=name + '.1')(v)
        return nn.relu(v)

    def _stn_region(self, x, theta_i):
        """Build the full theta ([[1,0,tx],[0,0.25,ty]]) and sample
        (reference: hacnn.py:287-305)."""
        n = theta_i.shape[0]
        zeros = jnp.zeros((n,), theta_i.dtype)
        row1 = jnp.stack([jnp.ones((n,)), zeros, theta_i[:, 0]], axis=1)
        row2 = jnp.stack([zeros, jnp.full((n,), 0.25), theta_i[:, 1]], axis=1)
        theta = jnp.stack([row1, row2], axis=1)        # [N, 2, 3]
        return affine_grid_sample(x, theta)

    @nn.compact
    def __call__(self, x, train: bool = False):
        nch = self.nchannels
        if x.shape[1] != 160 or x.shape[2] != 64:
            raise ValueError('HACNN expects 160x64 input, got {}x{}'.format(
                x.shape[1], x.shape[2]))
        x = ConvBlock(32, 3, s=2, p=1, dtype=self.dtype, name='conv')(x, train)

        local_sizes = ((24, 28), (12, 14), (6, 7))
        x_locals = [None] * 4
        cur = x
        for b in range(3):
            inc = InceptionA(nch[b], dtype=self.dtype,
                             name='inception{}.0'.format(b + 1))(cur, train)
            inc = InceptionB(nch[b], dtype=self.dtype,
                             name='inception{}.1'.format(b + 1))(inc, train)
            attn = SoftAttn(dtype=self.dtype,
                            name='ha{}.soft_attn'.format(b + 1))(inc, train)
            theta = HardAttn(dtype=self.dtype,
                             name='ha{}.hard_attn'.format(b + 1))(inc)
            out = inc * attn
            if self.learn_region:
                lh, lw = local_sizes[b]
                local_conv = InceptionB(nch[b], dtype=self.dtype,
                                        name='local_conv{}'.format(b + 1))
                new_locals = []
                for r in range(4):
                    trans = self._stn_region(cur, theta[:, r])
                    trans = resize_bilinear_align_corners(trans, lh, lw)
                    if b > 0:
                        trans = trans + x_locals[r]
                    new_locals.append(local_conv(trans, train))
                x_locals = new_locals
            cur = out

        x_global = self._fc(cur.mean(axis=(1, 2)), train, 'fc_global')
        if self.learn_region:
            x_local = jnp.concatenate(
                [li.mean(axis=(1, 2)) for li in x_locals], axis=-1)
            x_local = self._fc(x_local, train, 'fc_local')
        if not train:
            if self.learn_region:
                xg = x_global / jnp.maximum(
                    jnp.linalg.norm(x_global, axis=1, keepdims=True), 1e-12)
                xl = x_local / jnp.maximum(
                    jnp.linalg.norm(x_local, axis=1, keepdims=True), 1e-12)
                return jnp.concatenate([xg, xl], axis=1)
            return x_global
        y_global = nn.Dense(self.num_classes, dtype=self.dtype,
                            name='classifier_global')(x_global)
        if self.learn_region:
            y_local = nn.Dense(self.num_classes, dtype=self.dtype,
                               name='classifier_local')(x_local)
        if self.loss == 'softmax':
            return (y_global, y_local) if self.learn_region else y_global
        elif self.loss == 'triplet':
            if self.learn_region:
                return (y_global, y_local), (x_global, x_local)
            return y_global, x_global
        raise KeyError('Unsupported loss: {}'.format(self.loss))


def hacnn(num_classes, loss='softmax', pretrained=True, **kwargs):
    dtype = kwargs.pop('dtype', jnp.float32)
    return HACNN(num_classes=num_classes, loss=loss, dtype=dtype)
