"""MLFN: Multi-Level Factorisation Net (NHWC, flax).

Rebuild of the reference (torchreid/models/mlfn.py:15-269, Chang et al.
CVPR18): 16 factor-module blocks with grouped convs whose groups are
gated by a factor-selection module; the concatenated selection signals
join the final embedding.
"""
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from bpbreid_tpu.models.common import BN_EPS, BN_MOMENTUM, max_pool_torch

__all__ = ['MLFN', 'mlfn']


def _bn(x, train, name, dtype):
    return nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                        epsilon=BN_EPS, dtype=dtype, name=name)(x)


class MLFNBlock(nn.Module):
    out_channels: int
    stride: int
    fsm_channels: Sequence[int]
    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        mid = self.out_channels // 2
        residual = x
        # factor selection module: GAP -> conv/bn/relu x2 -> conv/bn/sigmoid
        s = x.mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(self.fsm_channels[0], (1, 1), use_bias=True,
                    dtype=self.dtype, name='fsm.1')(s)
        s = nn.relu(_bn(s, train, 'fsm.2', self.dtype))
        s = nn.Conv(self.fsm_channels[1], (1, 1), use_bias=True,
                    dtype=self.dtype, name='fsm.4')(s)
        s = nn.relu(_bn(s, train, 'fsm.5', self.dtype))
        s = nn.Conv(self.groups, (1, 1), use_bias=True, dtype=self.dtype,
                    name='fsm.7')(s)
        s = nn.sigmoid(_bn(s, train, 'fsm.8', self.dtype))   # [N,1,1,G]

        out = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                      name='fm_conv1')(x)
        out = nn.relu(_bn(out, train, 'fm_bn1', self.dtype))
        out = nn.Conv(mid, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False,
                      feature_group_count=self.groups, dtype=self.dtype,
                      name='fm_conv2')(out)
        out = nn.relu(_bn(out, train, 'fm_bn2', self.dtype))

        # factor selection: scale each group's channels by its gate.
        # torch repeats (b, g, 1, 1) n times then permutes so index
        # c = g_idx * n + j maps to gate g_idx (mlfn.py:78-85); NHWC
        # grouped convs lay channels out the same way.
        n, h, w, c = out.shape
        per = c // self.groups
        gates = jnp.repeat(s[:, :, :, :, None], per, axis=-1)  # [N,1,1,G,per]
        gates = gates.reshape(n, 1, 1, c)
        out = out * gates

        out = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                      dtype=self.dtype, name='fm_conv3')(out)
        out = nn.relu(_bn(out, train, 'fm_bn3', self.dtype))

        if residual.shape[-1] != self.out_channels or self.stride > 1:
            residual = nn.Conv(self.out_channels, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name='downsample.0')(x)
            residual = _bn(residual, train, 'downsample.1', self.dtype)
        return nn.relu(residual + out), s


class MLFN(nn.Module):
    num_classes: int
    loss: str = 'softmax'
    groups: int = 32
    channels: Sequence[int] = (64, 256, 512, 1024, 2048)
    embed_dim: int = 1024
    dtype: Any = jnp.float32

    @property
    def feature_dim(self):
        return self.embed_dim

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = self.channels
        x = nn.Conv(ch[0], (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=True, dtype=self.dtype, name='conv1')(x)
        x = nn.relu(_bn(x, train, 'bn1', self.dtype))
        x = max_pool_torch(x)
        # (out_channels, stride, fsm_channels) x16 (mlfn.py:113-177)
        plan = ([(ch[1], 1, (128, 64))] * 3
                + [(ch[2], 2, (256, 128))] + [(ch[2], 1, (256, 128))] * 3
                + [(ch[3], 2, (512, 128))] + [(ch[3], 1, (512, 128))] * 5
                + [(ch[4], 2, (512, 128))] + [(ch[4], 1, (512, 128))] * 2)
        s_list = []
        for i, (c, stride, fsm) in enumerate(plan):
            x, s = MLFNBlock(c, stride, fsm, self.groups, dtype=self.dtype,
                             name='feature.{}'.format(i))(x, train)
            s_list.append(s)
        if self.loss == 'part_based':
            return x
        s_hat = jnp.concatenate(s_list, axis=-1)     # [N,1,1,16*G]
        v_x = x.mean(axis=(1, 2), keepdims=True)
        v_x = nn.Conv(self.embed_dim, (1, 1), use_bias=False,
                      dtype=self.dtype, name='fc_x.0')(v_x)
        v_x = nn.relu(_bn(v_x, train, 'fc_x.1', self.dtype))
        v_s = nn.Conv(self.embed_dim, (1, 1), use_bias=False,
                      dtype=self.dtype, name='fc_s.0')(s_hat)
        v_s = nn.relu(_bn(v_s, train, 'fc_s.1', self.dtype))
        v = ((v_x + v_s) * 0.5)[:, 0, 0, :]
        if not train:
            return v
        y = nn.Dense(self.num_classes, dtype=self.dtype, name='classifier')(v)
        if self.loss == 'softmax':
            return y
        elif self.loss == 'triplet':
            return y, v
        raise KeyError('Unsupported loss: {}'.format(self.loss))


def mlfn(num_classes, loss='softmax', pretrained=True, **kwargs):
    dtype = kwargs.pop('dtype', jnp.float32)
    return MLFN(num_classes=num_classes, loss=loss, dtype=dtype)
