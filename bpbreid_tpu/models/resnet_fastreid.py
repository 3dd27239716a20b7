"""fastreid-style ResNet backbones: IBN-a and Non-local variants.

Rebuild of the reference port (reference: torchreid/models/
resnet_fastreid.py:36-470): ResNet-50 trunk with optional IBN-a (first
half of the bottleneck's bn1 channels instance-normalized), optional SE,
and Non-local attention blocks interleaved at the tail of stages 2/3
(non_layers [0, 2, 3, 0] for 50x).

Note: the reference's ``Non_local`` computes ``inter_channels =
reduc_ratio // reduc_ratio == 1`` (resnet_fastreid.py:65) — an upstream
bug baked into the published checkpoints. Reproduced here verbatim so
those checkpoints convert; the intended ``in_channels // reduc_ratio``
variant is available via ``sane_nl=True``.
"""
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from bpbreid_tpu.models.common import BN_EPS, BN_MOMENTUM, max_pool_torch

__all__ = ['FastReIDResNet', 'fastreid_resnet', 'fastreid_resnet_ibn',
           'fastreid_resnet_nl', 'fastreid_resnet_ibn_nl']


def _bn(x, train, name, dtype):
    return nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                        epsilon=BN_EPS, dtype=dtype, name=name)(x)


class IBNLayer(nn.Module):
    """Half-IN / half-BN over channels (reference: resnet_fastreid.py:108-123).
    torch names: '<prefix>.IN' (InstanceNorm) and '<prefix>.BN'."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        c = x.shape[-1]
        half = c // 2
        a = nn.GroupNorm(num_groups=half, epsilon=1e-5, dtype=self.dtype,
                         name='IN')(x[..., :half])
        b = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype,
                         name='BN')(x[..., half:])
        return jnp.concatenate([a, b], axis=-1)


class SELayer(nn.Module):
    """(reference: resnet_fastreid.py:135-151); torch names fc.0 / fc.2."""
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = x.mean(axis=(1, 2))
        s = nn.Dense(c // self.reduction, use_bias=False, dtype=self.dtype,
                     name='fc.0')(s)
        s = nn.relu(s)
        s = nn.Dense(c, use_bias=False, dtype=self.dtype, name='fc.2')(s)
        s = nn.sigmoid(s)
        return x * s[:, None, None, :]


class NonLocal(nn.Module):
    """Embedded-gaussian non-local block (reference: resnet_fastreid.py:60-105)."""
    sane_nl: bool = False
    reduc_ratio: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        n, h, w, c = x.shape
        inter = (c // self.reduc_ratio) if self.sane_nl else 1
        g = nn.Conv(inter, (1, 1), use_bias=True, dtype=self.dtype,
                    name='g')(x).reshape(n, h * w, inter)
        theta = nn.Conv(inter, (1, 1), use_bias=True, dtype=self.dtype,
                        name='theta')(x).reshape(n, h * w, inter)
        phi = nn.Conv(inter, (1, 1), use_bias=True, dtype=self.dtype,
                      name='phi')(x).reshape(n, h * w, inter)
        f = jnp.einsum('npi,nqi->npq', theta, phi,
                       preferred_element_type=jnp.float32)
        f = f / f.shape[-1]
        y = jnp.einsum('npq,nqi->npi', f.astype(x.dtype), g,
                       preferred_element_type=jnp.float32)
        y = y.reshape(n, h, w, inter).astype(x.dtype)
        wy = nn.Conv(c, (1, 1), use_bias=True, dtype=self.dtype,
                     name='W.0')(y)
        wy = _bn(wy, train, 'W.1', self.dtype)
        return wy + x


class FRBottleneck(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    with_ibn: bool = False
    with_se: bool = False
    dtype: Any = jnp.float32
    expansion = 4

    @nn.compact
    def __call__(self, x, train=False):
        residual = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      name='conv1')(x)
        if self.with_ibn:
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
        if self.with_se:
            out = SELayer(dtype=self.dtype, name='se')(out)
        if self.has_downsample:
            residual = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name='downsample.0')(x)
            residual = _bn(residual, train, 'downsample.1', self.dtype)
        return nn.relu(out + residual)


class FastReIDResNet(nn.Module):
    """Feature-map trunk (the reference model emits the 4D map and is used
    as a BPBreID backbone)."""
    last_stride: int = 1
    with_ibn: bool = False
    with_se: bool = False
    with_nl: bool = False
    layers: Sequence[int] = (3, 4, 6, 3)
    non_layers: Sequence[int] = (0, 2, 3, 0)
    sane_nl: bool = False
    dtype: Any = jnp.float32
    feature_dim = 2048

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name='conv1')(x)
        x = nn.relu(_bn(x, train, 'bn1', self.dtype))
        # fastreid uses MaxPool2d(3, 2, ceil_mode=True) with NO padding
        # (resnet_fastreid.py:251) — emulate ceil_mode by padding only the
        # bottom/right with -inf to the ceil output size
        h, w = x.shape[1], x.shape[2]
        out_h = -(-(h - 3) // 2) + 1
        out_w = -(-(w - 3) // 2) + 1
        pad_h = max(0, (out_h - 1) * 2 + 3 - h)
        pad_w = max(0, (out_w - 1) * 2 + 3 - w)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((0, pad_h), (0, pad_w)))
        planes = (64, 128, 256, 512)
        strides = (1, 2, 2, self.last_stride)
        for s in range(4):
            n_blocks = self.layers[s]
            n_nl = self.non_layers[s] if self.with_nl else 0
            nl_idx = sorted(n_blocks - (i + 1) for i in range(n_nl))
            nl_counter = 0
            for b in range(n_blocks):
                stride = strides[s] if b == 0 else 1
                needs_ds = stride != 1 or x.shape[-1] != planes[s] * 4
                # IBN only on stages 1-3, never the last (reference :252-255)
                with_ibn = self.with_ibn and s < 3
                x = FRBottleneck(planes[s], stride, needs_ds,
                                 with_ibn=with_ibn, with_se=self.with_se,
                                 dtype=self.dtype,
                                 name='layer{}.{}'.format(s + 1, b))(x, train)
                if nl_counter < len(nl_idx) and b == nl_idx[nl_counter]:
                    x = NonLocal(sane_nl=self.sane_nl, dtype=self.dtype,
                                 name='NL_{}.{}'.format(s + 1, nl_counter)
                                 )(x, train)
                    nl_counter += 1
        return x


def _fastreid(with_ibn=False, with_nl=False, **kwargs):
    dtype = kwargs.pop('dtype', jnp.float32)
    last_stride = kwargs.pop('last_stride', 1)
    for k in ('num_classes', 'loss', 'pretrained', 'enable_dim_reduction',
              'dim_reduction_channels', 'pretrained_path'):
        kwargs.pop(k, None)
    return FastReIDResNet(last_stride=last_stride, with_ibn=with_ibn,
                          with_nl=with_nl, dtype=dtype)


def fastreid_resnet(pretrained=True, **kwargs):
    return _fastreid(pretrained=pretrained, **kwargs)


def fastreid_resnet_ibn(pretrained=True, **kwargs):
    return _fastreid(with_ibn=True, pretrained=pretrained, **kwargs)


def fastreid_resnet_nl(pretrained=True, **kwargs):
    return _fastreid(with_nl=True, pretrained=pretrained, **kwargs)


def fastreid_resnet_ibn_nl(pretrained=True, **kwargs):
    return _fastreid(with_ibn=True, with_nl=True, pretrained=pretrained,
                     **kwargs)
