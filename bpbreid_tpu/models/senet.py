"""SENet family: se_resnet50/101/152 (+fc512), se_resnext50/101, senet154
(NHWC, flax).

Rebuild of the reference port (torchreid/models/senet.py:91-688, Hu et
al. CVPR18): squeeze-and-excitation bottlenecks; se_resnet follows the
Caffe convention (stride on conv1), se_resnext puts stride on conv2;
senet154 uses a 3x-3x3 stem and doubled conv1 width. The stem maxpool
uses ceil_mode (Caffe compatibility, senet.py:363-367).
"""
import math
from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from bpbreid_tpu.models.common import BN_EPS, BN_MOMENTUM

__all__ = ['SENet', 'senet154', 'se_resnet50', 'se_resnet50_fc512',
           'se_resnet101', 'se_resnet152', 'se_resnext50_32x4d',
           'se_resnext101_32x4d']


def _bn(x, train, name, dtype):
    return nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                        epsilon=BN_EPS, dtype=dtype, name=name)(x)


def _max_pool_ceil(x, window=3, stride=2):
    h, w = x.shape[1], x.shape[2]
    out_h = -(-(h - window) // stride) + 1
    out_w = -(-(w - window) // stride) + 1
    pad_h = max(0, (out_h - 1) * stride + window - h)
    pad_w = max(0, (out_w - 1) * stride + window - w)
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding=((0, pad_h), (0, pad_w)))


class SEModule(nn.Module):
    reduction: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = x.mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(c // self.reduction, (1, 1), use_bias=True,
                    dtype=self.dtype, name='fc1')(s)
        s = nn.relu(s)
        s = nn.Conv(c, (1, 1), use_bias=True, dtype=self.dtype,
                    name='fc2')(s)
        return x * nn.sigmoid(s)


class SEBottleneckBase(nn.Module):
    """Generic SE bottleneck; ``style`` selects the conv stride placement
    and widths (senet.py:143-244)."""
    planes: int
    groups: int
    reduction: int
    stride: int = 1
    has_downsample: bool = False
    ds_kernel: int = 1
    style: str = 'se_resnet'     # 'se_resnet' | 'se_resnext' | 'senet154'
    base_width: int = 4
    dtype: Any = jnp.float32
    expansion = 4

    @nn.compact
    def __call__(self, x, train=False):
        residual = x
        if self.style == 'senet154':
            w1, w2 = self.planes * 2, self.planes * 4
            s1, s2 = 1, self.stride
        elif self.style == 'se_resnext':
            width = int(math.floor(self.planes * (self.base_width / 64.0))
                        * self.groups)
            w1 = w2 = width
            s1, s2 = 1, self.stride
        else:                                  # se_resnet (Caffe style)
            w1 = w2 = self.planes
            s1, s2 = self.stride, 1
        out = nn.Conv(w1, (1, 1), strides=(s1, s1), use_bias=False,
                      dtype=self.dtype, name='conv1')(x)
        out = nn.relu(_bn(out, train, 'bn1', self.dtype))
        out = nn.Conv(w2, (3, 3), strides=(s2, s2),
                      padding=((1, 1), (1, 1)),
                      feature_group_count=self.groups, use_bias=False,
                      dtype=self.dtype, name='conv2')(out)
        out = nn.relu(_bn(out, train, 'bn2', self.dtype))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      dtype=self.dtype, name='conv3')(out)
        out = _bn(out, train, 'bn3', self.dtype)
        if self.has_downsample:
            pad = self.ds_kernel // 2
            residual = nn.Conv(self.planes * 4,
                               (self.ds_kernel, self.ds_kernel),
                               strides=(self.stride, self.stride),
                               padding=((pad, pad), (pad, pad)),
                               use_bias=False, dtype=self.dtype,
                               name='downsample.0')(x)
            residual = _bn(residual, train, 'downsample.1', self.dtype)
        out = SEModule(self.reduction, dtype=self.dtype,
                       name='se_module')(out) + residual
        return nn.relu(out)


class SENet(nn.Module):
    num_classes: int = 1000
    loss: str = 'softmax'
    style: str = 'se_resnet'
    layers: Sequence[int] = (3, 4, 6, 3)
    groups: int = 1
    reduction: int = 16
    inplanes: int = 64
    input_3x3: bool = False
    downsample_kernel_size: int = 1
    last_stride: int = 2
    fc_dims: Optional[Sequence[int]] = None
    dtype: Any = jnp.float32

    @property
    def feature_dim(self):
        return self.fc_dims[-1] if self.fc_dims else 512 * 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.input_3x3:
            for i, (feats, stride) in enumerate(((64, 2), (64, 1),
                                                 (self.inplanes, 1))):
                x = nn.Conv(feats, (3, 3), strides=(stride, stride),
                            padding=((1, 1), (1, 1)), use_bias=False,
                            dtype=self.dtype,
                            name='layer0.conv{}'.format(i + 1))(x)
                x = nn.relu(_bn(x, train, 'layer0.bn{}'.format(i + 1),
                                self.dtype))
        else:
            x = nn.Conv(self.inplanes, (7, 7), strides=(2, 2),
                        padding=((3, 3), (3, 3)), use_bias=False,
                        dtype=self.dtype, name='layer0.conv1')(x)
            x = nn.relu(_bn(x, train, 'layer0.bn1', self.dtype))
        x = _max_pool_ceil(x)
        planes = (64, 128, 256, 512)
        strides = (1, 2, 2, self.last_stride)
        for s in range(4):
            for b in range(self.layers[s]):
                stride = strides[s] if b == 0 else 1
                needs_ds = stride != 1 or x.shape[-1] != planes[s] * 4
                ds_kernel = 1 if s == 0 else self.downsample_kernel_size
                x = SEBottleneckBase(
                    planes[s], self.groups, self.reduction, stride, needs_ds,
                    ds_kernel=ds_kernel, style=self.style, dtype=self.dtype,
                    name='layer{}.{}'.format(s + 1, b))(x, train)
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


def _senet(style, layers, groups=1, reduction=16, inplanes=64,
           input_3x3=False, downsample_kernel_size=1, last_stride=2,
           fc_dims=None, **kwargs):
    num_classes = kwargs.pop('num_classes', 1000)
    loss = kwargs.pop('loss', 'softmax')
    dtype = kwargs.pop('dtype', jnp.float32)
    return SENet(num_classes=num_classes, loss=loss, style=style,
                 layers=tuple(layers), groups=groups, reduction=reduction,
                 inplanes=inplanes, input_3x3=input_3x3,
                 downsample_kernel_size=downsample_kernel_size,
                 last_stride=last_stride, fc_dims=fc_dims, dtype=dtype)


def senet154(num_classes, loss='softmax', pretrained=True, **kwargs):
    return _senet('senet154', [3, 8, 36, 3], groups=64, reduction=16,
                  inplanes=128, input_3x3=True, downsample_kernel_size=3,
                  num_classes=num_classes, loss=loss, **kwargs)


def se_resnet50(num_classes, loss='softmax', pretrained=True, **kwargs):
    return _senet('se_resnet', [3, 4, 6, 3], num_classes=num_classes,
                  loss=loss, **kwargs)


def se_resnet50_fc512(num_classes, loss='softmax', pretrained=True, **kwargs):
    return _senet('se_resnet', [3, 4, 6, 3], last_stride=1, fc_dims=(512,),
                  num_classes=num_classes, loss=loss, **kwargs)


def se_resnet101(num_classes, loss='softmax', pretrained=True, **kwargs):
    return _senet('se_resnet', [3, 4, 23, 3], num_classes=num_classes,
                  loss=loss, **kwargs)


def se_resnet152(num_classes, loss='softmax', pretrained=True, **kwargs):
    return _senet('se_resnet', [3, 8, 36, 3], num_classes=num_classes,
                  loss=loss, **kwargs)


def se_resnext50_32x4d(num_classes, loss='softmax', pretrained=True, **kwargs):
    return _senet('se_resnext', [3, 4, 6, 3], groups=32,
                  num_classes=num_classes, loss=loss, **kwargs)


def se_resnext101_32x4d(num_classes, loss='softmax', pretrained=True,
                        **kwargs):
    return _senet('se_resnext', [3, 4, 23, 3], groups=32,
                  num_classes=num_classes, loss=loss, **kwargs)
