"""OSNet / OSNet-IBN / OSNet-AIN: omni-scale re-id networks (NHWC, flax).

Rebuild of the reference OSNet family
(reference: torchreid/models/osnet.py:28-598 and osnet_ain.py:128-543):
multi-stream "omni-scale" residual blocks whose 1..4-deep depthwise
conv streams are merged through a shared channel gate. Instance
normalization is expressed with GroupNorm(groups=C), matching torch
InstanceNorm2d(affine=True, track_running_stats=False).

Parameter paths mirror the torch ``state_dict`` so the published
ImageNet/zoo checkpoints convert via utils/torch_weights.
"""
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from bpbreid_tpu.models.common import BN_EPS, BN_MOMENTUM, max_pool_torch

__all__ = ['OSNet', 'osnet_x1_0', 'osnet_x0_75', 'osnet_x0_5', 'osnet_x0_25',
           'osnet_ibn_x1_0', 'osnet_ain_x1_0']


def _bn(x, train, name, dtype):
    return nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                        epsilon=BN_EPS, dtype=dtype, name=name)(x)


def _instance_norm(x, name, dtype):
    return nn.GroupNorm(num_groups=x.shape[-1], epsilon=1e-5, dtype=dtype,
                        name=name)(x)


class ConvLayer(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    use_in: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        pad = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)), use_bias=False,
                    dtype=self.dtype, name='conv')(x)
        if self.use_in:
            x = _instance_norm(x, 'bn', self.dtype)
        else:
            x = _bn(x, train, 'bn', self.dtype)
        return nn.relu(x)


class Conv1x1(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.features, (1, 1), strides=(self.stride, self.stride),
                    use_bias=False, dtype=self.dtype, name='conv')(x)
        return nn.relu(_bn(x, train, 'bn', self.dtype))


class Conv1x1Linear(nn.Module):
    features: int
    stride: int = 1
    use_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.features, (1, 1), strides=(self.stride, self.stride),
                    use_bias=False, dtype=self.dtype, name='conv')(x)
        if self.use_bn:
            x = _bn(x, train, 'bn', self.dtype)
        return x


class LightConv3x3(nn.Module):
    """1x1 conv + depthwise 3x3 + BN + ReLU (reference: osnet.py:128-157)."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name='conv1')(x)
        x = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, feature_group_count=self.features,
                    dtype=self.dtype, name='conv2')(x)
        return nn.relu(_bn(x, train, 'bn', self.dtype))


class LightConvStream(nn.Module):
    """depth chained LightConv3x3 (reference: osnet_ain.py:148-165)."""
    features: int
    depth: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        for i in range(self.depth):
            x = LightConv3x3(self.features, dtype=self.dtype,
                             name='layers.{}'.format(i))(x, train)
        return x


class ChannelGate(nn.Module):
    """Channel-wise gates from globally pooled features
    (reference: osnet.py:162-220)."""
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        c = x.shape[-1]
        g = x.mean(axis=(1, 2), keepdims=True)           # [N,1,1,C]
        # floor at 1: small-width uses (e.g. the PVPM pose subnet, where the
        # reference's c//16 hits zero, pvpm.py:354+osnet.py:180) stay valid
        g = nn.Conv(max(1, c // self.reduction), (1, 1), use_bias=True,
                    dtype=self.dtype, name='fc1')(g)
        g = nn.relu(g)
        g = nn.Conv(c, (1, 1), use_bias=True, dtype=self.dtype,
                    name='fc2')(g)
        return x * nn.sigmoid(g)


class OSBlock(nn.Module):
    """Omni-scale block, classic layout with named streams conv2a..conv2d
    (reference: osnet.py:223-275)."""
    features: int
    use_in: bool = False
    reduction: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        mid = self.features // self.reduction
        identity = x
        x1 = Conv1x1(mid, dtype=self.dtype, name='conv1')(x, train)
        gate = ChannelGate(dtype=self.dtype, name='gate')
        streams = []
        s = LightConv3x3(mid, dtype=self.dtype, name='conv2a')(x1, train)
        streams.append(gate(s, train))
        for sname, depth in (('conv2b', 2), ('conv2c', 3), ('conv2d', 4)):
            s = x1
            for i in range(depth):
                s = LightConv3x3(mid, dtype=self.dtype,
                                 name='{}.{}'.format(sname, i))(s, train)
            streams.append(gate(s, train))
        x2 = sum(streams)
        x3 = Conv1x1Linear(self.features, dtype=self.dtype,
                           name='conv3')(x2, train)
        if identity.shape[-1] != self.features:
            identity = Conv1x1Linear(self.features, dtype=self.dtype,
                                     name='downsample')(identity, train)
        out = x3 + identity
        if self.use_in:
            out = _instance_norm(out, 'IN', self.dtype)
        return nn.relu(out)


class OSBlockAIN(nn.Module):
    """AIN-layout omni-scale block: T LightConvStreams under 'conv2.{t}';
    ``in_inside`` selects OSBlockINin (IN inside the residual,
    reference: osnet_ain.py:263-293)."""
    features: int
    in_inside: bool = False
    reduction: int = 4
    T: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        mid = self.features // self.reduction
        identity = x
        x1 = Conv1x1(mid, dtype=self.dtype, name='conv1')(x, train)
        gate = ChannelGate(dtype=self.dtype, name='gate')
        x2 = None
        for t in range(1, self.T + 1):
            s = LightConvStream(mid, t, dtype=self.dtype,
                                name='conv2.{}'.format(t - 1))(x1, train)
            s = gate(s, train)
            x2 = s if x2 is None else x2 + s
        x3 = Conv1x1Linear(self.features, use_bn=not self.in_inside,
                           dtype=self.dtype, name='conv3')(x2, train)
        if self.in_inside:
            x3 = _instance_norm(x3, 'IN', self.dtype)
        if identity.shape[-1] != self.features:
            identity = Conv1x1Linear(self.features, dtype=self.dtype,
                                     name='downsample')(identity, train)
        return nn.relu(x3 + identity)


class OSNet(nn.Module):
    """Omni-Scale Network (classic and AIN layouts).

    ``blocks`` entries: 'os' (plain), 'os_in' (IN after residual),
    'ain' (AIN plain), 'ain_in' (IN inside residual). AIN layout uses
    separate pool2/pool3 transitions (osnet_ain.py:330-349); classic
    embeds the transition in conv2/conv3 (osnet.py:340-365).
    """
    num_classes: int = 1000
    loss: str = 'softmax'
    blocks: Sequence[Sequence[str]] = (('os', 'os'), ('os', 'os'),
                                       ('os', 'os'))
    channels: Sequence[int] = (64, 256, 384, 512)
    fc_dim: int = 512
    conv1_IN: bool = False
    ain_layout: bool = False
    dtype: Any = jnp.float32

    @property
    def feature_dim(self):
        return self.fc_dim if self.fc_dim and self.fc_dim > 0 \
            else self.channels[3]

    def _block(self, kind, features, name):
        if kind == 'os':
            return OSBlock(features, dtype=self.dtype, name=name)
        if kind == 'os_in':
            return OSBlock(features, use_in=True, dtype=self.dtype, name=name)
        if kind == 'ain':
            return OSBlockAIN(features, dtype=self.dtype, name=name)
        if kind == 'ain_in':
            return OSBlockAIN(features, in_inside=True, dtype=self.dtype,
                              name=name)
        raise ValueError(kind)

    @nn.compact
    def __call__(self, x, train=False, return_featuremaps=False):
        ch = self.channels
        x = ConvLayer(ch[0], 7, 2, use_in=self.conv1_IN, dtype=self.dtype,
                      name='conv1')(x, train)
        x = max_pool_torch(x)
        for si, stage in enumerate(('conv2', 'conv3', 'conv4')):
            kinds = self.blocks[si]
            feats = ch[si + 1]
            for bi, kind in enumerate(kinds):
                x = self._block(kind, feats, '{}.{}'.format(stage, bi))(
                    x, train)
            if stage != 'conv4':
                if self.ain_layout:
                    pool_name = 'pool{}'.format(si + 2)
                    x = Conv1x1(feats, dtype=self.dtype,
                                name='{}.0'.format(pool_name))(x, train)
                    x = nn.avg_pool(x, (2, 2), strides=(2, 2))
                else:
                    tr = '{}.{}'.format(stage, len(kinds))
                    x = Conv1x1(feats, dtype=self.dtype,
                                name='{}.0'.format(tr))(x, train)
                    x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = Conv1x1(ch[3], dtype=self.dtype, name='conv5')(x, train)
        if self.loss == 'part_based' or return_featuremaps:
            return x
        v = x.mean(axis=(1, 2))
        if self.fc_dim and self.fc_dim > 0:
            v = nn.Dense(self.fc_dim, dtype=self.dtype, name='fc.0')(v)
            v = nn.BatchNorm(use_running_average=not train,
                             momentum=BN_MOMENTUM, epsilon=BN_EPS,
                             dtype=self.dtype, name='fc.1')(v)
            v = nn.relu(v)
        if not train:
            return v
        y = nn.Dense(self.num_classes, dtype=self.dtype, name='classifier')(v)
        if self.loss == 'softmax':
            return y
        elif self.loss == 'triplet':
            return y, v
        raise KeyError('Unsupported loss: {}'.format(self.loss))


def _osnet(channels, blocks=(('os', 'os'),) * 3, conv1_IN=False,
           ain_layout=False, **kwargs):
    num_classes = kwargs.pop('num_classes', 1000)
    loss = kwargs.pop('loss', 'softmax')
    dtype = kwargs.pop('dtype', jnp.float32)
    kwargs.pop('pretrained', None)
    return OSNet(num_classes=num_classes, loss=loss, blocks=blocks,
                 channels=tuple(channels), conv1_IN=conv1_IN,
                 ain_layout=ain_layout, dtype=dtype)


def osnet_x1_0(num_classes=1000, pretrained=True, loss='softmax', **kwargs):
    return _osnet((64, 256, 384, 512), num_classes=num_classes, loss=loss,
                  **kwargs)


def osnet_x0_75(num_classes=1000, pretrained=True, loss='softmax', **kwargs):
    return _osnet((48, 192, 288, 384), num_classes=num_classes, loss=loss,
                  **kwargs)


def osnet_x0_5(num_classes=1000, pretrained=True, loss='softmax', **kwargs):
    return _osnet((32, 128, 192, 256), num_classes=num_classes, loss=loss,
                  **kwargs)


def osnet_x0_25(num_classes=1000, pretrained=True, loss='softmax', **kwargs):
    return _osnet((16, 64, 96, 128), num_classes=num_classes, loss=loss,
                  **kwargs)


def osnet_ibn_x1_0(num_classes=1000, pretrained=True, loss='softmax',
                   **kwargs):
    # IN on conv1 + IN after the residual in stage conv2 (osnet.py:581-600)
    return _osnet((64, 256, 384, 512),
                  blocks=(('os_in', 'os_in'), ('os', 'os'), ('os', 'os')),
                  conv1_IN=True, num_classes=num_classes, loss=loss, **kwargs)


def osnet_ain_x1_0(num_classes=1000, pretrained=True, loss='softmax',
                   **kwargs):
    return _osnet((64, 256, 384, 512),
                  blocks=(('ain_in', 'ain_in'), ('ain', 'ain_in'),
                          ('ain_in', 'ain')),
                  conv1_IN=True, ain_layout=True, num_classes=num_classes,
                  loss=loss, **kwargs)
