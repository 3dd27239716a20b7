"""DenseNet 121/169/201/161 (+fc512) (NHWC, flax).

Rebuild of the reference torchvision port
(torchreid/models/densenet.py:21-380, Huang et al. CVPR17): dense blocks
with bottleneck layers (norm-relu-conv1x1 -> norm-relu-conv3x3,
concatenated), transition norm-relu-conv-avgpool, final norm.
Parameter paths mirror torchvision ``state_dict`` names
(``features.denseblock1.denselayer1.conv1`` ...).
"""
from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from bpbreid_tpu.models.common import BN_EPS, BN_MOMENTUM, max_pool_torch

__all__ = ['DenseNet', 'densenet121', 'densenet169', 'densenet201',
           'densenet161', 'densenet121_fc512']


def _bn(x, train, name, dtype):
    return nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                        epsilon=BN_EPS, dtype=dtype, name=name)(x)


class DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        out = nn.relu(_bn(x, train, 'norm1', self.dtype))
        out = nn.Conv(self.bn_size * self.growth_rate, (1, 1),
                      use_bias=False, dtype=self.dtype, name='conv1')(out)
        out = nn.relu(_bn(out, train, 'norm2', self.dtype))
        out = nn.Conv(self.growth_rate, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, dtype=self.dtype, name='conv2')(out)
        return jnp.concatenate([x, out], axis=-1)


class DenseNet(nn.Module):
    num_classes: int
    loss: str = 'softmax'
    growth_rate: int = 32
    block_config: Sequence[int] = (6, 12, 24, 16)
    num_init_features: int = 64
    bn_size: int = 4
    fc_dims: Optional[Sequence[int]] = None
    dtype: Any = jnp.float32

    @property
    def feature_dim(self):
        if self.fc_dims:
            return self.fc_dims[-1]
        # channels grow by growth_rate per layer, halved at each transition
        feats = self.num_init_features
        for i, n in enumerate(self.block_config):
            feats += n * self.growth_rate
            if i != len(self.block_config) - 1:
                feats = feats // 2
        return feats

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.num_init_features, (7, 7), strides=(2, 2),
                    padding=((3, 3), (3, 3)), use_bias=False,
                    dtype=self.dtype, name='features.conv0')(x)
        x = nn.relu(_bn(x, train, 'features.norm0', self.dtype))
        x = max_pool_torch(x)
        for bi, n_layers in enumerate(self.block_config):
            for li in range(n_layers):
                x = DenseLayer(self.growth_rate, self.bn_size,
                               dtype=self.dtype,
                               name='features.denseblock{}.denselayer{}'
                               .format(bi + 1, li + 1))(x, train)
            if bi != len(self.block_config) - 1:
                x = nn.relu(_bn(x, train,
                                'features.transition{}.norm'.format(bi + 1),
                                self.dtype))
                x = nn.Conv(x.shape[-1] // 2, (1, 1), use_bias=False,
                            dtype=self.dtype,
                            name='features.transition{}.conv'.format(bi + 1)
                            )(x)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(_bn(x, train, 'features.norm5', self.dtype))
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


def _densenet(growth_rate, block_config, num_init_features, fc_dims=None,
              **kwargs):
    num_classes = kwargs.pop('num_classes', 1000)
    loss = kwargs.pop('loss', 'softmax')
    dtype = kwargs.pop('dtype', jnp.float32)
    return DenseNet(num_classes=num_classes, loss=loss,
                    growth_rate=growth_rate,
                    block_config=tuple(block_config),
                    num_init_features=num_init_features, fc_dims=fc_dims,
                    dtype=dtype)


def densenet121(num_classes, loss='softmax', pretrained=True, **kwargs):
    return _densenet(32, (6, 12, 24, 16), 64, num_classes=num_classes,
                     loss=loss, **kwargs)


def densenet169(num_classes, loss='softmax', pretrained=True, **kwargs):
    return _densenet(32, (6, 12, 32, 32), 64, num_classes=num_classes,
                     loss=loss, **kwargs)


def densenet201(num_classes, loss='softmax', pretrained=True, **kwargs):
    return _densenet(32, (6, 12, 48, 32), 64, num_classes=num_classes,
                     loss=loss, **kwargs)


def densenet161(num_classes, loss='softmax', pretrained=True, **kwargs):
    return _densenet(48, (6, 12, 36, 24), 96, num_classes=num_classes,
                     loss=loss, **kwargs)


def densenet121_fc512(num_classes, loss='softmax', pretrained=True, **kwargs):
    return _densenet(32, (6, 12, 24, 16), 64, fc_dims=(512,),
                     num_classes=num_classes, loss=loss, **kwargs)
