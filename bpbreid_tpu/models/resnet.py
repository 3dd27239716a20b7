"""ResNet backbone family (NHWC, flax.linen).

TPU-native rebuild of the reference ResNet layer
(reference: torchreid/models/resnet.py:157-377): standard
resnet18/34/50/101/152 (+resnext, +fc512 variant) with the re-id
specific ``last_stride`` knob and the part-based early return of the 4D
feature map (resnet.py:357-358). Module names mirror torchvision
``state_dict`` paths so ImageNet/reference checkpoints convert directly.
"""
from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from bpbreid_tpu.models.common import (
    BN_EPS,
    BN_MOMENTUM,
    BasicBlock,
    Bottleneck,
    ResLayer,
    max_pool_torch,
)


class ResNet(nn.Module):
    """Residual network producing either spatial feature maps
    (``loss='part_based'``), global embeddings, or class scores.
    """
    num_classes: int = 1000
    loss: str = 'softmax'
    block_name: str = 'bottleneck'
    layers: Sequence[int] = (3, 4, 6, 3)
    last_stride: int = 2
    fc_dims: Optional[Sequence[int]] = None
    groups: int = 1                      # resnext support (groups>1)
    width_per_group: int = 64
    dtype: Any = jnp.float32

    @property
    def feature_dim(self):
        block = Bottleneck if self.block_name == 'bottleneck' else BasicBlock
        base = 512 * block.expansion
        return self.fc_dims[-1] if self.fc_dims else base

    def featuremaps(self, x, train=False):
        block = Bottleneck if self.block_name == 'bottleneck' else BasicBlock
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name='conv1')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name='bn1')(x)
        x = nn.relu(x)
        x = max_pool_torch(x)
        g, w = self.groups, self.width_per_group
        x = ResLayer(block, 64, self.layers[0], 1, groups=g, base_width=w,
                     dtype=self.dtype, name='layer1')(x, train)
        x = ResLayer(block, 128, self.layers[1], 2, groups=g, base_width=w,
                     dtype=self.dtype, name='layer2')(x, train)
        x = ResLayer(block, 256, self.layers[2], 2, groups=g, base_width=w,
                     dtype=self.dtype, name='layer3')(x, train)
        x = ResLayer(block, 512, self.layers[3], self.last_stride, groups=g,
                     base_width=w, dtype=self.dtype, name='layer4')(x, train)
        return x

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.featuremaps(x, train)
        if self.loss == 'part_based':
            return f                                     # [N, Hf, Wf, D]
        v = jnp.mean(f, axis=(1, 2))                     # global avg pool
        if self.fc_dims:
            for i, dim in enumerate(self.fc_dims):
                v = nn.Dense(dim, dtype=self.dtype, name='fc.{}'.format(i * 3))(v)
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


def _resnet(block_name, layers, last_stride=2, fc_dims=None, **kwargs):
    num_classes = kwargs.pop('num_classes', 1000)
    loss = kwargs.pop('loss', 'softmax')
    dtype = kwargs.pop('dtype', jnp.float32)
    kwargs.pop('pretrained', None)
    allowed = {'groups', 'width_per_group'}
    extra = {k: v for k, v in kwargs.items() if k in allowed}
    last_stride = kwargs.pop('last_stride', last_stride)
    return ResNet(num_classes=num_classes, loss=loss, block_name=block_name,
                  layers=tuple(layers), last_stride=last_stride,
                  fc_dims=fc_dims, dtype=dtype, **extra)


def resnet18(num_classes, loss='softmax', pretrained=True, **kwargs):
    return _resnet('basic', [2, 2, 2, 2], num_classes=num_classes, loss=loss, **kwargs)


def resnet34(num_classes, loss='softmax', pretrained=True, **kwargs):
    return _resnet('basic', [3, 4, 6, 3], num_classes=num_classes, loss=loss, **kwargs)


def resnet50(num_classes, loss='softmax', pretrained=True, **kwargs):
    return _resnet('bottleneck', [3, 4, 6, 3], num_classes=num_classes, loss=loss, **kwargs)


def resnet101(num_classes, loss='softmax', pretrained=True, **kwargs):
    return _resnet('bottleneck', [3, 4, 23, 3], num_classes=num_classes, loss=loss, **kwargs)


def resnet152(num_classes, loss='softmax', pretrained=True, **kwargs):
    return _resnet('bottleneck', [3, 8, 36, 3], num_classes=num_classes, loss=loss, **kwargs)


def resnext50_32x4d(num_classes, loss='softmax', pretrained=True, **kwargs):
    return _resnet('bottleneck', [3, 4, 6, 3], num_classes=num_classes,
                   loss=loss, groups=32, width_per_group=4, **kwargs)


def resnext101_32x8d(num_classes, loss='softmax', pretrained=True, **kwargs):
    return _resnet('bottleneck', [3, 4, 23, 3], num_classes=num_classes,
                   loss=loss, groups=32, width_per_group=8, **kwargs)


def resnet50_fc512(num_classes, loss='softmax', pretrained=True, **kwargs):
    return _resnet('bottleneck', [3, 4, 6, 3], last_stride=1, fc_dims=(512,),
                   num_classes=num_classes, loss=loss, **kwargs)
