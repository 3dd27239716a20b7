"""PCB: Part-based Convolutional Baseline (NHWC, flax).

Rebuild of the reference PCB (reference: torchreid/models/pcb.py:131-314,
Sun et al. ECCV18): ResNet-50 trunk (last_stride=1) -> adaptive average
pooling into ``parts`` horizontal strips -> dropout + 1x1 dim-reduce ->
one classifier per strip. Eval returns the L2-normalized strip features.
"""
from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from bpbreid_tpu.models.common import BN_EPS, BN_MOMENTUM, Bottleneck, ResLayer, max_pool_torch

__all__ = ['PCBModel', 'pcb_p4', 'pcb_p6', 'adaptive_avg_pool_rows']


def adaptive_avg_pool_rows(x, out_rows):
    """torch AdaptiveAvgPool2d((out_rows, 1)) over NHWC: average W fully
    and split H into torch's floor/ceil region boundaries."""
    n, h, w, c = x.shape
    cols = x.mean(axis=2)                       # [N, H, C]
    outs = []
    for i in range(out_rows):
        lo = (i * h) // out_rows
        hi = -(-((i + 1) * h) // out_rows)      # ceil
        outs.append(cols[:, lo:hi].mean(axis=1))
    return jnp.stack(outs, axis=1)              # [N, out_rows, C]


class PCBModel(nn.Module):
    num_classes: int
    loss: str = 'softmax'
    parts: int = 6
    reduced_dim: int = 256
    nonlinear: str = 'relu'
    dtype: Any = jnp.float32

    @property
    def feature_dim(self):
        return self.reduced_dim

    @nn.compact
    def __call__(self, x, train: bool = False):
        # ResNet-50 trunk with torch-parity names
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name='conv1')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name='bn1')(x)
        x = nn.relu(x)
        x = max_pool_torch(x)
        for i, (planes, blocks, stride) in enumerate(
                ((64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 1))):
            x = ResLayer(Bottleneck, planes, blocks, stride,
                         dtype=self.dtype, name='layer{}'.format(i + 1)
                         )(x, train)

        v_g = adaptive_avg_pool_rows(x, self.parts)      # [N, P, 2048]
        if not train:
            norm = jnp.linalg.norm(v_g, axis=-1, keepdims=True)
            v_g = v_g / jnp.maximum(norm, 1e-12)
            # torch flattens [N, C, P, 1] channel-major (pcb.py:245-246)
            return jnp.swapaxes(v_g, 1, 2).reshape(v_g.shape[0], -1)

        v_g_d = nn.Dropout(0.5, deterministic=not train)(v_g)
        # conv5: 1x1 conv + BN (+relu) applied per strip
        v_h = nn.Conv(self.reduced_dim, (1, 1), use_bias=False,
                      dtype=self.dtype,
                      name='conv5.layers.0')(v_g_d[:, :, None, :])
        v_h = nn.BatchNorm(use_running_average=not train,
                           momentum=BN_MOMENTUM, epsilon=BN_EPS,
                           dtype=self.dtype, name='conv5.layers.1')(v_h)
        if self.nonlinear == 'relu':
            v_h = nn.relu(v_h)
        elif self.nonlinear == 'leakyrelu':
            v_h = nn.leaky_relu(v_h, 0.1)
        v_h = v_h[:, :, 0, :]                            # [N, P, D]

        ys = []
        for i in range(self.parts):
            ys.append(nn.Dense(self.num_classes, dtype=self.dtype,
                               name='classifier.{}'.format(i))(v_h[:, i]))
        if self.loss == 'softmax':
            return ys
        elif self.loss == 'triplet':
            norm = jnp.linalg.norm(v_g, axis=-1, keepdims=True)
            v_gn = jnp.swapaxes(v_g / jnp.maximum(norm, 1e-12), 1, 2)
            return ys, v_gn.reshape(v_g.shape[0], -1)
        raise KeyError('Unsupported loss: {}'.format(self.loss))


def pcb_p6(num_classes, loss='softmax', pretrained=True, **kwargs):
    dtype = kwargs.pop('dtype', jnp.float32)
    return PCBModel(num_classes=num_classes, loss=loss, parts=6,
                    reduced_dim=256, dtype=dtype)


def pcb_p4(num_classes, loss='softmax', pretrained=True, **kwargs):
    dtype = kwargs.pop('dtype', jnp.float32)
    return PCBModel(num_classes=num_classes, loss=loss, parts=4,
                    reduced_dim=256, dtype=dtype)
