"""PVPM: Pose-guided Visible Part Matching (NHWC, flax).

Rebuild of the reference port (torchreid/models/pvpm.py:314-542, Gao et
al. CVPR20): a ResNet-50 trunk whose part features are pooled under
pose-guided attention maps produced by an OSBlock pose subnet from
external pose heatmaps; optional per-part matching-score regression.

Registry names mirror the reference: pose_p4 / pose_p6 (+pscore_reg
variants map to part_score_reg=True).
"""
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from bpbreid_tpu.models.common import (
    BN_EPS, BN_MOMENTUM, Bottleneck, ResLayer, max_pool_torch)
from bpbreid_tpu.models.osnet import Conv1x1, ConvLayer, OSBlock

__all__ = ['PoseGuidedAttResnet', 'pose_p4', 'pose_p6', 'pose_p4s', 'pose_p6s']


def _bn(x, train, name, dtype):
    return nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                        epsilon=BN_EPS, dtype=dtype, name=name)(x)


class PoseSubnet(nn.Module):
    """PVP + PGA subnet over pose heatmaps
    (reference: pvpm.py:350-420)."""
    att_num: int
    channels: Sequence[int] = (32, 32, 32)
    matching_score_reg: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pose_map, train=False):
        ch = self.channels
        x = ConvLayer(ch[0], 7, 1, dtype=self.dtype,
                      name='conv1')(pose_map, train)
        x = max_pool_torch(x)
        # conv2: one OSBlock + transition (Conv1x1 + AvgPool)
        x = OSBlock(ch[1], dtype=self.dtype, name='conv2.0')(x, train)
        x = Conv1x1(ch[1], dtype=self.dtype, name='conv2.1.0')(x, train)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        # conv3: one OSBlock, no reduction
        x = OSBlock(ch[2], dtype=self.dtype, name='conv3.0')(x, train)
        # conv4: Conv3x3 (conv + bn + relu)
        x_ = nn.Conv(ch[2], (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                     dtype=self.dtype, name='conv4.conv')(x)
        x_ = nn.relu(_bn(x_, train, 'conv4.bn', self.dtype))
        # PGA attention: 1x1 conv + bn + sigmoid
        att = nn.Conv(self.att_num, (1, 1), use_bias=False, dtype=self.dtype,
                      name='conv_out.conv')(x_)
        att = nn.sigmoid(_bn(att, train, 'conv_out.bn', self.dtype))
        # hard one-hot over parts (argmax per pixel)
        import jax
        idx = jnp.argmax(att, axis=-1)
        onehot = jax.nn.one_hot(idx, self.att_num, dtype=att.dtype)
        if self.matching_score_reg:
            s = x_.mean(axis=(1, 2))
            s = nn.Dense(self.att_num, use_bias=False, dtype=self.dtype,
                         name='conv_score.reg')(s)
            s = nn.BatchNorm(use_running_average=not train,
                             momentum=BN_MOMENTUM, epsilon=BN_EPS,
                             dtype=self.dtype, name='conv_score.bn')(s)
            return att, nn.sigmoid(s), onehot
        return att, onehot


class PoseGuidedAttResnet(nn.Module):
    """(reference pose_guide_att_Resnet: pvpm.py:422-478)"""
    num_classes: int
    loss: str = 'softmax'
    parts: int = 4
    reduced_dim: int = 256
    part_score_reg: bool = False
    pose_inchannel: int = 56
    dtype: Any = jnp.float32

    @property
    def feature_dim(self):
        return self.reduced_dim

    @nn.compact
    def __call__(self, x, pose_map, train: bool = False):
        # ResNet-50 trunk, last_stride=1 (pvpm PCB: pvpm.py:149-153)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name='conv1')(x)
        x = nn.relu(_bn(x, train, 'bn1', self.dtype))
        x = max_pool_torch(x)
        for i, (planes, blocks, stride) in enumerate(
                ((64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 1))):
            x = ResLayer(Bottleneck, planes, blocks, stride,
                         dtype=self.dtype, name='layer{}'.format(i + 1)
                         )(x, train)
        f = x                                       # [N, Hf, Wf, 2048]

        subnet = PoseSubnet(self.parts, matching_score_reg=self.part_score_reg,
                            dtype=self.dtype, name='pose_subnet')
        if self.part_score_reg:
            pose_att, part_score, onehot = subnet(pose_map, train)
        else:
            pose_att, onehot = subnet(pose_map, train)
            part_score = None
        pose_att = pose_att * onehot                # [N, Hf, Wf, P]
        att_mean = pose_att.mean(axis=(1, 2))       # [N, P]

        v_parts = []
        for i in range(self.parts):
            w = pose_att[..., i:i + 1] / (att_mean[:, None, None, i:i + 1]
                                          + 1e-6)
            v_parts.append((f * w).mean(axis=(1, 2)))    # [N, 2048]
        if not train:
            # [N, 2048, P] channel-major flatten + L2 norm over channels
            vg = jnp.stack(v_parts, axis=-1)
            vg = vg / jnp.maximum(
                jnp.linalg.norm(vg, axis=1, keepdims=True), 1e-12)
            flat = vg.reshape(vg.shape[0], -1)
            if self.part_score_reg:
                return flat, part_score
            return flat
        ys, vs = [], []
        for i in range(self.parts):
            v = nn.Conv(self.reduced_dim, (1, 1), use_bias=True,
                        dtype=self.dtype,
                        name='em.{}.0'.format(i))(
                            v_parts[i][:, None, None, :])
            v = _bn(v, train, 'em.{}.1'.format(i), self.dtype)
            v = nn.relu(v)[:, 0, 0, :]
            y = nn.Dense(self.num_classes, use_bias=False, dtype=self.dtype,
                         name='classifier.{}'.format(i))(v)
            ys.append(y)
            vs.append(v)
        if self.loss == 'softmax':
            if self.part_score_reg:
                return ys, pose_att, part_score, v_parts
            return ys, pose_att
        elif self.loss == 'triplet':
            return ys, vs
        raise KeyError('Unsupported loss: {}'.format(self.loss))


def _pvpm(parts, part_score_reg=False, **kwargs):
    num_classes = kwargs.pop('num_classes', 1000)
    loss = kwargs.pop('loss', 'softmax')
    dtype = kwargs.pop('dtype', jnp.float32)
    return PoseGuidedAttResnet(num_classes=num_classes, loss=loss,
                               parts=parts, part_score_reg=part_score_reg,
                               dtype=dtype)


def pose_p4(num_classes, loss='softmax', pretrained=True, **kwargs):
    return _pvpm(4, num_classes=num_classes, loss=loss, **kwargs)


def pose_p6(num_classes, loss='softmax', pretrained=True, **kwargs):
    return _pvpm(6, num_classes=num_classes, loss=loss, **kwargs)


def pose_p4s(num_classes, loss='softmax', pretrained=True, **kwargs):
    return _pvpm(4, part_score_reg=True, num_classes=num_classes, loss=loss,
                 **kwargs)


def pose_p6s(num_classes, loss='softmax', pretrained=True, **kwargs):
    return _pvpm(6, part_score_reg=True, num_classes=num_classes, loss=loss,
                 **kwargs)
