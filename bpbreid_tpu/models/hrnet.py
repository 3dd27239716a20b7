"""HRNet-W32 backbone (NHWC, flax.linen).

TPU-native rebuild of the reference HRNet
(reference: torchreid/models/hrnet.py:314-620, stage config :26-56):
4-stage multi-resolution network whose four branch outputs are
upsampled (bilinear, align_corners=True) to 1/4 scale and concatenated
into a 1920-channel spatial map, optionally reduced by a 1x1-conv head.

Module names mirror the torch ``state_dict`` paths
(``stage3.1.branches.2.0.conv1`` ...) so the ImageNet `hrnetv2_w32`
checkpoint and the BPBReID `.pth` checkpoints convert generically.

The multi-branch structure is static Python (unrolled at trace time) —
XLA sees a flat graph of convs it can fuse/schedule; no dynamic control
flow is involved.
"""
from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from bpbreid_tpu.models.common import (BN_EPS, BN_MOMENTUM, BasicBlock,
                                        Bottleneck, FastBatchNorm, PConv,
                                        ResLayer, calibrated_quant)
from bpbreid_tpu.ops.quant import QTensor, dequantize
from bpbreid_tpu.ops.resize import resize_bilinear_align_corners

# (num_modules, num_branches, num_blocks, channels) per stage
# reference: torchreid/models/hrnet.py:26-56
HRNET_W32_STAGES = {
    'stage2': (1, 2, (4, 4), (32, 64)),
    'stage3': (4, 3, (4, 4, 4), (32, 64, 128)),
    'stage4': (3, 4, (4, 4, 4, 4), (32, 64, 128, 256)),
}


class _ConvBNRelu(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        pad = self.kernel // 2
        x = PConv(self.features, (self.kernel, self.kernel),
                  strides=(self.stride, self.stride),
                  padding=((pad, pad), (pad, pad)), use_bias=self.use_bias,
                  dtype=self.dtype, name='0')(x)
        x = FastBatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                          epsilon=BN_EPS, dtype=self.dtype, name='1')(x)
        if self.relu:
            x = nn.relu(x)
        return x


class HighResolutionModule(nn.Module):
    """Parallel branches + full cross-resolution fusion.

    ``lane_pack``: run the 32-channel branch space-to-depth lane-packed
    in train mode (ops/lane_pack.py — measured 1.16-1.25x on the real
    chip for the branch conv+BN chain; packing is a loss at >=64
    channels and at inference, so it is gated to exactly this case)."""
    num_branches: int
    num_blocks: Sequence[int]
    num_channels: Sequence[int]
    multi_scale_output: bool = True
    lane_pack: bool = True
    dtype: Any = jnp.float32

    def _branch(self, i, x, train):
        from bpbreid_tpu.ops.lane_pack import depth_to_space, space_to_depth
        pack = (self.lane_pack and train and self.num_channels[i] == 32
                and not isinstance(x, QTensor)
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)
        if pack:
            x = space_to_depth(x)
        # quant_out: in shared-int8 mode every consumer of a branch
        # output is QTensor-aware (the fuse-layer PConvs, the identity
        # dequantize, the next stage's transitions and block inputs),
        # so the whole branch trunk rides s8 producer-side copies
        x = ResLayer(BasicBlock, self.num_channels[i], self.num_blocks[i],
                     packed=pack, quant_out=True, dtype=self.dtype,
                     name='branches.{}'.format(i))(x, train)
        return depth_to_space(x) if pack else x

    @nn.compact
    def __call__(self, xs, train=False):
        b = self.num_branches
        if b == 1:
            return [self._branch(0, xs[0], train)]
        xs = [self._branch(i, xs[i], train) for i in range(b)]
        # int8 inference: quantize each branch output ONCE — the i==j
        # identity use, up to 3 fuse convs and the downsample chains all
        # read the same int8 copy (otherwise every fuse conv quantizes
        # with its own scale and XLA materializes per-conv int8 copies
        # PLUS the float copy for the identity term)
        xs = [calibrated_quant(self, xs[j], name='branch_amax_{}'.format(j))
              for j in range(b)]
        n_out = b if self.multi_scale_output else 1
        outs = []
        for i in range(n_out):
            y = None
            for j in range(b):
                if j == i:
                    t = dequantize(xs[j], self.dtype) \
                        if isinstance(xs[j], QTensor) else xs[j]
                elif j > i:
                    # 1x1 conv + BN then nearest-upsample by 2^(j-i)
                    t = PConv(self.num_channels[i], (1, 1), use_bias=False,
                              dtype=self.dtype,
                              name='fuse_layers.{}.{}.0'.format(i, j))(xs[j])
                    t = FastBatchNorm(use_running_average=not train,
                                      momentum=BN_MOMENTUM, epsilon=BN_EPS,
                                      dtype=self.dtype,
                                      name='fuse_layers.{}.{}.1'.format(i, j))(t)
                    f = 2 ** (j - i)
                    t = jnp.repeat(jnp.repeat(t, f, axis=1), f, axis=2)
                else:
                    # chain of stride-2 3x3 convs (relu between, none at end)
                    t = xs[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        feats = self.num_channels[i] if last else self.num_channels[j]
                        t = _ConvBNRelu(feats, 3, 2, relu=not last,
                                        dtype=self.dtype,
                                        name='fuse_layers.{}.{}.{}'.format(i, j, k)
                                        )(t, train)
                y = t if y is None else y + t
            outs.append(nn.relu(y))
        return outs


class HighResolutionNet(nn.Module):
    """HRNet-W32 trunk emitting the 1/4-scale 1920-ch feature map."""
    enable_dim_reduction: bool = False
    dim_reduction_channels: int = 512
    # profiling aid: return early after the named segment
    # ('stem' | 'layer1' | 'stage2' | 'stage3' | 'stage4')
    profile_stop: Any = None
    # also return the per-branch incre outputs (pre-upsample/concat) so
    # heads that are linear in the features can pool each branch at its
    # native resolution and let XLA dead-code-eliminate the 1920-ch
    # upsampled concat map (see BPBreID.multires_pooling)
    return_branches: bool = False
    # train-mode space-to-depth packing of the 32-ch branch (see
    # HighResolutionModule.lane_pack)
    lane_pack_train: bool = True
    # stage-config override (same schema as HRNET_W32_STAGES): the
    # flagship learning gate trains a depth-reduced W32 (fewer modules /
    # blocks, SAME channel widths so lane packing and the incre head
    # planes are exercised unchanged) that fits a CPU test budget
    stages: Any = None
    dtype: Any = jnp.float32

    def _stages(self):
        return self.stages if self.stages is not None else HRNET_W32_STAGES

    @property
    def feature_dim(self):
        if self.enable_dim_reduction:
            return self.dim_reduction_channels
        # incre heads are Bottlenecks (expansion 4) at the stage-4 widths
        return sum(4 * c for c in self._stages()['stage4'][3])

    @nn.compact
    def __call__(self, x, train: bool = False):
        # stem: two stride-2 3x3 convs -> 1/4 scale
        for name_c, name_b in (('conv1', 'bn1'), ('conv2', 'bn2')):
            x = PConv(64, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                      use_bias=False, dtype=self.dtype, name=name_c)(x)
            x = FastBatchNorm(use_running_average=not train,
                              momentum=BN_MOMENTUM, epsilon=BN_EPS,
                              dtype=self.dtype, name=name_b)(x)
            x = nn.relu(x)
        if self.profile_stop == 'stem':
            return x
        # quant_out: layer1's output feeds the stage-2 transitions
        # (QTensor-aware PConvs / pass-through block inputs)
        x = ResLayer(Bottleneck, 64, 4, quant_out=True, dtype=self.dtype,
                     name='layer1')(x, train)
        if self.profile_stop == 'layer1':
            return dequantize(x, self.dtype) if isinstance(x, QTensor) else x

        prev_channels = [256]
        xs = [x]
        for si, stage in enumerate(('stage2', 'stage3', 'stage4')):
            n_mod, n_br, n_blocks, channels = self._stages()[stage]
            tname = 'transition{}'.format(si + 1)
            # int8: one shared quantized copy per stage input — each
            # tensor here can feed several transition convs AND pass
            # through to the next stage's blocks (per-consumer scales
            # would materialize duplicate int8 + float copies)
            xs = [calibrated_quant(self, xs[i],
                                   name='{}_in_amax_{}'.format(stage, i))
                  for i in range(len(xs))]
            new_xs = []
            for i in range(n_br):
                if i < len(prev_channels):
                    if channels[i] != prev_channels[i]:
                        new_xs.append(_ConvBNRelu(
                            channels[i], 3, 1, dtype=self.dtype,
                            name='{}.{}'.format(tname, i))(xs[i], train))
                    else:
                        new_xs.append(xs[i])
                else:
                    # new branch: stride-2 conv chain from the lowest stream
                    t = xs[-1]
                    for j in range(i + 1 - len(prev_channels)):
                        feats = channels[i] if j == i - len(prev_channels) else \
                            prev_channels[-1]
                        t = _ConvBNRelu(feats, 3, 2, dtype=self.dtype,
                                        name='{}.{}.{}'.format(tname, i, j)
                                        )(t, train)
                    new_xs.append(t)
            xs = new_xs
            for m in range(n_mod):
                xs = HighResolutionModule(
                    n_br, n_blocks, channels, multi_scale_output=True,
                    lane_pack=self.lane_pack_train,
                    dtype=self.dtype, name='{}.{}'.format(stage, m))(xs, train)
            prev_channels = list(channels)
            if self.profile_stop == stage:
                return xs[0]

        # per-branch bottleneck "incre" heads: 32/64/128/256 -> 128/256/512/1024
        head_planes = self._stages()['stage4'][3]
        ys = [ResLayer(Bottleneck, head_planes[i], 1, dtype=self.dtype,
                       name='incre_modules.{}'.format(i))(xs[i], train)
              for i in range(len(head_planes))]

        # upsample all to branch-0 resolution (bilinear align_corners) + concat
        h, w = ys[0].shape[1], ys[0].shape[2]
        ups = [ys[0]] + [resize_bilinear_align_corners(y, h, w) for y in ys[1:]]
        x = jnp.concatenate(ups, axis=-1)            # [N, H/4, W/4, 1920]

        if self.enable_dim_reduction:
            x = PConv(self.dim_reduction_channels, (1, 1), use_bias=True,
                      dtype=self.dtype, name='cls_head.0')(x)
            x = FastBatchNorm(use_running_average=not train,
                              momentum=BN_MOMENTUM, epsilon=BN_EPS,
                              dtype=self.dtype, name='cls_head.1')(x)
            x = nn.relu(x)
        if self.return_branches:
            return x, tuple(ys)
        return x


def hrnet32(num_classes=1000, loss='part_based', pretrained=True,
            enable_dim_reduction=True, dim_reduction_channels=256,
            pretrained_path='', return_branches=False, lane_pack_train=True,
            stages=None, dtype=jnp.float32, **kwargs):
    """Constructor mirroring the reference
    (torchreid/models/hrnet.py:611-620). Pretrained weights are loaded
    separately through bpbreid_tpu.utils.torch_weights."""
    del num_classes, loss, pretrained, pretrained_path, kwargs
    return HighResolutionNet(enable_dim_reduction=enable_dim_reduction,
                             dim_reduction_channels=dim_reduction_channels,
                             return_branches=return_branches,
                             lane_pack_train=lane_pack_train,
                             stages=stages, dtype=dtype)
