"""NASNet-A Mobile (NHWC, flax).

Rebuild of the reference (torchreid/models/nasnet.py:52-1131, Zoph et
al. CVPR18): stem cells + 3 stages of (FirstCell + 3 NormalCells)
separated by ReductionCells, with the port's characteristic asymmetric
top-left zero-pad / crop tricks around stride-2 branches. eps=1e-3
batchnorms. Parameter paths mirror the torch ``state_dict``.
"""
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from bpbreid_tpu.models.common import BN_MOMENTUM

__all__ = ['NASNetAMobile', 'nasnetamobile']


def _bn(x, train, name, dtype):
    return nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                        epsilon=1e-3, dtype=dtype, name=name)(x)


def _pad_tl(x):
    """ZeroPad2d((1, 0, 1, 0)): left+top."""
    return jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))


def _avg_excl(x, window=3, stride=1, padding=1):
    ones = jnp.ones(x.shape[:-1] + (1,), x.dtype)
    pads = ((padding, padding), (padding, padding))
    s = nn.avg_pool(x, (window, window), strides=(stride, stride),
                    padding=pads, count_include_pad=True)
    c = nn.avg_pool(ones, (window, window), strides=(stride, stride),
                    padding=pads, count_include_pad=True)
    return s / c


def _max_pool_pad(x):
    x = _pad_tl(x)
    x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    return x[:, 1:, 1:, :]


def _avg_pool_pad(x):
    x = _pad_tl(x)
    x = _avg_excl(x, 3, 2, 1)
    return x[:, 1:, 1:, :]


def _max_pool(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


class _Branch(nn.Module):
    """BranchSeparables / ...Stem / ...Reduction in one module.

    mode: 'plain' | 'specific' | 'stem' | 'reduction'
    (reference: nasnet.py:113-221)."""
    out_channels: int
    kernel: int
    stride: int
    mode: str = 'plain'
    dtype: Any = jnp.float32

    def _sep(self, x, mid_out, stride, name):
        c_in = x.shape[-1]
        pad = self.kernel // 2
        x = nn.Conv(c_in, (self.kernel, self.kernel),
                    strides=(stride, stride),
                    padding=((pad, pad), (pad, pad)), use_bias=False,
                    feature_group_count=c_in, dtype=self.dtype,
                    name=name + '.depthwise_conv2d')(x)
        return nn.Conv(mid_out, (1, 1), use_bias=False, dtype=self.dtype,
                       name=name + '.pointwise_conv2d')(x)

    @nn.compact
    def __call__(self, x, train=False):
        pad_crop = self.mode in ('specific', 'reduction')
        mid = x.shape[-1] if self.mode != 'stem' else self.out_channels
        x = nn.relu(x)
        if pad_crop:
            x = _pad_tl(x)
        x = self._sep(x, mid, self.stride, 'separable_1')
        if pad_crop:
            x = x[:, 1:, 1:, :]
        x = _bn(x, train, 'bn_sep_1', self.dtype)
        x = nn.relu(x)
        x = self._sep(x, self.out_channels, 1, 'separable_2')
        return _bn(x, train, 'bn_sep_2', self.dtype)


class _ReluConvBn(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.relu(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name='conv')(x)
        return _bn(x, train, 'bn', self.dtype)


def _factorized_path(x_relu, half_features, train, dtype):
    """path_1 (stride-2 subsample + conv) / path_2 (shifted subsample +
    conv) -> concat -> bn (reference: nasnet.py:458-546). Plain helper:
    convs attach to the CALLER's scope with the torch names."""
    p1 = nn.Conv(half_features, (1, 1), use_bias=False, dtype=dtype,
                 name='path_1.conv')(x_relu[:, ::2, ::2, :])
    # path 2: pad bottom/right, crop top/left, then stride-2 subsample —
    # matches torch for odd sizes (the pad row/col can be sampled)
    x_p2 = jnp.pad(x_relu, ((0, 0), (0, 1), (0, 1), (0, 0)))[:, 1:, 1:, :]
    p2 = nn.Conv(half_features, (1, 1), use_bias=False, dtype=dtype,
                 name='path_2.conv')(x_p2[:, ::2, ::2, :])
    out = jnp.concatenate([p1, p2], axis=-1)
    return _bn(out, train, 'final_path_bn', dtype)


class CellStem0(nn.Module):
    num_filters: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        nf = self.num_filters
        x1 = _ReluConvBn(nf, dtype=self.dtype, name='conv_1x1')(x, train)
        c0 = _Branch(nf, 5, 2, dtype=self.dtype,
                     name='comb_iter_0_left')(x1, train) \
            + _Branch(nf, 7, 2, mode='stem', dtype=self.dtype,
                      name='comb_iter_0_right')(x, train)
        c1 = _max_pool(x1) \
            + _Branch(nf, 7, 2, mode='stem', dtype=self.dtype,
                      name='comb_iter_1_right')(x, train)
        c2 = _avg_excl(x1, 3, 2, 1) \
            + _Branch(nf, 5, 2, mode='stem', dtype=self.dtype,
                      name='comb_iter_2_right')(x, train)
        c3 = _avg_excl(c0, 3, 1, 1) + c1
        c4 = _Branch(nf, 3, 1, dtype=self.dtype,
                     name='comb_iter_4_left')(c0, train) + _max_pool(x1)
        return jnp.concatenate([c1, c2, c3, c4], axis=-1)


class CellStem1(nn.Module):
    num_filters: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_conv0, x_stem_0, train=False):
        nf = self.num_filters
        x_left = _ReluConvBn(nf, dtype=self.dtype,
                             name='conv_1x1')(x_stem_0, train)
        x_right = _factorized_path(nn.relu(x_conv0), nf // 2, train,
                                   self.dtype)
        b = lambda k, name: _Branch(nf, k, 2, mode='specific',
                                    dtype=self.dtype, name=name)
        c0 = b(5, 'comb_iter_0_left')(x_left, train) \
            + b(7, 'comb_iter_0_right')(x_right, train)
        c1 = _max_pool_pad(x_left) \
            + b(7, 'comb_iter_1_right')(x_right, train)
        c2 = _avg_pool_pad(x_left) \
            + b(5, 'comb_iter_2_right')(x_right, train)
        c3 = _avg_excl(c0, 3, 1, 1) + c1
        c4 = _Branch(nf, 3, 1, mode='specific', dtype=self.dtype,
                     name='comb_iter_4_left')(c0, train) \
            + _max_pool_pad(x_left)
        return jnp.concatenate([c1, c2, c3, c4], axis=-1)


class FirstCell(nn.Module):
    out_left: int
    out_right: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, x_prev, train=False):
        x_left = _factorized_path(nn.relu(x_prev), self.out_left, train,
                                  self.dtype)
        x_right = _ReluConvBn(self.out_right, dtype=self.dtype,
                              name='conv_1x1')(x, train)
        r = self.out_right
        c0 = _Branch(r, 5, 1, dtype=self.dtype,
                     name='comb_iter_0_left')(x_right, train) \
            + _Branch(r, 3, 1, dtype=self.dtype,
                      name='comb_iter_0_right')(x_left, train)
        c1 = _Branch(r, 5, 1, dtype=self.dtype,
                     name='comb_iter_1_left')(x_left, train) \
            + _Branch(r, 3, 1, dtype=self.dtype,
                      name='comb_iter_1_right')(x_left, train)
        c2 = _avg_excl(x_right, 3, 1, 1) + x_left
        c3 = _avg_excl(x_left, 3, 1, 1) + _avg_excl(x_left, 3, 1, 1)
        c4 = _Branch(r, 3, 1, dtype=self.dtype,
                     name='comb_iter_4_left')(x_right, train) + x_right
        return jnp.concatenate([x_left, c0, c1, c2, c3, c4], axis=-1)


class NormalCell(nn.Module):
    out_left: int
    out_right: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, x_prev, train=False):
        x_left = _ReluConvBn(self.out_left, dtype=self.dtype,
                             name='conv_prev_1x1')(x_prev, train)
        x_right = _ReluConvBn(self.out_right, dtype=self.dtype,
                              name='conv_1x1')(x, train)
        l, r = self.out_left, self.out_right
        c0 = _Branch(r, 5, 1, dtype=self.dtype,
                     name='comb_iter_0_left')(x_right, train) \
            + _Branch(l, 3, 1, dtype=self.dtype,
                      name='comb_iter_0_right')(x_left, train)
        c1 = _Branch(l, 5, 1, dtype=self.dtype,
                     name='comb_iter_1_left')(x_left, train) \
            + _Branch(l, 3, 1, dtype=self.dtype,
                      name='comb_iter_1_right')(x_left, train)
        c2 = _avg_excl(x_right, 3, 1, 1) + x_left
        c3 = _avg_excl(x_left, 3, 1, 1) + _avg_excl(x_left, 3, 1, 1)
        c4 = _Branch(r, 3, 1, dtype=self.dtype,
                     name='comb_iter_4_left')(x_right, train) + x_right
        return jnp.concatenate([x_left, c0, c1, c2, c3, c4], axis=-1)


class ReductionCell(nn.Module):
    """ReductionCell0 (mode='reduction') / ReductionCell1 (mode='specific')
    share structure (reference: nasnet.py:674-891)."""
    out_left: int
    out_right: int
    mode: str = 'reduction'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, x_prev, train=False):
        x_left = _ReluConvBn(self.out_left, dtype=self.dtype,
                             name='conv_prev_1x1')(x_prev, train)
        x_right = _ReluConvBn(self.out_right, dtype=self.dtype,
                              name='conv_1x1')(x, train)
        r = self.out_right
        b = lambda k, name: _Branch(r, k, 2, mode=self.mode,
                                    dtype=self.dtype, name=name)
        c0 = b(5, 'comb_iter_0_left')(x_right, train) \
            + b(7, 'comb_iter_0_right')(x_left, train)
        c1 = _max_pool_pad(x_right) \
            + b(7, 'comb_iter_1_right')(x_left, train)
        c2 = _avg_pool_pad(x_right) \
            + b(5, 'comb_iter_2_right')(x_left, train)
        c3 = _avg_excl(c0, 3, 1, 1) + c1
        c4 = _Branch(r, 3, 1, mode=self.mode, dtype=self.dtype,
                     name='comb_iter_4_left')(c0, train) \
            + _max_pool_pad(x_right)
        return jnp.concatenate([c1, c2, c3, c4], axis=-1)


class NASNetAMobile(nn.Module):
    num_classes: int
    loss: str = 'softmax'
    stem_filters: int = 32
    penultimate_filters: int = 1056
    filters_multiplier: int = 2
    dtype: Any = jnp.float32

    @property
    def feature_dim(self):
        return self.penultimate_filters

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.penultimate_filters // 24
        m = self.filters_multiplier
        x_conv0 = nn.Conv(self.stem_filters, (3, 3), strides=(2, 2),
                          padding='VALID', use_bias=False, dtype=self.dtype,
                          name='conv0.conv')(x)
        x_conv0 = _bn(x_conv0, train, 'conv0.bn', self.dtype)
        x_stem_0 = CellStem0(f // (m ** 2), dtype=self.dtype,
                             name='cell_stem_0')(x_conv0, train)
        x_stem_1 = CellStem1(f // m, dtype=self.dtype,
                             name='cell_stem_1')(x_conv0, x_stem_0, train)
        c0 = FirstCell(f // 2, f, dtype=self.dtype,
                       name='cell_0')(x_stem_1, x_stem_0, train)
        c1 = NormalCell(f, f, dtype=self.dtype, name='cell_1')(c0, x_stem_1,
                                                               train)
        c2 = NormalCell(f, f, dtype=self.dtype, name='cell_2')(c1, c0, train)
        c3 = NormalCell(f, f, dtype=self.dtype, name='cell_3')(c2, c1, train)
        r0 = ReductionCell(2 * f, 2 * f, mode='reduction', dtype=self.dtype,
                           name='reduction_cell_0')(c3, c2, train)
        c6 = FirstCell(f, 2 * f, dtype=self.dtype, name='cell_6')(r0, c3,
                                                                  train)
        c7 = NormalCell(2 * f, 2 * f, dtype=self.dtype,
                        name='cell_7')(c6, r0, train)
        c8 = NormalCell(2 * f, 2 * f, dtype=self.dtype,
                        name='cell_8')(c7, c6, train)
        c9 = NormalCell(2 * f, 2 * f, dtype=self.dtype,
                        name='cell_9')(c8, c7, train)
        r1 = ReductionCell(4 * f, 4 * f, mode='specific', dtype=self.dtype,
                           name='reduction_cell_1')(c9, c8, train)
        c12 = FirstCell(2 * f, 4 * f, dtype=self.dtype,
                        name='cell_12')(r1, c9, train)
        c13 = NormalCell(4 * f, 4 * f, dtype=self.dtype,
                         name='cell_13')(c12, r1, train)
        c14 = NormalCell(4 * f, 4 * f, dtype=self.dtype,
                         name='cell_14')(c13, c12, train)
        c15 = NormalCell(4 * f, 4 * f, dtype=self.dtype,
                         name='cell_15')(c14, c13, train)
        out = nn.relu(c15)
        if self.loss == 'part_based':
            return out
        v = out.mean(axis=(1, 2))
        v = nn.Dropout(0.5, deterministic=not train)(v)
        if not train:
            return v
        y = nn.Dense(self.num_classes, dtype=self.dtype, name='classifier')(v)
        if self.loss == 'softmax':
            return y
        elif self.loss == 'triplet':
            return y, v
        raise KeyError('Unsupported loss: {}'.format(self.loss))


def nasnetamobile(num_classes, loss='softmax', pretrained=True, **kwargs):
    dtype = kwargs.pop('dtype', jnp.float32)
    return NASNetAMobile(num_classes=num_classes, loss=loss, dtype=dtype)
