"""Post-training int8 quantization for inference convolutions.

The HRNet branch convolutions dominate BPBreID inference time and run
HBM-bandwidth-bound at bf16 (IMPLEMENTATION_STATUS.md per-op profile).
int8 halves the activation bytes and doubles the MXU rate: the micro
benchmark on the hot shape ([256, 96, 32, 32] x 3x3x32->32, TPU v5e)
measures 1.67 ms bf16 vs 0.80 ms int8.

Two-phase design (measured: *dynamic* per-conv activation scales are a
net LOSS end-to-end — 4.4k vs 5.5k img/s — because every conv then
needs an extra full amax pass over its input that cannot fuse with the
conv itself):

1. **calibration** — run representative batches inside
   ``int8_calibration()`` with ``mutable=['quant']``: convs execute in
   float and record the running max |activation| into a ``quant``
   variable collection (one scalar per conv).
2. **inference** — apply inside ``int8_inference()`` with the calibrated
   ``quant`` collection in the variables: activations are quantized with
   the *static* stored scale (the round/clip/cast chain fuses into the
   producing BN/ReLU, which then writes int8 — half the bytes), weights
   are quantized per-output-channel at trace time, and the conv
   accumulates int32 on the MXU.

The flags are read at TRACE time: a jitted function compiled inside a
context keeps that graph permanently — keep separate jitted callables
per mode. Training always uses the float path.

Mode matrix — which graph runs for each config (one mechanism per
row; they compose top-to-bottom, later rows only activate with the
earlier ones):

  ``cfg.test.int8 = False`` (or outside ``int8_inference()``):
      float/bf16 everywhere. ``calibrated_quant`` and
      ``quant_out`` are no-ops (they return the tensor unchanged), so
      the block/module-level hooks cost nothing outside int8 mode.
  ``cfg.test.int8 = True``, ``int8_shared_points = False`` (per-conv,
      the conservative fallback): every PConv quantizes its OWN input
      with its own calibrated scale; residual/identity adds consume
      the exact float tensor, so quantization error does not compound
      along the residual trunk. Measured 7027 img/s (flagship, batch
      256, scan_k 4, round 5).
  ``int8_shared_points = True`` (the DEFAULT): hot tensors are
      quantized ONCE at module level (``calibrated_quant``) and blocks
      PRODUCE ``QTensor`` outputs (``quant_out``/``quant_blocks`` —
      the quantize fuses into the block's final add+relu so the bf16
      output is never materialized in HBM); every consumer — convs and
      residual adds — reads the same s8 copy. Producer-side quant is
      numerically identical to the consumer-side quantize it replaces
      (same tensor, same calibrated scale; equivalence-tested in
      tests/test_quant.py). Measured 8004 img/s (+14%, round 5), and
      a SMALLER mAP delta than per-conv on the trained accuracy rig
      (MODEL_ZOO.md int8 table) — shared mode wins both axes.
  ``int8_act_granularity = 'per_tensor'`` (the DEFAULT): one scalar
      activation scale per quantization point. Per-channel scales must
      be FOLDED into the conv weights to keep the MXU conv pure int8,
      and the fold transfers the input-channel range spread into the
      weight rows, collapsing per-output-channel weight precision when
      BN ranges are unequalized — measured ~0.19 absolute mAP cost vs
      ~0.06 for per_tensor on the trained rig, and per_tensor is also
      ~1% faster (8085 vs 8004 img/s shared). 'per_channel_floor<K>'
      bounds the fold spread to K and interpolates monotonically
      between the two (see ``act_scale_from_amax``).
  ``int8_skip_patterns`` (default ``['extractor/conv1',
      'extractor/conv2']`` — the FLOAT STEM): module-path substrings
      kept in float under either mode. The float stem measured BOTH
      faster (8215 vs 8117 img/s at scan 8 — a 3-channel stride-2
      conv underuses the int8 MXU and the full-res input quantize is
      pure overhead) and more accurate (~0.006 mAP on the trained
      rig). Adding ``'incre_modules'`` is the best-accuracy mix
      (-0.036 vs -0.064 mAP, -1.1% throughput); ``[]`` selects the
      fully-quantized graph.

The engine (engine/part_based.py) builds its int8 eval step from
``QuantOpts.from_config(cfg.test)``, so the config knobs select the
graph end-to-end; ``bench.py --int8-shared`` A/Bs the two modes.

The reference has no quantized path; this is TPU-native headroom on top
of the reference's fp32 inference (torchreid/models/hrnet.py:314-620).
"""
import contextlib
import contextvars
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ['int8_inference', 'int8_calibration', 'quant_mode', 'quant_conv',
           'QTensor', 'QuantOpts', 'quantize_static', 'dequantize',
           'calib_amax', 'quant_skipped', 'quant_shared_points',
           'act_scale_from_amax']


class QuantOpts(NamedTuple):
    """Hashable bundle of the trace-time mixed-precision knobs.

    Pass one of these as a STATIC argument of any jitted function whose
    body traces under ``int8_inference`` — the knobs are read from
    contextvars at trace time, so they are invisible to the jit cache:
    without a static-arg key, rebuilding a jitted callable for the same
    function with different knob values silently reuses the first
    compiled graph (bound methods compare equal, so even a fresh
    ``jax.jit(obj.method)`` hits the old cache).

    Defaults mirror config.py ``cfg.test.int8_*`` (incl. the float
    stem — see the mode matrix above).
    """
    skip_patterns: Any = ('extractor/conv1', 'extractor/conv2')
    shared: bool = True
    act_granularity: str = 'per_tensor'

    @classmethod
    def from_config(cls, tcfg):
        """Build from a ``cfg.test``-style namespace. An explicit empty
        ``int8_skip_patterns`` list means the fully-quantized graph."""
        return cls(
            skip_patterns=tuple(
                getattr(tcfg, 'int8_skip_patterns',
                        cls._field_defaults['skip_patterns']) or ()),
            shared=bool(getattr(tcfg, 'int8_shared_points', True)),
            act_granularity=str(
                getattr(tcfg, 'int8_act_granularity', 'per_tensor')))

    def inference_context(self):
        return int8_inference(skip_patterns=self.skip_patterns,
                              shared=self.shared,
                              act_granularity=self.act_granularity)

_MODE = contextvars.ContextVar('bpbreid_quant_mode', default='off')
_CALIB_PCT = contextvars.ContextVar('bpbreid_quant_calib_pct', default=100.0)
# mixed-precision controls, read at trace time like _MODE (defaults
# mirror QuantOpts / cfg.test so a bare `with int8_inference():` runs
# the same graph as the config-driven engine path — incl. the float
# stem, the measured throughput+accuracy winner):
_SKIP = contextvars.ContextVar('bpbreid_quant_skip',
                               default=('extractor/conv1',
                                        'extractor/conv2'))
# default True: matches QuantOpts.shared / cfg.test.int8_shared_points,
# so a bare `with int8_inference():` quantizes exactly like the
# config-driven engine path (shared points + producer quant — the
# round-5 measured winner on both throughput and accuracy)
_SHARED = contextvars.ContextVar('bpbreid_quant_shared', default=True)
_ACT_GRAN = contextvars.ContextVar('bpbreid_quant_act_gran',
                                   default='per_tensor')


@contextlib.contextmanager
def _set_mode(mode, percentile=None, skip_patterns=None, shared=None,
              act_granularity=None):
    tokens = [(_MODE, _MODE.set(mode))]
    if percentile is not None:
        tokens.append((_CALIB_PCT, _CALIB_PCT.set(float(percentile))))
    if skip_patterns is not None:
        tokens.append((_SKIP, _SKIP.set(tuple(skip_patterns))))
    if shared is not None:
        tokens.append((_SHARED, _SHARED.set(bool(shared))))
    if act_granularity is not None:
        tokens.append((_ACT_GRAN, _ACT_GRAN.set(act_granularity)))
    try:
        yield
    finally:
        for var, token in reversed(tokens):
            var.reset(token)


def int8_inference(enabled=True, skip_patterns=None, shared=None,
                   act_granularity=None):
    """Trace-time switch: convs traced inside run int8.

    Mixed-precision controls (all trace-time, default = full int8):
        skip_patterns: substrings of flax module paths
            (``'/'.join(module.path)``) to keep in FLOAT — e.g.
            ``('incre_modules',)`` keeps the HRNet feature heads exact
            while the trunk runs int8.
        shared: True (the default, matching cfg.test.int8_shared_points)
            enables the module-level shared quantization points
            (``calibrated_quant``) and block producer quant: one int8
            copy per block input/output, shared by every consumer —
            the round-5 measured winner on both throughput (+14%) and
            accuracy (MODEL_ZOO.md int8 table). False quantizes per
            conv and keeps residual/identity adds on the exact FLOAT
            tensor (the conservative fallback).
        act_granularity: 'per_tensor' (default) or 'per_channel'
            activation scales (per-tensor reduces the stored
            per-channel amax with a max at use time; see
            ``act_scale_from_amax`` for why per-channel folding loses
            accuracy here).
    """
    return _set_mode('int8' if enabled else 'off',
                     skip_patterns=skip_patterns, shared=shared,
                     act_granularity=act_granularity)


def quant_skipped(path):
    """True when the flax module path (tuple of names) matches one of
    the active skip patterns — the module then stays float."""
    pats = _SKIP.get()
    if not pats:
        return False
    joined = '/'.join(path)
    return any(p in joined for p in pats)


def quant_shared_points():
    """Whether module-level shared quantization points are active."""
    return _SHARED.get()


def act_scale_from_amax(amax):
    """Stored per-channel amax -> activation scale under the active
    granularity.

    'per_tensor' collapses it with a max. 'per_channel_floor<K>'
    (e.g. 'per_channel_floor16') floors each channel's amax at
    max(amax)/K: per-channel activation scales are FOLDED into the conv
    weights (quant_conv._fold_act_scale), so an unbounded amax spread
    across input channels inflates the folded weight rows' dynamic
    range and destroys the per-OUTPUT-channel weight quantization — the
    floor bounds that fold spread to K while keeping per-channel
    resolution for the loud channels (measured: unbounded per-channel
    folding costs ~0.19 mAP on the briefly-trained flagship rig where
    BN ranges are unequalized; per-tensor costs ~0.06)."""
    amax = jnp.asarray(amax)
    gran = _ACT_GRAN.get()
    if amax.ndim == 0:
        return amax / 127.0
    if gran == 'per_tensor':
        amax = jnp.max(amax)
    elif gran.startswith('per_channel_floor'):
        k = float(gran[len('per_channel_floor'):])
        amax = jnp.maximum(amax, jnp.max(amax) / k)
    return amax / 127.0


def int8_calibration(percentile=100.0):
    """Trace-time switch: convs run in float and record activation
    ranges into the ``quant`` collection (apply with mutable=['quant']).

    ``percentile`` < 100 records a percentile of |x| instead of the
    absolute max: one outlier then saturates (the quantizer clips to
    ±127) instead of stretching the scale and crushing the resolution
    of every other value — the standard post-training-quantization
    range-clipping trade (measured on the flagship parity rig: abs-max
    costs ~4.6% absolute mAP, 99.9% clipping recovers most of it; see
    tests/test_e2e_reference_parity.py::test_flagship_int8_map_delta).
    """
    return _set_mode('calibrate', percentile)


def quant_mode():
    return _MODE.get()


def calib_amax(x):
    """Per-channel calibration range of ``x``: abs-max (or the
    configured percentile of |x|, see ``int8_calibration``) over all
    axes but the trailing channel axis.

    The recorded range is per-channel so the GRANULARITY stays a
    use-time knob (``act_scale_from_amax``): per-tensor consumers
    collapse it with a max. Note the round-5 accuracy A/B reversed the
    early assumption that per-channel scales would win: folding them
    into the conv weights (``quant_conv``) transfers the input-channel
    range spread into the weight rows and costs ~3x the mAP of a plain
    per-tensor scale on the trained rig — 'per_tensor' is the
    default."""
    pct = _CALIB_PCT.get()
    ax = jnp.abs(x.astype(jnp.float32))
    flat = ax.reshape(-1, ax.shape[-1])
    if pct >= 100.0:
        return jnp.max(flat, axis=0)
    return jnp.quantile(flat, pct / 100.0, axis=0)


class QTensor(NamedTuple):
    """An int8-quantized activation tensor with its static scale.

    Produced once per hot tensor (block input / branch output) so every
    consumer — convs AND residual/fusion adds — reads the same int8 HBM
    copy instead of XLA materializing a float copy next to per-conv int8
    copies (measured: per-conv quantization made int8 end-to-end neutral
    because each residual kept a full bf16 copy of the block input
    alive)."""
    q: Any          # int8 data, layout of the original tensor
    scale: Any      # () or [C] float32: dequant multiplier (amax / 127)


def quantize_static(x, act_scale):
    """x (float) -> QTensor with the given static scale (a scalar, or a
    per-channel [C] vector broadcast over the trailing axis)."""
    sx = jnp.maximum(jnp.asarray(act_scale, jnp.float32), 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                 -127, 127).astype(jnp.int8)
    return QTensor(q, sx)


def dequantize(qt, dtype=jnp.bfloat16):
    """QTensor -> float tensor (fuses into the consuming add/mul)."""
    return (qt.q.astype(jnp.float32) * qt.scale).astype(dtype)


def _quantize_weight_per_channel(w):
    """[kh, kw, cin, cout] -> int8 with one scale per output channel."""
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-6) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _fold_act_scale(kernel, sx, groups):
    """Fold the activation dequant scale into the float weights.

    With per-channel activation scales, x ~= xq * sx[cin], so
    conv(x, w) ~= conv(xq, w * sx[cin]) — the fold keeps the MXU conv
    pure int8 while the per-channel resolution survives. For grouped
    convs, output channel ``o`` (group ``o // (cout/groups)``) consumes
    input slice ``g*cin_g:(g+1)*cin_g`` mapped onto kernel axis 2.
    """
    sx = jnp.asarray(sx, jnp.float32)
    if sx.ndim == 0:
        return kernel * sx
    kh, kw, cin_g, cout = kernel.shape
    fold = sx.reshape(groups, cin_g).T                   # [cin_g, groups]
    fold = jnp.repeat(fold, cout // groups, axis=1)      # [cin_g, cout]
    return kernel * fold[None, None, :, :]


def quant_conv(x, kernel, strides, padding, act_scale=None, groups=1,
               out_dtype=jnp.bfloat16):
    """int8 x int8 -> int32 convolution with dequantized output.

    Args:
        x: [N, H, W, Cin] activations — either a float tensor (quantized
            here with ``act_scale``) or an already-quantized ``QTensor``
            (``act_scale`` ignored; zero-point is 0 so conv padding is
            exact in the quantized domain).
        kernel: [kh, kw, Cin/groups, Cout] float weights.
        act_scale: static activation scale (amax/127 from calibration) —
            a scalar or per-channel [Cin] array. Required for float
            ``x``.
        strides/padding: as for lax.conv_general_dilated (NHWC/HWIO).
    Returns:
        [N, H', W', Cout] in ``out_dtype``.
    """
    if isinstance(x, QTensor):
        xq, sx = x.q, x.scale
    else:
        xq, sx = quantize_static(x, act_scale)
    w_folded = _fold_act_scale(kernel.astype(jnp.float32), sx, groups)
    wq, sw = _quantize_weight_per_channel(w_folded)
    y = jax.lax.conv_general_dilated(
        xq, wq, strides, padding,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=groups,
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * sw).astype(out_dtype)
