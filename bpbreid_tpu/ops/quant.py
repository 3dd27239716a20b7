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

The reference has no quantized path; this is TPU-native headroom on top
of the reference's fp32 inference (torchreid/models/hrnet.py:314-620).
"""
import contextlib
import contextvars
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ['int8_inference', 'int8_calibration', 'quant_mode', 'quant_conv',
           'QTensor', 'quantize_static', 'dequantize']

_MODE = contextvars.ContextVar('bpbreid_quant_mode', default='off')


@contextlib.contextmanager
def _set_mode(mode):
    token = _MODE.set(mode)
    try:
        yield
    finally:
        _MODE.reset(token)


def int8_inference(enabled=True):
    """Trace-time switch: convs traced inside run int8."""
    return _set_mode('int8' if enabled else 'off')


def int8_calibration():
    """Trace-time switch: convs run in float and record activation
    ranges into the ``quant`` collection (apply with mutable=['quant'])."""
    return _set_mode('calibrate')


def quant_mode():
    return _MODE.get()


class QTensor(NamedTuple):
    """An int8-quantized activation tensor with its static scale.

    Produced once per hot tensor (block input / branch output) so every
    consumer — convs AND residual/fusion adds — reads the same int8 HBM
    copy instead of XLA materializing a float copy next to per-conv int8
    copies (measured: per-conv quantization made int8 end-to-end neutral
    because each residual kept a full bf16 copy of the block input
    alive)."""
    q: Any          # int8 data, layout of the original tensor
    scale: Any      # () float32: dequant multiplier (|x|max / 127)


def quantize_static(x, act_scale):
    """x (float) -> QTensor with the given static per-tensor scale."""
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


def quant_conv(x, kernel, strides, padding, act_scale=None, groups=1,
               out_dtype=jnp.bfloat16):
    """int8 x int8 -> int32 convolution with dequantized output.

    Args:
        x: [N, H, W, Cin] activations — either a float tensor (quantized
            here with ``act_scale``) or an already-quantized ``QTensor``
            (``act_scale`` ignored; zero-point is 0 so conv padding is
            exact in the quantized domain).
        kernel: [kh, kw, Cin/groups, Cout] float weights.
        act_scale: static per-tensor activation scale (|x|max/127 from
            calibration) — a scalar array. Required for float ``x``.
        strides/padding: as for lax.conv_general_dilated (NHWC/HWIO).
    Returns:
        [N, H', W', Cout] in ``out_dtype``.
    """
    if isinstance(x, QTensor):
        xq, sx = x.q, x.scale
    else:
        xq, sx = quantize_static(x, act_scale)
    wq, sw = _quantize_weight_per_channel(kernel.astype(jnp.float32))
    y = jax.lax.conv_general_dilated(
        xq, wq, strides, padding,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=groups,
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (sx * sw)).astype(out_dtype)
