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

import jax
import jax.numpy as jnp

__all__ = ['int8_inference', 'int8_calibration', 'quant_mode', 'quant_conv']

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


def _quantize_weight_per_channel(w):
    """[kh, kw, cin, cout] -> int8 with one scale per output channel."""
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-6) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quant_conv(x, kernel, strides, padding, act_scale, groups=1,
               out_dtype=jnp.bfloat16):
    """int8 x int8 -> int32 convolution with dequantized output.

    Args:
        x: [N, H, W, Cin] activations (any float dtype).
        kernel: [kh, kw, Cin/groups, Cout] float weights.
        act_scale: static per-tensor activation scale (|x|max/127 from
            calibration) — a scalar array.
        strides/padding: as for lax.conv_general_dilated (NHWC/HWIO).
    Returns:
        [N, H', W', Cout] in ``out_dtype``.
    """
    sx = jnp.maximum(act_scale, 1e-8)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                  -127, 127).astype(jnp.int8)
    wq, sw = _quantize_weight_per_channel(kernel.astype(jnp.float32))
    y = jax.lax.conv_general_dilated(
        xq, wq, strides, padding,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=groups,
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (sx * sw)).astype(out_dtype)
