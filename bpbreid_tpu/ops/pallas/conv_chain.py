"""Pallas TPU kernel: fused residual BasicBlock chain at inference.

STATUS: experimental, not wired into the model. Two formulations were
measured on v5e (batch 256, 96x32x32, 4 blocks):

1. [HW, 9C] im2col (this file): rejected by current Mosaic — the
   lane-dim concat of shifted slices hits "result/input offset
   mismatch on non-concat dimension" for C < 128.
2. Pixels-on-lanes [C, HW] with taps as supported lane rotations and a
   sublane tap concat ([C, 9C] @ [9C, HW]): compiles and is bit-exact,
   but measured SLOWER than XLA (5.7ms vs 3.2ms) — the M=C matmul pads
   to 128 rows on the MXU and the 9-tap VPU edge-masking outweighs the
   saved HBM round-trips.

Conclusion: XLA's conv lowering (batch-on-lanes, ~70% of HBM roofline
per the per-op profile) is already strong for these shapes; revisit
only with an int8 path (half the bytes, 2x MXU peak) where the fused
chain would amortize the quantize/dequantize steps.

Round-2 follow-up (int8 path landed in ops/quant.py via XLA): the
int8 1x1-bottleneck epilogue pattern was also prototyped in Pallas —
s8[786k,64] @ s8[64,256] -> int32 -> scale + bias + dequant(residual)
-> relu -> requant s8, the exact layer1/conv3 chain. Swept
TM in {1024..8192} x dimension_semantics: best Pallas 2.21 ms vs XLA
1.84 ms (bit-exact). XLA's own fusion of this chain wins again; the
framework's int8 speedup (5.4k -> 6.3k img/s) therefore ships on the
XLA path, and Pallas kernels here remain benchmark artifacts, kept as
documentation of the measured design space.

HRNet's high-resolution branches run long chains of 3x3 convs on small
maps (96x32x32 ... 12x4x256). Per conv the whole-batch tensor is only
12-50MB, so composed in XLA every conv round-trips HBM and the chain is
memory-bound (~50 TFLOP/s measured vs ~180 for large convs). One image's
map is just 98-196KB — the ENTIRE chain fits in VMEM. This kernel grids
over the batch and runs all blocks of a branch in one HBM pass:

  for each block:  y = relu(conv3x3(x) * s1 + b1)       (BN folded)
                   y = conv3x3(y) * s2 + b2
                   x = relu(x + y)                       (residual)

matching the reference BasicBlock at eval (reference:
torchreid/models/hrnet.py:82-114) with BN running stats folded into
per-channel scale/bias by the caller.

Convs are im2col matmuls on the MXU: patches [H*W, 9C] @ W [9C, C].
Weights for all blocks are VMEM-resident (C<=128: <1.2MB).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['fused_basicblock_chain', 'basicblock_chain_reference']


def _conv3x3_vmem(x, w_mat, h, wd, c):
    """3x3 same-padding conv of a VMEM-resident [H, W, C] map via
    im2col: returns [H, W, C]. w_mat is [9*C, C] with taps ordered
    (dy, dx, ci)."""
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
    cols = []
    for dy in range(3):
        for dx in range(3):
            cols.append(jax.lax.slice(xp, (dy, dx, 0), (dy + h, dx + wd, c)))
    patches = jnp.concatenate(cols, axis=-1).reshape(h * wd, 9 * c)
    y = jax.lax.dot_general(
        patches, w_mat, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return y.reshape(h, wd, c)


def _chain_kernel(x_ref, w_ref, s_ref, b_ref, o_ref, *, n_blocks, h, wd, c):
    x = x_ref[0].astype(jnp.float32)                    # [H, W, C]
    for i in range(n_blocks):
        w1 = w_ref[2 * i].astype(jnp.float32)           # [9C, C]
        w2 = w_ref[2 * i + 1].astype(jnp.float32)
        y = _conv3x3_vmem(x, w1, h, wd, c)
        y = jnp.maximum(y * s_ref[2 * i] + b_ref[2 * i], 0.0)
        y = _conv3x3_vmem(y, w2, h, wd, c)
        y = y * s_ref[2 * i + 1] + b_ref[2 * i + 1]
        x = jnp.maximum(x + y, 0.0)
    o_ref[0] = x.astype(o_ref.dtype)


def fused_basicblock_chain(x, weights, scales, biases, interpret=False,
                           use_pallas=None):
    """Run ``len(weights)//2`` BasicBlocks over ``x`` in one HBM pass.

    Args:
        x: ``[N, H, W, C]`` feature map.
        weights: ``[2*blocks, 3, 3, C, C]`` HWIO conv kernels.
        scales/biases: ``[2*blocks, C]`` folded-BN affine params.
    Returns:
        ``[N, H, W, C]``.
    """
    n, h, wd, c = x.shape
    n_convs = weights.shape[0]
    assert n_convs % 2 == 0
    if use_pallas is None:
        use_pallas = jax.default_backend() == 'tpu'
    if not use_pallas and not interpret:
        return basicblock_chain_reference(x, weights, scales, biases)

    from jax.experimental import pallas as pl

    # [2B, 3, 3, C, C] -> [2B, 9C, C] with (dy, dx, ci) tap order
    w_mat = weights.reshape(n_convs, 9 * c, c)
    s = scales.astype(jnp.float32)
    b = biases.astype(jnp.float32)

    kernel = functools.partial(_chain_kernel, n_blocks=n_convs // 2,
                               h=h, wd=wd, c=c)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, wd, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((n_convs, 9 * c, c), lambda i: (0, 0, 0)),
            pl.BlockSpec((n_convs, c), lambda i: (0, 0)),
            pl.BlockSpec((n_convs, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, wd, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, wd, c), x.dtype),
        interpret=interpret,
    )(x, w_mat, s, b)


def basicblock_chain_reference(x, weights, scales, biases):
    """XLA reference semantics of the fused chain (used on CPU and in
    tests)."""
    n_convs = weights.shape[0]
    dt = x.dtype

    def conv(v, w):
        return jax.lax.conv_general_dilated(
            v, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32)

    xf = x.astype(jnp.float32)
    for i in range(n_convs // 2):
        y = conv(xf, weights[2 * i].astype(jnp.float32))
        y = jnp.maximum(y * scales[2 * i] + biases[2 * i], 0.0)
        y = conv(y, weights[2 * i + 1].astype(jnp.float32))
        y = y * scales[2 * i + 1] + biases[2 * i + 1]
        xf = jnp.maximum(xf + y, 0.0)
    return xf.astype(dt)
