"""Pallas TPU kernel: fused part-attention softmax + masked pooling.

The BPBreID head turns per-pixel part logits into attention maps
(softmax over K+1) and pools the backbone feature map under each map
(GWAP). Composed in XLA this reads the feature map from HBM once for
the softmax consumer and once per reduction fusion; this kernel does the
whole contraction in one VMEM pass per (sample, feature-tile):

  probs  = softmax(logits, -1)              [P, K+1]   (P = Hf*Wf pixels)
  num    = probs^T @ feats                  [K+1, Dt]  (MXU)
  den    = sum_p probs                      [K+1]
  vismax = max_p probs                      [K+1]

Grid: (N, D // Dt). ``den``/``vismax`` are computed once (first D tile).
Outputs are the raw numerator/denominator so callers choose GWAP
(num/den) or GAP (num/P) without re-reading the feature map.

The functional wrapper falls back to plain XLA when Pallas is
unavailable (e.g. CPU tests run with interpret=True).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['fused_attention_pool']


def _kernel(logits_ref, feats_ref, num_ref, den_ref, vis_ref):
    from jax.experimental import pallas as pl

    j = pl.program_id(1)
    logits = logits_ref[0].astype(jnp.float32)          # [P, Kp]
    probs = jax.nn.softmax(logits, axis=-1)
    feats = feats_ref[0].astype(jnp.float32)            # [P, Dt]
    num_ref[0] = jax.lax.dot_general(
        probs, feats, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # [Kp, Dt]

    @pl.when(j == 0)
    def _():
        den_ref[0] = probs.sum(axis=0)[None, :]          # [1, Kp]
        vis_ref[0] = probs.max(axis=0)[None, :]          # [1, Kp]


def fused_attention_pool(features, logits, d_tile=512, interpret=False,
                         use_pallas=None):
    """Fused softmax-attention pooling.

    Args:
        features: ``[N, Hf, Wf, D]``.
        logits: ``[N, Hf, Wf, K+1]`` pixel part logits.
        d_tile: feature tile width per grid step.
    Returns:
        (num ``[N, K+1, D]`` f32, den ``[N, K+1]`` f32,
         vismax ``[N, K+1]`` f32).
    """
    n, h, w, d = features.shape
    k1 = logits.shape[-1]
    p = h * w
    feats = features.reshape(n, p, d)
    lg = logits.reshape(n, p, k1)

    if use_pallas is None:
        use_pallas = jax.default_backend() == 'tpu'
    if not use_pallas and not interpret:
        probs = jax.nn.softmax(lg.astype(jnp.float32), axis=-1)
        num = jnp.einsum('npk,npd->nkd', probs, feats.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
        return num, probs.sum(axis=1), probs.max(axis=1)

    from jax.experimental import pallas as pl

    # keep the double-buffered [1, P, d_tile] feature block within the
    # ~16MB scoped-VMEM budget (block + prefetch + f32 working copy)
    bytes_per = jnp.dtype(feats.dtype).itemsize
    fit = max(128, (4 * 1024 * 1024 // (p * bytes_per)) // 128 * 128)
    d_tile = min(d_tile, d, fit)
    # prefer a tile that divides D exactly — padding D to a multiple
    # materializes a full padded copy of the feature map in HBM
    for cand in range(d_tile, 127, -128):
        if d % cand == 0:
            d_tile = cand
            break
    if d % d_tile:
        pad = (-d) % d_tile
        feats = jnp.pad(feats, ((0, 0), (0, 0), (0, pad)))
        d_pad = d + pad
    else:
        d_pad = d
    grid = (n, d_pad // d_tile)

    num, den, vis = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, p, k1), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, p, d_tile), lambda i, j: (i, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, k1, d_tile), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, 1, k1), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, k1), lambda i, j: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, k1, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, k1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, k1), jnp.float32),
        ],
        interpret=interpret,
    )(lg, feats)
    return num[:, :, :d], den[:, 0, :], vis[:, 0, :]
