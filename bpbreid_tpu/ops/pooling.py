"""Masked part pooling heads.

The hot op of the BPBreID head: pool a ``[N, H, W, D]`` feature map into
``[N, K, D]`` part embeddings under ``[N, H, W, K]`` attention masks.

The reference materializes a ``[N, K, D, H, W]`` product tensor
(reference: torchreid/models/bpbreid.py:444-503). On TPU we instead
express GWAP/GAP as a single batched matmul over the flattened pixel
axis — ``einsum('npk,npd->nkd')`` — which maps straight onto the MXU and
never materializes the broadcast. GMP cannot be a matmul (max-reduce);
it unrolls over the small K axis, peak memory ``[N, H, W, D]``.

A Pallas fusion of (softmax -> mask product -> pooled reduction) lives
in ops/pallas/ for the single-kernel version; this module is the XLA
reference implementation and the default (XLA already fuses well here).
"""
import jax
import jax.numpy as jnp

__all__ = ['parts_pooling', 'gwap_pool', 'gap_pool', 'gmp_pool']


def gwap_pool(features, masks, eps=1e-6):
    """Global Weighted Average Pooling: sum(mask*feat)/clamp(sum(mask)).

    Args:
        features: ``[N, H, W, D]``.
        masks: ``[N, H, W, K]``.
    Returns:
        ``[N, K, D]`` (reference: bpbreid.py:489-503).
    """
    n, h, w, d = features.shape
    k = masks.shape[-1]
    f = features.reshape(n, h * w, d)
    m = masks.reshape(n, h * w, k)
    num = jnp.einsum('npk,npd->nkd', m, f,
                     preferred_element_type=jnp.float32)
    den = jnp.clip(m.sum(axis=1), 1e-6, None).astype(num.dtype)   # [N, K]
    return (num / den[..., None]).astype(features.dtype)


def gap_pool(features, masks):
    """Global Average Pooling of the masked feature map: mean over pixels
    of mask*feat (reference GlobalAveragePoolingHead, bpbreid.py:485-486)."""
    n, h, w, d = features.shape
    k = masks.shape[-1]
    f = features.reshape(n, h * w, d)
    m = masks.reshape(n, h * w, k)
    num = jnp.einsum('npk,npd->nkd', m, f,
                     preferred_element_type=jnp.float32)
    return (num / (h * w)).astype(features.dtype)


def gmp_pool(features, masks):
    """Global Max Pooling of the masked feature map
    (reference GlobalMaxPoolingHead, bpbreid.py:481-482).

    Unrolled over K (small, <=38): max over pixels of mask_k * features.
    """
    k = masks.shape[-1]
    outs = []
    for i in range(k):
        outs.append((masks[..., i:i + 1] * features).max(axis=(1, 2)))
    return jnp.stack(outs, axis=1)


def parts_pooling(features, masks, pooling='gwap'):
    """Dispatch on pooling type ('gwap' | 'gap' | 'gmp')."""
    if pooling == 'gwap':
        return gwap_pool(features, masks)
    if pooling == 'gap':
        return gap_pool(features, masks)
    if pooling == 'gmp':
        return gmp_pool(features, masks)
    raise ValueError('pooling type {} not supported'.format(pooling))
