"""Pallas kernels vs XLA reference (interpret mode on CPU)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp


def test_fused_attention_pool_matches_xla():
    from bpbreid_tpu.ops.pallas.pooling import fused_attention_pool
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(2, 8, 4, 96)).astype(np.float32))
    logits = jnp.asarray(rng.normal(size=(2, 8, 4, 6)).astype(np.float32))

    num_ref, den_ref, vis_ref = fused_attention_pool(
        feats, logits, use_pallas=False)
    num, den, vis = fused_attention_pool(feats, logits, d_tile=32,
                                         interpret=True)
    np.testing.assert_allclose(np.asarray(num), np.asarray(num_ref),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(den), np.asarray(den_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(vis), np.asarray(vis_ref),
                               atol=1e-6)


def test_fused_attention_pool_gwap_equivalence():
    """num/den equals the model's gwap pooling of the softmax maps."""
    from bpbreid_tpu.ops.pallas.pooling import fused_attention_pool
    from bpbreid_tpu.ops.pooling import gwap_pool
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.normal(size=(2, 4, 4, 40)).astype(np.float32))
    logits = jnp.asarray(rng.normal(size=(2, 4, 4, 3)).astype(np.float32))
    num, den, _ = fused_attention_pool(feats, logits, d_tile=40,
                                       interpret=True)
    probs = jax.nn.softmax(logits, axis=-1)
    want = gwap_pool(feats, probs)
    got = num / jnp.clip(den, 1e-6)[..., None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_bpbreid_use_pallas_pooling_flag_matches_default():
    """BPBreID(use_pallas_pooling=True) produces the same embeddings as
    the default XLA pooling path (same params; CPU exercises the
    functional fallback, TPU the real kernel)."""
    from bpbreid_tpu.models.bpbreid import BPBreID
    kw = dict(num_classes=7, parts_num=3, backbone='resnet18',
              dim_reduce='after_pooling', dim_reduce_output=32)
    base = BPBreID(**kw)
    fused = BPBreID(use_pallas_pooling=True, **kw)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 64, 32, 3)).astype(np.float32))
    variables = base.init(jax.random.PRNGKey(0), x)
    out_a = base.apply(variables, x, train=False)
    out_b = fused.apply(variables, x, train=False)
    for key in (out_a[0] or {}):
        np.testing.assert_allclose(np.asarray(out_a[0][key]),
                                   np.asarray(out_b[0][key]),
                                   atol=1e-4, err_msg=key)


def test_fused_basicblock_chain_interpret():
    """Experimental fused residual-chain kernel matches the XLA
    reference semantics (interpret mode on CPU)."""
    from bpbreid_tpu.ops.pallas.conv_chain import (
        basicblock_chain_reference, fused_basicblock_chain)
    rng = np.random.default_rng(0)
    n, h, w, c, blocks = 2, 8, 4, 32, 2
    x = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
    ws = jnp.asarray(
        rng.normal(size=(2 * blocks, 3, 3, c, c)).astype(np.float32) * 0.05)
    s = jnp.asarray(
        rng.normal(size=(2 * blocks, c)).astype(np.float32) * 0.1 + 1)
    b = jnp.asarray(rng.normal(size=(2 * blocks, c)).astype(np.float32) * 0.1)
    ref = basicblock_chain_reference(x, ws, s, b)
    got = fused_basicblock_chain(x, ws, s, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
