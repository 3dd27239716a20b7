"""BPBreID model: output contract, visibility semantics, and full-model
parity with the reference implementation (loaded with a stubbed
torchreid package so it runs standalone)."""
import importlib.util
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bpbreid_tpu.constants import (
    BACKGROUND, BN_FOREGROUND, BN_PARTS, CONCAT_PARTS, FOREGROUND, GLOBAL, PARTS,
)


def _make_model(parts_num=5, backbone='resnet18', **kw):
    from bpbreid_tpu.models.bpbreid import BPBreID
    return BPBreID(num_classes=10, parts_num=parts_num, backbone=backbone,
                   last_stride=1, dim_reduce='after_pooling',
                   dim_reduce_output=64, **kw)


def test_output_contract():
    model = _make_model()
    x = jnp.zeros((2, 64, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    emb, vis, cls, pix, feat, masks = model.apply(variables, x, train=False)
    K, D, C = 5, 64, 10
    assert emb[GLOBAL].shape == (2, D)
    assert emb[FOREGROUND].shape == (2, D)
    assert emb[BACKGROUND].shape == (2, D)
    assert emb[CONCAT_PARTS].shape == (2, K * D)
    assert emb[PARTS].shape == (2, K, D)
    assert emb[BN_FOREGROUND].shape == (2, D)
    assert emb[BN_PARTS].shape == (2, K, D)
    assert vis[GLOBAL].shape == (2,)
    assert vis[PARTS].shape == (2, K)
    assert vis[PARTS].dtype == jnp.bool_     # binary visibility by default
    assert cls[GLOBAL].shape == (2, C)
    assert cls[PARTS].shape == (2, K, C)
    assert pix.shape[0] == 2 and pix.shape[-1] == K + 1
    assert masks[PARTS].shape[-1] == K


def test_external_masks_mode():
    model = _make_model(learnable_attention_enabled=False)
    x = jnp.zeros((2, 64, 32, 3))
    ext = jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(1), (2, 16, 8, 6)) * 3, axis=-1)
    variables = model.init(jax.random.PRNGKey(0), x, ext, train=False)
    emb, vis, cls, pix, feat, masks = model.apply(variables, x, ext,
                                                  train=False)
    assert pix is None
    assert emb[PARTS].shape == (2, 5, 64)


def test_stripes_mode():
    # 4 stripes on the 4-row feature map (64/16) so every stripe is nonempty
    model = _make_model(parts_num=4, horizontal_stripes=True,
                        learnable_attention_enabled=False)
    x = jnp.zeros((2, 64, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    emb, vis, cls, pix, feat, masks = model.apply(variables, x, train=False)
    # all stripe parts visible
    assert bool(np.asarray(vis[PARTS]).all())


def test_gwap_vs_gap_vs_gmp_pooling():
    from bpbreid_tpu.ops.pooling import gap_pool, gmp_pool, gwap_pool
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.random((2, 8, 4, 16)).astype(np.float32))
    m = jnp.asarray(rng.random((2, 8, 4, 3)).astype(np.float32))
    gwap = np.asarray(gwap_pool(f, m))
    gap = np.asarray(gap_pool(f, m))
    gmp = np.asarray(gmp_pool(f, m))
    assert gwap.shape == gap.shape == gmp.shape == (2, 3, 16)
    # naive references
    prod = np.asarray(f)[:, :, :, None, :] * np.asarray(m)[:, :, :, :, None]
    np.testing.assert_allclose(
        gwap, prod.sum((1, 2)) / np.asarray(m).sum((1, 2))[..., None],
        atol=1e-5)
    np.testing.assert_allclose(gap, prod.mean((1, 2)), atol=1e-5)
    np.testing.assert_allclose(gmp, prod.max((1, 2)), atol=1e-5)


def _install_torchreid_stub():
    """Fabricate the minimal torchreid package surface the reference
    bpbreid.py imports, backed by the standalone reference resnet."""
    if 'torchreid' in sys.modules:
        return
    spec = importlib.util.spec_from_file_location(
        'ref_resnet_for_bpbreid', '/root/reference/torchreid/models/resnet.py')
    ref_resnet = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_resnet)

    torchreid = types.ModuleType('torchreid')
    models_mod = types.ModuleType('torchreid.models')

    def build_model(name, num_classes, loss='softmax', pretrained=False,
                    **kwargs):
        fn = getattr(ref_resnet, name)
        import inspect
        sig = inspect.signature(ref_resnet.ResNet.__init__)
        allowed = set(sig.parameters)
        extra = {k: v for k, v in kwargs.items() if k in allowed}
        model = fn(num_classes=num_classes, loss=loss, pretrained=False,
                   **extra)
        model.feature_dim = 512 * (4 if name in (
            'resnet50', 'resnet101', 'resnet152') else 1)
        return model

    models_mod.build_model = build_model
    constants = types.ModuleType('torchreid.utils.constants')
    import bpbreid_tpu.constants as my_constants
    for k in dir(my_constants):
        if not k.startswith('_'):
            setattr(constants, k, getattr(my_constants, k))
    utils_mod = types.ModuleType('torchreid.utils')
    utils_mod.constants = constants
    torchreid.models = models_mod
    torchreid.utils = utils_mod
    sys.modules['torchreid'] = torchreid
    sys.modules['torchreid.models'] = models_mod
    sys.modules['torchreid.utils'] = utils_mod
    sys.modules['torchreid.utils.constants'] = constants


class _AttrDict(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    __setattr__ = dict.__setitem__


def test_full_bpbreid_parity_with_reference():
    """End-to-end head parity: same weights, same input, eval mode."""
    _run_full_parity('after_pooling')


@pytest.mark.slow
@pytest.mark.parametrize('dim_reduce', ['none', 'before_pooling',
                                        'before_and_after_pooling'])
def test_full_bpbreid_parity_dim_reduce_variants(dim_reduce):
    """Every runnable reference dim_reduce wiring (bpbreid.py:84-114)
    against the torch model with converted weights.
    'after_pooling_with_dropout' is excluded: the REFERENCE itself
    crashes there (`nn.opout`, a mangled nn.Dropout at bpbreid.py:337 —
    AttributeError on construction), so there is nothing to compare
    against; our implementation wires a real eval-inactive Dropout."""
    _run_full_parity(dim_reduce)


@pytest.mark.slow
@pytest.mark.parametrize('pooling', ['gap', 'gmp'])
def test_full_bpbreid_parity_pooling_variants(pooling):
    """GlobalAverage/GlobalMax attention-pooling heads
    (reference bpbreid.py:432-503) through the full-model parity
    harness with converted weights."""
    _run_full_parity('after_pooling', pooling=pooling)


@pytest.mark.slow
def test_full_bpbreid_parity_shared_parts_classifier():
    """shared_parts_id_classifier=True: one BNClassifier reused across
    every part branch (reference bpbreid.py:72-75, 272-275)."""
    _run_full_parity('after_pooling', shared_parts_id_classifier=True)


def _run_full_parity(dim_reduce, pooling='gwap',
                     shared_parts_id_classifier=False):
    import torch
    _install_torchreid_stub()
    spec = importlib.util.spec_from_file_location(
        'ref_bpbreid', '/root/reference/torchreid/models/bpbreid.py')
    ref_bpbreid = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_bpbreid)

    model_cfg = _AttrDict(
        masks=_AttrDict(parts_num=4),
        shared_parts_id_classifier=shared_parts_id_classifier,
        test_use_target_segmentation='none',
        training_binary_visibility_score=True,
        testing_binary_visibility_score=True,
        backbone='resnet50',
        last_stride=1,
        dim_reduce=dim_reduce,
        dim_reduce_output=64,
        hrnet_pretrained_path='',
        normalization='identity',
        pooling=pooling,
        learnable_attention_enabled=True,
    )
    torch.manual_seed(0)
    ref = ref_bpbreid.BPBreID(num_classes=10, pretrained=False,
                              loss='part_based', model_cfg=model_cfg)
    # randomize BN stats like the backbone test
    g = torch.Generator().manual_seed(1)
    for m in ref.modules():
        if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
            m.running_mean.copy_(
                torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(
                torch.rand(m.running_var.shape, generator=g) + 0.5)
    ref.eval()

    x = np.random.default_rng(0).normal(size=(2, 3, 64, 32)).astype(np.float32)
    with torch.no_grad():
        r_emb, r_vis, r_cls, r_pix, r_feat, r_masks = ref(torch.from_numpy(x))

    from bpbreid_tpu.models.bpbreid import BPBreID
    from bpbreid_tpu.utils.torch_weights import torch_to_flax
    model = BPBreID(num_classes=10, parts_num=4, backbone='resnet50',
                    last_stride=1, dim_reduce=dim_reduce, pooling=pooling,
                    shared_parts_id_classifier=shared_parts_id_classifier,
                    dim_reduce_output=64)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 32, 3)),
                           train=False)
    new_vars, matched, discarded = torch_to_flax(ref.state_dict(), variables)
    assert not discarded, discarded[:10]

    emb, vis, cls, pix, feat, masks = model.apply(
        new_vars, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False)

    np.testing.assert_allclose(np.asarray(pix).transpose(0, 3, 1, 2),
                               r_pix.numpy(), atol=5e-3, rtol=1e-3)
    for key in (GLOBAL, FOREGROUND, BACKGROUND, CONCAT_PARTS, PARTS):
        np.testing.assert_allclose(
            np.asarray(emb[key]), r_emb[key].numpy(), atol=5e-3, rtol=5e-3,
            err_msg='embeddings[{}]'.format(key))
        np.testing.assert_allclose(
            np.asarray(vis[key]).astype(np.float32),
            r_vis[key].numpy().astype(np.float32), atol=1e-5,
            err_msg='visibility[{}]'.format(key))
        np.testing.assert_allclose(
            np.asarray(cls[key]), r_cls[key].numpy(), atol=5e-3, rtol=5e-3,
            err_msg='cls[{}]'.format(key))


@pytest.mark.slow
@pytest.mark.parametrize('mode', ['soft', 'hard'])
def test_target_segmentation_parity_with_reference(mode):
    """Test-time external-mask refinement (reference bpbreid.py:160-175):
    'hard' replaces the background mask with the external foreground
    decision and floors parts to 1e-12 outside it; 'soft' multiplies the
    learned part attention by the external part masks. Same weights and
    inputs as the reference torch model -> same embeddings/visibility."""
    import torch
    _install_torchreid_stub()
    spec = importlib.util.spec_from_file_location(
        'ref_bpbreid_ts', '/root/reference/torchreid/models/bpbreid.py')
    ref_bpbreid = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_bpbreid)

    model_cfg = _AttrDict(
        masks=_AttrDict(parts_num=4),
        shared_parts_id_classifier=False,
        test_use_target_segmentation=mode,
        training_binary_visibility_score=True,
        testing_binary_visibility_score=True,
        backbone='resnet50',
        last_stride=1,
        dim_reduce='after_pooling',
        dim_reduce_output=64,
        hrnet_pretrained_path='',
        normalization='identity',
        pooling='gwap',
        learnable_attention_enabled=True,
    )
    torch.manual_seed(0)
    ref = ref_bpbreid.BPBreID(num_classes=10, pretrained=False,
                              loss='part_based', model_cfg=model_cfg)
    g = torch.Generator().manual_seed(1)
    for m in ref.modules():
        if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
            m.running_mean.copy_(
                torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(
                torch.rand(m.running_var.shape, generator=g) + 0.5)
    ref.eval()

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 3, 64, 32)).astype(np.float32)
    # external masks: K+1 channels in [0, 1] at input resolution
    ext = rng.uniform(size=(2, 5, 64, 32)).astype(np.float32)
    with torch.no_grad():
        r_emb, r_vis, *_ = ref(torch.from_numpy(x),
                               external_parts_masks=torch.from_numpy(ext))

    from bpbreid_tpu.models.bpbreid import BPBreID
    from bpbreid_tpu.utils.torch_weights import torch_to_flax
    model = BPBreID(num_classes=10, parts_num=4, backbone='resnet50',
                    last_stride=1, dim_reduce='after_pooling',
                    dim_reduce_output=64,
                    test_use_target_segmentation=mode)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 32, 3)),
                           jnp.full((1, 16, 8, 5), 0.2), train=False)
    new_vars, matched, discarded = torch_to_flax(ref.state_dict(), variables)
    assert not discarded, discarded[:10]

    emb, vis, *_ = model.apply(
        new_vars, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(ext, (0, 2, 3, 1))), train=False)
    for key in (GLOBAL, FOREGROUND, BACKGROUND, CONCAT_PARTS, PARTS):
        np.testing.assert_allclose(
            np.asarray(emb[key]), r_emb[key].numpy(), atol=5e-3, rtol=5e-3,
            err_msg='{} embeddings[{}]'.format(mode, key))
        np.testing.assert_allclose(
            np.asarray(vis[key]).astype(np.float32),
            r_vis[key].numpy().astype(np.float32), atol=1e-5,
            err_msg='{} visibility[{}]'.format(mode, key))


@pytest.mark.slow
def test_multires_pooling_matches_materialized():
    """The HRNet inference fast path (pool each branch at native
    resolution with transpose-resized masks, skip the 1920-ch concat)
    must equal the materialized path exactly: embeddings, visibility
    and pixel logits."""
    from bpbreid_tpu.models.bpbreid import BPBreID
    kw = dict(num_classes=7, parts_num=5, backbone='hrnet32',
              dim_reduce='after_pooling', dim_reduce_output=64)
    base = BPBreID(multires_pooling=False, **kw)
    fast = BPBreID(multires_pooling=True, **kw)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 32, 3)).astype(np.float32))
    vb = base.init(jax.random.PRNGKey(0), x)
    vf = fast.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(vb) == jax.tree_util.tree_structure(vf)
    out_a = base.apply(vb, x, train=False)
    out_b = fast.apply(vb, x, train=False)
    for key in out_a[0]:
        np.testing.assert_allclose(np.asarray(out_a[0][key]),
                                   np.asarray(out_b[0][key]),
                                   atol=2e-4, rtol=1e-3, err_msg=key)
    np.testing.assert_allclose(np.asarray(out_a[3]), np.asarray(out_b[3]),
                               atol=2e-4, rtol=1e-3)
    for key in out_a[1]:
        np.testing.assert_allclose(np.asarray(out_a[1][key]),
                                   np.asarray(out_b[1][key]),
                                   atol=2e-4, err_msg='vis ' + key)
    # train mode must keep using the materialized path (BN batch stats
    # over the concat map) and still work with the tuple-returning backbone
    out_t = fast.apply(vb, x, train=True,
                       mutable=['batch_stats'],
                       rngs={'dropout': jax.random.PRNGKey(1)})
    assert out_t[0][0]['parts'].shape == (2, 5, 64)


@pytest.mark.slow
def test_multires_pooling_train_mode_matches():
    """Training through the multi-resolution path must match the
    materialized path: outputs, the pixel classifier's VIRTUAL BN batch
    statistics (computed per branch via interpolation Gram matrices),
    and gradients."""
    from bpbreid_tpu.models.bpbreid import BPBreID
    kw = dict(num_classes=7, parts_num=5, backbone='hrnet32',
              dim_reduce='after_pooling', dim_reduce_output=64)
    base = BPBreID(multires_pooling=False, **kw)
    fast = BPBreID(multires_pooling=True, **kw)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 32, 3)).astype(np.float32))
    vb = base.init(jax.random.PRNGKey(0), x)
    r = {'dropout': jax.random.PRNGKey(1)}
    out_a, nv_a = base.apply(vb, x, train=True, mutable=['batch_stats'],
                             rngs=r)
    out_b, nv_b = fast.apply(vb, x, train=True, mutable=['batch_stats'],
                             rngs=r)
    for key in out_a[0]:
        np.testing.assert_allclose(np.asarray(out_a[0][key]),
                                   np.asarray(out_b[0][key]),
                                   atol=5e-4, rtol=2e-3, err_msg=key)
    np.testing.assert_allclose(np.asarray(out_a[3]), np.asarray(out_b[3]),
                               atol=5e-4, rtol=2e-3, err_msg='pixel logits')
    sa = nv_a['batch_stats']['pixel_classifier']['bn']
    sb = nv_b['batch_stats']['pixel_classifier']['bn']
    np.testing.assert_allclose(np.asarray(sa['mean']), np.asarray(sb['mean']),
                               atol=1e-5, rtol=1e-4, err_msg='bn mean')
    np.testing.assert_allclose(np.asarray(sa['var']), np.asarray(sb['var']),
                               atol=1e-5, rtol=1e-4, err_msg='bn var')

    def loss(p, model):
        out = model.apply({'params': p, 'batch_stats': vb['batch_stats']},
                          x, train=True, mutable=['batch_stats'], rngs=r)[0]
        return (out[0]['parts'].astype(jnp.float32) ** 2).mean() + \
               (out[3].astype(jnp.float32) ** 2).mean()
    ga = jax.grad(loss)(vb['params'], base)
    gb = jax.grad(loss)(vb['params'], fast)
    for (pa, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(ga),
                               jax.tree_util.tree_leaves_with_path(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-2, rtol=5e-2,
                                   err_msg=jax.tree_util.keystr(pa))


@pytest.mark.slow
def test_multires_gate_with_target_segmentation():
    """With test_use_target_segmentation the eval path must fall back to
    the materialized pooling (masks are refined after the softmax), and
    still match a multires_pooling=False model exactly."""
    from bpbreid_tpu.models.bpbreid import BPBreID
    kw = dict(num_classes=5, parts_num=3, backbone='hrnet32',
              dim_reduce='after_pooling', dim_reduce_output=32,
              test_use_target_segmentation='soft')
    base = BPBreID(multires_pooling=False, **kw)
    fast = BPBreID(multires_pooling=True, **kw)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 64, 32, 3)).astype(np.float32))
    ext = jax.nn.softmax(jnp.asarray(
        rng.normal(size=(2, 16, 8, 4)).astype(np.float32)), axis=-1)
    vb = base.init(jax.random.PRNGKey(0), x, ext)
    out_a = base.apply(vb, x, ext, train=False)
    out_b = fast.apply(vb, x, ext, train=False)
    for key in out_a[0]:
        np.testing.assert_allclose(np.asarray(out_a[0][key]),
                                   np.asarray(out_b[0][key]),
                                   atol=1e-5, err_msg=key)
