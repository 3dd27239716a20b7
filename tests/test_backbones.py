"""Backbone parity: flax models + converted weights vs the reference torch
models (loaded standalone, random weights, eval mode)."""
import importlib.util
import sys
import types

import numpy as np
import pytest

REF_RESNET = '/root/reference/torchreid/models/resnet.py'
REF_HRNET = '/root/reference/torchreid/models/hrnet.py'


def _load_ref_module(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _install_yacs_shim():
    """Minimal CfgNode shim so the reference hrnet.py imports without yacs."""
    if 'yacs.config' in sys.modules:
        return
    yacs = types.ModuleType('yacs')
    yacs_config = types.ModuleType('yacs.config')

    class CN(dict):
        def __init__(self, *a, **kw):
            super().__init__()

        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    yacs_config.CfgNode = CN
    yacs.config = yacs_config
    sys.modules['yacs'] = yacs
    sys.modules['yacs.config'] = yacs_config


def _torch_eval_randomize_bn(model, seed=0):
    """Put random (but sane) values into BN running stats so eval-mode
    comparison exercises the statistics path."""
    import torch
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
    model.eval()
    return model


@pytest.mark.parametrize('arch,last_stride', [('resnet18', 2), ('resnet50', 1)])
def test_resnet_parity_with_reference(arch, last_stride):
    import torch
    import jax.numpy as jnp
    from bpbreid_tpu import models
    from bpbreid_tpu.utils.torch_weights import torch_to_flax

    ref_mod = _load_ref_module(REF_RESNET, 'ref_resnet')
    torch.manual_seed(0)
    extra = {'last_stride': last_stride} if arch == 'resnet50' else {}
    ref = getattr(ref_mod, arch)(num_classes=10, loss='part_based',
                                 pretrained=False, **extra)
    _torch_eval_randomize_bn(ref)

    x = np.random.default_rng(0).normal(size=(2, 3, 64, 32)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()          # [N, C, Hf, Wf]

    model = models.build_model(arch, num_classes=10, loss='part_based',
                               last_stride=last_stride)
    import jax
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 32, 3)), train=False)
    new_vars, matched, discarded = torch_to_flax(ref.state_dict(), variables)
    # everything in the conv trunk must match (fc/classifier absent in
    # part_based mode)
    assert not [d for d in discarded if 'num_batches_tracked' not in d], discarded

    got = model.apply(new_vars, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                      train=False)
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_hrnet_parity_with_reference():
    _install_yacs_shim()
    import torch
    import jax
    import jax.numpy as jnp
    from bpbreid_tpu.models.hrnet import hrnet32
    from bpbreid_tpu.utils.torch_weights import torch_to_flax

    ref_mod = _load_ref_module(REF_HRNET, 'ref_hrnet')
    cfg = ref_mod.get_hrnet_config()
    torch.manual_seed(0)
    ref = ref_mod.HighResolutionNet(cfg, enable_dim_reduction=True,
                                    dim_reduction_channels=128)
    _torch_eval_randomize_bn(ref)

    x = np.random.default_rng(1).normal(size=(1, 3, 64, 32)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    model = hrnet32(enable_dim_reduction=True, dim_reduction_channels=128)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 32, 3)),
                           train=False)
    new_vars, matched, discarded = torch_to_flax(ref.state_dict(), variables)
    assert not discarded, discarded[:10]

    got = model.apply(new_vars, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                      train=False)
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    assert got.shape == want.shape
    # random-init nets produce huge activations (|x| ~ 1e4); allow the
    # correspondingly scaled fp32 accumulation error
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-2)


def test_feature_dims():
    from bpbreid_tpu.models.hrnet import hrnet32
    from bpbreid_tpu import models
    m = models.build_model('resnet50', num_classes=10, loss='part_based')
    assert m.feature_dim == 2048
    assert hrnet32(enable_dim_reduction=False).feature_dim == 1920
    assert hrnet32(enable_dim_reduction=True,
                   dim_reduction_channels=256).feature_dim == 256


@pytest.mark.parametrize('c', [32, 64, 128, 37])
def test_fast_batch_norm_matches_flax(c):
    """FastBatchNorm must be an exact nn.BatchNorm drop-in: forward
    values, running-stat updates, and input/param gradients (both the
    lane-dense narrow-channel path and the general fallback)."""
    import flax.linen as fnn
    import jax
    import jax.numpy as jnp
    from bpbreid_tpu.models.common import BN_EPS, BN_MOMENTUM, FastBatchNorm

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 8, 4, c)).astype(np.float32) * 3 + 1)

    ref = fnn.BatchNorm(use_running_average=False, momentum=BN_MOMENTUM,
                        epsilon=BN_EPS)
    fast = FastBatchNorm(use_running_average=False, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS)
    v_ref = ref.init(jax.random.PRNGKey(0), x)
    v_fast = fast.init(jax.random.PRNGKey(0), x)
    # same variable tree (torch conversion compatibility)
    assert jax.tree_util.tree_structure(v_ref) == \
        jax.tree_util.tree_structure(v_fast)
    # non-trivial affine params + running stats
    params = {'scale': jnp.asarray(rng.normal(size=(c,)).astype(np.float32)),
              'bias': jnp.asarray(rng.normal(size=(c,)).astype(np.float32))}
    stats = {'mean': jnp.asarray(rng.normal(size=(c,)).astype(np.float32)),
             'var': jnp.abs(jnp.asarray(
                 rng.normal(size=(c,)).astype(np.float32))) + 0.5}
    variables = {'params': params, 'batch_stats': stats}

    def run(mod):
        y, mut = mod.apply(variables, x, mutable=['batch_stats'])
        return y, mut['batch_stats']

    y_ref, s_ref = run(ref)
    y_fast, s_fast = run(fast)
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_ref),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s_fast['mean']),
                               np.asarray(s_ref['mean']), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_fast['var']),
                               np.asarray(s_ref['var']), atol=1e-5)

    def loss(mod, p, xx):
        y, _ = mod.apply({'params': p, 'batch_stats': stats}, xx,
                         mutable=['batch_stats'])
        return jnp.sum(y * y * 0.1)

    g_ref = jax.grad(lambda p, xx: loss(ref, p, xx), argnums=(0, 1))(params, x)
    g_fast = jax.grad(lambda p, xx: loss(fast, p, xx), argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fast)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=3e-4, rtol=2e-4)

    # eval mode
    refE = fnn.BatchNorm(use_running_average=True, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS)
    fastE = FastBatchNorm(use_running_average=True, momentum=BN_MOMENTUM,
                          epsilon=BN_EPS)
    np.testing.assert_allclose(
        np.asarray(fastE.apply(variables, x)),
        np.asarray(refE.apply(variables, x)), atol=2e-5, rtol=1e-5)
