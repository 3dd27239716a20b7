"""OSNet family parity vs the reference torch implementations."""
import importlib.util

import numpy as np
import pytest


def _load_ref(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _randomize_bn(model, seed=0):
    import torch
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
            m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                             generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape,
                                           generator=g) + 0.5)
    model.eval()
    return model


@pytest.mark.parametrize('arch,ref_file', [
    ('osnet_x0_25', '/root/reference/torchreid/models/osnet.py'),
    ('osnet_ibn_x1_0', '/root/reference/torchreid/models/osnet.py'),
    ('osnet_ain_x1_0', '/root/reference/torchreid/models/osnet_ain.py'),
])
@pytest.mark.slow
def test_osnet_parity(arch, ref_file):
    import torch
    import jax
    import jax.numpy as jnp
    from bpbreid_tpu import models
    from bpbreid_tpu.utils.torch_weights import torch_to_flax

    ref_mod = _load_ref(ref_file, 'ref_' + arch)
    torch.manual_seed(0)
    ref = getattr(ref_mod, arch)(num_classes=7, pretrained=False,
                                 loss='softmax')
    _randomize_bn(ref)

    x = np.random.default_rng(0).normal(size=(2, 3, 64, 32)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()      # eval -> features [N, 512]

    model = models.build_model(arch, num_classes=7, loss='softmax',
                               pretrained=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 32, 3)),
                           train=False)
    new_vars, matched, discarded = torch_to_flax(ref.state_dict(), variables)
    assert not [d for d in discarded if 'classifier' not in d], discarded[:8]

    got = np.asarray(model.apply(
        new_vars, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-2)


@pytest.mark.slow
def test_osnet_featuremap_mode():
    import jax
    import jax.numpy as jnp
    from bpbreid_tpu import models
    m = models.build_model('osnet_x0_25', num_classes=5, loss='part_based',
                           pretrained=False)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 32, 3)), train=False)
    f = m.apply(v, jnp.zeros((2, 64, 32, 3)), train=False)
    assert f.shape == (2, 4, 2, 128)      # /16 scale, top channels


@pytest.mark.parametrize('arch', ['fastreid_resnet_ibn_nl'])
def test_fastreid_resnet_parity(arch):
    import torch
    import jax
    import jax.numpy as jnp
    from bpbreid_tpu import models
    from bpbreid_tpu.utils.torch_weights import torch_to_flax

    ref_mod = _load_ref('/root/reference/torchreid/models/resnet_fastreid.py',
                        'ref_fastreid')
    torch.manual_seed(0)
    ref = ref_mod.build_resnet_backbone(pretrained=False, with_ibn=True,
                                        with_nl=True, last_stride=1)
    _randomize_bn(ref)

    x = np.random.default_rng(0).normal(size=(2, 3, 64, 32)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    model = models.build_model(arch, num_classes=1, loss='part_based',
                               pretrained=False, last_stride=1)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 32, 3)),
                           train=False)
    new_vars, matched, discarded = torch_to_flax(ref.state_dict(), variables)
    assert not discarded, discarded[:8]
    got = np.asarray(model.apply(
        new_vars, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False))
    got = np.transpose(got, (0, 3, 1, 2))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-2)
