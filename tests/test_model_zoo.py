"""Model zoo breadth: parity vs reference for pcb/mobilenetv2/shufflenetv2."""
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
    ('mobilenetv2_x1_0', '/root/reference/torchreid/models/mobilenetv2.py'),
    ('shufflenet_v2_x0_5', '/root/reference/torchreid/models/shufflenetv2.py'),
    ('pcb_p4', '/root/reference/torchreid/models/pcb.py'),
    ('resnet50_ibn_a', '/root/reference/torchreid/models/resnet_ibn_a.py'),
    ('resnet50_ibn_b', '/root/reference/torchreid/models/resnet_ibn_b.py'),
    ('se_resnet50', '/root/reference/torchreid/models/senet.py'),
    ('se_resnext50_32x4d', '/root/reference/torchreid/models/senet.py'),
    ('squeezenet1_0', '/root/reference/torchreid/models/squeezenet.py'),
    ('shufflenet', '/root/reference/torchreid/models/shufflenet.py'),
    ('mlfn', '/root/reference/torchreid/models/mlfn.py'),
    ('resnet50mid', '/root/reference/torchreid/models/resnetmid.py'),
])
def test_zoo_parity(arch, ref_file):
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
        want = ref(torch.from_numpy(x)).numpy()

    model = models.build_model(arch, num_classes=7, loss='softmax',
                               pretrained=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 32, 3)),
                           train=False)
    new_vars, matched, discarded = torch_to_flax(ref.state_dict(), variables)
    allowed_missing = ('classifier', 'conv5', 'fc')   # train-only heads
    assert not [d for d in discarded
                if not any(a in d for a in allowed_missing)], discarded[:8]

    got = np.asarray(model.apply(
        new_vars, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-2)


def test_registry_covers_zoo():
    from bpbreid_tpu import models
    avail = models.show_avai_models()
    for name in ('resnet50', 'hrnet32', 'osnet_x1_0', 'osnet_ain_x1_0',
                 'pcb_p6', 'mobilenetv2_x1_0', 'shufflenet_v2_x1_0',
                 'fastreid_resnet_ibn_nl'):
        assert name in avail, name
