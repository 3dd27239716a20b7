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
    ('densenet121', '/root/reference/torchreid/models/densenet.py'),
    ('mudeep', '/root/reference/torchreid/models/mudeep.py'),
    ('xception', '/root/reference/torchreid/models/xception.py'),
    ('inceptionv4', '/root/reference/torchreid/models/inceptionv4.py'),
    ('inceptionresnetv2',
     '/root/reference/torchreid/models/inceptionresnetv2.py'),
    ('nasnetamobile', '/root/reference/torchreid/models/nasnet.py'),
])
@pytest.mark.slow
def test_zoo_parity(arch, ref_file):
    import torch
    import jax
    import jax.numpy as jnp
    from bpbreid_tpu import models
    from bpbreid_tpu.utils.torch_weights import torch_to_flax

    ref_mod = _load_ref(ref_file, 'ref_' + arch)
    torch.manual_seed(0)
    if arch == 'mudeep':
        ref = ref_mod.MuDeep(num_classes=7, loss='softmax')
    else:
        ref = getattr(ref_mod, arch)(num_classes=7, pretrained=False,
                                     loss='softmax')
    _randomize_bn(ref)

    hw = {'mudeep': (256, 128), 'inceptionv4': (160, 96),
          'inceptionresnetv2': (160, 96),
          'nasnetamobile': (128, 64)}.get(arch, (64, 32))
    x = np.random.default_rng(0).normal(
        size=(2, 3) + hw).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    model = models.build_model(arch, num_classes=7, loss='softmax',
                               pretrained=False)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1,) + hw + (3,)), train=False)
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


def test_grid_sample_matches_torch():
    import torch
    import jax.numpy as jnp
    from bpbreid_tpu.ops.grid_sample import affine_grid_sample
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 10, 6)).astype(np.float32)   # NCHW for torch
    theta = np.stack([
        np.array([[1.0, 0.0, 0.2], [0.0, 0.25, -0.5]], np.float32),
        np.array([[0.8, 0.0, -0.3], [0.0, 0.5, 0.4]], np.float32)])
    grid = torch.nn.functional.affine_grid(torch.from_numpy(theta),
                                           (2, 3, 10, 6), align_corners=False)
    want = torch.nn.functional.grid_sample(
        torch.from_numpy(x), grid, align_corners=False).numpy()
    got = np.asarray(affine_grid_sample(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), jnp.asarray(theta)))
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want,
                               atol=1e-5)


@pytest.mark.slow
def test_hacnn_parity():
    import torch
    import jax
    import jax.numpy as jnp
    from bpbreid_tpu import models
    from bpbreid_tpu.utils.torch_weights import torch_to_flax

    ref_mod = _load_ref('/root/reference/torchreid/models/hacnn.py',
                        'ref_hacnn')
    torch.manual_seed(0)
    ref = ref_mod.HACNN(num_classes=7, use_gpu=False)
    _randomize_bn(ref)
    ref.train()   # eval path is broken upstream; compare train outputs
    # (disable BN stat updates by re-entering eval for BN only)
    ref.eval()

    x = np.random.default_rng(0).normal(size=(2, 3, 160, 64)).astype(np.float32)
    with torch.no_grad():
        # eval-mode reference crashes (Tensor.normalization); compare the
        # global-only variant which returns x_global directly
        pass
    torch.manual_seed(0)
    ref_g = ref_mod.HACNN(num_classes=7, use_gpu=False,
                          learn_region=False)
    _randomize_bn(ref_g)
    with torch.no_grad():
        want = ref_g(torch.from_numpy(x)).numpy()

    from bpbreid_tpu.models.hacnn import HACNN
    model = HACNN(num_classes=7, loss='softmax', learn_region=False)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 160, 64, 3)), train=False)
    new_vars, matched, discarded = torch_to_flax(ref_g.state_dict(), variables)
    assert not [d for d in discarded if 'classifier' not in d], discarded[:8]
    got = np.asarray(model.apply(
        new_vars, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-2)


@pytest.mark.slow
def test_hacnn_local_branch_runs():
    import jax
    import jax.numpy as jnp
    from bpbreid_tpu import models
    model = models.build_model('hacnn', num_classes=7, loss='softmax',
                               pretrained=False)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 160, 64, 3)),
                   train=False)
    out = model.apply(v, jnp.zeros((2, 160, 64, 3)), train=False)
    assert out.shape == (2, 1024)     # global 512 + local 512


@pytest.mark.slow
def test_pvpm_shapes():
    import jax
    import jax.numpy as jnp
    from bpbreid_tpu import models
    m = models.build_model('pose_p4', num_classes=5, loss='softmax',
                           pretrained=False)
    imgs = jnp.zeros((2, 64, 32, 3))
    pose = jnp.zeros((2, 16, 8, 56))   # quarter-res pose maps -> att matches f
    v = m.init(jax.random.PRNGKey(0), imgs, pose, train=True)
    (ys, att), _ = m.apply(v, imgs, pose, train=True,
                           mutable=['batch_stats'],
                           rngs={'dropout': jax.random.PRNGKey(1)})
    assert len(ys) == 4 and ys[0].shape == (2, 5)
    feats = m.apply(v, imgs, pose, train=False)
    assert feats.shape == (2, 2048 * 4)

    ms = models.build_model('pose_p4s', num_classes=5, loss='softmax',
                            pretrained=False)
    vs = ms.init(jax.random.PRNGKey(0), imgs, pose, train=False)
    feats, score = ms.apply(vs, imgs, pose, train=False)
    assert score.shape == (2, 4)
