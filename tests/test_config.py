"""Config tree: defaults, YAML merge, CLI opts merge, diff display."""
import pytest

from bpbreid_tpu.config import (
    Config,
    display_config_diff,
    engine_run_kwargs,
    get_default_config,
    imagedata_kwargs,
    lr_scheduler_kwargs,
    optimizer_kwargs,
)
from bpbreid_tpu.constants import GLOBAL, PARTS


def test_defaults_mirror_reference():
    cfg = get_default_config()
    assert cfg.model.bpbreid.pooling == 'gwap'
    assert cfg.model.bpbreid.mask_filtering_testing is True
    assert cfg.model.bpbreid.last_stride == 1
    assert cfg.model.bpbreid.dim_reduce == 'after_pooling'
    assert cfg.model.bpbreid.dim_reduce_output == 512
    assert cfg.model.bpbreid.test_embeddings == ['bn_foreg', 'parts']
    assert cfg.model.bpbreid.masks.softmax_weight == 15
    assert cfg.model.bpbreid.masks.background_computation_strategy == 'threshold'
    assert cfg.model.bpbreid.masks.mask_filtering_threshold == 0.5
    assert cfg.loss.part_based.weights[GLOBAL]['id'] == 1.0
    assert cfg.loss.part_based.weights[PARTS]['tr'] == 1.0
    assert cfg.test.batch_size_pairwise_dist_matrix == 500
    assert cfg.test.part_based.dist_combine_strat == 'mean'
    assert cfg.train.lr == 0.00035
    assert cfg.train.stepsize == [40, 70]


def test_yaml_merge(tmp_path):
    p = tmp_path / 'cfg.yaml'
    p.write_text("""
model:
  bpbreid:
    backbone: hrnet32
    masks:
      preprocess: five_v
data:
  height: 384
train:
  batch_size: 32
""")
    cfg = get_default_config()
    cfg.merge_from_file(str(p))
    assert cfg.model.bpbreid.backbone == 'hrnet32'
    assert cfg.model.bpbreid.masks.preprocess == 'five_v'
    assert cfg.data.height == 384
    assert cfg.train.batch_size == 32
    # untouched defaults survive
    assert cfg.data.width == 128


def test_unknown_key_rejected(tmp_path):
    cfg = get_default_config()
    with pytest.raises(KeyError):
        cfg.merge_from_dict({'model': {'no_such_option': 1}})


def test_opts_merge_and_coercion():
    cfg = get_default_config()
    cfg.merge_from_list(['train.lr', '0.001', 'model.bpbreid.pooling', 'gmp',
                         'test.evaluate', 'True', 'train.stepsize', '[10,20]'])
    assert cfg.train.lr == 0.001
    assert cfg.model.bpbreid.pooling == 'gmp'
    assert cfg.test.evaluate is True
    assert cfg.train.stepsize == [10, 20]


def test_kwargs_adapters():
    cfg = get_default_config()
    kw = imagedata_kwargs(cfg)
    assert kw['use_masks'] is True
    assert kw['num_instances'] == 4
    assert optimizer_kwargs(cfg)['optim'] == 'adam'
    assert lr_scheduler_kwargs(cfg)['lr_scheduler'] == 'warmup_multi_step'
    assert engine_run_kwargs(cfg)['ranks'] == [1, 5, 10, 20]


def test_diff_display():
    cfg = get_default_config()
    cfg.train.lr = 0.1
    cfg.data.workers = 99   # in ignore list
    diff = display_config_diff(cfg, show=False)
    assert diff.get('lr') == 0.1
    assert 'workers' not in diff
    assert 'lr' in cfg.project.diff_config


def test_all_shipped_yaml_configs_parse():
    """Every shipped config (12 mirrors of /root/reference/configs/bpbreid
    + the synthetic smoke) must merge cleanly and resolve the mask
    grouping to the right parts count / engine inputs."""
    import glob
    import os

    from bpbreid_tpu.ops.masks import compute_parts_num_and_names

    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'configs', 'bpbreid')
    paths = sorted(glob.glob(os.path.join(root, '*.yaml')))
    assert len(paths) == 13, paths
    expected_parts = {'five_v': 5, 'eight': 8}
    for p in paths:
        cfg = get_default_config()
        cfg.merge_from_file(p)
        compute_parts_num_and_names(cfg)
        name = os.path.basename(p)
        assert cfg.model.name == 'bpbreid', name
        assert cfg.loss.name == 'part_based', name
        if cfg.model.bpbreid.masks.type == 'disk':
            want = expected_parts[cfg.model.bpbreid.masks.preprocess]
            assert cfg.model.bpbreid.masks.parts_num == want, name
        else:  # the two PCB stripes configs
            assert cfg.model.bpbreid.masks.type == 'stripes', name
            assert cfg.model.bpbreid.masks.parts_num == 6, name
            assert cfg.model.bpbreid.test_embeddings == ['conct'], name
        if name.endswith('_test.yaml'):
            assert cfg.test.evaluate is True, name
            assert cfg.model.load_config is True, name
        elif name != 'bpbreid_synthetic_smoke.yaml':
            assert cfg.test.evaluate is False, name


def test_roundtrip_dict():
    cfg = get_default_config()
    cfg.model.bpbreid.masks.parts_num = 5
    d = cfg.to_dict()
    cfg2 = Config().merge_from_dict({'model': d['model']})
    assert cfg2.model.bpbreid.masks.parts_num == 5
