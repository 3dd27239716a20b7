"""Train/test CLI driver.

Mirror of the reference entry point
(reference: torchreid/scripts/main.py:128-274): config build (YAML merge
+ CLI opts + parts-count resolution + checkpoint-embedded config
reload + diff display) -> datamanager -> model -> optimizer/scheduler ->
engine -> ``engine.run``.
"""
import argparse
import os
import os.path as osp
import random

import numpy as np

from bpbreid_tpu import models as model_registry
from bpbreid_tpu.config import (
    display_config_diff,
    engine_run_kwargs,
    get_default_config,
    imagedata_kwargs,
    lr_scheduler_kwargs,
    optimizer_kwargs,
)
from bpbreid_tpu.ops.masks import compute_parts_num_and_names
from bpbreid_tpu.data import ImageDataManager
from bpbreid_tpu.data.datasets import get_image_dataset


def set_random_seed(seed):
    random.seed(seed)
    np.random.seed(seed)


def build_datamanager(cfg):
    """(reference: main.py:18-22)"""
    if cfg.data.type == 'video':
        from bpbreid_tpu.config import videodata_kwargs
        from bpbreid_tpu.data.video import VideoDataManager
        return VideoDataManager(**videodata_kwargs(cfg))
    return ImageDataManager(**imagedata_kwargs(cfg))


def build_config(args=None, config_file=None, config=None, makedirs=True):
    """(reference: main.py:192-223)"""
    cfg = get_default_config()
    default_cfg_copy = cfg.clone()
    if config is not None:
        cfg.merge_from_dict(config if isinstance(config, dict)
                            else config.to_dict())
    if config_file:
        cfg.merge_from_file(config_file)
        cfg.project.config_file = os.path.basename(config_file)
    if args is not None:
        if getattr(args, 'root', ''):
            cfg.data.root = args.root
        if getattr(args, 'save_dir', ''):
            cfg.data.save_dir = args.save_dir
        if getattr(args, 'inference_enabled', False):
            cfg.inference.enabled = args.inference_enabled
        if getattr(args, 'sources', None):
            cfg.data.sources = args.sources
        if getattr(args, 'targets', None):
            cfg.data.targets = args.targets
        if getattr(args, 'transforms', None):
            cfg.data.transforms = args.transforms
        if getattr(args, 'job_id', None):
            cfg.project.job_id = args.job_id
        if getattr(args, 'opts', None):
            cfg.merge_from_list(args.opts)

    if cfg.data.type == 'image':
        ds_cls = get_image_dataset(cfg.data.sources[0])
        masks_config = ds_cls.get_masks_config(cfg.model.bpbreid.masks.dir)
    else:
        masks_config = None        # video datasets carry no part masks
    compute_parts_num_and_names(cfg, masks_config)

    if cfg.model.load_weights and osp.isfile(cfg.model.load_weights) \
            and cfg.model.load_config:
        from bpbreid_tpu.utils.torch_weights import load_torch_state_dict
        try:
            _sd, extra = load_torch_state_dict(cfg.model.load_weights)
            ckpt_cfg = extra.get('config')
        except Exception:
            import json
            meta_path = cfg.model.load_weights + '.meta.json'
            ckpt_cfg = None
            if osp.exists(meta_path):
                with open(meta_path) as f:
                    ckpt_cfg = json.load(f).get('config')
        if ckpt_cfg:
            print('Overwriting current config with config loaded from {}'
                  .format(cfg.model.load_weights))
            sub = ckpt_cfg['model']['bpbreid'] if 'model' in ckpt_cfg \
                else ckpt_cfg
            sub = dict(sub)
            sub.pop('hrnet_pretrained_path', None)
            if isinstance(sub.get('masks'), dict):
                sub['masks'] = {k: v for k, v in sub['masks'].items()
                                if k != 'dir'}
            from bpbreid_tpu.config import _merge
            _merge(cfg.model.bpbreid, sub, 'cfg.model.bpbreid')
        else:
            print('Could not load config from file {}'.format(
                cfg.model.load_weights))

    display_config_diff(cfg, default_cfg_copy)
    cfg.data.save_dir = os.path.join(cfg.data.save_dir,
                                     str(cfg.project.job_id))
    if makedirs:
        os.makedirs(cfg.data.save_dir, exist_ok=True)
    return cfg


def build_engine(cfg, datamanager, model, optimizer, scheduler, writer,
                 engine_state):
    """(reference: main.py:27-108)"""
    from bpbreid_tpu.engine import (
        ImagePartBasedEngine, ImageSoftmaxEngine, ImageTripletEngine)
    if cfg.data.type == 'video':
        # (reference: main.py:76-108 — video supports softmax/triplet)
        from bpbreid_tpu.engine.video import (VideoSoftmaxEngine,
                                              VideoTripletEngine)
        if cfg.loss.name == 'softmax':
            return VideoSoftmaxEngine(
                datamanager, model, optimizer=optimizer, scheduler=scheduler,
                label_smooth=cfg.loss.softmax.label_smooth, config=cfg,
                pooling_method=cfg.video.pooling_method,
                save_model_flag=cfg.model.save_model_flag, writer=writer,
                engine_state=engine_state)
        return VideoTripletEngine(
            datamanager, model, optimizer=optimizer,
            margin=cfg.loss.triplet.margin, weight_t=cfg.loss.triplet.weight_t,
            weight_x=cfg.loss.triplet.weight_x, scheduler=scheduler,
            label_smooth=cfg.loss.softmax.label_smooth, config=cfg,
            pooling_method=cfg.video.pooling_method,
            save_model_flag=cfg.model.save_model_flag, writer=writer,
            engine_state=engine_state)
    if cfg.loss.name == 'softmax':
        return ImageSoftmaxEngine(
            datamanager, model, optimizer=optimizer, scheduler=scheduler,
            label_smooth=cfg.loss.softmax.label_smooth, config=cfg,
            save_model_flag=cfg.model.save_model_flag, writer=writer,
            engine_state=engine_state)
    if cfg.loss.name == 'triplet':
        return ImageTripletEngine(
            datamanager, model, optimizer=optimizer,
            margin=cfg.loss.triplet.margin, weight_t=cfg.loss.triplet.weight_t,
            weight_x=cfg.loss.triplet.weight_x, scheduler=scheduler,
            label_smooth=cfg.loss.softmax.label_smooth, config=cfg,
            save_model_flag=cfg.model.save_model_flag, writer=writer,
            engine_state=engine_state)
    if cfg.loss.name == 'part_based':
        return ImagePartBasedEngine(
            cfg, datamanager, model, optimizer,
            loss_name=cfg.loss.part_based.name,
            margin=cfg.loss.triplet.margin, scheduler=scheduler,
            save_model_flag=cfg.model.save_model_flag, writer=writer,
            engine_state=engine_state,
            dist_combine_strat=cfg.test.part_based.dist_combine_strat,
            batch_size_pairwise_dist_matrix=
            cfg.test.batch_size_pairwise_dist_matrix,
            mask_filtering_training=cfg.model.bpbreid.mask_filtering_training,
            mask_filtering_testing=cfg.model.bpbreid.mask_filtering_testing,
            detailed_ranking=cfg.test.detailed_ranking)
    raise ValueError('unknown loss {}'.format(cfg.loss.name))


def build_model_engine(cfg):
    """(reference build_torchreid_model_engine: main.py:226-271)"""
    from bpbreid_tpu.optim import build_lr_scheduler, build_optimizer
    from bpbreid_tpu.utils.engine_state import EngineState
    from bpbreid_tpu.utils.logging import Logger
    from bpbreid_tpu.utils.writer import Writer

    logger = Logger(cfg)
    set_random_seed(cfg.train.seed)
    if cfg.project.debug_mode:
        # TPU equivalent of torch.autograd.set_detect_anomaly
        # (reference: main.py:227-228): fail fast on NaNs in jitted code
        import jax
        jax.config.update('jax_debug_nans', True)
    datamanager = build_datamanager(cfg)
    engine_state = EngineState(cfg.train.start_epoch, cfg.train.max_epoch)
    writer = Writer(cfg, logger=logger)
    print('Building model: {}'.format(cfg.model.name))
    model = model_registry.build_model(
        name=cfg.model.name, num_classes=datamanager.num_train_pids,
        loss=cfg.loss.name, pretrained=cfg.model.pretrained, config=cfg)

    optimizer = build_optimizer(**optimizer_kwargs(cfg))
    scheduler = build_lr_scheduler(lr=cfg.train.lr, **lr_scheduler_kwargs(cfg))
    engine = build_engine(cfg, datamanager, model, optimizer, scheduler,
                          writer, engine_state)

    if hasattr(engine, 'init_state'):
        engine.init_state()
    # pretrained backbone / full-model weights
    if cfg.model.load_weights and osp.isfile(cfg.model.load_weights):
        load_pretrained_weights(engine, cfg.model.load_weights)
    elif cfg.model.pretrained and cfg.model.bpbreid.backbone == 'hrnet32':
        maybe_load_hrnet_imagenet(engine, cfg)
    if cfg.model.resume and osp.isfile(cfg.model.resume):
        from bpbreid_tpu.utils.checkpoint import resume_from_checkpoint
        engine.state, start_epoch, _meta = resume_from_checkpoint(
            cfg.model.resume, engine.state)
        cfg.train.start_epoch = start_epoch
        engine.start_epoch = start_epoch
        engine.epoch = start_epoch
    maybe_distribute_engine(engine, cfg)
    return engine, model


def maybe_distribute_engine(engine, cfg):
    """Mesh data parallelism for the CLI path: shard the train step (and
    let eval use gallery-sharded retrieval) over the device mesh when
    more than one device is available or ``train.n_devices`` asks for it.
    TPU-native replacement for the reference's ``nn.DataParallel``
    wiring (reference: torchreid/scripts/main.py:256-257)."""
    import jax
    requested = getattr(cfg.train, 'n_devices', 0)
    n = requested or jax.device_count()
    if n <= 1 or not hasattr(engine, '_train_step_impl'):
        return None
    avail = jax.device_count()
    if n > avail:
        print('train.n_devices={} but only {} devices visible; using {}'
              .format(cfg.train.n_devices, avail, avail))
        n = avail
    if cfg.train.batch_size % n:
        # largest divisor of batch_size that fits the available devices
        # (NOT gcd: batch 100 on 8 devices should use 5 chips, not
        # gcd(100, 8) = 4; batch 9 on 8 devices should use 3, not 1)
        best = max(d for d in range(1, n + 1)
                   if cfg.train.batch_size % d == 0)
        if requested:
            # fail loudly rather than silently training single-device:
            # a user asking for n devices must either get them or fix
            # the batch size (divisibility keeps the shard static)
            raise ValueError(
                'train.batch_size={} is not divisible by the {}-device '
                'mesh; set train.batch_size to a multiple of {} (or '
                'train.n_devices to a divisor of the batch size, e.g. '
                'n_devices={})'.format(
                    cfg.train.batch_size, n, n, best))
        # auto-detected device count: shrink the mesh to the largest
        # usable divisor instead of quietly dropping parallelism
        n = best
        if n <= 1:
            print('auto mesh: batch_size {} shares no divisor >1 with '
                  'the {} visible devices; single-device'.format(
                      cfg.train.batch_size, avail))
            return None
        print('auto mesh: batch_size {} -> using {} of {} visible '
              'devices'.format(cfg.train.batch_size, n, avail))
    from bpbreid_tpu.parallel import distribute_engine
    mesh = distribute_engine(engine, n_devices=n)
    print('Distributed training over a {}-device "{}" mesh '
          '(batch sharded, params replicated, gradient psum over ICI)'
          .format(mesh.devices.size, ','.join(mesh.axis_names)))
    return mesh


def load_pretrained_weights(engine, path):
    """Partial shape-checked load from torch ``.pth`` or native ``.ckpt``
    (reference: torchtools.py:260-321)."""
    from bpbreid_tpu.utils.torch_weights import load_torch_state_dict, torch_to_flax
    if path.endswith('.ckpt'):
        from bpbreid_tpu.utils.checkpoint import load_checkpoint
        state, _meta = load_checkpoint(path, engine.state)
        engine.state = state
        print('Loaded native checkpoint from {}'.format(path))
        return
    sd, _extra = load_torch_state_dict(path)
    variables = {'params': engine.state.params,
                 'batch_stats': engine.state.batch_stats}
    new_vars, matched, discarded = torch_to_flax(sd, variables)
    engine.load_variables(new_vars)
    print('Loaded pretrained weights from {}: {} tensors matched, {} left '
          'at init'.format(path, len(matched), len(discarded)))


def maybe_load_hrnet_imagenet(engine, cfg):
    path = osp.join(cfg.model.bpbreid.hrnet_pretrained_path,
                    'hrnetv2_w32_imagenet_pretrained.pth')
    if osp.isfile(path):
        from bpbreid_tpu.utils.torch_weights import load_torch_state_dict, torch_to_flax
        sd, _ = load_torch_state_dict(path)
        prefixed = {'backbone_appearance_feature_extractor.' + k: v
                    for k, v in sd.items()}
        variables = {'params': engine.state.params,
                     'batch_stats': engine.state.batch_stats}
        new_vars, matched, _discarded = torch_to_flax(prefixed, variables)
        engine.load_variables(new_vars)
        print('Loaded ImageNet HRNet-W32 weights from {} ({} tensors)'
              .format(path, len(matched)))
    else:
        print('HRNet ImageNet weights not found at {}; training from '
              'random init'.format(path))


def _enable_compile_cache():
    """Persistent XLA compile cache for CLI runs: the HRNet train/eval
    graphs take minutes to compile (longer through a tunneled backend);
    repeated invocations with the same config hit the disk cache.

    Also re-asserts JAX_PLATFORMS from the environment: some deploy
    images install a sitecustomize that forces their own platform AFTER
    env processing, silently overriding ``JAX_PLATFORMS=cpu`` — the
    same guard tests/conftest.py applies for pytest."""
    import jax
    plat = os.environ.get('JAX_PLATFORMS')
    if plat:
        jax.config.update('jax_platforms', plat)
    cache_dir = os.environ.get(
        'BPBREID_TPU_COMPILE_CACHE',
        osp.expanduser('~/.cache/bpbreid_tpu_jax'))
    if cache_dir and cache_dir != '0':
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)


def main(argv=None):
    _enable_compile_cache()
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument('--config-file', type=str, default='')
    parser.add_argument('-s', '--sources', type=str, nargs='+')
    parser.add_argument('-t', '--targets', type=str, nargs='+')
    parser.add_argument('--transforms', type=str, nargs='+')
    parser.add_argument('--root', type=str, default='')
    parser.add_argument('--save_dir', type=str, default='')
    parser.add_argument('--job-id', type=int, default=None)
    parser.add_argument('--inference-enabled', action='store_true')
    parser.add_argument('opts', default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args(argv)

    cfg = build_config(args, args.config_file)
    engine, model = build_model_engine(cfg)
    print('Starting experiment {} with job id {}'.format(
        cfg.project.experiment_id, cfg.project.job_id))
    engine.run(**engine_run_kwargs(cfg), max_epoch=cfg.train.max_epoch,
               eval_freq=cfg.train.eval_freq, start_eval=cfg.test.start_eval)
    if cfg.inference.enabled:
        from bpbreid_tpu.tools.extract_part_based_features import extract_reid_features
        print('Starting inference on external data')
        extract_reid_features(cfg, cfg.inference.input_folder,
                              cfg.data.save_dir, engine=engine)


if __name__ == '__main__':
    main()
