"""Train-step throughput benchmark (the train-side counterpart of
/bench.py): builds the CLI's real part-based engine on the synthetic
dataset at the reference recipe's geometry (HRNet-W32, 384x128,
five_v masks) and times ``engine.forward_backward`` with device-resident
batches — the engine's jitted train step including augmentation, GiLt +
body-part-attention losses and the optax update (reference hot loop:
torchreid/engine/image/part_based_engine.py:77-105).

Prints one JSON line: {"metric": ..., "value": img/s, "unit": ...}.
Run on the TPU chip: ``python -m bpbreid_tpu.tools.bench_train``.
"""
import argparse
import json
import os
import os.path as osp
import time


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch-size', type=int, default=64)
    parser.add_argument('--height', type=int, default=384)
    parser.add_argument('--width', type=int, default=128)
    parser.add_argument('--backbone', default='hrnet32')
    parser.add_argument('--iters', type=int, default=20)
    parser.add_argument('--steps-per-dispatch', type=int, default=8,
                        help='train steps fused per compiled dispatch '
                             '(cfg.train.steps_per_dispatch; 1 = the '
                             'per-batch path)')
    parser.add_argument('--profile', default=None, metavar='DIR',
                        help='wrap the timed loop in a jax.profiler '
                             'trace written under DIR; summarize with '
                             'python -m bpbreid_tpu.tools.profile_summary DIR')
    parser.add_argument('--repeats', type=int, default=3,
                        help='independent timed repetitions; the record '
                             'reports the MEDIAN step time plus the '
                             'per-run list (error bar, like /bench.py)')
    args = parser.parse_args(argv)

    import jax
    # honor JAX_PLATFORMS under sitecustomize-forced TPU environments
    # (same recipe as scripts/main.py / tests/conftest.py)
    if os.environ.get('JAX_PLATFORMS'):
        jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])
    jax.config.update('jax_compilation_cache_dir',
                      osp.expanduser('~/.cache/bpbreid_tpu_jax'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import numpy as np

    from bpbreid_tpu.config import get_default_config
    from bpbreid_tpu.data.datamanager import ImageDataManager
    from bpbreid_tpu.engine.part_based import ImagePartBasedEngine
    from bpbreid_tpu.models import build_model
    from bpbreid_tpu.ops.masks import compute_parts_num_and_names
    from bpbreid_tpu.optim import build_optimizer

    cfg = get_default_config()
    cfg.model.name = 'bpbreid'
    cfg.model.compute_dtype = 'bfloat16'
    cfg.model.bpbreid.backbone = args.backbone
    cfg.model.bpbreid.masks.preprocess = 'five_v'
    cfg.model.bpbreid.dim_reduce_output = 512
    cfg.data.height, cfg.data.width = args.height, args.width
    cfg.data.sources = cfg.data.targets = ['synthetic']
    cfg.train.batch_size = args.batch_size
    cfg.data.transforms = ['rf', 'rc', 're']
    compute_parts_num_and_names(cfg)

    dm = ImageDataManager(
        config=cfg, root='', sources=['synthetic'], targets=['synthetic'],
        height=args.height, width=args.width,
        batch_size_train=args.batch_size, batch_size_test=args.batch_size,
        transforms=cfg.data.transforms, use_masks=True, workers=2,
        num_instances=max(1, args.batch_size // 8))
    model = build_model('bpbreid', dm.num_train_pids, loss='part_based',
                        pretrained=False, config=cfg)
    engine = ImagePartBasedEngine(cfg, dm, model,
                                  build_optimizer(optim='adam', lr=3.5e-4))
    engine.init_state()

    batch = next(iter(dm.train_loader))
    spd = max(1, args.steps_per_dispatch)
    if spd > 1:
        # the engine's multi-step path: k batches stacked into one
        # [k, B, ...] super-batch, one lax.scan dispatch for k steps
        stacked = {k: np.stack([batch[k]] * spd)
                   for k in ('image', 'mask', 'pid') if k in batch}
        dbatch = {k: jax.device_put(v) for k, v in stacked.items()}
        step = lambda: engine.forward_backward_multi(dbatch)  # noqa: E731
        sync = lambda out: float(out[0][-1])                  # noqa: E731
        n_steps = args.iters * spd
    else:
        dbatch = {k: (jax.device_put(v) if hasattr(v, 'shape') else v)
                  for k, v in batch.items()}
        step = lambda: engine.forward_backward(dbatch)        # noqa: E731
        sync = lambda out: float(out[0])                      # noqa: E731
        n_steps = args.iters

    sync(step())                                        # compile + warmup

    def timed_loop():
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = step()
        sync(out)                                       # final sync
        return (time.perf_counter() - t0) / n_steps

    if args.profile:
        with jax.profiler.trace(args.profile):
            dts = [timed_loop()]
    else:
        dts = sorted(timed_loop() for _ in range(max(1, args.repeats)))
    dt = dts[len(dts) // 2] if len(dts) % 2 else \
        0.5 * (dts[len(dts) // 2 - 1] + dts[len(dts) // 2])
    record = {
        'metric': '{}_bpbreid_train_step_{}x{}_b{}{}'.format(
            args.backbone, args.height, args.width, args.batch_size,
            '_spd{}'.format(spd) if spd > 1 else ''),
        'value': round(args.batch_size / dt, 2),
        'unit': 'images/sec/chip',
        'step_ms': round(dt * 1e3, 2),
        'runs_ms': [round(d * 1e3, 2) for d in dts],
    }
    if args.profile:
        # tracing overhead inflates dt — mark the record so a profiled
        # run is never mistaken for a clean benchmark number
        record['metric'] += '_profiled'
        record['profiled'] = True
    print(json.dumps(record))


if __name__ == '__main__':
    main()
