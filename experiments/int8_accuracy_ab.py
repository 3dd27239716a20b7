"""A/B the int8 quantization variants' mAP cost on the trained flagship rig.

Builds the same rig as tests/test_e2e_reference_parity.py::flagship_rig
(HRNet-W32 + multires + five_v + GWAP, converted reference weights),
trains it on the synthetic set until the float eval carries identity
signal, then evaluates the SAME eval split under each int8 variant and
prints the mAP / rank-1 deltas vs float. Run on the TPU chip (fast) or
CPU (slow):

    python experiments/int8_accuracy_ab.py [--train-steps 40]

Variants: per-conv scales (cfg default), shared quantization points
(one int8 HBM copy per block input, residual rides int8), per-tensor
activation granularity, and skip-pattern mixes.
"""
import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))
sys.path.insert(0, osp.join(osp.dirname(__file__), '..', 'tests'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--train-steps', type=int, default=40)
    ap.add_argument('--variants', default='perconv,shared,pertensor')
    args = ap.parse_args()

    import jax
    if os.environ.get('JAX_PLATFORMS'):
        jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])
    jax.config.update('jax_compilation_cache_dir',
                      os.environ.get('BPBREID_TPU_COMPILE_CACHE',
                                     osp.expanduser('~/.cache/bpbreid_tpu_jax')))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    import itertools
    import tempfile
    import time

    from test_e2e_reference_parity import _build_rig
    from bpbreid_tpu.data.datamanager import BatchLoader
    from bpbreid_tpu.data.datasets import init_image_dataset

    t0 = time.time()
    cfg, dm, engine, _ref_model, _d, _r = _build_rig(
        'hrnet32', tempfile.mkdtemp(prefix='int8ab'))
    print(f'[{time.time()-t0:.0f}s] rig built')

    for i, batch in enumerate(
            itertools.islice(itertools.cycle(dm.train_loader),
                             args.train_steps)):
        engine.forward_backward(batch)
    print(f'[{time.time()-t0:.0f}s] trained {args.train_steps} steps')

    common = dict(config=cfg, root='', use_masks=True,
                  masks_dir='pifpaf_maskrcnn_filtering',
                  num_pids=16, imgs_per_pid_cam=4, height=64, width=32)
    qset = init_image_dataset('synthetic', mode='query', **common)
    gset = init_image_dataset('synthetic', mode='gallery', **common)
    q_loader = BatchLoader(qset, 'query', 8, 64, 32, num_workers=1)
    g_loader = BatchLoader(gset, 'gallery', 8, 64, 32, num_workers=1)
    kwargs = dict(dataset_name='synthetic', query_loader=q_loader,
                  gallery_loader=g_loader, save_dir=cfg.data.save_dir)

    cmc_f, mAP_f, _, _ = engine._evaluate(0, **kwargs)
    print(f'[{time.time()-t0:.0f}s] float: mAP {mAP_f:.4f} '
          f'r1 {float(cmc_f[0]):.4f}')

    # every variant starts from this explicit per-conv/per-channel
    # baseline (NOT the cfg defaults — those were flipped to the A/B
    # winner after the table in MODEL_ZOO.md was recorded, and the
    # variant names here describe deltas from the per-conv baseline)
    baseline = dict(int8_shared_points=False,
                    int8_act_granularity='per_channel',
                    int8_skip_patterns=[],
                    int8_calib_percentile=99.9)

    def run_variant(name, **overrides):
        overrides = {**baseline, **overrides}
        prev = {k: getattr(cfg.test, k) for k in overrides}
        cfg.test.int8 = True
        for k, v in overrides.items():
            setattr(cfg.test, k, v)
        try:
            cmc_q, mAP_q, _, _ = engine._evaluate(0, **kwargs)
            assert engine._int8_eval_step is not None
        finally:
            cfg.test.int8 = False
            for k, v in prev.items():
                setattr(cfg.test, k, v)
            engine._int8_eval_step = None
            engine._quant_coll = None
        print(f'[{time.time()-t0:.0f}s] {name}: mAP {mAP_q:.4f} '
              f'(d={mAP_q-mAP_f:+.4f}) r1 {float(cmc_q[0]):.4f} '
              f'(d={float(cmc_q[0])-float(cmc_f[0]):+.4f})', flush=True)

    wanted = set(args.variants.split(','))
    if 'perconv' in wanted:
        run_variant('per-conv scales (conservative baseline)')
    if 'shared' in wanted:
        run_variant('shared points (int8 residuals)', int8_shared_points=True)
    if 'pertensor' in wanted:
        run_variant('per-tensor activation scales',
                    int8_act_granularity='per_tensor')
    if 'sharedpt' in wanted:
        run_variant('shared + per-tensor scales',
                    int8_shared_points=True,
                    int8_act_granularity='per_tensor')
    if 'floor16' in wanted:
        run_variant('per-channel floor16 (bounded weight-fold spread)',
                    int8_act_granularity='per_channel_floor16')
    if 'floor4' in wanted:
        run_variant('per-channel floor4',
                    int8_act_granularity='per_channel_floor4')
    if 'sharedfloor16' in wanted:
        run_variant('shared + per-channel floor16',
                    int8_shared_points=True,
                    int8_act_granularity='per_channel_floor16')
    if 'pt100' in wanted:
        run_variant('per-tensor, abs-max calibration',
                    int8_act_granularity='per_tensor',
                    int8_calib_percentile=100.0)
    if 'skiphead' in wanted:
        run_variant('skip incre/downsamp head',
                    int8_skip_patterns=['incre_modules', 'downsamp_modules'])
    if 'sharedskip' in wanted:
        run_variant('shared + skip stage4',
                    int8_shared_points=True,
                    int8_skip_patterns=['stage4'])
    if 'ptskiphead' in wanted:
        run_variant('per-tensor + float incre head',
                    int8_act_granularity='per_tensor',
                    int8_skip_patterns=['incre_modules'])
    # the stem convs are named 'conv1'/'conv2' at the BACKBONE root;
    # anchor with the parent attribute so block-level conv1/conv2
    # (substring match) stay quantized
    if 'ptskipstem' in wanted:
        run_variant('per-tensor + float stem',
                    int8_act_granularity='per_tensor',
                    int8_skip_patterns=['extractor/conv1',
                                        'extractor/conv2'])
    if 'ptskipboth' in wanted:
        run_variant('per-tensor + float stem/incre',
                    int8_act_granularity='per_tensor',
                    int8_skip_patterns=['extractor/conv1',
                                        'extractor/conv2',
                                        'incre_modules'])
    if 'sharedptskiphead' in wanted:
        run_variant('shared + per-tensor + float incre head',
                    int8_shared_points=True,
                    int8_act_granularity='per_tensor',
                    int8_skip_patterns=['incre_modules'])
    if 'default' in wanted:
        # the SHIPPED config default (round 5): shared points +
        # per-tensor acts + float stem
        run_variant('shared + per-tensor + float stem (cfg default)',
                    int8_shared_points=True,
                    int8_act_granularity='per_tensor',
                    int8_skip_patterns=['extractor/conv1',
                                        'extractor/conv2'])


if __name__ == '__main__':
    main()
