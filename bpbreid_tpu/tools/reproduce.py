"""Turnkey reference-checkpoint reproduction: convert -> eval -> compare.

One command takes a real dataset root plus a reference torch ``.pth``
checkpoint (the GDrive artifacts of /root/reference/README.md:189-192,
saved by torchtools.save_checkpoint with state_dict + rank1/mAP + the
full config) and reproduces its evaluation with this framework:

    python -m bpbreid_tpu.tools.reproduce \
        --checkpoint bpbreid_market1501_hrnet32_10642.pth \
        --root $REID_DATA [--dataset market1501] [opts ...]

Flow: the checkpoint's embedded config restores the model architecture
(scripts/main.py build_config semantics with model.load_config), the
torch weights convert through utils/torch_weights, the engine evaluates
query/gallery, and the resulting mAP/rank-1 are compared against the
numbers stored in the checkpoint — printed as a delta table and
returned (and exit code 1 when --max-delta is exceeded).

The orchestration is covered by tests/test_reproduce.py on a fabricated
mini Market-1501 tree + a tiny reference-format checkpoint; on a
machine with the real dataset + published checkpoint the same command
validates true accuracy parity.
"""
import argparse
import json
import os.path as osp


def reproduce(checkpoint, root, dataset='market1501', config_file=None,
              opts=None, save_dir=None, max_delta=None, masks_dir=None):
    """Run the convert->eval->compare flow; returns a result dict."""
    from bpbreid_tpu.scripts.main import (build_config, build_model_engine)
    from bpbreid_tpu.utils.torch_weights import load_torch_state_dict

    class _Args:
        pass

    args = _Args()
    args.root = root
    args.save_dir = save_dir or osp.join(root, 'reproduce_log')
    args.sources = [dataset]
    args.targets = [dataset]
    args.transforms = None
    args.job_id = None
    args.inference_enabled = False
    args.opts = list(opts or [])
    # evaluation-only semantics of the reference *_test.yaml configs
    args.opts = ['test.evaluate', 'True', 'model.load_weights', checkpoint,
                 'model.load_config', 'True'] + args.opts
    if masks_dir:
        args.opts += ['model.bpbreid.masks.dir', masks_dir]

    cfg = build_config(args, config_file)
    engine, _model = build_model_engine(cfg)
    cmc, mAP, ssmd, _pxl = engine.test(
        0, dist_metric=cfg.test.dist_metric,
        normalize_feature=cfg.test.normalize_feature,
        save_dir=cfg.data.save_dir, ranks=(1, 5, 10, 20),
        rerank=cfg.test.rerank)

    # stored metrics from the reference checkpoint (torchtools.py:24-63)
    stored = {}
    try:
        _sd, extra = load_torch_state_dict(checkpoint)
        for key in ('rank1', 'mAP', 'ssmd', 'epoch'):
            if key in extra and extra[key] is not None:
                stored[key] = float(extra[key])
    except Exception:
        pass

    result = {'dataset': dataset, 'mAP': float(mAP),
              'rank1': float(cmc[0]), 'ssmd': float(ssmd),
              'stored': stored}
    print('\n== reproduction vs checkpoint ==')
    print('{:<10} {:>12} {:>12} {:>10}'.format(
        'metric', 'reproduced', 'checkpoint', 'delta'))
    for key, got in (('mAP', result['mAP']), ('rank1', result['rank1'])):
        want = stored.get(key)
        delta = (got - want) if want is not None else float('nan')
        print('{:<10} {:>12.4f} {:>12} {:>10}'.format(
            key, got,
            '{:.4f}'.format(want) if want is not None else 'n/a',
            '{:+.4f}'.format(delta) if want is not None else 'n/a'))
        result['delta_' + key] = delta
    ok = True
    if max_delta is not None:
        for key in ('mAP', 'rank1'):
            want = stored.get(key)
            if want is not None and abs(result['delta_' + key]) > max_delta:
                ok = False
                print('FAIL: |{} delta| {:.4f} > {}'.format(
                    key, abs(result['delta_' + key]), max_delta))
    result['ok'] = ok
    return result


def main(argv=None):
    parser = argparse.ArgumentParser(
        description=__doc__.splitlines()[0],
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument('--checkpoint', required=True,
                        help='reference torch .pth (or native .ckpt)')
    parser.add_argument('--root', required=True, help='datasets root')
    parser.add_argument('--dataset', default='market1501')
    parser.add_argument('--config-file', default=None,
                        help='optional *_test.yaml overriding the '
                             'checkpoint-embedded config')
    parser.add_argument('--save_dir', default=None)
    parser.add_argument('--masks-dir', default=None,
                        help='confidence-fields directory name (e.g. '
                             'pifpaf_maskrcnn_filtering); omit to eval '
                             'without external masks')
    parser.add_argument('--max-delta', type=float, default=None,
                        help='fail (exit 1) when |reproduced - stored| '
                             'mAP/rank-1 exceeds this')
    parser.add_argument('--json-out', default=None)
    parser.add_argument('opts', nargs=argparse.REMAINDER)
    args = parser.parse_args(argv)
    result = reproduce(args.checkpoint, args.root, args.dataset,
                       config_file=args.config_file, opts=args.opts,
                       save_dir=args.save_dir, max_delta=args.max_delta,
                       masks_dir=args.masks_dir)
    if args.json_out:
        with open(args.json_out, 'w') as f:
            json.dump(result, f, indent=1)
    return 0 if result['ok'] else 1


if __name__ == '__main__':
    raise SystemExit(main())
