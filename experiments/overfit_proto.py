"""Prototype for the round-4 learning gate: overfit BPBreID(resnet18)
on the hard synthetic set and watch eval rank-1/mAP vs epochs.

Env knobs: OVERFIT_LR (default 1e-3), OVERFIT_EPOCHS (default 12),
OVERFIT_EVAL_EVERY (default 1), OVERFIT_BATCH (default 16).
Measured curves (CPU, 2026-08-19): lr=1e-3 reaches rank1 0.896 /
mAP 0.655 at epoch 12 and keeps rising; see git history for the log.
"""
import os
import time

os.environ['JAX_PLATFORMS'] = 'cpu'

import numpy as np


def main():
    import jax
    if os.environ.get('JAX_PLATFORMS'):
        jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])
    from bpbreid_tpu.config import get_default_config
    from bpbreid_tpu.data import ImageDataManager
    from bpbreid_tpu.data.datasets import clear_dataset_cache
    from bpbreid_tpu.models.bpbreid import BPBreID
    from bpbreid_tpu.engine import ImagePartBasedEngine
    from bpbreid_tpu.optim import build_optimizer
    from bpbreid_tpu.ops.masks import compute_parts_num_and_names

    lr = float(os.environ.get('OVERFIT_LR', '1e-3'))
    epochs = int(os.environ.get('OVERFIT_EPOCHS', '12'))
    eval_every = int(os.environ.get('OVERFIT_EVAL_EVERY', '1'))
    batch = int(os.environ.get('OVERFIT_BATCH', '16'))

    # dataset-hardness sweep knobs (tuning the learning-gate dataset)
    amp = int(os.environ.get('OVERFIT_AMP', '45'))
    clo = int(os.environ.get('OVERFIT_CLO', '60'))
    chi = int(os.environ.get('OVERFIT_CHI', '180'))
    noise = int(os.environ.get('OVERFIT_NOISE', '24'))
    pids = int(os.environ.get('OVERFIT_PIDS', '8'))
    if (amp, clo, chi, noise, pids) != (45, 60, 180, 24, 8):
        from bpbreid_tpu.data.datasets import register_image_dataset
        from bpbreid_tpu.data.datasets.image_datasets import SyntheticDataset

        class TunedHard(SyntheticDataset):
            dataset_dir = 'synthetic_hard'

            def __init__(self, **kw):
                kw.update(hard=True, pattern_amp=amp, color_lo=clo,
                          color_hi=chi, noise=noise, num_pids=pids)
                super().__init__(**kw)

        # replace the registered class for this process
        import bpbreid_tpu.data.datasets as dsmod
        dsmod.__dict__['__image_datasets']['synthetic_hard'] = TunedHard
        print(f"tuned hard set: amp={amp} color=[{clo},{chi}] "
              f"noise={noise} pids={pids}", flush=True)

    clear_dataset_cache()
    cfg = get_default_config()
    cfg.data.height, cfg.data.width = 64, 32
    cfg.data.sources = cfg.data.targets = ['synthetic_hard']
    cfg.data.transforms = ['rf']
    cfg.train.batch_size = batch
    cfg.sampler.num_instances = 4
    cfg.test.batch_size = 16
    cfg.model.bpbreid.backbone = 'resnet18'
    cfg.model.bpbreid.masks.preprocess = 'five_v'
    cfg.model.bpbreid.dim_reduce_output = 64
    compute_parts_num_and_names(cfg)

    dm = ImageDataManager(
        config=cfg, root='', sources=['synthetic_hard'], targets=['synthetic_hard'],
        height=64, width=32, transforms=cfg.data.transforms,
        batch_size_train=batch, batch_size_test=16, workers=1,
        num_instances=4, use_masks=True,
        masks_dir='pifpaf_maskrcnn_filtering')
    model = BPBreID(num_classes=dm.num_train_pids, parts_num=5,
                    backbone='resnet18', last_stride=1,
                    dim_reduce='after_pooling', dim_reduce_output=64)
    engine = ImagePartBasedEngine(
        cfg, dm, model, build_optimizer(optim='adam', lr=lr),
        mask_filtering_testing=True)
    engine.init_state()

    def ev():
        cmc, mAP, ssmd, _ = engine._evaluate(
            0, dataset_name='synthetic_hard',
            query_loader=dm.test_loader['synthetic_hard']['query'],
            gallery_loader=dm.test_loader['synthetic_hard']['gallery'],
            normalize_feature=True, ranks=(1, 5))
        return float(cmc[0]), float(mAP)

    # train-set retrieval: query == gallery == the train images; the CMC
    # protocol drops same-(pid,camid) gallery entries, so the query's own
    # image never matches itself — rank-1 measures memorisation across
    # cameras (the VERDICT learning-gate criterion).
    import copy
    from bpbreid_tpu.data.loader import BatchLoader
    memo = copy.copy(dm.train_loader.dataset)
    memo.query = memo.train
    memo.gallery = memo.train

    def ev_train():
        cmc, mAP, ssmd, _ = engine._evaluate(
            0, dataset_name='synthetic_hard_train',
            query_loader=BatchLoader(memo, 'query', 16, 64, 32,
                                     num_workers=1),
            gallery_loader=BatchLoader(memo, 'gallery', 16, 64, 32,
                                       num_workers=1),
            normalize_feature=True, ranks=(1,))
        return float(cmc[0]), float(mAP)

    r0, m0 = ev()
    tr0, tm0 = ev_train()
    print(f"lr={lr} epoch 0: rank1={r0:.3f} mAP={m0:.3f} "
          f"train_rank1={tr0:.3f} train_mAP={tm0:.3f}", flush=True)
    t0 = time.time()
    for epoch in range(epochs):
        losses = []
        for batch_data in dm.train_loader:
            loss, _ = engine.forward_backward(batch_data)
            losses.append(float(loss))
        if (epoch + 1) % eval_every == 0 or epoch + 1 == epochs:
            r, m = ev()
            tr, tm = ev_train()
            print(f"epoch {epoch+1}: loss={np.mean(losses):.3f} "
                  f"rank1={r:.3f} mAP={m:.3f} "
                  f"train_rank1={tr:.3f} train_mAP={tm:.3f} "
                  f" ({time.time()-t0:.0f}s)", flush=True)


if __name__ == '__main__':
    main()
