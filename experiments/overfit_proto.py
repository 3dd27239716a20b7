"""Prototype for the round-4 learning gate: overfit BPBreID(resnet18)
on the synthetic set and watch eval rank-1/mAP vs epochs."""
import itertools
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

    clear_dataset_cache()
    cfg = get_default_config()
    cfg.data.height, cfg.data.width = 64, 32
    cfg.data.sources = cfg.data.targets = ['synthetic']
    cfg.data.transforms = ['rf']
    cfg.train.batch_size = 16
    cfg.sampler.num_instances = 4
    cfg.test.batch_size = 16
    cfg.model.bpbreid.backbone = 'resnet18'
    cfg.model.bpbreid.masks.preprocess = 'five_v'
    cfg.model.bpbreid.dim_reduce_output = 64
    compute_parts_num_and_names(cfg)

    dm = ImageDataManager(
        config=cfg, root='', sources=['synthetic'], targets=['synthetic'],
        height=64, width=32, transforms=cfg.data.transforms,
        batch_size_train=16, batch_size_test=16, workers=1,
        num_instances=4, use_masks=True,
        masks_dir='pifpaf_maskrcnn_filtering')
    model = BPBreID(num_classes=dm.num_train_pids, parts_num=5,
                    backbone='resnet18', last_stride=1,
                    dim_reduce='after_pooling', dim_reduce_output=64)
    engine = ImagePartBasedEngine(
        cfg, dm, model, build_optimizer(optim='adam', lr=1e-3),
        mask_filtering_testing=True)
    engine.init_state()

    def ev():
        cmc, mAP, ssmd, _ = engine._evaluate(
            0, dataset_name='synthetic',
            query_loader=dm.test_loader['synthetic']['query'],
            gallery_loader=dm.test_loader['synthetic']['gallery'],
            normalize_feature=True, ranks=(1, 5))
        return float(cmc[0]), float(mAP)

    r0, m0 = ev()
    print(f"epoch 0: rank1={r0:.3f} mAP={m0:.3f}")
    t0 = time.time()
    for epoch in range(30):
        losses = []
        for batch in dm.train_loader:
            loss, _ = engine.forward_backward(batch)
            losses.append(float(loss))
        if (epoch + 1) % 5 == 0:
            r, m = ev()
            print(f"epoch {epoch+1}: loss={np.mean(losses):.3f} "
                  f"rank1={r:.3f} mAP={m:.3f}  ({time.time()-t0:.0f}s)")


if __name__ == '__main__':
    main()
