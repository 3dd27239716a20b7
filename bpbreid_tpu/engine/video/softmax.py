"""Video softmax engine
(reference: torchreid/engine/video/softmax.py:82-111): tracklet batches
``[B, S, H, W, 3]`` are flattened to ``[B*S, ...]`` for training; at
eval, frame features are pooled ('avg'/'max') over the tracklet."""
import jax.numpy as jnp
import numpy as np

from bpbreid_tpu.engine.image.softmax import ImageSoftmaxEngine

__all__ = ['VideoSoftmaxEngine']


class VideoSoftmaxEngine(ImageSoftmaxEngine):
    def __init__(self, datamanager, model, optimizer, scheduler=None,
                 use_gpu=False, label_smooth=True, pooling_method='avg',
                 config=None, writer=None, engine_state=None,
                 save_model_flag=False, **kwargs):
        super().__init__(datamanager, model, optimizer, scheduler=scheduler,
                         use_gpu=use_gpu, label_smooth=label_smooth,
                         config=config, writer=writer,
                         engine_state=engine_state,
                         save_model_flag=save_model_flag, **kwargs)
        self.pooling_method = pooling_method

    def forward_backward(self, batch):
        # [B, S, H, W, 3] -> [B*S, H, W, 3]; pids repeated per frame
        # (reference: video/softmax.py:82-96)
        imgs = np.asarray(batch['image'])
        b, s = imgs.shape[:2]
        flat = dict(batch)
        flat['image'] = imgs.reshape(b * s, *imgs.shape[2:])
        flat['pid'] = np.repeat(np.asarray(batch['pid']), s)
        return super().forward_backward(flat)

    def forward_backward_multi(self, batch):
        # step-stacked tracklets [k, B, S, H, W, 3] -> [k, B*S, H, W, 3]
        # with pids repeated per frame (frame order matches the reshape:
        # B-major, S fastest), then the image engine's k-step scan
        imgs = jnp.asarray(batch['image'])
        k, b, s = imgs.shape[:3]
        flat = dict(batch)
        flat['image'] = imgs.reshape(k, b * s, *imgs.shape[3:])
        flat['pid'] = jnp.repeat(jnp.asarray(batch['pid']), s, axis=1)
        return super().forward_backward_multi(flat)

    def _feature_extraction(self, loader):
        f_, pids_, camids_ = [], [], []
        for batch in loader:
            imgs = np.asarray(batch['image'])
            b, s = imgs.shape[:2]
            feats = self._eval_step(
                self.state.params, self.state.batch_stats,
                jnp.asarray(imgs.reshape(b * s, *imgs.shape[2:])))
            feats = np.asarray(feats).reshape(b, s, -1)
            if self.pooling_method == 'avg':
                feats = feats.mean(axis=1)
            else:
                feats = feats.max(axis=1)
            valid = batch['valid']
            f_.append(feats[valid])
            pids_.append(batch['pid'][valid])
            camids_.append(batch['camid'][valid])
        return (np.concatenate(f_), np.concatenate(pids_),
                np.concatenate(camids_))
