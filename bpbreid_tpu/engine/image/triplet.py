"""Global-embedding triplet+CE engine
(reference: torchreid/engine/image/triplet.py:91-115)."""
import jax.numpy as jnp

from bpbreid_tpu.engine.image.softmax import ImageSoftmaxEngine
from bpbreid_tpu.losses.cross_entropy import CrossEntropyLoss
from bpbreid_tpu.losses.triplet import TripletLoss

__all__ = ['ImageTripletEngine']


class ImageTripletEngine(ImageSoftmaxEngine):
    loss_mode = 'triplet'

    def __init__(self, datamanager, model, optimizer, margin=0.3,
                 weight_t=1.0, weight_x=1.0, scheduler=None, use_gpu=False,
                 label_smooth=True, config=None, writer=None,
                 engine_state=None, save_model_flag=False, **kwargs):
        super().__init__(datamanager, model, optimizer, scheduler=scheduler,
                         use_gpu=use_gpu, label_smooth=label_smooth,
                         config=config, writer=writer,
                         engine_state=engine_state,
                         save_model_flag=save_model_flag, **kwargs)
        assert weight_t >= 0 and weight_x >= 0
        assert weight_t + weight_x > 0
        self.weight_t = weight_t
        self.weight_x = weight_x
        self.criterion_t = TripletLoss(margin=margin)
        self.criterion_x = CrossEntropyLoss(label_smooth=label_smooth)

    def _compute_loss(self, outputs, pids):
        logits, features = outputs
        loss = jnp.asarray(0.0, jnp.float32)
        summary = {'triplet': {}}
        if self.weight_t > 0:
            loss_t = self.criterion_t(features, pids)
            loss = loss + self.weight_t * loss_t
            summary['triplet']['t'] = loss_t
        if self.weight_x > 0:
            loss_x = self.criterion_x(logits, pids)
            loss = loss + self.weight_x * loss_x
            summary['triplet']['x'] = loss_x
            summary['triplet']['acc'] = (jnp.argmax(logits, -1) == pids).mean()
        return loss, summary
