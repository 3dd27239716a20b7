"""Video triplet engine (reference: torchreid/engine/video/triplet.py)."""
import jax.numpy as jnp
import numpy as np

from bpbreid_tpu.engine.image.triplet import ImageTripletEngine
from bpbreid_tpu.engine.video.softmax import VideoSoftmaxEngine

__all__ = ['VideoTripletEngine']


class VideoTripletEngine(ImageTripletEngine):
    def __init__(self, datamanager, model, optimizer, margin=0.3,
                 weight_t=1.0, weight_x=1.0, scheduler=None, use_gpu=False,
                 label_smooth=True, pooling_method='avg', config=None,
                 writer=None, engine_state=None, save_model_flag=False,
                 **kwargs):
        super().__init__(datamanager, model, optimizer, margin=margin,
                         weight_t=weight_t, weight_x=weight_x,
                         scheduler=scheduler, use_gpu=use_gpu,
                         label_smooth=label_smooth, config=config,
                         writer=writer, engine_state=engine_state,
                         save_model_flag=save_model_flag, **kwargs)
        self.pooling_method = pooling_method

    forward_backward = VideoSoftmaxEngine.forward_backward
    forward_backward_multi = VideoSoftmaxEngine.forward_backward_multi
    _feature_extraction = VideoSoftmaxEngine._feature_extraction
