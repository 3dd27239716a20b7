from bpbreid_tpu.engine.video.softmax import VideoSoftmaxEngine
from bpbreid_tpu.engine.video.triplet import VideoTripletEngine
