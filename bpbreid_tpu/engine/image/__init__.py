from bpbreid_tpu.engine.part_based import ImagePartBasedEngine
from bpbreid_tpu.engine.image.softmax import ImageSoftmaxEngine
from bpbreid_tpu.engine.image.triplet import ImageTripletEngine
